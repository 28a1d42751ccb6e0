"""Batch ingest job: staging JSON → partitioned lake + catalog append
+ per-source fan-out (reference E1, SURVEY.md §3).

One declarative job replaces the reference's five-service hop chain
(APIGW→Firehose→S3→SQS→Lambda, stack.py:177–216 → recorder:71–92):

  events.json.gz ──read──► lake (partitionBy source, sorted by ts)
                      ├──► catalog append (source, ingest_ts, file_key)
                      └──► fan-out: per-source delivery (sink per source)

The catalog is itself a partitioned Parquet table, so the DynamoDB
(pk=Source, sk=Timestamp) query shape (stack.py:63–77) becomes
partition pruning + min/max skipping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_spark.sources import lake

CATALOG_SCHEMA = "source STRING, ingest_ts TIMESTAMP, file_key STRING, n_records BIGINT"


def build_catalog_entries(events: DataFrame, batch_id: str) -> DataFrame:
    """R9: one catalog row per (source, batch) — item shape mirrors
    recorder:16–31 `(Source, Timestamp, Key)` plus a record count.
    ingest_ts is the processing time the reference takes from SQS
    SentTimestamp (recorder:77); here it's stamped per batch."""
    return events.groupBy(F.col("source")).agg(
        F.count("*").alias("n_records"),
    ).select(
        "source",
        F.current_timestamp().alias("ingest_ts"),
        F.concat(F.col("source"), F.lit(f"/{batch_id}.parquet")).alias("file_key"),
        "n_records",
    )


def append_catalog(entries: DataFrame, catalog_path: str) -> None:
    entries.write.mode("append").partitionBy("source").parquet(catalog_path)


def read_catalog(spark: SparkSession, catalog_path: str) -> DataFrame:
    return spark.read.parquet(catalog_path)


def fan_out(events: DataFrame, delivery_root: str) -> list[str]:
    """R10/R11: per-source delivery. The reference loops SNS publishes
    per record (recorder:55–65); here one partitioned write delivers
    every record to its source's directory — subscribers read their
    own partition. Returns the source list delivered."""
    events.write.mode("append").partitionBy("source").parquet(delivery_root)
    # key=str survives a non-string source column; nulls are
    # normalized to __unknown__ upstream (ingest_batch) so no None
    # reaches the sort — but don't crash if a caller skipped that
    return sorted(
        (r["source"] for r in events.select("source").distinct().collect()),
        key=str,
    )


def ingest_batch(
    spark: SparkSession,
    staging_path: str,
    lake_path: str,
    catalog_path: str,
    delivery_root: str | None,
    batch_id: str,
    source_col: str = "event_type",
) -> dict[str, int]:
    """E1 end-to-end: read staging JSON, land in the lake partitioned
    by source, append catalog entries, fan out. Returns counts."""
    raw = lake.read_json_events(spark, staging_path)
    # null source (missing event_type) routes to an explicit quarantine
    # partition: a NULL partition value would land under Hive's default
    # dir and then crash the post-write source listing (None < str),
    # reporting failure AFTER the writes committed — a retry would
    # duplicate the batch
    events = raw.withColumn(
        "source", F.coalesce(F.col(source_col).cast("string"), F.lit("__unknown__"))
    ).withColumn("batch_id", F.lit(batch_id))
    # ONE materialization feeds the lake write, the catalog aggregate,
    # the fan-out, and the count: unpersisted, each action re-read and
    # re-parsed the staging JSON (~5x the scan cost), and a file
    # landing in staging between actions made lake/catalog/count
    # mutually inconsistent
    events = events.persist()
    try:
        lake.write_partitioned(events, lake_path)
        entries = build_catalog_entries(events, batch_id)
        append_catalog(entries, catalog_path)
        delivered: list[str] = []
        if delivery_root:
            delivered = fan_out(events, delivery_root)
        n = events.count()
    finally:
        events.unpersist()
    return {"n_events": n, "n_sources": len(delivered), "batch_id": batch_id}  # type: ignore[dict-item]
