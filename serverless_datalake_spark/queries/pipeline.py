"""Reference-pipeline semantics as relational queries (SURVEY.md §2a).

The reference's dataflow — buffer events into per-source files (R2/R4),
catalog them (R9), range-select for replay (R12), fan out per source
(R10/R11) — re-expressed over the `events` fixture. `event_type` plays
the reference's `source` role (FIXTURES.md); an hourly bucket plays the
Firehose flush (60 s in the reference, stack.py:139 — scaled up so
fixture data yields multi-record files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_table

# A cataloged "blob": all events of one source within one flush bucket
# (R2 buffering + R4 per-source prefix). file_key mirrors the
# reference's `{source}/<object>` key shape (stack.py:144).
_CATALOG_SQL = """
    SELECT event_type AS source,
           DATE_TRUNC('hour', ts) AS bucket,
           event_type || '/' || STRFTIME(DATE_TRUNC('hour', ts), '%Y%m%d%H') || '.json.gz' AS file_key,
           COUNT(*) AS n_records,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
"""


def _catalog_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bucket = F.date_trunc("hour", F.col("ts"))
    return (
        e.groupBy(
            F.col("event_type").alias("source"),
            bucket.alias("bucket"),
            F.concat(
                F.col("event_type"),
                F.lit("/"),
                F.date_format(bucket, "yyyyMMddHH"),
                F.lit(".json.gz"),
            ).alias("file_key"),
        )
        .agg(F.count("*").alias("n_records"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


@query(
    "pipeline_catalog_build",
    oracle=f"""
    SELECT source, file_key, n_records, sum_value,
           CAST(FLOOR(EPOCH(CAST(bucket AS TIMESTAMP))) AS BIGINT) AS bucket_epoch
    FROM ({_CATALOG_SQL})
    """,
    tags=("pipeline", "catalog"),
)
def pipeline_catalog_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9: the catalog-append dataflow (recorder:16–31,71–91) as a
    declarative aggregation — one row per (source, flush bucket) with
    the derived object key."""
    return _catalog_df(spark, sf_dir).select(
        "source",
        "file_key",
        "n_records",
        "sum_value",
        F.col("bucket").cast("long").alias("bucket_epoch"),
    )


@query(
    "pipeline_replay_select",
    oracle=f"""
    SELECT source, file_key, n_records
    FROM ({_CATALOG_SQL})
    WHERE source = 'click'
      AND bucket BETWEEN TIMESTAMP '2024-01-08 00:00:00' AND TIMESTAMP '2024-01-15 00:00:00'
    """,
    tags=("pipeline", "replay"),
)
def pipeline_replay_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R12/R13: the replay range query — `Source EQ` + `Timestamp
    BETWEEN` over the catalog (replayer:19–39), returning the file
    keys that would be re-enqueued. Partition pruning on `source` +
    min/max skipping on the bucket column at scale."""
    cat = _catalog_df(spark, sf_dir)
    return cat.where(
        (F.col("source") == "click")
        & F.col("bucket").between("2024-01-08 00:00:00", "2024-01-15 00:00:00")
    ).select("source", "file_key", "n_records")


@query(
    "pipeline_fanout_counts",
    oracle="""
    SELECT event_type AS source,
           COUNT(*) AS n_delivered,
           COUNT(DISTINCT user_id) AS n_users,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY event_type
    """,
    tags=("pipeline", "fanout"),
)
def pipeline_fanout_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R10/R11: group-by-source + per-source delivery totals — the
    recorder's in-handler grouping (recorder:86–90) and SNS fan-out
    loop (recorder:55–65) as one aggregation."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(F.col("event_type").alias("source")).agg(
        F.count("*").alias("n_delivered"),
        F.count_distinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "pipeline_source_projection",
    oracle="""
    SELECT DISTINCT split_part(file_key, '/', 1) AS source
    FROM (SELECT event_type || '/' || CAST(event_id AS VARCHAR) || '.json.gz' AS file_key
          FROM events)
    """,
    tags=("pipeline", "project"),
)
def pipeline_source_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8: derive source from the object key (`key.split('/')[0]`,
    recorder:82) — with a partitioned layout this is free (it's the
    partition column), shown here as the explicit projection."""
    e = load_table(spark, sf_dir, "events")
    keys = e.select(
        F.concat(
            F.col("event_type"), F.lit("/"), F.col("event_id").cast("string"), F.lit(".json.gz")
        ).alias("file_key")
    )
    return keys.select(F.split_part(F.col("file_key"), F.lit("/"), F.lit(1)).alias("source")).distinct()


@query(
    "pipeline_source_freshness",
    oracle="""
    WITH per AS (
      SELECT event_type AS source,
             CAST(FLOOR(EPOCH(CAST(MAX(ts) AS TIMESTAMP))) AS BIGINT) AS latest_epoch,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    ), g AS (
      SELECT CAST(MAX(latest_epoch) AS BIGINT) AS global_latest FROM per
    )
    SELECT per.source, per.latest_epoch, per.n_events,
           g.global_latest - per.latest_epoch AS lag_seconds,
           g.global_latest - per.latest_epoch > 3600 AS stale
    FROM per CROSS JOIN g
    """,
    tags=("pipeline", "freshness", "ops"),
)
def pipeline_source_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source freshness — the ops monitor every multi-source
    ingest runs (the reference's per-source prefixes imply exactly
    this check): each source's latest event time, its lag behind the
    freshest source, and a staleness flag at 1 hour — the alarm that
    catches a silently-dead producer before consumers notice missing
    data.

    Scale shape: a per-source MAX/COUNT aggregate (partition-pruned
    to metadata at rest — the lake layout stores per-source max ts in
    parquet footers) and a 1-row broadcast of the global max."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy(F.col("event_type").alias("source")).agg(
        F.max(F.col("ts").cast("long")).alias("latest_epoch"),
        F.count(F.lit(1)).alias("n_events"),
    )
    g = per.groupBy().agg(F.max("latest_epoch").alias("global_latest"))
    return per.crossJoin(F.broadcast(g)).select(
        "source",
        "latest_epoch",
        "n_events",
        (F.col("global_latest") - F.col("latest_epoch")).alias("lag_seconds"),
        ((F.col("global_latest") - F.col("latest_epoch")) > 3600).alias("stale"),
    )
