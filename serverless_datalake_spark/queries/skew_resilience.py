"""Skew-mitigation operators as oracle-verified queries: salting is
an execution-strategy change, not a semantics change, so the salted
plans must produce bit-identical results to the plain GROUP BY / JOIN
the oracle runs. These entries prove operators/skew.py end-to-end.

Scale rationale: AQE splits skewed *sort-merge join* partitions but
does nothing for a hash aggregate whose hottest key owns a large
share of all rows (one reducer straggles), nor for a hot-key
broadcast join explosion — the two cases implemented here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_spark.operators import skew
from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_table


@query(
    "skew_salted_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS total,
           MIN(value) AS vmin,
           MAX(value) AS vmax
    FROM events
    GROUP BY event_type
    """,
    tags=("skew", "aggregation"),
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over events: partial agg on
    (key, salt) spreads a hot key over `buckets` reducers; the final
    agg meets only `buckets` partial rows per key. Results equal the
    single-phase GROUP BY (count/min/max exactly; the sum's partial
    order differs → rounded on both sides like every double sum)."""
    e = load_table(spark, sf_dir, "events")
    agged = skew.salted_agg(
        e.select("event_type", "value"),
        "event_type",
        {"n": "count(*)", "total": "sum(value)", "vmin": "min(value)", "vmax": "max(value)"},
        buckets=32,
    )
    return agged.select(
        "event_type", "n", F.round("total", 4).alias("total"), "vmin", "vmax"
    )


@query(
    "skew_hotkey_join",
    oracle="""
    SELECT e.event_type, d.label,
           COUNT(*) AS n,
           ROUND(SUM(e.value), 4) AS total
    FROM events e
    JOIN (SELECT DISTINCT event_type, UPPER(event_type) AS label
          FROM events) d
      ON e.event_type = d.event_type
    GROUP BY e.event_type, d.label
    """,
    tags=("skew", "join"),
)
def skew_hotkey_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key equi-join via explode-salting: the fact side gets a
    per-row salt, the (broadcastable) dim side is replicated across
    all salt values, and the join runs on (key, salt) — so one hot
    key can no longer pin a single task. Row-identical to the plain
    join the oracle runs."""
    e = load_table(spark, sf_dir, "events")
    dim = (
        e.select("event_type").distinct()
        .withColumn("label", F.upper("event_type"))
    )
    joined = skew.explode_salt_join(
        e.select("event_type", "value"), dim, on="event_type", buckets=8
    )
    return joined.groupBy("event_type", "label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("total"),
    )
