"""Funnel / sessionized product-analytics shapes over `events` —
the conversion-ordering queries an event lake exists to answer
(reference E1's data put to its natural analytical use)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_table


@query(
    "funnel_signup_click_purchase",
    oracle="""
    WITH stage1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), stage2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN stage1 s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts > s.t1
      GROUP BY e.user_id
    ), stage3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN stage2 s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s.t2
      GROUP BY e.user_id
    )
    SELECT
      (SELECT COUNT(*) FROM stage1) AS n_signup,
      (SELECT COUNT(*) FROM stage2) AS n_then_click,
      (SELECT COUNT(*) FROM stage3) AS n_then_purchase
    """,
    tags=("funnel", "analytics"),
)
def funnel_signup_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who signed up, then clicked
    AFTER the first signup, then purchased AFTER that first click.
    Expressed as cascaded first-event aggregations + semi-structured
    joins — each stage is one shuffle on user_id, and Catalyst reuses
    the events scan across stages."""
    e = load_table(spark, sf_dir, "events")
    s1 = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count("*").alias("n_signup"))
        .crossJoin(s2.agg(F.count("*").alias("n_then_click")))
        .crossJoin(s3.agg(F.count("*").alias("n_then_purchase")))
    )


@query(
    "funnel_time_to_convert",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(FLOOR(EPOCH(CAST(first_purchase AS TIMESTAMP)) - EPOCH(CAST(first_signup AS TIMESTAMP))) AS BIGINT) AS seconds_to_convert
    FROM firsts
    WHERE first_signup IS NOT NULL AND first_purchase IS NOT NULL
      AND first_purchase > first_signup
    """,
    tags=("funnel", "analytics"),
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert per user via conditional-aggregation firsts —
    ONE pass over events (no per-stage joins), the pattern to prefer
    when stage ordering beyond firsts isn't required."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("first_signup"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    return (
        firsts.where(
            F.col("first_signup").isNotNull()
            & F.col("first_purchase").isNotNull()
            & (F.col("first_purchase") > F.col("first_signup"))
        )
        .select(
            "user_id",
            F.floor(
                F.col("first_purchase").cast("double") - F.col("first_signup").cast("double")
            )
            .cast("long")
            .alias("seconds_to_convert"),
        )
    )
