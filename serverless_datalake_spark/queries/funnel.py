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


@query(
    "retention_cohorts",
    oracle="""
    WITH wk AS (
      SELECT user_id,
             CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) // 604800 AS w
      FROM events
    ), first_wk AS (
      SELECT user_id, MIN(w) AS cohort_w FROM wk GROUP BY 1
    ), cohort_size AS (
      SELECT cohort_w, CAST(COUNT(*) AS BIGINT) AS n_users FROM first_wk GROUP BY 1
    ), active AS (
      SELECT DISTINCT f.cohort_w, wk.w - f.cohort_w AS offset_w, wk.user_id
      FROM wk JOIN first_wk f USING (user_id)
    ), cells AS (
      SELECT cohort_w, offset_w, CAST(COUNT(*) AS BIGINT) AS n_active
      FROM active GROUP BY 1, 2
    )
    SELECT c.cohort_w * 604800 AS cohort_start,
           c.offset_w,
           c.n_active,
           s.n_users AS cohort_users,
           ROUND(CAST(c.n_active AS DOUBLE) / CAST(s.n_users AS DOUBLE), 4) AS retention
    FROM cells c JOIN cohort_size s USING (cohort_w)
    """,
    tags=("funnel", "retention", "cohort"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retention cohort matrix — product analytics' canonical
    report: users bucketed by first-activity week (the cohort), each
    later week's activity expressed as a fraction of the cohort
    (offset 0 is 1.0 by construction; decay down the row is the
    retention curve).

    Scale shape: first-activity is one user-keyed aggregate; the
    cohort×offset matrix is a distinct + count over (cohort, offset,
    user) — both shuffles are user- or cell-bounded, and the join back
    to cohort sizes is cohort-cardinality (broadcast). No windows, no
    self-joins over raw events."""
    e = load_table(spark, sf_dir, "events")
    wk = e.select("user_id", F.expr("CAST(ts AS LONG) DIV 604800").alias("w"))
    first_wk = wk.groupBy("user_id").agg(F.min("w").alias("cohort_w"))
    cohort_size = first_wk.groupBy("cohort_w").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    active = (
        wk.join(first_wk, "user_id")
        .select("cohort_w", (F.col("w") - F.col("cohort_w")).alias("offset_w"), "user_id")
        .distinct()
    )
    cells = active.groupBy("cohort_w", "offset_w").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    return cells.join(F.broadcast(cohort_size), "cohort_w").select(
        (F.col("cohort_w") * 604800).alias("cohort_start"),
        "offset_w",
        "n_active",
        "cohort_users",
        F.round(
            F.col("n_active").cast("double") / F.col("cohort_users").cast("double"), 4
        ).alias("retention"),
    )


@query(
    "events_dau_stickiness",
    oracle="""
    WITH d AS (
      SELECT CAST(FLOOR(EPOCH(CAST(time_bucket(INTERVAL '1 day', ts) AS TIMESTAMP))) AS BIGINT) AS day_start,
             CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) // 604800 AS wk,
             user_id
      FROM events
    ), dau AS (
      SELECT day_start, wk, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
      FROM d GROUP BY 1, 2
    ), wau AS (
      SELECT wk, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
      FROM d GROUP BY 1
    )
    SELECT dau.day_start, dau.dau, wau.wau,
           ROUND(CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE), 4) AS stickiness
    FROM dau JOIN wau USING (wk)
    """,
    tags=("funnel", "engagement", "dau"),
)
def events_dau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / stickiness — the engagement triple every product
    dashboard leads with: daily distinct actives, the enclosing
    week's distinct actives, and their ratio (how much of the weekly
    audience shows up on a given day; 1/7 ≈ everyone once a week,
    1.0 ≈ everyone daily).

    Scale shape: two distinct-count aggregates over the same scan
    (day- and week-keyed; Catalyst plans each as expand+partial), and
    a week-keyed join of day rows against the week relation —
    week-cardinality, broadcast in practice. No per-user state beyond
    the distinct machinery."""
    e = load_table(spark, sf_dir, "events")
    d = e.select(
        F.expr("CAST(ts AS LONG) DIV 86400 * 86400").alias("day_start"),
        F.expr("CAST(ts AS LONG) DIV 604800").alias("wk"),
        "user_id",
    )
    dau = d.groupBy("day_start", "wk").agg(
        F.countDistinct("user_id").alias("dau")
    )
    wau = d.groupBy("wk").agg(F.countDistinct("user_id").alias("wau"))
    return dau.join(F.broadcast(wau), "wk").select(
        "day_start",
        "dau",
        "wau",
        F.round(
            F.col("dau").cast("double") / F.col("wau").cast("double"), 4
        ).alias("stickiness"),
    )
