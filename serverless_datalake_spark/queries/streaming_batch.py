"""Streaming semantics, batch-verified (SURVEY.md §2b streaming rows).

`F.window` / `F.session_window` / `dropDuplicates` compute identically
in batch and streaming, so their *semantics* are oracle-verified here;
the streaming execution path (triggers, watermarks, checkpoints,
foreachBatch fan-out) lives in streaming/pipeline.py with its own
deterministic micro-batch tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from serverless_datalake_spark.operators.ranking import with_global_cummax
from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_table


@query(
    "stream_tumbling_window",
    oracle="""
    SELECT event_type,
           CAST(FLOOR(EPOCH(CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP))) AS BIGINT) AS window_start,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "window"),
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per source — the streaming
    aggregation shape (R2's 60 s flush generalized to event time);
    identical code works under readStream + withWatermark."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "event_type",
            F.col("w.start").cast("long").alias("window_start"),
            "n",
            "sum_value",
        )
    )


@query(
    "stream_sliding_window",
    oracle="""
    SELECT ws AS window_start, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
    FROM (
      SELECT CAST(FLOOR(EPOCH(CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP))) AS BIGINT) - offs AS ws,
             value
      FROM events, UNNEST([0, 3600]) AS t(offs)
    )
    GROUP BY ws
    """,
    tags=("streaming", "window"),
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 2-hour width, 1-hour slide — each event lands
    in exactly two windows. Oracle expands the two memberships with
    UNNEST; Spark's F.window does the same expansion internally."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").cast("long").alias("window_start"), "n", "sum_value")
    )


@query(
    "stream_session_window",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM ordered
    )
    SELECT user_id,
           CAST(FLOOR(EPOCH(CAST(MIN(ts) AS TIMESTAMP))) AS BIGINT) AS session_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tags=("streaming", "session"),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user via the native
    F.session_window — O(n log n) per key, state-store-backed under
    streaming. Oracle reproduces the semantics with the classic
    gaps-and-islands SQL."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_dedup_exact",
    oracle="""
    SELECT event_type, COUNT(*) AS n_after_dedup
    FROM (
      SELECT DISTINCT ON (event_id) event_id, event_type
      FROM (SELECT event_id, event_type FROM events
            UNION ALL
            SELECT event_id, event_type FROM events)
      ORDER BY event_id
    )
    GROUP BY event_type
    """,
    tags=("streaming", "dedup"),
)
def stream_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once from at-least-once: the reference redelivers
    without dedup (SURVEY.md §1.4); here a doubled (redelivered)
    stream collapses back via dropDuplicates on the event key — in
    streaming the same call is state-store dedup + watermark."""
    e = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    doubled = e.unionAll(e)
    return doubled.dropDuplicates(["event_id"]).groupBy("event_type").agg(
        F.count("*").alias("n_after_dedup")
    )


@query(
    "stream_join_timerange",
    oracle="""
    SELECT c.user_id,
           COUNT(*) AS n_pairs,
           MIN(epoch_ms(p.ts) - epoch_ms(c.ts)) AS min_lag_ms
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click'
     AND p.event_type = 'purchase'
     AND p.ts >= c.ts
     AND p.ts < c.ts + INTERVAL 1 HOUR
    GROUP BY c.user_id
    """,
    tags=("streaming", "join"),
)
def stream_join_timerange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream time-range join
    (streaming/pipeline.stream_stream_enrich): click→purchase pairs of
    the same user within one hour, aggregated per user. In streaming,
    the same condition bounds join state via watermarks (a row can be
    dropped once no future row can land in its range); in batch it is
    a range-predicate equi-join on user_id — one shuffle, integer lag
    math for exactness."""
    e = load_table(spark, sf_dir, "events")
    c = e.where(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("c_ts")
    )
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("ts").alias("p_ts")
    )
    pairs = c.join(p, "user_id").where(
        (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") < F.col("c_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    lag_ms = F.unix_millis("p_ts") - F.unix_millis("c_ts")
    return pairs.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
        F.min(lag_ms).alias("min_lag_ms"),
    )


@query(
    "stream_topk_windowed",
    oracle="""
    WITH agg AS (
      SELECT CAST(FLOOR(EPOCH(CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP))) AS BIGINT) AS window_start,
             event_type,
             COUNT(*) AS n
      FROM events
      GROUP BY 1, 2
    ), ranked AS (
      SELECT window_start, event_type, n,
             ROW_NUMBER() OVER (PARTITION BY window_start
                                ORDER BY n DESC, event_type) AS rank
      FROM agg
    )
    SELECT window_start, event_type, n, rank FROM ranked WHERE rank <= 3
    """,
    tags=("streaming", "window", "topk"),
)
def stream_topk_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window top-k (trending items): the leaderboard every
    monitoring dashboard keeps — top-3 event types per tumbling hour,
    deterministic tie-break on the key. In batch this verifies the
    exact semantics; the streaming run computes the same windowed
    counts under a watermark and re-ranks per window in foreachBatch
    (rank is not an incremental operator — the canonical pattern is
    windowed agg upstream, small per-window top-k at the sink).

    Scale shape: partial counts map-side, ONE (window, type) shuffle,
    then a per-window row_number whose WindowGroupLimit pushdown caps
    state at k rows per window before the final exchange."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("w").orderBy(F.col("n").desc(), "event_type")
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n",
            F.col("rank").cast("long").alias("rank"),
        )
    )


@query(
    "stream_sliding_distinct_users",
    oracle="""
    SELECT ws AS window_start,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM (
      -- window starts align to the SLIDE grid (30 min), not the hour:
      -- every event belongs to exactly size/slide = 4 windows
      SELECT CAST(FLOOR(EPOCH(ts) / 1800.0) AS BIGINT) * 1800 - offs AS ws,
             user_id
      FROM events, UNNEST([0, 1800, 3600, 5400]) AS t(offs)
    )
    GROUP BY ws
    """,
    tags=("streaming", "window", "distinct"),
)
def stream_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window DISTINCT-user counts (2-hour windows sliding by
    30 minutes) — the streaming unique-visitors metric. Distinct
    aggregation inside overlapping windows is the state-heavy shape:
    per-window per-user state until the watermark closes the window
    (production would swap COUNT(DISTINCT) for the mergeable HLL/KMV
    sketch — agg_hll_mergeable / agg_kmv_distinct_union — once unique
    state outgrows memory; this exact query pins the semantics the
    sketch approximates).

    Batch twin of `groupBy(window(ts, '2 hours', '30 minutes'))`;
    identical code runs under readStream + withWatermark. The oracle
    replicates Spark's window assignment: each event lands in the 4
    overlapping windows whose start ≤ ts."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "30 minutes").alias("w"))
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "n_users",
            "n_events",
        )
    )


@query(
    "stream_lateness_audit",
    oracle="""
    WITH arr AS (
      SELECT event_type, event_id, ts,
             MAX(ts) OVER (ORDER BY event_id
                           ROWS UNBOUNDED PRECEDING) AS high_watermark
      FROM events
    ), scored AS (
      SELECT event_type,
             CASE WHEN EPOCH(high_watermark) - EPOCH(ts) > 1800.0 THEN 1 ELSE 0 END
               AS late_30m,
             CAST(FLOOR(GREATEST(EPOCH(high_watermark) - EPOCH(ts), 0.0)) AS BIGINT)
               AS lateness_s
      FROM arr
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(late_30m) AS BIGINT) AS n_late_30m,
           CAST(MAX(lateness_s) AS BIGINT) AS max_lateness_s
    FROM scored GROUP BY 1
    """,
    tags=("streaming", "watermark", "lateness"),
)
def stream_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-lateness audit: replay the stream in ARRIVAL order
    (event_id, the fixture's arrival proxy), track the running
    event-time high watermark, and measure how late each event arrives
    behind it — the report that tells you what
    `withWatermark('ts', X)` WOULD drop before you pick X (here: the
    would-drop count at a 30-minute delay and the worst observed
    lateness per source).

    Exactness: the running MAX is order-free given the total arrival
    order; lateness compares exact micro-resolution epoch doubles and
    floors to whole seconds.

    Scale shape: the running max runs through `with_global_cummax`
    (operators/ranking.py): range-partition on arrival order,
    partition-local running maxima in parallel windows, then fold in
    the broadcast carry (prefix max of prior partitions' maxima).
    MAX is associative and idempotent, so the decomposition is exact
    — bit-identical to the sequential watermark tracker the oracle
    expresses — and no task ever sorts more than one arrival range.
    (Spark's own streaming watermark is the same shape: per-partition
    maxima merged at the driver.)"""
    ev = load_table(spark, sf_dir, "events")
    arr = with_global_cummax(
        ev.select("event_type", "ts", "event_id"),
        [F.col("event_id")],
        "ts",
        out="high_watermark",
    ).select("event_type", "ts", "high_watermark")
    lateness = F.col("high_watermark").cast("double") - F.col("ts").cast("double")
    scored = arr.select(
        "event_type",
        F.when(lateness > 1800.0, 1).otherwise(0).alias("late_30m"),
        F.floor(F.greatest(lateness, F.lit(0.0))).cast("long").alias("lateness_s"),
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("late_30m").cast("long").alias("n_late_30m"),
        F.max("lateness_s").cast("long").alias("max_lateness_s"),
    )
