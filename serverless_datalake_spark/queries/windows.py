"""Window-function surface (SURVEY.md §2b): ranking, analytic
(lag/lead/first/last), running frames, top-k per group."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_table


@query(
    "window_ranking",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER w AS rn,
             RANK() OVER w AS rnk,
             DENSE_RANK() OVER w AS drnk,
             NTILE(4) OVER w AS quartile
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 3
    """,
    tags=("window", "ranking"),
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank/ntile over a deterministic order
    (price desc, orderkey tie-break). One shuffle on o_custkey serves
    all four functions."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
        )
        .where(F.col("rn") <= 3)
    )


@query(
    "window_analytic",
    oracle="""
    SELECT user_id,
           event_id,
           CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_epoch,
           CAST(FLOOR(EPOCH(CAST(LAG(ts) OVER w AS TIMESTAMP))) AS BIGINT) AS prev_ts_epoch,
           CAST(FLOOR(EPOCH(CAST(LEAD(ts) OVER w AS TIMESTAMP))) AS BIGINT) AS next_ts_epoch,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window", "analytic"),
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first/last with an explicit unbounded frame for
    last_value (default frames differ across engines — pinned here)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("ts_epoch"),
        F.lag("ts").over(w).cast("long").alias("prev_ts_epoch"),
        F.lead("ts").over(w).cast("long").alias("next_ts_epoch"),
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w_full).alias("last_type"),
    )


@query(
    "window_running",
    oracle="""
    SELECT user_id, event_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
    FROM events
    """,
    tags=("window", "frame"),
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + 3-row moving average (rowsBetween frames).
    ROWS frames (not RANGE) keep accumulation order deterministic via
    the event_id tie-break."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2
        ).alias("running_value"),
        F.round(F.avg("value").over(w.rowsBetween(-2, Window.currentRow)), 4).alias(
            "moving_avg3"
        ),
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 5
    """,
    tags=("window", "topk"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 customers by balance per market segment — the window
    row_number pattern; at scale Spark's WindowGroupLimit pushes the
    k-limit below the shuffle (partial top-k per mapper)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.select("c_mktsegment", "c_custkey", "c_acctbal", F.row_number().over(w).cast("long").alias("rn"))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )


@query(
    "window_distribution",
    oracle="""
    SELECT s_nationkey, s_suppkey, s_acctbal,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           NTH_VALUE(s_suppkey, 2) OVER (PARTITION BY s_nationkey
             ORDER BY s_acctbal DESC, s_suppkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_best
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
    tags=("window", "distribution"),
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution functions — percent_rank/cume_dist (rank scaled to
    the partition) and nth_value over the full-partition frame. Same
    single shuffle on the partition key serves all three."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return s.select(
        "s_nationkey",
        "s_suppkey",
        "s_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("s_suppkey", 2).over(w_full).alias("second_best"),
    )


@query(
    "window_ignore_nulls",
    oracle="""
    SELECT user_id, event_id,
           LAST_VALUE(click_value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_value,
           FIRST_VALUE(click_value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_click_value
    FROM (
      SELECT user_id, event_id, ts,
             CASE WHEN event_type = 'click' THEN value END AS click_value
      FROM events
    ) t
    """,
    tags=("window", "analytic", "ignore_nulls"),
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS analytics — last-observation-carried-forward
    gap fill (each event carries the user's most recent click value)
    plus first-non-null over the full partition. The standard
    time-series forward-fill, one shuffle on the partition key; also
    the primitive behind the as-of join composition
    (operators/asof.py)."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "click", F.col("value")).alias("click_value"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return clicks.select(
        "user_id",
        "event_id",
        F.last("click_value", ignorenulls=True).over(w_run).alias("last_click_value"),
        F.first("click_value", ignorenulls=True).over(w_full).alias("first_click_value"),
    )


@query(
    "window_gaps_islands",
    oracle="""
    WITH hrs AS (
      SELECT DISTINCT event_type,
             CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) // 3600 AS h
      FROM events
    ), grp AS (
      SELECT event_type, h,
             h - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS g
      FROM hrs
    ), islands AS (
      SELECT event_type,
             MIN(h) * 3600 AS island_start,
             MAX(h) * 3600 AS island_end,
             CAST(COUNT(*) AS BIGINT) AS n_hours
      FROM grp GROUP BY event_type, g
    )
    SELECT event_type, island_start, island_end, n_hours,
           CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY island_start) AS BIGINT) AS island_no
    FROM islands
    """,
    tags=("window", "gaps-islands"),
)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands — the canonical consecutive-runs idiom: hours
    with activity per event type are grouped into maximal consecutive
    runs via the row_number-difference trick (h − rn is constant
    within a run), yielding uptime/outage islands with start, end and
    length. The pattern every monitoring/SLA pipeline reimplements.

    Scale shape: the raw events collapse to the DISTINCT (type, hour)
    grid first (partial-agg shuffle), then one window + one aggregate
    on the grid — all grid-sized, never event-sized."""
    e = load_table(spark, sf_dir, "events")
    hrs = e.select(
        "event_type", F.expr("CAST(ts AS LONG) DIV 3600").alias("h")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    grp = hrs.withColumn("g", F.col("h") - F.row_number().over(w))
    islands = grp.groupBy("event_type", "g").agg(
        (F.min("h") * 3600).alias("island_start"),
        (F.max("h") * 3600).alias("island_end"),
        F.count(F.lit(1)).alias("n_hours"),
    )
    w2 = Window.partitionBy("event_type").orderBy("island_start")
    return islands.select(
        "event_type",
        "island_start",
        "island_end",
        "n_hours",
        F.row_number().over(w2).cast("long").alias("island_no"),
    )


@query(
    "cdc_latest_by_key",
    oracle="""
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           event_type, value
    FROM (
      SELECT user_id, event_id, ts, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("cdc", "dedup", "compaction"),
)
def cdc_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-wins compaction — the CDC/upsert read view: one
    surviving row per key, the one with the greatest (ts, event_id)
    (total tie-break so replays are deterministic). This is the
    OPTIMIZE/compaction semantics every mutable-table reader applies
    over an append-only change stream, and the batch twin of the
    txlog MERGE's latest-version visibility.

    Scale shape: one shuffle on the key; WindowGroupLimit pushdown
    keeps per-key state at a single row before the exchange (same
    mechanism as topk_per_group with k=1)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    # ts returns as a microsecond string: a raw TimestampType output
    # goes through the DRIVER OS timezone in PySpark collect()
    # (datetime.fromtimestamp) and shifts on a non-UTC host — the
    # round-7 full-registry hostile-timezone sim caught exactly this
    # query; date_format evaluates JVM-side in the pinned session tz.
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
            "event_type",
            "value",
        )
    )


@query(
    "window_pareto_share",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n,
             SUM(o_totalprice) OVER (PARTITION BY o_orderpriority) AS tot
      FROM orders
    )
    SELECT o_orderpriority,
           MIN(n) AS n_orders,
           CAST(CEIL(0.1 * MIN(n)) AS BIGINT) AS top_decile_n,
           ROUND(SUM(CASE WHEN rn <= CEIL(0.1 * n) THEN o_totalprice ELSE 0.0 END)
                 / MIN(tot), 4) AS top_decile_share
    FROM ranked GROUP BY o_orderpriority
    """,
    tags=("window", "pareto", "concentration"),
)
def window_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: what fraction of each priority class's
    revenue sits in its top decile of orders — the 80/20 check that
    complements agg_gini_concentration's single coefficient with the
    operational number ("how much rides on the whales").

    One shuffle on the group key: rank, group count, and group total
    all ride the same window partition; the decile share folds into
    the final aggregate. Division happens once per group (identical
    operand order both engines; the summed numerator is a plain
    conditional SUM of raw 2-decimal inputs — order-safe at this
    magnitude because the values are exact cents multiples)."""
    from pyspark.sql import functions as F  # noqa: F811

    o = load_table(spark, sf_dir, "orders")
    wp = Window.partitionBy("o_orderpriority")
    w = wp.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("o_totalprice").over(wp).alias("tot"),
    )
    return ranked.groupBy("o_orderpriority").agg(
        F.min("n").cast("long").alias("n_orders"),
        F.ceil(0.1 * F.min("n")).cast("long").alias("top_decile_n"),
        F.round(
            F.sum(
                F.when(
                    F.col("rn") <= F.ceil(0.1 * F.col("n")), F.col("o_totalprice")
                ).otherwise(F.lit(0.0))
            )
            / F.min("tot"),
            4,
        ).alias("top_decile_share"),
    )


@query(
    "window_longest_streak",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) // 86400 AS d
      FROM events
    ), grp AS (
      SELECT user_id, d,
             d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS g
      FROM days
    ), streaks AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len,
             MIN(d) * 86400 AS streak_start
      FROM grp GROUP BY user_id, g
    ), best AS (
      SELECT user_id, len, streak_start,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY len DESC, streak_start) AS rn
      FROM streaks
    )
    SELECT user_id, len AS longest_streak_days, streak_start
    FROM best WHERE rn = 1
    """,
    tags=("window", "streak", "engagement"),
)
def window_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (earliest on
    ties) — the engagement statistic behind habit metrics and streak
    badges; gaps-and-islands (window_gaps_islands) re-applied at the
    (user, day) grain with a per-user argmax on top.

    Scale shape: distinct (user, day) grid first — everything after is
    grid-sized; two user-partitioned windows and a per-streak
    aggregate, all on the same shuffle key (one exchange)."""
    e = load_table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.expr("CAST(ts AS LONG) DIV 86400").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn("g", F.col("d") - F.row_number().over(w))
    streaks = grp.groupBy("user_id", "g").agg(
        F.count(F.lit(1)).alias("len"),
        (F.min("d") * 86400).alias("streak_start"),
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.col("len").desc(), "streak_start"
    )
    return (
        streaks.withColumn("rn", F.row_number().over(wb))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("len").alias("longest_streak_days"),
            "streak_start",
        )
    )


@query(
    "session_duration_histogram",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid,
             ts
      FROM flagged
    ), durs AS (
      SELECT CAST(FLOOR(EPOCH(CAST(MAX(ts) AS TIMESTAMP))) AS BIGINT)
             - CAST(FLOOR(EPOCH(CAST(MIN(ts) AS TIMESTAMP))) AS BIGINT) AS dur_s
      FROM sess GROUP BY user_id, sid
    )
    SELECT LEAST(CAST(dur_s AS BIGINT) // 600, 6) AS bin_10min,
           CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM durs GROUP BY 1
    """,
    tags=("window", "session", "histogram"),
)
def session_duration_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-duration distribution: 30-minute-gap sessionization
    (the udtf_sessionize semantics, spelled with windows) rolled into
    a 10-minute-bin histogram with a 1-hour+ tail bucket — the
    engagement-depth curve product teams monitor next to DAU.

    Scale shape: one user-keyed shuffle carries both windows; the
    per-session MIN/MAX and the 7-bin count are grid-sized."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts").cast("long") - F.lag("ts").over(w).cast("long") > 1800),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    ws = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = flagged.select(
        "user_id", F.sum("new_s").over(ws).alias("sid"), "ts"
    )
    durs = sess.groupBy("user_id", "sid").agg(
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
            "dur_s"
        )
    )
    return durs.groupBy(
        F.least(F.floor(F.col("dur_s") / 600), F.lit(6)).cast("long").alias(
            "bin_10min"
        )
    ).agg(F.count(F.lit(1)).alias("n_sessions"))


@query(
    "window_running_distinct",
    oracle="""
    WITH flagged AS (
      SELECT event_type, ts, event_id, user_id,
             CASE WHEN ROW_NUMBER() OVER (PARTITION BY event_type, user_id
                                          ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT event_type, event_id, distinct_users_so_far
    FROM (
      -- window BEFORE the output filter (a WHERE in the same block
      -- would filter the rows feeding the running sum)
      SELECT event_type, event_id,
             CAST(SUM(first_seen) OVER (PARTITION BY event_type ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS distinct_users_so_far
      FROM flagged
    )
    WHERE event_id % 100 = 0
    """,
    tags=("window", "running-distinct"),
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count per group — COUNT(DISTINCT) OVER a
    running frame, which engines refuse (no mergeable running-distinct
    state), rewritten with the FIRST-OCCURRENCE FLAG trick: mark each
    (group, user)'s first row with one rank window, then a plain
    running SUM of flags IS the running distinct count. Two windows,
    both O(n log n) — versus the quadratic set-rebuild a naive
    implementation performs per row.

    Scale shape: both windows partition by event_type (co-partitioned
    — one shuffle feeds both after the per-(type,user) rank); the
    output filter keeps the comparison set bounded while the windows
    compute over the full stream, so the pinned values embed the
    complete history."""
    ev = load_table(spark, sf_dir, "events")
    fw = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    rw = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.when(F.row_number().over(fw) == 1, 1).otherwise(0).alias("first_seen"),
    )
    return flagged.select(
        "event_type",
        "event_id",
        F.sum("first_seen").over(rw).cast("long").alias("distinct_users_so_far"),
    ).where(F.col("event_id") % 100 == 0)


@query(
    "window_global_rank_distributed",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS spend_cents
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, spend_cents,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rank,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           CAST(SUM(spend_cents) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_cents
    FROM spend
    WINDOW w AS (ORDER BY spend_cents DESC, o_custkey)
    """,
    tags=("window", "ranking", "distributed", "scale"),
)
def window_global_rank_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL rank + quartile + running total WITHOUT a global window:
    the two-pass range-partitioned primitives (operators/ranking.py —
    repartitionByRange on the total order, per-range parallel windows,
    broadcast per-range offsets). The oracle is the single-window SQL
    the primitives must reproduce bit-for-bit; the Spark plan contains
    ONLY partitioned Window nodes (pinned in tests/test_ranking.py),
    so the same plan survives billions of entities where
    `Window.orderBy` with no partition would serialize on one task.
    Running total is exact integer cents, so the per-range offset
    decomposition is associative and exact."""
    from serverless_datalake_spark.operators.ranking import (
        with_global_order_analytics,
    )

    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("spend_cents")
    )
    order = [F.col("spend_cents").desc(), F.col("o_custkey")]
    # rank + quartile + running total share ONE order → one range pass,
    # one pass-1 stats job, one partitioned WindowExec (not three).
    out = with_global_order_analytics(
        spend,
        order,
        k=4,
        value_col="spend_cents",
        rank_out="rank",
        ntile_out="quartile",
        cum_out="cum_cents",
    )
    return out.select("o_custkey", "spend_cents", "rank", "quartile", "cum_cents")
