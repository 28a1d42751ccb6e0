"""Funnel / sessionized product-analytics shapes over `events` —
the conversion-ordering queries an event lake exists to answer
(reference E1's data put to its natural analytical use)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


@query(
    "events_attribution_linear",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, ts,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL THEN 1
                  WHEN EPOCH(ts) - EPOCH(LAG(ts) OVER (PARTITION BY user_id
                                                       ORDER BY ts, event_id))
                       > 1800.0 THEN 1
                  ELSE 0 END AS new_s
      FROM events
    ), sess AS (
      SELECT user_id, event_id, event_type, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_no
      FROM ordered
    ), purchases AS (
      SELECT user_id, session_no, event_id AS purchase_id, ts AS pts
      FROM sess WHERE event_type = 'purchase'
    ), touches AS (
      SELECT s.user_id, p.purchase_id, s.event_id AS touch_id, s.event_type
      FROM sess s
      JOIN purchases p
        ON p.user_id = s.user_id AND p.session_no = s.session_no
       AND (s.ts < p.pts OR (s.ts = p.pts AND s.event_id < p.purchase_id))
      WHERE s.event_type IN ('click', 'view', 'signup')
    ), weighted AS (
      SELECT event_type, purchase_id,
             CAST(ROUND(1000000.0 / (COUNT(*) OVER (PARTITION BY purchase_id)), 0)
                  AS BIGINT) AS ppm
      FROM touches
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           ROUND(CAST(SUM(ppm) AS DOUBLE) / 1000000.0, 6) AS credit
    FROM weighted GROUP BY 1
    """,
    tags=("funnel", "attribution"),
)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-weight) conversion attribution: every purchase
    distributes one unit of credit equally across the touchpoint
    events (click/view/signup) that preceded it IN ITS SESSION —
    the position-agnostic member of the attribution family (first-
    touch/last-touch are argmin/argmax specializations of the same
    touch relation).

    Exactness: per-touch weight 1/n is materialized as integer
    PARTS-PER-MILLION (ROUND(1e6/n)) so the cross-purchase credit sum
    is an exact integer under any partitioning — summing raw 1/n
    doubles would be shuffle-order-dependent (a purchase's credits can
    be off by ≤1 ppm from exactly 1.0, the documented rounding).

    Scale shape: sessionization is one user-partitioned window; the
    touch relation joins purchases to their OWN session's rows
    (co-partitioned on user_id — one shuffle); per-purchase touch
    counts are a window over the touch relation. Event-time tie-break
    by event_id keeps the precedence total."""
    ev = load_table(spark, sf_dir, "events")
    uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag(F.col("ts")).over(uw)
    sess = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.sum(
            F.when(lag_ts.isNull(), 1)
            .when(F.col("ts").cast("double") - lag_ts.cast("double") > 1800.0, 1)
            .otherwise(0)
        )
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("session_no"),
    )
    purchases = sess.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("session_no").alias("ps"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    touches = (
        sess.where(F.col("event_type").isin("click", "view", "signup"))
        .join(
            purchases,
            (F.col("pu") == F.col("user_id"))
            & (F.col("ps") == F.col("session_no"))
            & (
                (F.col("ts") < F.col("pts"))
                | ((F.col("ts") == F.col("pts")) & (F.col("event_id") < F.col("purchase_id")))
            ),
        )
        .select("event_type", "purchase_id")
    )
    pw = Window.partitionBy("purchase_id")
    weighted = touches.select(
        "event_type",
        F.round(F.lit(1000000.0) / F.count(F.lit(1)).over(pw), 0)
        .cast("long")
        .alias("ppm"),
    )
    return weighted.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.round(F.sum("ppm").cast("double") / F.lit(1000000.0), 6).alias("credit"),
    )


@query(
    "events_bot_gap_regularity",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             CAST(ROUND((EPOCH(ts) - EPOCH(LAG(ts) OVER (PARTITION BY user_id
                                                          ORDER BY ts, event_id)))
                        * 1000000.0, 0) AS BIGINT) AS gap_us
      FROM events
    ), per_user AS (
      SELECT user_id,
             CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
             CAST(SUM(gap_us) AS BIGINT) AS s,
             SUM(CAST(gap_us AS HUGEINT) * CAST(gap_us AS HUGEINT)) AS ss
      FROM gaps WHERE gap_us IS NOT NULL
      GROUP BY 1 HAVING COUNT(gap_us) >= 10
    )
    SELECT user_id, n_gaps,
           ROUND(CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE) / 1000000.0, 4)
             AS mean_gap_s,
           ROUND(SQRT(GREATEST((CAST(ss AS DOUBLE)
                                - (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                                  * CAST(s AS DOUBLE)) / CAST(n_gaps AS DOUBLE), 0.0))
                 / (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)), 4) AS gap_cv,
           CAST(CASE WHEN SQRT(GREATEST((CAST(ss AS DOUBLE)
                                - (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                                  * CAST(s AS DOUBLE)) / CAST(n_gaps AS DOUBLE), 0.0))
                          / (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)) < 0.3
                THEN 1 ELSE 0 END AS BIGINT) AS too_regular
    FROM per_user
    """,
    tags=("funnel", "abuse", "bot-detection"),
)
def events_bot_gap_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/automation screening by inter-event-time REGULARITY: human
    activity has bursty gaps (coefficient of variation ≈ 1 for
    Poisson-ish arrivals, higher for sessions); schedulers and replay
    scripts produce near-constant gaps (CV → 0). Flags users whose
    gap CV < 0.3 with ≥ 10 observed gaps — the timing-regularity rule
    every abuse stack runs before content-based signals.

    Exactness: gaps are exact integer MICROSECONDS; Σ and Σ² are
    exact integer sums (Σ² needs >64 bits at micro resolution —
    HUGEINT on the oracle side, DECIMAL(38,0) in Spark — both exact,
    both cast to double only for the final mean/CV expression, which
    is spelled identically); GREATEST(·,0) guards the
    catastrophic-cancellation-free but still ±0-prone variance.

    Scale shape: one user-partitioned lag window over the event scan,
    then a per-user aggregate — the sessionization shuffle reused;
    HAVING prunes low-activity users inside the aggregate."""
    ev = load_table(spark, sf_dir, "events")
    uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.round(
        (F.col("ts").cast("double") - F.lag(F.col("ts")).over(uw).cast("double"))
        * 1000000.0,
        0,
    ).cast("long")
    gaps = ev.select("user_id", gap_us.alias("gap_us")).where(
        F.col("gap_us").isNotNull()
    )
    per_user = (
        gaps.groupBy("user_id")
        .agg(
            F.count("gap_us").cast("long").alias("n_gaps"),
            F.sum("gap_us").cast("long").alias("s"),
            F.sum(F.col("gap_us").cast("decimal(38,0)") * F.col("gap_us").cast("decimal(38,0)"))
            .alias("ss"),
        )
        .where(F.col("n_gaps") >= 10)
    )
    nd = F.col("n_gaps").cast("double")
    sd = F.col("s").cast("double")
    mean = sd / nd
    var = (F.col("ss").cast("double") - mean * sd) / nd
    cv = F.sqrt(F.greatest(var, F.lit(0.0))) / mean
    return per_user.select(
        "user_id",
        "n_gaps",
        F.round(mean / F.lit(1000000.0), 4).alias("mean_gap_s"),
        F.round(cv, 4).alias("gap_cv"),
        F.when(cv < 0.3, 1).otherwise(0).cast("long").alias("too_regular"),
    )


@query(
    "retention_ltv_cumulative",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             MIN(CAST(date_trunc('month', o_orderdate) AS DATE)) AS cohort
      FROM orders GROUP BY 1
    ), labeled AS (
      SELECT f.cohort,
             CAST((EXTRACT(YEAR FROM o.o_orderdate) - EXTRACT(YEAR FROM f.cohort)) * 12
                  + (EXTRACT(MONTH FROM o.o_orderdate) - EXTRACT(MONTH FROM f.cohort))
                  AS BIGINT) AS age_months,
             CAST(ROUND(o.o_totalprice * 100.0, 0) AS BIGINT) AS cents
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    ), grid AS (
      SELECT cohort, age_months,
             CAST(SUM(cents) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM labeled GROUP BY 1, 2
    )
    SELECT cohort, age_months, n_orders,
           CAST(SUM(cents) OVER (PARTITION BY cohort ORDER BY age_months
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_cents
    FROM grid
    """,
    tags=("funnel", "cohort", "ltv"),
)
def retention_ltv_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: customers grouped by first-order month, and
    each cohort's CUMULATIVE revenue by months-since-acquisition — the
    curve whose asymptote is customer lifetime value and whose slope
    decay is churn (retention_cohorts counts the users; this follows
    the money).

    Exactness: cohort month and integer month ages are calendar
    arithmetic (exact); revenue is integer cents with a running
    integer window sum over the (cohort, age) grid.

    Scale shape: the firsts relation is customer-grain (one
    aggregate); the label join is key-partitioned; the cumulative
    window runs over the tiny (cohort × age) grid, never raw orders."""
    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", F.col("o_orderdate")).cast("date")).alias("cohort")
    )
    labeled = o.join(firsts, "o_custkey").select(
        "cohort",
        (
            (F.year("o_orderdate") - F.year("cohort")) * 12
            + (F.month("o_orderdate") - F.month("cohort"))
        )
        .cast("long")
        .alias("age_months"),
        F.round(F.col("o_totalprice") * 100.0, 0).cast("long").alias("cents"),
    )
    grid = labeled.groupBy("cohort", "age_months").agg(
        F.sum("cents").cast("long").alias("cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.select(
        "cohort",
        "age_months",
        "n_orders",
        F.sum("cents").over(w).cast("long").alias("cum_cents"),
    )


@query(
    "funnel_window_bounded",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
        AND e.ts <= s1.t1 + INTERVAL 1 HOUR
      GROUP BY 1
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e
      JOIN s1 ON s1.user_id = e.user_id
      JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        AND e.ts <= s1.t1 + INTERVAL 1 HOUR
      GROUP BY 1
    ), levels AS (
      SELECT s1.user_id,
             CASE WHEN s3.user_id IS NOT NULL THEN 3
                  WHEN s2.user_id IS NOT NULL THEN 2
                  ELSE 1 END AS level
      FROM s1
      LEFT JOIN s2 ON s2.user_id = s1.user_id
      LEFT JOIN s3 ON s3.user_id = s1.user_id
    )
    SELECT CAST(level AS BIGINT) AS level,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM levels GROUP BY 1
    """,
    tags=("funnel", "window-bounded"),
)
def funnel_window_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-BOUNDED ordered funnel (the windowFunnel shape): how far
    does each user get through signup → click → purchase WITHIN ONE
    HOUR of the first signup? Unbounded funnels
    (funnel_signup_click_purchase) overstate conversion by counting
    journeys that took weeks; the window bound is what makes the
    metric a campaign/session KPI. Reported as users per max level.

    Exactness: stage times are exact MIN timestamps; the window bound
    compares timestamps directly (same interval arithmetic both
    sides); levels are integers.

    Scale shape: each stage is one user-keyed aggregate (events scan
    reused across stages by Catalyst); the level classification is
    two broadcast-sized left joins on the shrinking stage relations."""
    e = load_table(spark, sf_dir, "events")
    s1 = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.where(F.col("event_type") == "purchase")
        .join(s1, "user_id")
        .join(s2, "user_id")
        .where(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    levels = (
        s1.join(s2.select(F.col("user_id"), F.lit(1).alias("has2")), "user_id", "left")
        .join(s3.select(F.col("user_id"), F.lit(1).alias("has3")), "user_id", "left")
        .select(
            F.when(F.col("has3").isNotNull(), 3)
            .when(F.col("has2").isNotNull(), 2)
            .otherwise(1)
            .cast("long")
            .alias("level")
        )
    )
    return levels.groupBy("level").agg(F.count(F.lit(1)).alias("n_users"))


@query(
    "events_attribution_position",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, ts,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL THEN 1
                  WHEN EPOCH(ts) - EPOCH(LAG(ts) OVER (PARTITION BY user_id
                                                       ORDER BY ts, event_id))
                       > 1800.0 THEN 1
                  ELSE 0 END AS new_s
      FROM events
    ), sess AS (
      SELECT user_id, event_id, event_type, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_no
      FROM ordered
    ), purchases AS (
      SELECT user_id, session_no, event_id AS purchase_id, ts AS pts
      FROM sess WHERE event_type = 'purchase'
    ), touches AS (
      SELECT s.user_id, p.purchase_id, s.event_id AS touch_id, s.event_type,
             s.ts AS tts
      FROM sess s
      JOIN purchases p
        ON p.user_id = s.user_id AND p.session_no = s.session_no
       AND (s.ts < p.pts OR (s.ts = p.pts AND s.event_id < p.purchase_id))
      WHERE s.event_type IN ('click', 'view', 'signup')
    ), ranked AS (
      SELECT event_type, purchase_id,
             ROW_NUMBER() OVER (PARTITION BY purchase_id
                                ORDER BY tts, touch_id) AS pos,
             COUNT(*) OVER (PARTITION BY purchase_id) AS n
      FROM touches
    ), weighted AS (
      SELECT event_type,
             CASE WHEN n = 1 THEN 1000000
                  WHEN n = 2 THEN 500000
                  WHEN pos = 1 OR pos = n THEN 400000
                  ELSE CAST(ROUND(200000.0 / (CAST(n AS DOUBLE) - 2.0), 0)
                            AS BIGINT)
             END AS ppm
      FROM ranked
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           ROUND(CAST(SUM(ppm) AS DOUBLE) / 1000000.0, 6) AS credit
    FROM weighted GROUP BY 1
    """,
    tags=("funnel", "attribution"),
)
def events_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based 40/20/40) conversion attribution: the
    first and last touch before each purchase get 40% of the credit
    each, the interior touches split the remaining 20% equally —
    the standard middle ground between first-touch and linear
    (n=1 takes all credit, n=2 splits 50/50).

    Exactness: as in events_attribution_linear, per-touch weights are
    integer PARTS-PER-MILLION so the cross-purchase credit sum is an
    exact integer under any partitioning (per-purchase total can be
    ≤ 1 ppm off 1.0 from the interior-share rounding, documented).

    Scale shape: identical to the linear variant — one user-keyed
    sessionization window, one co-partitioned purchase/touch join —
    plus a purchase-keyed ROW_NUMBER window (purchase cardinality,
    narrow rows). Position rank ties break on event_id, keeping the
    order total and the credit assignment deterministic."""
    ev = load_table(spark, sf_dir, "events")
    uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag(F.col("ts")).over(uw)
    sess = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.sum(
            F.when(lag_ts.isNull(), 1)
            .when(F.col("ts").cast("double") - lag_ts.cast("double") > 1800.0, 1)
            .otherwise(0)
        )
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("session_no"),
    )
    purchases = sess.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("session_no").alias("ps"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    touches = (
        sess.where(F.col("event_type").isin("click", "view", "signup"))
        .join(
            purchases,
            (F.col("pu") == F.col("user_id"))
            & (F.col("ps") == F.col("session_no"))
            & (
                (F.col("ts") < F.col("pts"))
                | (
                    (F.col("ts") == F.col("pts"))
                    & (F.col("event_id") < F.col("purchase_id"))
                )
            ),
        )
        .select("event_type", "purchase_id", F.col("ts").alias("tts"), F.col("event_id").alias("touch_id"))
    )
    pw = Window.partitionBy("purchase_id")
    ranked = touches.select(
        "event_type",
        F.row_number()
        .over(Window.partitionBy("purchase_id").orderBy("tts", "touch_id"))
        .alias("pos"),
        F.count(F.lit(1)).over(pw).alias("n"),
    )
    ppm = (
        F.when(F.col("n") == 1, F.lit(1000000))
        .when(F.col("n") == 2, F.lit(500000))
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("n")), F.lit(400000))
        .otherwise(
            F.round(F.lit(200000.0) / (F.col("n").cast("double") - F.lit(2.0)), 0).cast(
                "long"
            )
        )
    )
    weighted = ranked.select("event_type", ppm.alias("ppm"))
    return weighted.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.round(F.sum("ppm").cast("double") / F.lit(1000000.0), 6).alias("credit"),
    )


@query(
    "events_next_event_examples",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type, 3) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS l3,
             LAG(event_type, 2) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS l2,
             LAG(event_type, 1) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS l1
      FROM events
    ), examples AS (
      SELECT l3 || '>' || l2 || '>' || l1 AS context, event_type AS label
      FROM ordered WHERE l3 IS NOT NULL
    ), counted AS (
      SELECT context, label, CAST(COUNT(*) AS BIGINT) AS n_examples
      FROM examples GROUP BY 1, 2
    )
    SELECT context, label, n_examples,
           ROUND(CAST(n_examples AS DOUBLE)
                 / CAST(SUM(n_examples) OVER (PARTITION BY context)
                        AS DOUBLE), 6) AS label_share
    FROM counted
    """,
    tags=("funnel", "datapipe", "sequence-model"),
)
def events_next_event_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-example construction for next-event prediction: per
    user, each event becomes one (context, label) pair where the
    context is the ordered 3-gram of PRECEDING event types — the
    sliding-window dataset build behind sequence/behavioral models
    (same shape an LLM data pipeline uses to cut next-token windows,
    at event granularity). Emitted grouped with per-context label
    shares, i.e. the empirical transition distribution the model must
    beat.

    Scale shape: three LAGs over ONE user-keyed window (single
    shuffle, streaming frame), then a partial-agg shuffle onto
    (context, label) rows; the share window runs per context over
    label-cardinality rows. Tie-break on event_id keeps windows
    total-ordered and the dataset bit-reproducible."""
    ev = load_table(spark, sf_dir, "events")
    uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type",
        F.lag("event_type", 3).over(uw).alias("l3"),
        F.lag("event_type", 2).over(uw).alias("l2"),
        F.lag("event_type", 1).over(uw).alias("l1"),
    )
    ex = o.where(F.col("l3").isNotNull()).select(
        F.concat_ws(">", "l3", "l2", "l1").alias("context"),
        F.col("event_type").alias("label"),
    )
    counted = ex.groupBy("context", "label").agg(
        F.count(F.lit(1)).alias("n_examples")
    )
    cw = Window.partitionBy("context")
    return counted.select(
        "context",
        "label",
        "n_examples",
        F.round(
            F.col("n_examples").cast("double")
            / F.sum("n_examples").over(cw).cast("double"),
            6,
        ).alias("label_share"),
    )
