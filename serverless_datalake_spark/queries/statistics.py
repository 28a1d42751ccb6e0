"""Distributed statistics with exact sufficient statistics.

Unlike ts_cross_correlation (ordered folds over a collected grid —
exact but sort-bound), these aggregates are the 100 TB shape: the
sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy) are sums of INTEGER
units accumulated in DECIMAL(38,0) — exact, ORDER-INDEPENDENT, and
map-side combinable, so the whole pass is one partial-agg shuffle with
no collect_list and no sort. DuckDB's SUM(BIGINT) → HUGEINT matches
the decimal sums bit-for-bit; both engines convert the exact integers
to double once, then evaluate the identical closed-form expression.

Integer units: l_quantity is integer-valued (1..50), l_extendedprice
has 2 decimals (→ cents). At sf0.1 Σ(cents·qty) ≈ 3e14 ≪ 2^53, so
even the final double conversions are exact; DECIMAL(38,0) keeps the
accumulators exact to ~1e38 — far past 100 TB row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window

from serverless_datalake_spark.operators import pin as _pin
from pyspark.sql import functions as F

from serverless_datalake_spark.queries import query
from serverless_datalake_spark.queries.evaluation import SCORED_GATE_SQL
from serverless_datalake_spark.tables import load_table

# Exact sufficient statistics per group, shared by corr + OLS.
_SUFF_SQL = """
    WITH units AS (
      SELECT l_returnflag AS grp,
             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS x,
             CAST(l_quantity AS BIGINT) AS y
      FROM lineitem
    ), suff AS (
      SELECT grp,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(y * y) AS DOUBLE) AS syy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy
      FROM units GROUP BY grp
    )
"""


def _suff(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    units = li.select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("x"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    return units.groupBy("grp").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast(d38)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(d38)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(d38)).cast("double").alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(d38)).cast("double").alias("sxy"),
    )


@query(
    "agg_correlation_pinned",
    oracle=_SUFF_SQL
    + """
    SELECT grp, CAST(n AS BIGINT) AS n_rows,
           ROUND((n * sxy - sx * sy)
                 / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr
    FROM suff
    """,
    tags=("statistics", "aggregate", "correlation"),
)
def agg_correlation_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Pearson correlation between price and quantity from
    exact integer-unit sufficient statistics — the distributed-exact
    twin of Spark's corr() (whose double partial sums are
    order-DEPENDENT and so can't be oracle-pinned). One partial-agg
    shuffle; no sort, no collect; identical closed form both engines."""
    s = _suff(spark, sf_dir)
    corr = (s.n * s.sxy - s.sx * s.sy) / F.sqrt(
        (s.n * s.sxx - s.sx * s.sx) * (s.n * s.syy - s.sy * s.sy)
    )
    return s.select(
        "grp",
        F.col("n").cast("long").alias("n_rows"),
        F.round(corr, 6).alias("corr"),
    )


@query(
    "agg_linear_regression",
    oracle=_SUFF_SQL
    + """
    SELECT grp, CAST(n AS BIGINT) AS n_rows,
           ROUND((n * sxy - sy * sx) / (n * syy - sy * sy), 6) AS slope_cents_per_unit,
           ROUND((sx - ((n * sxy - sy * sx) / (n * syy - sy * sy)) * sy) / n, 6)
             AS intercept_cents,
           ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM suff
    """,
    tags=("statistics", "aggregate", "regression"),
)
def agg_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS of price (cents) on quantity: slope, intercept,
    R² — regr_slope/regr_intercept/regr_r2 semantics rebuilt on exact
    order-independent sums (Spark has no regr_* with pinnable partial
    sums). Same single-shuffle sufficient-statistics scan as
    agg_correlation_pinned; slope/intercept/R² are projections."""
    s = _suff(spark, sf_dir)
    slope = (s.n * s.sxy - s.sy * s.sx) / (s.n * s.syy - s.sy * s.sy)
    intercept = (s.sx - slope * s.sy) / s.n
    r2 = ((s.n * s.sxy - s.sx * s.sy) * (s.n * s.sxy - s.sx * s.sy)) / (
        (s.n * s.sxx - s.sx * s.sx) * (s.n * s.syy - s.sy * s.sy)
    )
    return s.select(
        "grp",
        F.col("n").cast("long").alias("n_rows"),
        F.round(slope, 6).alias("slope_cents_per_unit"),
        F.round(intercept, 6).alias("intercept_cents"),
        F.round(r2, 6).alias("r2"),
    )


@query(
    "ts_theil_sen",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) // 86400 AS d,
             ROUND(SUM(value), 2) AS v
      FROM events GROUP BY 1, 2
    ), slopes AS (
      SELECT a.event_type,
             (b.v - a.v) / CAST(b.d - a.d AS DOUBLE) AS s
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.d < b.d
    ), ranked AS (
      SELECT event_type, s,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY s) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS m
      FROM slopes
    )
    SELECT event_type, MIN(m) AS n_pairs,
           ROUND(AVG(s), 6) AS trend_per_day
    FROM ranked
    WHERE rn = (m + 1) // 2 OR rn = (m + 2) // 2
    GROUP BY event_type
    """,
    tags=("timeseries", "statistics", "robust"),
)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend: the MEDIAN of all pairwise slopes of
    each type's daily-total series — outlier-resistant where OLS
    (agg_linear_regression) is not (29.3% breakdown point).

    Scale shape: the O(g²) pair join runs on the AGGREGATED daily
    grid (≤ a few hundred points per type — the standard Theil–Sen
    windowing), never raw events; the median uses the exact
    order-statistic pattern (row_number vs count, mean of the middle
    two) shared with agg_percentile_exact. Raw events see only one
    partial-agg shuffle."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.expr("CAST(ts AS LONG) DIV 86400").alias("d")
    ).agg(F.round(F.sum("value"), 2).alias("v"))
    a = daily.select("event_type", F.col("d").alias("da"), F.col("v").alias("va"))
    b = daily.select(
        F.col("event_type").alias("et_b"), F.col("d").alias("db"), F.col("v").alias("vb")
    )
    slopes = (
        a.join(b, (a.event_type == b.et_b) & (a.da < b.db))
        .select(
            "event_type",
            ((F.col("vb") - F.col("va")) / (F.col("db") - F.col("da")).cast("double")).alias("s"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("s")
    ranked = slopes.select(
        "event_type",
        "s",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("m"),
    )
    mid = ranked.where(
        (F.col("rn") == F.floor((F.col("m") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("m") + 2) / 2))
    )
    return mid.groupBy("event_type").agg(
        F.min("m").cast("long").alias("n_pairs"),
        F.round(F.avg("s"), 6).alias("trend_per_day"),
    )


@query(
    "stats_ks_two_sample",
    oracle="""
    WITH pts AS (
      SELECT l_extendedprice AS v,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g1,
             CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS g2
      FROM lineitem WHERE l_returnflag IN ('R', 'A')
    ), per_v AS (
      SELECT v, CAST(SUM(g1) AS BIGINT) AS c1, CAST(SUM(g2) AS BIGINT) AS c2
      FROM pts GROUP BY v
    ), tot AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      FROM per_v
    ), ecdf AS (
      SELECT v,
             SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS a1,
             SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS a2
      FROM per_v
    ), diffs AS (
      SELECT ABS(CAST(a1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                 - CAST(a2 AS DOUBLE) / CAST(n2 AS DOUBLE)) AS d
      FROM ecdf CROSS JOIN tot
    )
    SELECT tot.n1, tot.n2,
           ROUND(MAX(d), 6) AS d_stat,
           ROUND(1.358 * SQRT((CAST(tot.n1 AS DOUBLE) + CAST(tot.n2 AS DOUBLE))
                 / (CAST(tot.n1 AS DOUBLE) * CAST(tot.n2 AS DOUBLE))), 6) AS d_crit_05,
           CAST(CASE WHEN MAX(d) > 1.358 * SQRT((CAST(tot.n1 AS DOUBLE)
                          + CAST(tot.n2 AS DOUBLE))
                          / (CAST(tot.n1 AS DOUBLE) * CAST(tot.n2 AS DOUBLE)))
                THEN 1 ELSE 0 END AS BIGINT) AS reject_05
    FROM diffs CROSS JOIN tot
    GROUP BY tot.n1, tot.n2
    """,
    tags=("stats", "ks-test"),
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test between the returned ('R')
    and acknowledged ('A') price distributions: D = max |ECDF₁ − ECDF₂|
    evaluated at every distinct value, with the large-sample 5%
    critical value 1.358·√((n₁+n₂)/(n₁n₂)) — the standard
    distribution-drift gate a data-quality monitor runs between a
    reference window and today's batch.

    Exactness: ECDF numerators are integer cumulative counts over the
    per-VALUE aggregated relation (ties collapse before the window, so
    both ECDFs step at the value's last occurrence — the correct KS
    evaluation points); each |F₁−F₂| is two exact-integer divisions;
    MAX over identical double sets is order-free.

    Scale shape: one hash aggregate to distinct-value grain (map-side
    partials absorb duplicate prices), then a window over the
    value-grain relation — the same aggregate-before-window discipline
    as ts_resample. At 100 TB the distinct-value relation is what you
    bin first (equi-width pre-binning bounds it) — the documented
    production twin of every exact-order-statistic query here."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("R", "A")
    )
    per_v = li.groupBy(F.col("l_extendedprice").alias("v")).agg(
        F.sum((F.col("l_returnflag") == "R").cast("long")).cast("long").alias("c1"),
        F.sum((F.col("l_returnflag") == "A").cast("long")).cast("long").alias("c2"),
    )
    tot = per_v.agg(
        F.sum("c1").cast("long").alias("n1"), F.sum("c2").cast("long").alias("n2")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ecdf = per_v.select(
        "v", F.sum("c1").over(w).alias("a1"), F.sum("c2").over(w).alias("a2")
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    diffs = ecdf.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        F.abs(
            F.col("a1").cast("double") / n1d - F.col("a2").cast("double") / n2d
        ).alias("d"),
    )
    crit = F.round(F.lit(1.358) * F.sqrt((n1d + n2d) / (n1d * n2d)), 6)
    return diffs.groupBy("n1", "n2").agg(
        F.round(F.max("d"), 6).alias("d_stat"),
        crit.alias("d_crit_05"),
        F.when(
            F.max("d") > F.lit(1.358) * F.sqrt((n1d + n2d) / (n1d * n2d)), 1
        )
        .otherwise(0)
        .cast("long")
        .alias("reject_05"),
    )


@query(
    "stats_chi_square",
    oracle="""
    WITH obs AS (
      SELECT o_orderstatus AS s, o_orderpriority AS p,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM orders GROUP BY 1, 2
    ), rt AS (
      SELECT s, CAST(SUM(o) AS BIGINT) AS rs FROM obs GROUP BY 1
    ), ct AS (
      SELECT p, CAST(SUM(o) AS BIGINT) AS cs FROM obs GROUP BY 1
    ), n AS (
      SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs
    ), cells AS (
      SELECT r.s, c.p,
             COALESCE(obs.o, 0) AS o,
             CAST(r.rs AS DOUBLE) * CAST(c.cs AS DOUBLE) / CAST(n.n AS DOUBLE) AS e
      FROM rt r CROSS JOIN ct c CROSS JOIN n
      LEFT JOIN obs ON obs.s = r.s AND obs.p = c.p
    ), contrib AS (
      SELECT s, p,
             ROUND((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e, 8) AS x2
      FROM cells
    ), dims AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rt) AS n_rows,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM ct) AS n_cols
    )
    SELECT ROUND(list_aggregate(list(x2 ORDER BY s, p), 'sum'), 6) AS chi2,
           (dims.n_rows - 1) * (dims.n_cols - 1) AS dof,
           dims.n_rows, dims.n_cols
    FROM contrib CROSS JOIN dims
    GROUP BY dims.n_rows, dims.n_cols
    """,
    tags=("stats", "chi-square"),
)
def stats_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test over the order-status ×
    order-priority contingency table (statistic + degrees of freedom;
    the categorical-drift / feature-dependence screen). Expected
    counts include structurally-zero cells (row×col grid LEFT JOIN
    observed, COALESCE 0) — dropping them understates the statistic.

    Exactness: observed/marginal counts are integers; each cell's
    (o−e)²/e is a fixed double expression rounded at 8; the cell sum
    is an ORDERED fold over the (status, priority)-sorted cell list
    (the text_kl_divergence discipline), so both engines add identical
    doubles in identical order.

    Scale shape: everything after the first hash aggregate is
    contingency-grain (|statuses|×|priorities| rows); the grid build
    is a broadcast cross join of two marginal relations. Fact rows are
    touched exactly once."""
    o = load_table(spark, sf_dir, "orders")
    obs = o.groupBy(
        F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p")
    ).agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("s").agg(F.sum("o").cast("long").alias("rs"))
    ct = obs.groupBy("p").agg(F.sum("o").cast("long").alias("cs"))
    n = obs.agg(F.sum("o").cast("long").alias("n"))
    grid = rt.crossJoin(F.broadcast(ct)).crossJoin(F.broadcast(n))
    cells = grid.join(obs, ["s", "p"], "left").select(
        "s",
        "p",
        F.coalesce(F.col("o"), F.lit(0)).alias("o"),
        (
            F.col("rs").cast("double")
            * F.col("cs").cast("double")
            / F.col("n").cast("double")
        ).alias("e"),
    )
    od = F.col("o").cast("double")
    contrib = cells.select(
        "s", "p", F.round((od - F.col("e")) * (od - F.col("e")) / F.col("e"), 8).alias("x2")
    )
    dims = rt.agg(F.count(F.lit(1)).cast("long").alias("n_rows")).crossJoin(
        ct.agg(F.count(F.lit(1)).cast("long").alias("n_cols"))
    )
    arr = F.array_sort(F.collect_list(F.struct("s", "p", "x2")))
    folded = F.aggregate(
        F.transform(arr, lambda x: x["x2"]), F.lit(0.0), lambda a, x: a + x
    )
    return (
        contrib.agg(F.round(folded, 6).alias("chi2"))
        .crossJoin(F.broadcast(dims))
        .select(
            "chi2",
            ((F.col("n_rows") - 1) * (F.col("n_cols") - 1)).cast("long").alias("dof"),
            "n_rows",
            "n_cols",
        )
    )


@query(
    "events_diff_in_diff",
    oracle="""
    WITH labeled AS (
      SELECT user_id % 2 AS cohort,
             CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END
               AS post,
             CAST(ROUND(value * 100.0, 0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ), cells AS (
      SELECT cohort, post,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS cents
      FROM labeled GROUP BY 1, 2
    ), means AS (
      SELECT MAX(CASE WHEN cohort = 1 AND post = 1
                      THEN CAST(cents AS DOUBLE) / CAST(n AS DOUBLE) END) AS t1,
             MAX(CASE WHEN cohort = 1 AND post = 0
                      THEN CAST(cents AS DOUBLE) / CAST(n AS DOUBLE) END) AS t0,
             MAX(CASE WHEN cohort = 0 AND post = 1
                      THEN CAST(cents AS DOUBLE) / CAST(n AS DOUBLE) END) AS c1,
             MAX(CASE WHEN cohort = 0 AND post = 0
                      THEN CAST(cents AS DOUBLE) / CAST(n AS DOUBLE) END) AS c0,
             CAST(SUM(n) AS BIGINT) AS n_total
      FROM cells
    )
    SELECT n_total,
           ROUND(t1 / 100.0, 4) AS treat_post,
           ROUND(t0 / 100.0, 4) AS treat_pre,
           ROUND(c1 / 100.0, 4) AS ctrl_post,
           ROUND(c0 / 100.0, 4) AS ctrl_pre,
           ROUND((t1 - t0 - (c1 - c0)) / 100.0, 4) AS did_estimate
    FROM means
    """,
    tags=("stats", "causal", "diff-in-diff"),
)
def events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences over a cutover: mean purchase value
    per (cohort, pre/post) cell and the DiD estimate
    (Δtreatment − Δcontrol) — the workhorse causal estimator for
    staged rollouts when randomization isn't available (parallel-
    trends assumption documented, not tested here). Cohort = the
    deterministic user parity; cutover = mid-month.

    Exactness: cell sums are integer cents; the four means and the
    DiD arithmetic are fixed double expressions over exact inputs,
    identical both sides.

    Scale shape: ONE aggregate to the 4-cell grid; everything after
    is constant-size. The estimator at 100 TB costs exactly one fact
    pass — which is the argument for running it continuously."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    cells = ev.select(
        (F.col("user_id") % 2).alias("cohort"),
        F.when(F.col("ts") >= F.lit("2024-01-16 00:00:00").cast("timestamp"), 1)
        .otherwise(0)
        .alias("post"),
        F.round(F.col("value") * 100.0, 0).cast("long").alias("cents"),
    ).groupBy("cohort", "post").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").cast("long").alias("cents")
    )
    mean = F.col("cents").cast("double") / F.col("n").cast("double")
    means = cells.agg(
        F.max(F.when((F.col("cohort") == 1) & (F.col("post") == 1), mean)).alias("t1"),
        F.max(F.when((F.col("cohort") == 1) & (F.col("post") == 0), mean)).alias("t0"),
        F.max(F.when((F.col("cohort") == 0) & (F.col("post") == 1), mean)).alias("c1"),
        F.max(F.when((F.col("cohort") == 0) & (F.col("post") == 0), mean)).alias("c0"),
        F.sum("n").cast("long").alias("n_total"),
    )
    return means.select(
        "n_total",
        F.round(F.col("t1") / 100.0, 4).alias("treat_post"),
        F.round(F.col("t0") / 100.0, 4).alias("treat_pre"),
        F.round(F.col("c1") / 100.0, 4).alias("ctrl_post"),
        F.round(F.col("c0") / 100.0, 4).alias("ctrl_pre"),
        F.round(
            (F.col("t1") - F.col("t0") - (F.col("c1") - F.col("c0"))) / 100.0, 4
        ).alias("did_estimate"),
    )


@query(
    "agg_trimmed_mean",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag AS grp,
             CAST(ROUND(l_extendedprice * 100.0, 0) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice, l_orderkey, l_linenumber)
               AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ), kept AS (
      SELECT grp, cents, n FROM ranked
      WHERE rn > CAST(FLOOR(n * 0.1) AS BIGINT)
        AND rn <= n - CAST(FLOOR(n * 0.1) AS BIGINT)
    )
    SELECT grp,
           CAST(MAX(n) AS BIGINT) AS n_total,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           ROUND(CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0, 4)
             AS trimmed_mean
    FROM kept GROUP BY grp
    """,
    tags=("stats", "robust", "trimmed-mean"),
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% two-sided trimmed mean per group — the robust location
    estimate between the mean (efficient, outlier-fragile) and the
    median (robust, noisy): drop the bottom and top decile BY EXACT
    RANK (total tie-break order) and average the core in integer
    cents.

    Scale shape: the rank window is group-partitioned (one shuffle);
    at 100 TB the production twin derives the two trim BOUNDS from
    approxQuantile and filters map-side (the winsorize twin
    relationship) — pinned exact here because the oracle needs rank
    semantics."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    cw = Window.partitionBy("l_returnflag")
    ranked = li.select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_extendedprice") * 100.0, 0).cast("long").alias("cents"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cw).alias("n"),
    )
    lo = F.floor(F.col("n") * 0.1).cast("long")
    kept = ranked.where((F.col("rn") > lo) & (F.col("rn") <= F.col("n") - lo))
    return kept.groupBy("grp").agg(
        F.max("n").cast("long").alias("n_total"),
        F.count(F.lit(1)).alias("n_kept"),
        F.round(
            F.sum("cents").cast("double") / F.count(F.lit(1)).cast("double") / F.lit(100.0),
            4,
        ).alias("trimmed_mean"),
    )


@query(
    "eval_calibration_ece",
    oracle=f"""
    WITH {SCORED_GATE_SQL}, scored AS (
      SELECT doc_id, ROUND(conf_raw, 4) AS conf, label FROM gate
    ), binned AS (
      SELECT LEAST(CAST(FLOOR(conf * 10.0) AS BIGINT), 9) AS bin,
             CAST(ROUND(conf * 10000.0, 0) AS BIGINT) AS conf_e4,
             label
      FROM scored
    ), cells AS (
      SELECT bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(conf_e4) AS BIGINT) AS conf_sum_e4,
             CAST(SUM(label) AS BIGINT) AS n_pos
      FROM binned GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nt FROM cells
    )
    SELECT c.bin, c.n,
           ROUND(CAST(c.conf_sum_e4 AS DOUBLE) / CAST(c.n AS DOUBLE) / 10000.0, 4)
             AS mean_conf,
           ROUND(CAST(c.n_pos AS DOUBLE) / CAST(c.n AS DOUBLE), 4) AS frac_pos,
           ROUND(ABS(CAST(c.conf_sum_e4 AS DOUBLE) / CAST(c.n AS DOUBLE) / 10000.0
                     - CAST(c.n_pos AS DOUBLE) / CAST(c.n AS DOUBLE))
                 * CAST(c.n AS DOUBLE) / CAST(tot.nt AS DOUBLE), 6)
             AS ece_contrib
    FROM cells c CROSS JOIN tot
    """,
    tags=("stats", "evaluation", "calibration"),
)
def eval_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected-calibration-error table for a scored gate: treat a
    [0,1] quality score as a predicted probability (here a shifted
    diversity score standing in for a model confidence), the
    quality-gate outcome as the label, bin predictions into deciles,
    and report per-bin mean confidence vs empirical positive rate plus
    each bin's weighted |gap| — Σ(ece_contrib) IS the ECE. The
    classifier-evaluation table every scored filter (quality models,
    toxicity gates, dedup confidences) should publish next to its
    threshold.

    Exactness: per-doc confidences round at 4 and aggregate as
    integer 1e-4 units; labels and bin ids are integers; per-bin
    ratios are single divisions.

    Scale shape: one corpus scan → 10-row bin table; everything after
    the first aggregate is constant-size."""
    from serverless_datalake_spark.queries.evaluation import scored_gate

    scored = scored_gate(load_table(spark, sf_dir, "documents")).select(
        F.round(F.col("conf_raw"), 4).alias("conf"), "label"
    )
    binned = scored.select(
        F.least(F.floor(F.col("conf") * 10.0).cast("long"), F.lit(9).cast("long")).alias("bin"),
        F.round(F.col("conf") * 10000.0, 0).cast("long").alias("conf_e4"),
        "label",
    )
    cells = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("conf_e4").cast("long").alias("conf_sum_e4"),
        F.sum("label").cast("long").alias("n_pos"),
    )
    tot = cells.agg(F.sum("n").cast("long").alias("nt"))
    nd = F.col("n").cast("double")
    mean_conf = F.col("conf_sum_e4").cast("double") / nd / F.lit(10000.0)
    frac_pos = F.col("n_pos").cast("double") / nd
    return cells.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        F.round(mean_conf, 4).alias("mean_conf"),
        F.round(frac_pos, 4).alias("frac_pos"),
        F.round(
            F.abs(mean_conf - frac_pos) * nd / F.col("nt").cast("double"), 6
        ).alias("ece_contrib"),
    )


@query(
    "stats_ratio_delta_ci",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CAST(ROUND(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
             SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
             SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
      FROM per_user
    ), d AS (
      SELECT n, sy,
             CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) AS r,
             (CAST(sxx AS DOUBLE)
              - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS vx,
             (CAST(sxy AS DOUBLE)
              - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(sy AS DOUBLE))
               / CAST(n AS DOUBLE) AS cxy,
             (CAST(syy AS DOUBLE)
              - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(sy AS DOUBLE))
               / CAST(n AS DOUBLE) AS vy
      FROM m
    ), scored AS (
      SELECT n, r,
             SQRT(GREATEST(vx - 2.0 * r * cxy + r * r * vy, 0.0) / CAST(n AS DOUBLE))
               / (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS se
      FROM d
    )
    SELECT n AS n_users,
           ROUND(r / 100.0, 4) AS ratio,
           ROUND(se / 100.0, 6) AS se,
           ROUND(r / 100.0 - 1.96 * (se / 100.0), 4) AS ci_lo,
           ROUND(r / 100.0 + 1.96 * (se / 100.0), 4) AS ci_hi
    FROM scored
    """,
    tags=("stats", "ab-testing", "delta-method"),
)
def stats_ratio_delta_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method confidence interval for a RATIO metric (revenue
    per purchase) with USER-level units — the A/B-testing correction
    every experimentation platform applies: events within a user are
    correlated, so a per-event CI understates variance; the delta
    method computes var(X̄/Ȳ) ≈ (var X − 2R·cov + R²·var Y)/(n·Ȳ²)
    from user-level co-moments.

    Exactness: user-level sums are integer cents / counts; the five
    co-moments are exact 128-bit integer sums; the variance formula
    is a fixed double expression spelled identically on both sides,
    clamped at 0 before the square root.

    Scale shape: one aggregate to user grain, one 1-row moment
    reduce — the estimator costs one fact pass per experiment arm at
    any scale."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100.0, 0).cast("long")).cast("long").alias("x"),
        F.count(F.lit(1)).alias("y"),
    )
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    m = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
        F.sum(xd * yd).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    r = sx / sy
    vx = (F.col("sxx").cast("double") - (sx / nd) * sx) / nd
    cxy = (F.col("sxy").cast("double") - (sx / nd) * sy) / nd
    vy = (F.col("syy").cast("double") - (sy / nd) * sy) / nd
    se = F.sqrt(
        F.greatest(vx - F.lit(2.0) * r * cxy + r * r * vy, F.lit(0.0)) / nd
    ) / (sy / nd)
    return m.select(
        F.col("n").alias("n_users"),
        F.round(r / F.lit(100.0), 4).alias("ratio"),
        F.round(se / F.lit(100.0), 6).alias("se"),
        F.round(r / F.lit(100.0) - F.lit(1.96) * (se / F.lit(100.0)), 4).alias("ci_lo"),
        F.round(r / F.lit(100.0) + F.lit(1.96) * (se / F.lit(100.0)), 4).alias("ci_hi"),
    )


@query(
    "stats_survival_km",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ), horizon AS (
      SELECT MAX(CAST(o_orderdate AS DATE)) AS cens FROM orders
    ), subjects AS (
      SELECT f.o_custkey,
             CASE WHEN s.d IS NOT NULL THEN s.d - f.d
                  ELSE horizon.cens - f.d END AS dur_days,
             CASE WHEN s.d IS NOT NULL THEN 1 ELSE 0 END AS event
      FROM (SELECT o_custkey, d FROM ranked WHERE rn = 1) f
      LEFT JOIN (SELECT o_custkey, d FROM ranked WHERE rn = 2) s
        ON s.o_custkey = f.o_custkey
      CROSS JOIN horizon
    ), per_t AS (
      SELECT CAST(dur_days AS BIGINT) AS t,
             CAST(SUM(event) AS BIGINT) AS d_events,
             CAST(SUM(1 - event) AS BIGINT) AS c_censored
      FROM subjects GROUP BY 1
    ), risk AS (
      SELECT t, d_events, c_censored,
             CAST((SELECT COUNT(*) FROM subjects)
               - COALESCE(SUM(d_events + c_censored) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n_at_risk,
             ROW_NUMBER() OVER (ORDER BY t) AS k
      FROM per_t
    ), factors AS (
      SELECT list(1.0 - CAST(d_events AS DOUBLE) / CAST(n_at_risk AS DOUBLE)
                  ORDER BY t) AS fs
      FROM risk
    )
    SELECT r.t AS t_days, r.n_at_risk, r.d_events, r.c_censored,
           ROUND(list_aggregate(f.fs[1:CAST(r.k AS INTEGER)], 'product'), 6)
             AS survival
    FROM risk r CROSS JOIN factors f
    WHERE r.d_events > 0
    """,
    tags=("stats", "survival", "kaplan-meier"),
)
def stats_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for time-to-second-purchase with
    RIGHT-CENSORING: customers who never reorder within the
    observation window are censored at the horizon, not dropped — the
    estimator product-limits S(t) = Π (1 − dᵢ/nᵢ) over event times,
    which is the correct repeat-purchase/churn curve (naive "average
    days to reorder" over completers is survivorship-biased, the
    classic mistake this estimator exists to fix).

    Exactness: durations are integer days; risk sets come from
    integer cumulative sums; each factor is one exact-integer
    division; per-row survival folds the t-ordered factor PREFIX
    sequentially (array slice + product fold — identical order both
    engines), rounded at 6 once at the end.

    Scale shape: one rank window per customer (co-partitioned), a
    duration-grain aggregate, a cumulative window over the tiny
    event-time relation, and one 1-row factor-array broadcast for the
    prefix products — fact rows are touched once."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = o.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        F.row_number().over(w).alias("rn"),
    )
    horizon = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("cens"))
    f1 = ranked.where(F.col("rn") == 1).select("o_custkey", F.col("d").alias("d1"))
    s2 = ranked.where(F.col("rn") == 2).select(
        F.col("o_custkey").alias("ck2"), F.col("d").alias("d2")
    )
    subjects = (
        f1.join(s2, f1["o_custkey"] == s2["ck2"], "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("d2").isNotNull(), F.datediff(F.col("d2"), F.col("d1"))
            )
            .otherwise(F.datediff(F.col("cens"), F.col("d1")))
            .cast("long")
            .alias("dur_days"),
            F.when(F.col("d2").isNotNull(), 1).otherwise(0).alias("event"),
        )
    )
    per_t = subjects.groupBy(F.col("dur_days").alias("t")).agg(
        F.sum("event").cast("long").alias("d_events"),
        F.sum(F.lit(1) - F.col("event")).cast("long").alias("c_censored"),
    )
    n_total = subjects.agg(F.count(F.lit(1)).alias("n_total"))
    cw = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = per_t.crossJoin(F.broadcast(n_total)).select(
        "t",
        "d_events",
        "c_censored",
        (
            F.col("n_total")
            - F.coalesce(
                F.sum(F.col("d_events") + F.col("c_censored")).over(cw), F.lit(0)
            )
        )
        .cast("long")
        .alias("n_at_risk"),
        F.row_number().over(Window.orderBy("t")).alias("k"),
    )
    factors = risk.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("t"),
                    (
                        F.lit(1.0)
                        - F.col("d_events").cast("double")
                        / F.col("n_at_risk").cast("double")
                    ).alias("f"),
                )
            )
        ).alias("fs_t")
    ).select(F.transform(F.col("fs_t"), lambda x: x["f"]).alias("fs"))
    return (
        risk.crossJoin(F.broadcast(factors))
        .where(F.col("d_events") > 0)
        .select(
            F.col("t").alias("t_days"),
            "n_at_risk",
            "d_events",
            "c_censored",
            F.round(
                F.aggregate(
                    F.slice(F.col("fs"), 1, F.col("k").cast("int")),
                    F.lit(1.0),
                    lambda acc, x: acc * x,
                ),
                6,
            ).alias("survival"),
        )
    )


@query(
    "stats_mann_whitney_u",
    oracle="""
    WITH pts AS (
      SELECT l_extendedprice AS v,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g1
      FROM lineitem WHERE l_returnflag IN ('R', 'A')
    ), per_v AS (
      SELECT v, CAST(SUM(g1) AS BIGINT) AS c1,
             CAST(SUM(1 - g1) AS BIGINT) AS c2
      FROM pts GROUP BY v
    ), cum AS (
      SELECT c1, c2, c1 + c2 AS c,
             CAST(COALESCE(SUM(c1 + c2) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS prev
      FROM per_v
    ), m AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c2) AS BIGINT) AS n2,
             -- doubled rank sums stay integral under mid-rank ties:
             -- avg_rank*2 = 2*prev + c + 1
             SUM(CAST(c1 AS HUGEINT) * CAST(2 * prev + c + 1 AS HUGEINT)) AS r1x2,
             SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT) * CAST(c AS HUGEINT)
                 - CAST(c AS HUGEINT)) AS tie3
      FROM cum
    ), s AS (
      SELECT n1, n2,
             (CAST(r1x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n1 + 1 AS DOUBLE))
               / 2.0 AS u1,
             CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0 AS mu,
             CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
               * (CAST(n1 + n2 + 1 AS DOUBLE)
                  - CAST(tie3 AS DOUBLE)
                    / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE)))
               AS var_u
      FROM m
    )
    SELECT n1, n2,
           ROUND(u1, 1) AS u1,
           ROUND((u1 - mu) / SQRT(var_u), 6) AS z,
           CAST(CASE WHEN ABS((u1 - mu) / SQRT(var_u)) > 1.96 THEN 1 ELSE 0 END
                AS BIGINT) AS reject_05
    FROM s
    """,
    tags=("stats", "rank-test", "mann-whitney"),
)
def stats_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) between the returned and
    acknowledged price distributions — the nonparametric location test
    that needs no normality assumption (the KS sibling tests SHAPE;
    this tests SHIFT), with the exact tie correction in the normal
    approximation's variance.

    Exactness: mid-rank tie handling stays INTEGRAL by doubling
    (avg_rank·2 = 2·prev + c + 1 — no halves until the final
    formulas); rank sums and the Σ(t³−t) tie term are exact 128-bit
    integer aggregates; U, μ, σ² are fixed double expressions over
    exact inputs, z rounded at 6.

    Scale shape: identical to stats_ks_two_sample — one hash
    aggregate to distinct-value grain, one cumulative window over it,
    one moment reduce; the documented pre-binning twin applies when
    the value grain itself is huge."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("R", "A")
    )
    per_v = li.groupBy(F.col("l_extendedprice").alias("v")).agg(
        F.sum((F.col("l_returnflag") == "R").cast("long")).cast("long").alias("c1"),
        F.sum((F.col("l_returnflag") == "A").cast("long")).cast("long").alias("c2"),
    )
    cw = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = per_v.select(
        "c1",
        "c2",
        (F.col("c1") + F.col("c2")).alias("c"),
        F.coalesce(F.sum(F.col("c1") + F.col("c2")).over(cw), F.lit(0))
        .cast("long")
        .alias("prev"),
    )
    cd = F.col("c").cast("decimal(38,0)")
    m = cum.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
        F.sum(
            F.col("c1").cast("decimal(38,0)")
            * (F.lit(2) * F.col("prev") + F.col("c") + 1).cast("decimal(38,0)")
        ).alias("r1x2"),
        F.sum(cd * cd * cd - cd).alias("tie3"),
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    u1 = (F.col("r1x2").cast("double") - n1d * (F.col("n1") + 1).cast("double")) / F.lit(2.0)
    mu = n1d * n2d / F.lit(2.0)
    var_u = (
        n1d
        * n2d
        / F.lit(12.0)
        * (
            (F.col("n1") + F.col("n2") + 1).cast("double")
            - F.col("tie3").cast("double")
            / ((F.col("n1") + F.col("n2")).cast("double") * (F.col("n1") + F.col("n2") - 1).cast("double"))
        )
    )
    z = (u1 - mu) / F.sqrt(var_u)
    return m.select(
        "n1",
        "n2",
        F.round(u1, 1).alias("u1"),
        F.round(z, 6).alias("z"),
        F.when(F.abs(z) > 1.96, 1).otherwise(0).cast("long").alias("reject_05"),
    )


_PERM_B = 64


def _perm_hex8(expr: str) -> str:
    terms = [
        f"(strpos('0123456789abcdef', substr({expr}, {i + 1}, 1)) - 1)"
        f" * CAST({16 ** (7 - i)} AS BIGINT)"
        for i in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


@query(
    "stats_permutation_test",
    oracle=f"""
    WITH rows_k AS (
      SELECT {_perm_hex8("substr(md5(l_orderkey || '-' || CAST(l_linenumber AS VARCHAR)), 1, 8)")} AS h1,
             {_perm_hex8("substr(md5(l_orderkey || '-' || CAST(l_linenumber AS VARCHAR)), 9, 8)")} AS h2,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS grp,
             CAST(ROUND(l_extendedprice * 100.0, 0) AS BIGINT) AS cents
      FROM lineitem
    ), obs AS (
      SELECT CAST(SUM(grp) AS BIGINT) AS n1,
             CAST(SUM(1 - grp) AS BIGINT) AS n0,
             CAST(SUM(grp * cents) AS BIGINT) AS s1,
             CAST(SUM((1 - grp) * cents) AS BIGINT) AS s0
      FROM rows_k
    ), resamp AS (
      SELECT b,
             CAST(((CASE WHEN b <= 32 THEN h1 // CAST(POW(2, b - 1) AS BIGINT)
                         ELSE h2 // CAST(POW(2, b - 33) AS BIGINT) END) % 2)
                  AS BIGINT) AS pgrp,
             cents
      FROM rows_k, UNNEST(range(1, {_PERM_B + 1})) AS u(b)
    ), per_b AS (
      SELECT b,
             CAST(SUM(pgrp) AS BIGINT) AS pn1,
             CAST(SUM(1 - pgrp) AS BIGINT) AS pn0,
             CAST(SUM(pgrp * cents) AS BIGINT) AS ps1,
             CAST(SUM((1 - pgrp) * cents) AS BIGINT) AS ps0
      FROM resamp GROUP BY b
    ), stat AS (
      SELECT o.n1, o.n0,
             CAST(o.s1 AS DOUBLE) / CAST(o.n1 AS DOUBLE)
               - CAST(o.s0 AS DOUBLE) / CAST(o.n0 AS DOUBLE) AS obs_diff,
             CAST(SUM(CASE WHEN pn1 > 0 AND pn0 > 0
                  AND ABS(CAST(ps1 AS DOUBLE) / CAST(pn1 AS DOUBLE)
                          - CAST(ps0 AS DOUBLE) / CAST(pn0 AS DOUBLE))
                      >= ABS(CAST(o.s1 AS DOUBLE) / CAST(o.n1 AS DOUBLE)
                             - CAST(o.s0 AS DOUBLE) / CAST(o.n0 AS DOUBLE))
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
      FROM per_b CROSS JOIN obs o
      GROUP BY o.n1, o.n0, o.s1, o.s0
    )
    SELECT n1 AS n_returned, n0 AS n_other,
           ROUND(obs_diff / 100.0, 4) AS obs_diff_mean,
           n_extreme,
           ROUND(CAST(n_extreme + 1 AS DOUBLE) / CAST({_PERM_B} + 1 AS DOUBLE), 6)
             AS p_value
    FROM stat
    """,
    tags=("stats", "permutation", "resampling"),
)
def stats_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample permutation test (difference of mean extended price,
    returned vs non-returned lineitems) with 64 DETERMINISTIC label
    reshuffles: resample b relabels each row by
    md5(row_key # b) mod 2, so both engines replay the identical null
    distribution and the p-value ((1 + #extreme)/(B+1), the standard
    add-one permutation estimate) is reproducible to the bit — the
    significance machinery of A/B platforms without distributional
    assumptions (the KS/MWU tests' model-free sibling for MEANS).

    Exactness: per-resample sums are exact integer cents; each mean is
    one division; the extremeness comparison runs on identical doubles
    in both engines.

    Scale shape: NO row expansion — all B resample sums are agg
    columns over one pass (the sample_poisson_bootstrap "wider
    combiner"), sliced into JIT-compilable 16-column aggregates; the
    complementary group's sums derive exactly as total − group-1. The
    B labels for a row are the 64 BITS of ONE md5 per row (two 32-bit
    hex chunks), not B separate md5 calls — one-hash-many-bits cuts
    hashing B×, and the per-replica term is a shift+mask."""
    from serverless_datalake_spark.operators import pin as _pin

    li = load_table(spark, sf_dir, "lineitem")
    h = F.md5(
        F.concat_ws("-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string"))
    )
    # ONE corpus pass, NO row expansion (round-10 rewrite): the old
    # shape exploded rows × B=64 through a (b)-keyed partial aggregate
    # — 64× the rows of the scan through the combiner — plus a second
    # full scan for the observed sums. All 64 resample sums are plain
    # agg columns over the same rows (pn0/ps0 derived exactly as
    # row_total − pn1/ps1), so the resampling costs ONE pass with 2
    # sums per replica. The 128 agg columns are split into 8 slice
    # aggregates of 16 so each generated update method stays under the
    # JVM JIT compile threshold (the sample_poisson_bootstrap cliff:
    # one 64-column aggregate ran interpreted at 3× the cost); the
    # slices share one pinned (h1, h2, grp, cents) projection — 4
    # longs/row, the narrow proxy the shuffle-light shape needs.
    # Measured B/A/B/A at sf0.1: 6.7 s → 2.2 s (explode → slices).
    rows_k = _pin(
        li.select(
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(h, 9, 8), 16, 10).cast("long").alias("h2"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("grp"),
            F.round(F.col("l_extendedprice") * 100.0, 0).cast("long").alias("cents"),
        )
    )

    # All wide expression lists are shipped as F.expr SQL strings, not
    # nested Column objects: a 64-term Column fold costs seconds of
    # py4j plan-BUILD time (the round-3 finding; measured here: 4-7 s
    # build vs 2 s execution with Column objects).
    def pgrp_sql(b: int) -> str:
        # bit b of the 64-bit (h1, h2) uniform: identical integers to
        # the oracle's h DIV 2^(b-1) % 2 (h non-negative < 2^32)
        return (
            f"(shiftright(h1, {b - 1}) & 1)"
            if b <= 32
            else f"(shiftright(h2, {b - 33}) & 1)"
        )

    def slice_agg(lo: int, hi: int):
        aggs = []
        if lo == 1:
            aggs += [
                "CAST(sum(grp) AS BIGINT) AS n1",
                "CAST(sum(1 - grp) AS BIGINT) AS n0",
                "CAST(sum(grp * cents) AS BIGINT) AS s1",
                "CAST(sum((1 - grp) * cents) AS BIGINT) AS s0",
            ]
        for b in range(lo, hi + 1):
            aggs.append(f"CAST(sum({pgrp_sql(b)}) AS BIGINT) AS pn1_{b}")
            aggs.append(
                f"CAST(sum({pgrp_sql(b)} * cents) AS BIGINT) AS ps1_{b}"
            )
        return rows_k.agg(*[F.expr(a) for a in aggs])

    one = slice_agg(1, 8)
    for lo in range(9, _PERM_B + 1, 8):
        one = one.crossJoin(slice_agg(lo, lo + 7))

    od_sql = (
        "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
        " - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
    )
    terms = []
    for b in range(1, _PERM_B + 1):
        pn0 = f"((n1 + n0) - pn1_{b})"
        ps0 = f"((s1 + s0) - ps1_{b})"
        pd_ = (
            f"(CAST(ps1_{b} AS DOUBLE) / CAST(pn1_{b} AS DOUBLE)"
            f" - CAST({ps0} AS DOUBLE) / CAST({pn0} AS DOUBLE))"
        )
        terms.append(
            f"(CASE WHEN pn1_{b} > 0 AND {pn0} > 0"
            f" AND ABS({pd_}) >= __abs_od THEN 1 ELSE 0 END)"
        )
    n_extreme_sql = "CAST((" + " + ".join(terms) + ") AS BIGINT)"
    staged = one.selectExpr(
        "*", f"ABS({od_sql}) AS __abs_od"
    ).selectExpr(
        "n1", "n0", "s1", "s0", f"{n_extreme_sql} AS n_extreme"
    )
    return staged.selectExpr(
        "n1 AS n_returned",
        "n0 AS n_other",
        f"ROUND({od_sql} / 100.0, 4) AS obs_diff_mean",
        "n_extreme",
        f"ROUND(CAST(n_extreme + 1 AS DOUBLE)"
        f" / CAST({float(_PERM_B + 1)} AS DOUBLE), 6) AS p_value",
    )


@query(
    "stats_fdr_bh",
    oracle="""
    WITH joined AS (
      SELECT c.c_nationkey AS nation, o.o_orderstatus AS st
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), per_nation AS (
      SELECT nation,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CASE WHEN st = 'F' THEN 1 ELSE 0 END) AS BIGINT)
               AS f_orders
      FROM joined GROUP BY 1
    ), gtot AS (
      SELECT CAST(SUM(n_orders) AS DOUBLE) AS tot,
             CAST(SUM(f_orders) AS DOUBLE) AS tot_f
      FROM per_nation
    ), scored AS (
      SELECT nation, n_orders, f_orders,
             CAST(n_orders AS DOUBLE)
               * (CAST(f_orders AS DOUBLE) / CAST(n_orders AS DOUBLE)
                  - tot_f / tot)
               * (CAST(f_orders AS DOUBLE) / CAST(n_orders AS DOUBLE)
                  - tot_f / tot)
               / ((tot_f / tot) * (1.0 - tot_f / tot)) AS z2
      FROM per_nation, gtot
    ), pvals AS (
      SELECT nation, n_orders, f_orders, z2,
             CASE WHEN z2 <= 1.0 THEN 1.0 ELSE 1.0 / z2 END AS p_cheb
      FROM scored
    ), ranked AS (
      SELECT nation, n_orders, f_orders, z2, p_cheb,
             CAST(ROW_NUMBER() OVER (ORDER BY p_cheb, nation) AS BIGINT) AS rk,
             CAST(COUNT(*) OVER () AS BIGINT) AS m
      FROM pvals
    ), kstar AS (
      SELECT COALESCE(MAX(CASE WHEN p_cheb * CAST(m AS DOUBLE)
                                    <= CAST(rk AS DOUBLE) * 0.10
                               THEN rk END) OVER (), 0) AS k_star,
             nation, n_orders, f_orders, z2, p_cheb, rk
      FROM ranked
    )
    SELECT nation, n_orders, f_orders,
           ROUND(z2, 6) AS z2,
           ROUND(p_cheb, 6) AS p_cheb,
           rk AS p_rank,
           CAST(CASE WHEN rk <= k_star THEN 1 ELSE 0 END AS BIGINT)
             AS is_discovery
    FROM kstar
    """,
    tags=("statistics", "multiple-testing", "fdr"),
)
def stats_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg step-up FDR control over per-nation rate
    tests: for each nation, a one-sample z² statistic of its
    fulfilled-order ('F') rate against the global rate, converted to
    a CONSERVATIVE p-value via the Chebyshev bound p = min(1, 1/z²)
    (distribution-free, transcendental-free — BH with a p-value upper
    bound still controls FDR; the mechanics under test are the
    step-up machinery, not the tail approximation). Discovery set =
    all ranks ≤ k* where k* = max{k : p_(k) ≤ k·α/m}, α = 0.10 —
    note BH's step-up property: a rank below k* is IN even if its own
    threshold test failed.

    Exactness: every input to the double-arithmetic chain is an exact
    integer count; both engines evaluate the IDENTICAL expression
    tree on identical doubles, so the rank order and the boundary
    comparisons agree bit-for-bit.

    Scale shape: one fact-side join shuffle (orders→customer,
    broadcast-able dimension), one m-row aggregate; the BH window
    machinery runs on m rows (one per group) — driver-free, and the
    group cardinality, not the fact cardinality, bounds the window
    state. The multiple-testing pattern every metrics platform needs
    when it scans thousands of segments for movers."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    per_nation = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
                "f_orders"
            ),
        )
    )
    g = per_nation.agg(
        F.sum("n_orders").cast("double").alias("tot"),
        F.sum("f_orders").cast("double").alias("tot_f"),
    )
    s = per_nation.crossJoin(F.broadcast(g))
    p0 = F.col("tot_f") / F.col("tot")
    phat = F.col("f_orders").cast("double") / F.col("n_orders").cast("double")
    z2 = (
        F.col("n_orders").cast("double")
        * (phat - p0)
        * (phat - p0)
        / (p0 * (F.lit(1.0) - p0))
    )
    pvals = s.select(
        "nation",
        "n_orders",
        "f_orders",
        z2.alias("z2"),
        F.when(z2 <= 1.0, F.lit(1.0)).otherwise(F.lit(1.0) / z2).alias("p_cheb"),
    )
    ranked = pvals.select(
        "*",
        F.row_number().over(Window.orderBy("p_cheb", "nation")).cast("long").alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("m"),
    )
    qualifies = F.when(
        F.col("p_cheb") * F.col("m").cast("double")
        <= F.col("rk").cast("double") * F.lit(0.10),
        F.col("rk"),
    )
    kstar = ranked.select(
        "*",
        F.coalesce(
            F.max(qualifies).over(Window.partitionBy()), F.lit(0)
        ).alias("k_star"),
    )
    return kstar.select(
        "nation",
        "n_orders",
        "f_orders",
        F.round("z2", 6).alias("z2"),
        F.round("p_cheb", 6).alias("p_cheb"),
        F.col("rk").alias("p_rank"),
        F.when(F.col("rk") <= F.col("k_star"), 1)
        .otherwise(0)
        .cast("long")
        .alias("is_discovery"),
    )


@query(
    "stats_welch_tstat",
    oracle="""
    WITH units AS (
      SELECT c_mktsegment AS seg,
             CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS cents
      FROM customer
    ), suff AS (
      SELECT seg,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(cents) AS DOUBLE) AS s,
             CAST(SUM(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT))
                  AS DOUBLE) AS ss
      FROM units GROUP BY 1
    ), pairs AS (
      SELECT a.seg AS seg_a, b.seg AS seg_b,
             a.n AS na, b.n AS nb,
             (a.ss - (a.s / a.n) * a.s) / (a.n - 1.0) AS va,
             (b.ss - (b.s / b.n) * b.s) / (b.n - 1.0) AS vb,
             a.s / a.n AS ma, b.s / b.n AS mb
      FROM suff a JOIN suff b ON a.seg < b.seg
    )
    SELECT seg_a, seg_b,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           ROUND((ma - mb) / SQRT(va / na + vb / nb) , 6) AS t_welch,
           ROUND((va / na + vb / nb) * (va / na + vb / nb)
                 / ((va / na) * (va / na) / (na - 1.0)
                    + (vb / nb) * (vb / nb) / (nb - 1.0)), 4) AS dof_ws
    FROM pairs
    """,
    tags=("statistics", "hypothesis-test"),
)
def stats_welch_tstat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t statistic with Welch–Satterthwaite
    degrees of freedom for every pair of market segments on account
    balance — the default two-sample location test when variances
    differ (Student's pooled t is the special case this generalizes).
    Emits the statistic and dof, not a p-value: the t CDF is
    transcendental and engine-specific, while everything up to it is
    closed-form arithmetic both engines evaluate identically (pair
    with stats_fdr_bh's distribution-free bound, or thread the
    statistic into stats_permutation_test for an exact p).

    Exactness: per-segment sufficient statistics (n, Σcents, Σcents²)
    are exact integers (HUGEINT/DECIMAL accumulators), converted once
    to double; the identical expression tree then agrees bit-for-bit.

    Scale shape: ONE partial-agg shuffle over the scan reduces the
    fact table to one row per segment; the pair enumeration is a
    broadcast self-join of a group-cardinality relation — at 100 TB
    the cost is the scan, the pairing stays O(groups²) rows."""
    c = load_table(spark, sf_dir, "customer")
    d38 = "decimal(38,0)"
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    suff = (
        c.select(F.col("c_mktsegment").alias("seg"), cents.alias("cents"))
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(F.col("cents").cast(d38)).cast("double").alias("s"),
            F.sum((F.col("cents") * F.col("cents")).cast(d38))
            .cast("double")
            .alias("ss"),
        )
    )
    a = suff.alias("a")
    b = suff.alias("b")
    pairs = a.join(F.broadcast(b), F.col("a.seg") < F.col("b.seg")).select(
        F.col("a.seg").alias("seg_a"),
        F.col("b.seg").alias("seg_b"),
        F.col("a.n").alias("na"),
        F.col("b.n").alias("nb"),
        ((F.col("a.ss") - (F.col("a.s") / F.col("a.n")) * F.col("a.s"))
         / (F.col("a.n") - F.lit(1.0))).alias("va"),
        ((F.col("b.ss") - (F.col("b.s") / F.col("b.n")) * F.col("b.s"))
         / (F.col("b.n") - F.lit(1.0))).alias("vb"),
        (F.col("a.s") / F.col("a.n")).alias("ma"),
        (F.col("b.s") / F.col("b.n")).alias("mb"),
    )
    se2a = F.col("va") / F.col("na")
    se2b = F.col("vb") / F.col("nb")
    return pairs.select(
        "seg_a",
        "seg_b",
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round((F.col("ma") - F.col("mb")) / F.sqrt(se2a + se2b), 6).alias(
            "t_welch"
        ),
        F.round(
            (se2a + se2b) * (se2a + se2b)
            / (
                se2a * se2a / (F.col("na") - F.lit(1.0))
                + se2b * se2b / (F.col("nb") - F.lit(1.0))
            ),
            4,
        ).alias("dof_ws"),
    )


@query(
    "stats_eb_shrinkage",
    oracle="""
    WITH joined AS (
      SELECT c.c_nationkey AS nation, o.o_orderstatus AS st
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), per AS (
      SELECT nation,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN st = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS x
      FROM joined GROUP BY 1
    ), units AS (
      SELECT nation, n, x,
             CAST(ROUND(CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
                        * 1000000000.0, 0) AS BIGINT) AS p_nu
      FROM per
    ), moments AS (
      SELECT nation, n, x, p_nu,
             CAST(SUM(p_nu) OVER () AS DOUBLE)
               / CAST(COUNT(*) OVER () AS DOUBLE) / 1000000000.0 AS m,
             (CAST(SUM(CAST(p_nu AS HUGEINT) * CAST(p_nu AS HUGEINT))
                   OVER () AS DOUBLE)
              - (CAST(SUM(p_nu) OVER () AS DOUBLE)
                 / CAST(COUNT(*) OVER () AS DOUBLE))
                * CAST(SUM(p_nu) OVER () AS DOUBLE))
             / (CAST(COUNT(*) OVER () AS DOUBLE) - 1.0)
             / 1000000000.0 / 1000000000.0 AS s2
      FROM units
    ), ab AS (
      SELECT nation, n, x, p_nu, m, s2,
             CASE WHEN s2 > 0 AND m * (1.0 - m) / s2 - 1.0 > 0
                  THEN m * (m * (1.0 - m) / s2 - 1.0) END AS a,
             CASE WHEN s2 > 0 AND m * (1.0 - m) / s2 - 1.0 > 0
                  THEN (1.0 - m) * (m * (1.0 - m) / s2 - 1.0) END AS b
      FROM moments
    )
    SELECT nation, n, x,
           ROUND(CAST(x AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw_rate,
           ROUND(CASE WHEN a IS NULL THEN CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
                      ELSE (CAST(x AS DOUBLE) + a)
                           / (CAST(n AS DOUBLE) + a + b) END, 6)
             AS shrunk_rate,
           ROUND(CASE WHEN a IS NULL THEN 1.0
                      ELSE CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) + a + b)
                 END, 4) AS weight_on_data
    FROM ab
    """,
    tags=("statistics", "empirical-bayes", "shrinkage"),
)
def stats_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes beta-binomial shrinkage of per-nation rates:
    Beta(a, b) prior fit by method-of-moments on the observed
    per-group rates, posterior mean (x+a)/(n+a+b) per group — the
    standard fix for small-sample segments dominating a rate
    leaderboard (a 2/2 = 100% segment shrinks hard toward the prior;
    a 900/1000 barely moves). `weight_on_data` = n/(n+a+b) makes the
    shrinkage factor explicit. Degenerate spread (s² = 0 or MoM K ≤
    0) falls back to raw rates rather than emitting NaN priors.

    Exactness: group rates quantize to 1e-9 integer units so the
    cross-group mean/variance are order-independent exact sums;
    everything after is one fixed expression tree on identical
    doubles.

    Scale shape: one fact join + partial-agg shuffle onto group rows;
    moment windows and the posterior arithmetic run on m group rows.
    Same shape as stats_fdr_bh — the two are the report pair every
    segment dashboard needs (shrink the estimates, control the
    discoveries)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    per = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("x"),
        )
    )
    u = per.select(
        "*",
        F.round(F.col("x").cast("double") / F.col("n").cast("double") * 1e9, 0)
        .cast("long")
        .alias("p_nu"),
    )
    w = Window.partitionBy()
    d38 = "decimal(38,0)"
    cnt = F.count(F.lit(1)).over(w).cast("double")
    s1 = F.sum(F.col("p_nu").cast(d38)).over(w).cast("double")
    ss = F.sum((F.col("p_nu") * F.col("p_nu")).cast(d38)).over(w).cast("double")
    m = (s1 / cnt / F.lit(1000000000.0)).alias("m")
    s2 = (
        (ss - (s1 / cnt) * s1)
        / (cnt - F.lit(1.0))
        / F.lit(1000000000.0)
        / F.lit(1000000000.0)
    ).alias("s2")
    mo = u.select("*", m, s2)
    k = F.col("m") * (F.lit(1.0) - F.col("m")) / F.col("s2") - F.lit(1.0)
    ok = (F.col("s2") > 0) & (k > 0)
    ab = mo.select(
        "*",
        F.when(ok, F.col("m") * k).alias("a"),
        F.when(ok, (F.lit(1.0) - F.col("m")) * k).alias("b"),
    )
    raw = F.col("x").cast("double") / F.col("n").cast("double")
    shrunk = F.when(F.col("a").isNull(), raw).otherwise(
        (F.col("x").cast("double") + F.col("a"))
        / (F.col("n").cast("double") + F.col("a") + F.col("b"))
    )
    wod = F.when(F.col("a").isNull(), F.lit(1.0)).otherwise(
        F.col("n").cast("double") / (F.col("n").cast("double") + F.col("a") + F.col("b"))
    )
    return ab.select(
        "nation",
        "n",
        "x",
        F.round(raw, 6).alias("raw_rate"),
        F.round(shrunk, 6).alias("shrunk_rate"),
        F.round(wod, 4).alias("weight_on_data"),
    )


@query(
    "stats_cuped_adjusted",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             user_id % 2 AS arm,
             CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                           THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                           THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), g AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
      FROM per_user
    ), arms AS (
      SELECT arm,
             CAST(COUNT(*) AS DOUBLE) AS na,
             CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sxa,
             CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sya
      FROM per_user GROUP BY 1
    )
    SELECT CAST(arm AS BIGINT) AS arm,
           CAST(na AS BIGINT) AS n_users,
           ROUND(sya / na / 100.0, 6) AS mean_post,
           ROUND((sya / na
                  - ((g.n * g.sxy - g.sx * g.sy) / (g.n * g.sxx - g.sx * g.sx))
                    * (sxa / na - g.sx / g.n)) / 100.0, 6) AS mean_post_cuped,
           ROUND((g.n * g.sxy - g.sx * g.sy)
                 / (g.n * g.sxx - g.sx * g.sx), 6) AS theta,
           ROUND((g.n * g.sxy - g.sx * g.sy) * (g.n * g.sxy - g.sx * g.sy)
                 / ((g.n * g.sxx - g.sx * g.sx) * (g.n * g.syy - g.sy * g.sy)),
                 6) AS var_reduction
    FROM arms CROSS JOIN g
    """,
    tags=("stats", "experimentation", "cuped"),
)
def stats_cuped_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data) — the
    industry-standard A/B variance-reduction adjustment: per-user
    pre-period covariate X (first-half spend) and experiment metric Y
    (second-half spend), theta = cov(X,Y)/var(X) fit on ALL users
    (arm-agnostic, the unbiasedness requirement), then each arm's
    adjusted mean Y - theta*(X - mean(X)). Reports the adjusted means
    and the achieved variance reduction (= corr^2, the CUPED
    guarantee).

    Exactness: per-user X/Y are exact integer cents; the sufficient
    statistics (n, Sx, Sy, Sxx, Syy, Sxy) accumulate in DECIMAL(38,0)
    (DuckDB: HUGEINT) — order-independent, map-side combinable — and
    both engines evaluate the identical closed-form double expression
    once. Scale shape: one user-grain partial-agg shuffle, then an
    arm-grain (2-row) and a global (1-row) reduction — the same
    one-pass sufficient-statistics pattern as the rest of this module;
    nothing is collected, no windows."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    per_user = ev.groupBy(
        "user_id", (F.col("user_id") % 2).alias("arm")
    ).agg(
        F.sum(F.when(F.col("ts") < cut, cents).otherwise(F.lit(0))).alias("x"),
        F.sum(F.when(F.col("ts") >= cut, cents).otherwise(F.lit(0))).alias("y"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    g = per_user.groupBy().agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec("x")).cast("double").alias("sx"),
        F.sum(dec("y")).cast("double").alias("sy"),
        F.sum(dec("x") * dec("x")).cast("double").alias("sxx"),
        F.sum(dec("y") * dec("y")).cast("double").alias("syy"),
        F.sum(dec("x") * dec("y")).cast("double").alias("sxy"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("double").alias("na"),
        F.sum(dec("x")).cast("double").alias("sxa"),
        F.sum(dec("y")).cast("double").alias("sya"),
    )
    j = arms.crossJoin(F.broadcast(g))
    theta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return j.select(
        F.col("arm").cast("long").alias("arm"),
        F.col("na").cast("long").alias("n_users"),
        F.round(F.col("sya") / F.col("na") / 100.0, 6).alias("mean_post"),
        F.round(
            (
                F.col("sya") / F.col("na")
                - theta * (F.col("sxa") / F.col("na") - F.col("sx") / F.col("n"))
            )
            / 100.0,
            6,
        ).alias("mean_post_cuped"),
        F.round(theta, 6).alias("theta"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("var_reduction"),
    )


@query(
    "stats_anova_oneway",
    oracle="""
    WITH units AS (
      SELECT event_type AS grp,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS x
      FROM events
    ), per_group AS (
      SELECT grp,
             CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sg,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS ssg
      FROM units GROUP BY 1
    ), folded AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(ng) AS BIGINT) AS n,
             list_reduce(
               list_prepend([0.0, 0.0, 0.0],
                 list([sg, CAST(ng AS DOUBLE), ssg] ORDER BY grp)),
               (a, r) -> [a[1] + r[1] * r[1] / r[2], a[2] + r[1], a[3] + r[3]]
             ) AS acc
      FROM per_group
    )
    SELECT k, n,
           ROUND(acc[1] - acc[2] * acc[2] / CAST(n AS DOUBLE), 4) AS ss_between,
           ROUND(acc[3] - acc[1], 4) AS ss_within,
           ROUND(((acc[1] - acc[2] * acc[2] / CAST(n AS DOUBLE))
                  / (CAST(k AS DOUBLE) - 1.0))
                 / ((acc[3] - acc[1]) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))),
                 6) AS f_stat
    FROM folded
    """,
    tags=("stats", "anova"),
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across event types (does mean event value differ
    by type?): F = (SSB/(k−1)) / (SSW/(n−k)) from per-group exact
    sufficient statistics (n_g, Σx, Σx² in integer cents, HUGEINT /
    DECIMAL(38,0) accumulation).

    Determinism: the per-group stats are exact; the CROSS-GROUP float
    sums (Σ S_g²/n_g, ΣS_g, ΣSS_g) run as ONE ordered fold over the
    group rows sorted by group key — a LIST accumulator (the
    ts_holt_linear rule: DuckDB list_reduce mutates struct
    accumulators in place), identical association order in both
    engines. Group count is type-bounded (5), so the fold is a
    constant-size expression over a k-row relation.

    Scale shape: one partial-agg shuffle to group grain, then a k-row
    reduction — the textbook test at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    units = ev.select(
        F.col("event_type").alias("grp"),
        F.round(F.col("value") * 100, 0).cast("long").alias("x"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    per_group = units.groupBy("grp").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum(dec("x")).cast("double").alias("sg"),
        F.sum(dec("x") * dec("x")).cast("double").alias("ssg"),
    )
    folded = per_group.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("grp"), F.col("sg"), F.col("ng"), F.col("ssg")))
            ),
            F.array(F.lit(0.0), F.lit(0.0), F.lit(0.0)),
            lambda a, r: F.array(
                a[0] + r["sg"] * r["sg"] / r["ng"].cast("double"),
                a[1] + r["sg"],
                a[2] + r["ssg"],
            ),
        ).alias("acc"),
    )
    kd = F.col("k").cast("double")
    nd = F.col("n").cast("double")
    ssb = F.col("acc")[0] - F.col("acc")[1] * F.col("acc")[1] / nd
    ssw = F.col("acc")[2] - F.col("acc")[0]
    return folded.select(
        "k",
        "n",
        F.round(ssb, 4).alias("ss_between"),
        F.round(ssw, 4).alias("ss_within"),
        F.round((ssb / (kd - F.lit(1.0))) / (ssw / (nd - kd)), 6).alias("f_stat"),
    )


@query(
    "stats_spearman_rank",
    oracle="""
    WITH xc AS (
      SELECT l_extendedprice AS xv, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ), xr AS (
      SELECT xv,
             2 * (SUM(c) OVER (ORDER BY xv ROWS UNBOUNDED PRECEDING) - c)
               + c + 1 AS rx2
      FROM xc
    ), yc AS (
      SELECT l_quantity AS yv, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ), yr AS (
      SELECT yv,
             2 * (SUM(c) OVER (ORDER BY yv ROWS UNBOUNDED PRECEDING) - c)
               + c + 1 AS ry2
      FROM yc
    ), j AS (
      SELECT xr.rx2, yr.ry2
      FROM lineitem l
      JOIN xr ON l.l_extendedprice = xr.xv
      JOIN yr ON l.l_quantity = yr.yv
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(rx2 AS HUGEINT)) AS sx,
             SUM(CAST(ry2 AS HUGEINT)) AS sy,
             SUM(CAST(rx2 AS HUGEINT) * CAST(rx2 AS HUGEINT)) AS sxx,
             SUM(CAST(ry2 AS HUGEINT) * CAST(ry2 AS HUGEINT)) AS syy,
             SUM(CAST(rx2 AS HUGEINT) * CAST(ry2 AS HUGEINT)) AS sxy
      FROM j
    )
    SELECT n AS n_rows,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS spearman_rho
    FROM s
    """,
    tags=("statistics", "rank", "correlation"),
)
def stats_spearman_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of (l_extendedprice, l_quantity) with
    PROPER tie-averaged (fractional) ranks — the robust monotone-
    association twin of agg_correlation_pinned's Pearson. Ranks are
    never materialized per row by a global sort: each variable reduces
    to its VALUE-GRAIN count relation, the average rank per value
    comes from a running count ((2·cum_prev + c + 1) / 2, doubled to
    stay integral), and rows join their rank by value. Pearson on the
    doubled ranks equals Pearson on the ranks (scale-invariant), so
    every sufficient statistic is an exact integer sum in
    DECIMAL(38,0) — order-independent, map-side combinable, matching
    DuckDB's HUGEINT sums bit-for-bit; both engines convert each
    exact sum to double once and evaluate one identical expression.

    Scale shape: two value-grain aggregations; the quantity side is a
    50-row relation, the price side is value-grain (~distinct prices)
    and its running count rides `with_global_cumsum`
    (operators/ranking.py) — range-partitioned two-pass, no
    single-task window. The rank maps join back by value (AQE picks
    broadcast when small); the final pass is ONE partial-agg shuffle
    of six integer sums. No per-row rank window anywhere."""
    from serverless_datalake_spark.operators.ranking import with_global_cumsum

    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice", "l_quantity")

    def rank2_map(col: str, out: str) -> DataFrame:
        cnt = li.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        r = with_global_cumsum(cnt, [F.col(col)], "c", out="cum")
        return r.select(
            F.col(col),
            (2 * (F.col("cum") - F.col("c")) + F.col("c") + 1).cast("long").alias(out),
        )

    j = li.join(rank2_map("l_extendedprice", "rx2"), "l_extendedprice").join(
        rank2_map("l_quantity", "ry2"), "l_quantity"
    )
    dx = F.col("rx2").cast("decimal(19,0)")
    dy = F.col("ry2").cast("decimal(19,0)")
    s = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dx).alias("sx"),
        F.sum(dy).alias("sy"),
        F.sum(dx * dx).alias("sxx"),
        F.sum(dy * dy).alias("syy"),
        F.sum(dx * dy).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    return s.select(
        F.col("n").alias("n_rows"),
        F.round(
            (nd * sxy - sx * sy)
            / (F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)),
            6,
        ).alias("spearman_rho"),
    )


# --------------------------------------------------------------------------
# k-group tests (round 8): Kruskal-Wallis, Brown-Forsythe, Tukey HSD —
# the post-ANOVA toolkit a data-quality monitor runs across k cohorts.

# Shared doubled-mid-rank machinery for the rank-based k-group tests
# (Kruskal-Wallis and Dunn's post hoc): ONE definition of the
# units/vg/vc/cum/rnk/grp_r/ties pipeline in each language, so a fix
# to the mid-rank formula or the 128-bit casts lands everywhere at
# once (round-8 review: the two queries initially carried verbatim
# copies — four places to patch per change).
_RANK_CTES = """units AS (
      SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS v
      FROM lineitem
    ), vg AS (
      SELECT v, grp, CAST(COUNT(*) AS BIGINT) AS cg FROM units GROUP BY 1, 2
    ), vc AS (
      SELECT v, CAST(SUM(cg) AS BIGINT) AS c FROM vg GROUP BY 1
    ), cum AS (
      SELECT v, c,
             CAST(COALESCE(SUM(c) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS prev
      FROM vc
    ), rnk AS (
      SELECT v, 2 * prev + c + 1 AS r2 FROM cum
    ), grp_r AS (
      SELECT vg.grp,
             SUM(CAST(vg.cg AS HUGEINT) * CAST(rnk.r2 AS HUGEINT)) AS rr2,
             CAST(SUM(vg.cg) AS BIGINT) AS ng
      FROM vg JOIN rnk ON vg.v = rnk.v GROUP BY 1
    ), ties AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT) * CAST(c AS HUGEINT)
                 - CAST(c AS HUGEINT)) AS t3
      FROM vc
    )"""


def _doubled_rank_group_stats(spark, sf_dir):
    """(grp_r, ties) for quantity-by-returnflag: grp_r = per-group
    doubled rank sum (rr2) + size (ng); ties = total n + Σ(t³−t).
    The (v, grp) aggregate is pinned (four relations branch off it —
    unpinned, each consumer re-scanned the fact table)."""
    li = load_table(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    units = li.select(
        F.col("l_returnflag").alias("grp"), F.col("l_quantity").cast("long").alias("v")
    )
    vg = (
        units.groupBy("v", "grp")
        .agg(F.count(F.lit(1)).cast("long").alias("cg"))
        .transform(_pin)
    )
    vc = vg.groupBy("v").agg(F.sum("cg").cast("long").alias("c"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    rnk = vc.select(
        "v",
        (
            F.lit(2) * F.coalesce(F.sum("c").over(w), F.lit(0)).cast("long")
            + F.col("c")
            + 1
        ).alias("r2"),
    )
    grp_r = vg.join(rnk, "v").groupBy("grp").agg(
        F.sum(F.col("cg").cast(d38) * F.col("r2").cast(d38)).alias("rr2"),
        F.sum("cg").cast("long").alias("ng"),
    )
    cd = F.col("c").cast(d38)
    ties = vc.agg(
        F.sum("c").cast("long").alias("n"), F.sum(cd * cd * cd - cd).alias("t3")
    )
    return grp_r, ties


_KW_H = """(12.0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)) * srn
                  - 3.0 * CAST(n + 1 AS DOUBLE))
                 / (1.0 - CAST(t3 AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                       - CAST(n AS DOUBLE)))"""

# chi-square 5% critical values for dof 1..4 (k-group tests never see
# more groups here; the sentinel never rejects beyond the table)
_CHI2_CRIT = "CASE k - 1 WHEN 1 THEN 3.841 WHEN 2 THEN 5.991 WHEN 3 THEN 7.815 WHEN 4 THEN 9.488 ELSE 1e308 END"


@query(
    "stats_kruskal_wallis",
    oracle=f"""
    WITH {_RANK_CTES}, folded AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             list_reduce(
               list_prepend([0.0],
                 list([CAST(rr2 AS DOUBLE) * CAST(rr2 AS DOUBLE)
                       / (4.0 * CAST(ng AS DOUBLE))] ORDER BY grp)),
               (a, x) -> [a[1] + x[1]]
             )[1] AS srn
      FROM grp_r
    )
    SELECT k, n, k - 1 AS dof,
           ROUND({_KW_H}, 6) AS h_stat,
           CAST(CASE WHEN {_KW_H} > {_CHI2_CRIT} THEN 1 ELSE 0 END AS BIGINT)
             AS reject_05
    FROM folded CROSS JOIN ties
    """,
    tags=("stats", "rank-test", "kruskal-wallis"),
)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across the three return-flag cohorts' quantity
    distributions — the k-group extension of stats_mann_whitney_u
    (does ANY cohort's location differ?), with the exact tie
    correction 1 − Σ(t³−t)/(N³−N); rejects against the chi-square
    (k−1) 5% critical value.

    Exactness: the mid-rank machinery is stats_mann_whitney_u's —
    doubled ranks (avg_rank·2 = 2·prev + c + 1) stay integral; per-
    group doubled rank sums and the tie term are exact 128-bit
    aggregates; Σ R_j²/n_j runs as ONE ordered fold over the
    group-sorted 3-row list (the stats_anova_oneway discipline), so
    both engines add identical doubles in identical order.

    Scale shape: quantity has a ≤50-value DOMAIN, so the unpartitioned
    cumulative window runs over a domain-bounded relation (allowlisted
    like stats_ks_two_sample); everything downstream is group-grain.
    Fact rows are touched ONCE: the (v, grp) hash aggregate is pinned
    (lazy localCheckpoint, the ranking.py discipline) because four
    relations branch off it — unpinned, Spark re-derived it per branch
    and the physical plan scanned the fact table five times."""
    grp_r, ties = _doubled_rank_group_stats(spark, sf_dir)
    term = (
        F.col("rr2").cast("double")
        * F.col("rr2").cast("double")
        / (F.lit(4.0) * F.col("ng").cast("double"))
    )
    folded = grp_r.select("grp", term.alias("term")).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("grp", "term"))),
            F.array(F.lit(0.0)),
            lambda a, x: F.array(a[0] + x["term"]),
        )[0].alias("srn"),
    )
    nd = F.col("n").cast("double")
    h = (
        F.lit(12.0) / (nd * (F.col("n") + 1).cast("double")) * F.col("srn")
        - F.lit(3.0) * (F.col("n") + 1).cast("double")
    ) / (F.lit(1.0) - F.col("t3").cast("double") / (nd * nd * nd - nd))
    crit = (
        F.when(F.col("k") - 1 == 1, 3.841)
        .when(F.col("k") - 1 == 2, 5.991)
        .when(F.col("k") - 1 == 3, 7.815)
        .when(F.col("k") - 1 == 4, 9.488)
        .otherwise(F.lit(1e308))
    )
    return folded.crossJoin(F.broadcast(ties)).select(
        "k",
        "n",
        (F.col("k") - 1).cast("long").alias("dof"),
        F.round(h, 6).alias("h_stat"),
        F.when(h > crit, 1).otherwise(0).cast("long").alias("reject_05"),
    )


@query(
    "stats_levene_bf",
    oracle="""
    WITH units AS (
      SELECT l_returnflag AS grp,
             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS x
      FROM lineitem
    ), vg AS (
      SELECT grp, x, CAST(COUNT(*) AS BIGINT) AS c FROM units GROUP BY 1, 2
    ), gt AS (
      SELECT grp, CAST(SUM(c) AS BIGINT) AS ng FROM vg GROUP BY 1
    ), cum AS (
      SELECT vg.grp, vg.x, vg.c,
             CAST(COALESCE(SUM(vg.c) OVER (PARTITION BY vg.grp ORDER BY vg.x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS prev
      FROM vg
    ), med AS (
      SELECT cum.grp,
             CAST(SUM(
               CASE WHEN cum.prev < CAST(FLOOR((gt.ng + 1) / 2.0) AS BIGINT)
                     AND CAST(FLOOR((gt.ng + 1) / 2.0) AS BIGINT) <= cum.prev + cum.c
                    THEN cum.x ELSE 0 END
               + CASE WHEN cum.prev < CAST(FLOOR(gt.ng / 2.0) AS BIGINT) + 1
                       AND CAST(FLOOR(gt.ng / 2.0) AS BIGINT) + 1 <= cum.prev + cum.c
                      THEN cum.x ELSE 0 END) AS BIGINT) AS med2
      FROM cum JOIN gt ON cum.grp = gt.grp
      GROUP BY 1
    ), zstats AS (
      SELECT vg.grp,
             CAST(SUM(vg.c) AS BIGINT) AS ng,
             CAST(SUM(CAST(vg.c AS HUGEINT)
                      * CAST(ABS(2 * vg.x - med.med2) AS HUGEINT)) AS DOUBLE) AS sz,
             CAST(SUM(CAST(vg.c AS HUGEINT)
                      * CAST(ABS(2 * vg.x - med.med2) AS HUGEINT)
                      * CAST(ABS(2 * vg.x - med.med2) AS HUGEINT)) AS DOUBLE) AS szz
      FROM vg JOIN med ON vg.grp = med.grp
      GROUP BY 1
    ), folded AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(ng) AS BIGINT) AS n,
             list_reduce(
               list_prepend([0.0, 0.0, 0.0],
                 list([sz * sz / CAST(ng AS DOUBLE), sz, szz] ORDER BY grp)),
               (a, r) -> [a[1] + r[1], a[2] + r[2], a[3] + r[3]]
             ) AS acc
      FROM zstats
    )
    SELECT k, n,
           ROUND(((acc[1] - acc[2] * acc[2] / CAST(n AS DOUBLE))
                  / (CAST(k AS DOUBLE) - 1.0))
                 / ((acc[3] - acc[1]) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))),
                 6) AS f_bf,
           CAST(CASE WHEN ((acc[1] - acc[2] * acc[2] / CAST(n AS DOUBLE))
                  / (CAST(k AS DOUBLE) - 1.0))
                 / ((acc[3] - acc[1]) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
                 > (CASE k - 1 WHEN 1 THEN 3.841 WHEN 2 THEN 2.996
                    WHEN 3 THEN 2.605 WHEN 4 THEN 2.372 ELSE 1e308 END)
                THEN 1 ELSE 0 END AS BIGINT) AS reject_05
    FROM folded
    """,
    tags=("stats", "variance-test", "levene"),
)
def stats_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) variance-homogeneity
    test across the return-flag cohorts' price distributions: one-way
    ANOVA F on z = |x − median_g| — the robust pre-flight check before
    trusting pooled-variance tests (Welch's motivation quantified).
    Rejects against F(k−1, ∞) at 5% (= chi²_{k−1}/(k−1): 2.996 for
    k=3) — exact dof critical values differ in the 4th decimal at
    these n.

    Exactness: group medians come from the per-group cumulative count
    relation DOUBLED (med·2 = lower + upper middle value — integral in
    cents, no float averaging); z·2 = |2x − med2| stays integral, and
    F is scale-invariant so the doubling cancels. Σz, Σz² are exact
    128-bit integer aggregates; the cross-group reduction is the
    stats_anova_oneway ordered 3-row fold.

    Scale shape: one (grp, cents)-grain hash aggregate (map-side
    partials absorb duplicate prices), a PARTITIONED cumulative window
    (3 group partitions — never global), a 3-row broadcast of medians
    back onto the value-grain relation, one moment reduce. Fact rows
    are touched ONCE — the value-grain aggregate is pinned (lazy
    localCheckpoint) because three relations branch off it."""
    li = load_table(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    units = li.select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("x"),
    )
    vg = (
        units.groupBy("grp", "x")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(_pin)
    )
    gt = vg.groupBy("grp").agg(F.sum("c").cast("long").alias("ng"))
    w = (
        Window.partitionBy("grp")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = vg.select(
        "grp",
        "x",
        "c",
        F.coalesce(F.sum("c").over(w), F.lit(0)).cast("long").alias("prev"),
    )
    pos_lo = F.floor((F.col("ng") + 1) / 2.0).cast("long")
    pos_hi = (F.floor(F.col("ng") / 2.0) + 1).cast("long")
    hit = lambda p: F.when(  # noqa: E731
        (F.col("prev") < p) & (p <= F.col("prev") + F.col("c")), F.col("x")
    ).otherwise(F.lit(0))
    med = (
        cum.join(F.broadcast(gt), "grp")
        .groupBy("grp")
        .agg(F.sum(hit(pos_lo) + hit(pos_hi)).cast("long").alias("med2"))
    )
    z2 = F.abs(F.lit(2) * F.col("x") - F.col("med2")).cast(d38)
    zstats = (
        vg.join(F.broadcast(med), "grp")
        .groupBy("grp")
        .agg(
            F.sum("c").cast("long").alias("ng"),
            F.sum(F.col("c").cast(d38) * z2).cast("double").alias("sz"),
            F.sum(F.col("c").cast(d38) * z2 * z2).cast("double").alias("szz"),
        )
    )
    folded = zstats.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("grp", "sz", "ng", "szz"))
            ),
            F.array(F.lit(0.0), F.lit(0.0), F.lit(0.0)),
            lambda a, r: F.array(
                a[0] + r["sz"] * r["sz"] / r["ng"].cast("double"),
                a[1] + r["sz"],
                a[2] + r["szz"],
            ),
        ).alias("acc"),
    )
    kd = F.col("k").cast("double")
    nd = F.col("n").cast("double")
    ssb = F.col("acc")[0] - F.col("acc")[1] * F.col("acc")[1] / nd
    ssw = F.col("acc")[2] - F.col("acc")[0]
    f_bf = (ssb / (kd - F.lit(1.0))) / (ssw / (nd - kd))
    crit = (
        F.when(F.col("k") - 1 == 1, 3.841)
        .when(F.col("k") - 1 == 2, 2.996)
        .when(F.col("k") - 1 == 3, 2.605)
        .when(F.col("k") - 1 == 4, 2.372)
        .otherwise(F.lit(1e308))
    )
    return folded.select(
        "k",
        "n",
        F.round(f_bf, 6).alias("f_bf"),
        F.when(f_bf > crit, 1).otherwise(0).cast("long").alias("reject_05"),
    )


@query(
    "stats_tukey_hsd",
    oracle="""
    WITH units AS (
      SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS x
      FROM lineitem
    ), per_group AS (
      SELECT grp,
             CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sg,
             CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS DOUBLE) AS ssg
      FROM units GROUP BY 1
    ), folded AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(ng) AS BIGINT) AS n,
             list_reduce(
               list_prepend([0.0, 0.0],
                 list([sg * sg / CAST(ng AS DOUBLE), ssg] ORDER BY grp)),
               (a, r) -> [a[1] + r[1], a[2] + r[2]]
             ) AS acc
      FROM per_group
    ), mse AS (
      SELECT k, n,
             (acc[2] - acc[1]) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) AS mse
      FROM folded
    )
    SELECT a.grp AS g1, b.grp AS g2,
           ROUND(ABS(a.sg / CAST(a.ng AS DOUBLE) - b.sg / CAST(b.ng AS DOUBLE)),
                 6) AS mean_diff,
           ROUND(ABS(a.sg / CAST(a.ng AS DOUBLE) - b.sg / CAST(b.ng AS DOUBLE))
                 / SQRT(m.mse / 2.0 * (1.0 / CAST(a.ng AS DOUBLE)
                                       + 1.0 / CAST(b.ng AS DOUBLE))), 6)
             AS q_stat,
           CAST(CASE WHEN ABS(a.sg / CAST(a.ng AS DOUBLE)
                              - b.sg / CAST(b.ng AS DOUBLE))
                 / SQRT(m.mse / 2.0 * (1.0 / CAST(a.ng AS DOUBLE)
                                       + 1.0 / CAST(b.ng AS DOUBLE))) > 3.314
                THEN 1 ELSE 0 END AS BIGINT) AS reject_05
    FROM per_group a JOIN per_group b ON a.grp < b.grp CROSS JOIN mse m
    """,
    tags=("stats", "post-hoc", "tukey"),
)
def stats_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey HSD post-hoc pairwise comparison after a one-way ANOVA on
    quantity by return flag: studentized-range q per unordered cohort
    pair (Tukey-Kramer unequal-n form q = |m̄ᵢ−m̄ⱼ| / √(MSE/2·(1/nᵢ +
    1/nⱼ))), rejecting against q₀.₀₅(k=3, df=∞) = 3.314 — the
    "WHICH cohorts differ" follow-up stats_anova_oneway can't answer
    without inflating the family-wise error the way k pairwise t-tests
    would.

    Exactness: per-group n, Σx, Σx² are exact 128-bit integer
    aggregates; MSE's cross-group reduction is the stats_anova_oneway
    ordered fold; each pair's mean difference and q are fixed double
    expressions over exact inputs, identical in both engines.

    Scale shape: one partial-agg shuffle to group grain, a k-row
    self-join (k pairs, broadcast-trivial), a 1-row MSE broadcast —
    constant-size everything after the first aggregate, which is
    pinned (lazy localCheckpoint) so its three consumers (both sides
    of the pair join + the MSE fold) cost one fact scan, not three."""
    li = load_table(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    units = li.select(
        F.col("l_returnflag").alias("grp"), F.col("l_quantity").cast("long").alias("x")
    )
    per_group = (
        units.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("ng"),
            F.sum(F.col("x").cast(d38)).cast("double").alias("sg"),
            F.sum((F.col("x") * F.col("x")).cast(d38)).cast("double").alias("ssg"),
        )
        .transform(_pin)
    )
    folded = per_group.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("grp", "sg", "ng", "ssg"))),
            F.array(F.lit(0.0), F.lit(0.0)),
            lambda a, r: F.array(
                a[0] + r["sg"] * r["sg"] / r["ng"].cast("double"),
                a[1] + r["ssg"],
            ),
        ).alias("acc"),
    )
    mse = folded.select(
        (
            (F.col("acc")[1] - F.col("acc")[0])
            / (F.col("n").cast("double") - F.col("k").cast("double"))
        ).alias("mse")
    )
    a = per_group.alias("a")
    b = per_group.alias("b")
    mean = lambda s: F.col(f"{s}.sg") / F.col(f"{s}.ng").cast("double")  # noqa: E731
    diff = F.abs(mean("a") - mean("b"))
    q = diff / F.sqrt(
        F.col("mse")
        / 2.0
        * (
            F.lit(1.0) / F.col("a.ng").cast("double")
            + F.lit(1.0) / F.col("b.ng").cast("double")
        )
    )
    return (
        a.join(b, F.col("a.grp") < F.col("b.grp"))
        .crossJoin(F.broadcast(mse))
        .select(
            F.col("a.grp").alias("g1"),
            F.col("b.grp").alias("g2"),
            F.round(diff, 6).alias("mean_diff"),
            F.round(q, 6).alias("q_stat"),
            F.when(q > 3.314, 1).otherwise(0).cast("long").alias("reject_05"),
        )
    )


@query(
    "stats_dunn_posthoc",
    oracle=f"""
    WITH {_RANK_CTES}
    SELECT a.grp AS g1, b.grp AS g2,
           ROUND(ABS(CAST(a.rr2 AS DOUBLE) / (2.0 * CAST(a.ng AS DOUBLE))
                     - CAST(b.rr2 AS DOUBLE) / (2.0 * CAST(b.ng AS DOUBLE))),
                 6) AS rank_diff,
           ROUND(ABS(CAST(a.rr2 AS DOUBLE) / (2.0 * CAST(a.ng AS DOUBLE))
                     - CAST(b.rr2 AS DOUBLE) / (2.0 * CAST(b.ng AS DOUBLE)))
                 / SQRT((CAST(t.n AS DOUBLE) * CAST(t.n + 1 AS DOUBLE) / 12.0
                         - CAST(t.t3 AS DOUBLE)
                           / (12.0 * CAST(t.n - 1 AS DOUBLE)))
                        * (1.0 / CAST(a.ng AS DOUBLE)
                           + 1.0 / CAST(b.ng AS DOUBLE))), 6) AS z_stat,
           CAST(CASE WHEN ABS(CAST(a.rr2 AS DOUBLE) / (2.0 * CAST(a.ng AS DOUBLE))
                     - CAST(b.rr2 AS DOUBLE) / (2.0 * CAST(b.ng AS DOUBLE)))
                 / SQRT((CAST(t.n AS DOUBLE) * CAST(t.n + 1 AS DOUBLE) / 12.0
                         - CAST(t.t3 AS DOUBLE)
                           / (12.0 * CAST(t.n - 1 AS DOUBLE)))
                        * (1.0 / CAST(a.ng AS DOUBLE)
                           + 1.0 / CAST(b.ng AS DOUBLE))) > 2.394
                THEN 1 ELSE 0 END AS BIGINT) AS reject_05
    FROM grp_r a JOIN grp_r b ON a.grp < b.grp CROSS JOIN ties t
    """,
    tags=("stats", "post-hoc", "rank-test", "dunn"),
)
def stats_dunn_posthoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's (1964) post-hoc pairwise rank test after
    stats_kruskal_wallis — WHICH cohorts' quantity distributions
    differ: z = |R̄ᵢ − R̄ⱼ| / √((N(N+1)/12 − Σ(t³−t)/(12(N−1)))·(1/nᵢ +
    1/nⱼ)) with the tie-corrected variance, rejected against the
    Bonferroni-adjusted two-sided normal critical value for k=3 pairs
    (z₀.₀₅/₆ = 2.394) — Tukey's rank-land counterpart.

    Exactness: the mean ranks come from the stats_kruskal_wallis
    doubled-rank sums (R̄ = RR2/(2n), exact integers until the single
    division); the tie term is the same exact 128-bit aggregate; each
    pair's z is a fixed double expression over exact inputs.

    Scale shape: identical to stats_kruskal_wallis up to group grain
    (pinned value-grain aggregate, one fact scan), then a k-row
    self-join and a 1-row tie-term broadcast — constant-size."""
    grp_r, ties = _doubled_rank_group_stats(spark, sf_dir)
    grp_r = grp_r.transform(_pin)  # consumed by both sides of the pair join
    a, b = grp_r.alias("a"), grp_r.alias("b")
    mean_rank = lambda s: F.col(f"{s}.rr2").cast("double") / (  # noqa: E731
        F.lit(2.0) * F.col(f"{s}.ng").cast("double")
    )
    diff = F.abs(mean_rank("a") - mean_rank("b"))
    nd = F.col("n").cast("double")
    var = (
        nd * (F.col("n") + 1).cast("double") / F.lit(12.0)
        - F.col("t3").cast("double") / (F.lit(12.0) * (F.col("n") - 1).cast("double"))
    ) * (
        F.lit(1.0) / F.col("a.ng").cast("double")
        + F.lit(1.0) / F.col("b.ng").cast("double")
    )
    z = diff / F.sqrt(var)
    return (
        a.join(b, F.col("a.grp") < F.col("b.grp"))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("a.grp").alias("g1"),
            F.col("b.grp").alias("g2"),
            F.round(diff, 6).alias("rank_diff"),
            F.round(z, 6).alias("z_stat"),
            F.when(z > 2.394, 1).otherwise(0).cast("long").alias("reject_05"),
        )
    )


@query(
    "stats_kendall_tau",
    oracle="""
    WITH cells AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS y,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2
    ), prs AS (
      SELECT
        CAST(SUM(CASE WHEN a.y < b.y
                 THEN CAST(a.c AS HUGEINT) * CAST(b.c AS HUGEINT)
                 ELSE CAST(0 AS HUGEINT) END) AS HUGEINT) AS conc,
        CAST(SUM(CASE WHEN a.y > b.y
                 THEN CAST(a.c AS HUGEINT) * CAST(b.c AS HUGEINT)
                 ELSE CAST(0 AS HUGEINT) END) AS HUGEINT) AS disc
      FROM cells a JOIN cells b ON a.x < b.x
    ), tx AS (
      SELECT SUM(CAST(cx AS HUGEINT) * CAST(cx - 1 AS HUGEINT)) AS d1
      FROM (SELECT SUM(c) AS cx FROM cells GROUP BY x)
    ), ty AS (
      SELECT SUM(CAST(cy AS HUGEINT) * CAST(cy - 1 AS HUGEINT)) AS d2
      FROM (SELECT SUM(c) AS cy FROM cells GROUP BY y)
    ), tot AS (
      SELECT CAST(SUM(c) AS HUGEINT) AS n FROM cells
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           CAST(conc AS BIGINT) AS concordant,
           CAST(disc AS BIGINT) AS discordant,
           ROUND(2.0 * (CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))
                 / SQRT(CAST(n * (n - 1) - d1 AS DOUBLE)
                        * CAST(n * (n - 1) - d2 AS DOUBLE)), 6) AS tau_b
    FROM prs, tx, ty, tot
    """,
    tags=("statistics", "rank", "correlation"),
)
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between order quantity and discount — the
    pair-concordance member of the association family (Pearson =
    agg_correlation_pinned, Spearman = stats_spearman_rank; tau is the
    one whose value is a probability statement about pairs, which is
    why preference-learning evals report it).

    The naive definition is an O(n^2) pair scan; the scalable
    identity used here reduces it to the CONTINGENCY GRAIN: both
    variables are domain-bounded (quantity 1..50, discount 0..10
    cents), so the joint distribution is <=550 cells, concordant /
    discordant pair counts are cell-pair sums weighted by c_i*c_j,
    and tau-b's tie terms come from the two marginal count relations.
    Everything is an exact integer (DECIMAL(38,0) vs DuckDB HUGEINT);
    each factor converts to double once for the final expression.
    For continuous variables the same shape applies after quantile
    bucketing (feature_quantile_bucketize) — tau on buckets is the
    standard large-n estimator. Caveat: the REPORT columns
    concordant/discordant are int64 and pair counts grow as n^2/4,
    overflowing past ~6e9 rows — at that scale drop the two count
    columns (or emit them as decimals); tau_b itself is computed from
    the DECIMAL sums and stays exact.

    Scale shape: ONE partial-agg shuffle of the fact scan to <=550
    cells (map-side combinable), then a broadcast cell-pair self-join
    and two marginal rollups over the pinned cell relation — all
    domain-bounded, independent of row count. The 100 TB cost is the
    scan, exactly like agg_correlation_pinned."""
    li = load_table(spark, sf_dir, "lineitem")
    cells = (
        li.groupBy(
            F.col("l_quantity").cast("long").alias("x"),
            F.round(F.col("l_discount") * 100, 0).cast("long").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(_pin)  # feeds the pair join (twice) + 3 rollups
    )
    d38 = "decimal(38,0)"
    a, b = cells.alias("a"), cells.alias("b")
    pair_w = F.col("a.c").cast(d38) * F.col("b.c").cast(d38)
    zero = F.lit(0).cast(d38)
    prs = a.join(F.broadcast(b), F.col("a.x") < F.col("b.x")).agg(
        F.sum(F.when(F.col("a.y") < F.col("b.y"), pair_w).otherwise(zero)).alias("conc"),
        F.sum(F.when(F.col("a.y") > F.col("b.y"), pair_w).otherwise(zero)).alias("disc"),
    )
    tx = cells.groupBy("x").agg(F.sum("c").alias("cx")).agg(
        F.sum(F.col("cx").cast(d38) * (F.col("cx") - 1).cast(d38)).alias("d1")
    )
    ty = cells.groupBy("y").agg(F.sum("c").alias("cy")).agg(
        F.sum(F.col("cy").cast(d38) * (F.col("cy") - 1).cast(d38)).alias("d2")
    )
    tot = cells.agg(F.sum("c").cast(d38).alias("n"))
    j = prs.crossJoin(F.broadcast(tx)).crossJoin(F.broadcast(ty)).crossJoin(
        F.broadcast(tot)
    )
    n = F.col("n")
    return j.select(
        n.cast("long").alias("n_rows"),
        F.col("conc").cast("long").alias("concordant"),
        F.col("disc").cast("long").alias("discordant"),
        F.round(
            F.lit(2.0)
            * (F.col("conc").cast("double") - F.col("disc").cast("double"))
            / F.sqrt(
                (n * (n - 1) - F.col("d1")).cast("double")
                * (n * (n - 1) - F.col("d2")).cast("double")
            ),
            6,
        ).alias("tau_b"),
    )


@query(
    "stats_jackknife_groups",
    oracle="""
    WITH li AS (
      SELECT CAST(s.s_nationkey AS BIGINT) AS g,
             CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT) AS cents,
             CAST(l.l_quantity AS BIGINT) AS qty
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    ), grp AS (
      SELECT g, CAST(SUM(cents) AS HUGEINT) AS sg,
             CAST(SUM(qty) AS HUGEINT) AS qg
      FROM li GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(sg) AS HUGEINT) AS s, CAST(SUM(qg) AS HUGEINT) AS q,
             CAST(COUNT(*) AS BIGINT) AS gg
      FROM grp
    ), loo AS (
      SELECT g, ROUND(CAST(s - sg AS DOUBLE) / CAST(q - qg AS DOUBLE), 8)
                AS theta_g
      FROM grp CROSS JOIN tot
    ), m AS (
      SELECT list_aggregate(list(theta_g ORDER BY g), 'sum')
               / CAST((SELECT gg FROM tot) AS DOUBLE) AS mean_loo,
             list(theta_g ORDER BY g) AS thetas
      FROM loo
    )
    SELECT (SELECT gg FROM tot) AS n_groups,
           ROUND(CAST((SELECT s FROM tot) AS DOUBLE)
                 / CAST((SELECT q FROM tot) AS DOUBLE), 6) AS theta_hat,
           ROUND(SQRT(CAST((SELECT gg FROM tot) - 1 AS DOUBLE)
                      / CAST((SELECT gg FROM tot) AS DOUBLE)
                      * list_aggregate(list_transform(thetas,
                          t -> (t - mean_loo) * (t - mean_loo)), 'sum')), 6)
             AS jack_se
    FROM m
    """,
    tags=("statistics", "jackknife", "resampling"),
)
def stats_jackknife_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-GROUP jackknife standard error for the ratio
    estimator theta = total revenue cents / total quantity, groups =
    supplier nations — the design-based uncertainty a pipeline
    attaches to any ratio metric whose rows are dependent WITHIN
    groups (the survey-sampling sibling of stats_ratio_delta_ci,
    which assumes iid rows; the group jackknife only assumes
    independent GROUPS). Leave-one-out totals come free from the
    group totals: theta_(g) = (S - s_g)/(Q - q_g), so no second data
    pass exists.

    Exactness: s_g/q_g are exact integer sums (DECIMAL(38,0) vs
    HUGEINT); each theta_(g) is one double division rounded at 8; the
    mean and squared-deviation sums fold in nation order over the
    25-element list (the agg_entropy_by_group discipline).

    Scale shape: one broadcast join of the 100-row supplier dim onto
    the fact scan, ONE partial-agg shuffle to 25 group rows, then
    constant-size arithmetic. At 100 TB the cost is the scan."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_quantity"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    d38 = "decimal(38,0)"
    grp = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .groupBy(F.col("s_nationkey").cast("long").alias("g"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast(d38)).alias("sg"),
            F.sum(F.col("l_quantity").cast(d38)).alias("qg"),
        )
    )
    tot = grp.agg(
        F.sum("sg").alias("s"),
        F.sum("qg").alias("q"),
        F.count(F.lit(1)).cast("long").alias("gg"),
    )
    loo = grp.crossJoin(F.broadcast(tot)).select(
        "g",
        "s",
        "q",
        "gg",
        F.round(
            (F.col("s") - F.col("sg")).cast("double")
            / (F.col("q") - F.col("qg")).cast("double"),
            8,
        ).alias("theta_g"),
    )
    arr = F.array_sort(F.collect_list(F.struct(F.col("g"), F.col("theta_g").alias("t"))))
    agg = loo.groupBy("s", "q", "gg").agg(arr.alias("thetas"))
    ts = F.transform(F.col("thetas"), lambda s: s["t"])
    mean_loo = F.aggregate(ts, F.lit(0.0), lambda a, x: a + x) / F.col("gg").cast(
        "double"
    )
    dev2 = F.aggregate(
        F.transform(ts, lambda t: (t - F.col("m")) * (t - F.col("m"))),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    ggd = F.col("gg").cast("double")
    return (
        agg.withColumn("m", mean_loo)
        .select(
            F.col("gg").alias("n_groups"),
            F.round(F.col("s").cast("double") / F.col("q").cast("double"), 6).alias(
                "theta_hat"
            ),
            F.round(F.sqrt((ggd - F.lit(1.0)) / ggd * dev2), 6).alias("jack_se"),
        )
    )


@query(
    "stats_wilcoxon_signed_rank",
    oracle="""
    WITH pair AS (
      SELECT l_suppkey AS s,
             CAST(SUM(CASE WHEN MONTH(CAST(l_shipdate AS DATE)) <= 6
                      THEN CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                      ELSE 0 END) AS BIGINT)
             - CAST(SUM(CASE WHEN MONTH(CAST(l_shipdate AS DATE)) > 6
                        THEN CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS d
      FROM lineitem GROUP BY 1
    ), nz AS (
      SELECT s, d, ABS(d) AS ad FROM pair WHERE d <> 0
    ), vc AS (
      SELECT ad, CAST(COUNT(*) AS BIGINT) AS c FROM nz GROUP BY 1
    ), vr AS (
      SELECT ad,
             2 * (SUM(c) OVER (ORDER BY ad ROWS UNBOUNDED PRECEDING) - c)
               + c + 1 AS r2,
             c
      FROM vc
    ), sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN nz.d > 0 THEN CAST(vr.r2 AS HUGEINT)
                      ELSE CAST(0 AS HUGEINT) END) AS BIGINT) AS w2,
             (SELECT CAST(SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)
                               * CAST(c AS HUGEINT)
                           - CAST(c AS HUGEINT)) AS BIGINT) FROM vc) AS t3
      FROM nz JOIN vr ON nz.ad = vr.ad
    )
    SELECT n AS n_pairs,
           ROUND(CAST(w2 AS DOUBLE) / 2.0, 1) AS w_plus,
           ROUND((CAST(w2 AS DOUBLE) / 2.0
                  - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0)
                 / SQRT(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
                        * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
                        - CAST(t3 AS DOUBLE) / 48.0), 6) AS z_stat
    FROM sums
    """,
    tags=("statistics", "rank", "paired"),
)
def stats_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on PAIRED per-supplier revenue
    (first-half vs second-half months of the year) — the paired
    companion of stats_mann_whitney_u (which compares two independent
    samples; the signed-rank test asks whether a within-unit
    before/after shift is symmetric around zero), i.e. the
    nonparametric A/A' check an experimentation pipeline runs on
    matched units.

    Zero differences drop (standard practice); |d| gets tie-averaged
    ranks via the DOUBLED integral mid-rank machinery
    (stats_spearman_rank's value-grain running count — no per-row
    rank window), W+ sums the doubled ranks of positive differences
    as exact integers, and the normal approximation applies the
    standard tie-corrected variance n(n+1)(2n+1)/24 - sum(t^3-t)/48.

    Scale shape: one fact scan to supplier-grain pairs (partial-agg),
    one value-grain count relation whose running count rides
    with_global_cumsum (range-partitioned two-pass), a rank-map join
    back, and a single-row reduce — the spearman profile."""
    from serverless_datalake_spark.operators.ranking import with_global_cumsum

    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    half1 = F.when(F.month(F.col("l_shipdate").cast("date")) <= 6, cents).otherwise(
        F.lit(0)
    )
    half2 = F.when(F.month(F.col("l_shipdate").cast("date")) > 6, cents).otherwise(
        F.lit(0)
    )
    pair = li.groupBy(F.col("l_suppkey").alias("s")).agg(
        (F.sum(half1) - F.sum(half2)).cast("long").alias("d")
    )
    nz = pair.where(F.col("d") != 0).select("s", "d", F.abs(F.col("d")).alias("ad"))
    nz = nz.transform(_pin)  # feeds the value-grain counts AND the rank join
    vc = nz.groupBy("ad").agg(F.count(F.lit(1)).alias("c"))
    vr = with_global_cumsum(vc, [F.col("ad")], "c", out="cum").select(
        "ad",
        (2 * (F.col("cum") - F.col("c")) + F.col("c") + 1).cast("long").alias("r2"),
        "c",
    )
    vr = vr.transform(_pin)  # feeds the rank join AND the tie-term rollup
    d38 = "decimal(38,0)"
    t3 = vr.agg(
        F.sum(
            F.col("c").cast(d38) * F.col("c").cast(d38) * F.col("c").cast(d38)
            - F.col("c").cast(d38)
        )
        .cast("long")
        .alias("t3")
    )
    sums = (
        nz.join(vr.select("ad", "r2"), "ad")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.col("d") > 0, F.col("r2").cast(d38)).otherwise(
                    F.lit(0).cast(d38)
                )
            )
            .cast("long")
            .alias("w2"),
        )
        .crossJoin(F.broadcast(t3))
    )
    nD = F.col("n").cast("double")
    wp = F.col("w2").cast("double") / F.lit(2.0)
    var = nD * (nD + 1.0) * (2.0 * nD + 1.0) / F.lit(24.0) - F.col("t3").cast(
        "double"
    ) / F.lit(48.0)
    return sums.select(
        F.col("n").alias("n_pairs"),
        F.round(wp, 1).alias("w_plus"),
        F.round((wp - nD * (nD + 1.0) / F.lit(4.0)) / F.sqrt(var), 6).alias("z_stat"),
    )


@query(
    "stats_binom_wilson_ci",
    oracle="""
    WITH agg AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS s
      FROM events GROUP BY 1
    )
    SELECT event_type, n, s,
           ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_hat,
           ROUND(((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                   + 3.8416 / (2.0 * CAST(n AS DOUBLE)))
                  - 1.96 * SQRT((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                                * (1.0 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                                / CAST(n AS DOUBLE)
                                + 3.8416 / (4.0 * CAST(n AS DOUBLE)
                                            * CAST(n AS DOUBLE))))
                 / (1.0 + 3.8416 / CAST(n AS DOUBLE)), 6) AS wilson_lo,
           ROUND(((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                   + 3.8416 / (2.0 * CAST(n AS DOUBLE)))
                  + 1.96 * SQRT((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                                * (1.0 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                                / CAST(n AS DOUBLE)
                                + 3.8416 / (4.0 * CAST(n AS DOUBLE)
                                            * CAST(n AS DOUBLE))))
                 / (1.0 + 3.8416 / CAST(n AS DOUBLE)), 6) AS wilson_hi
    FROM agg
    """,
    tags=("statistics", "binomial", "confidence-interval"),
)
def stats_binom_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% confidence interval for each event type's
    high-value share — the binomial CI that stays inside [0, 1] and
    behaves at small n / extreme p, which is why pass-rate and
    win-rate dashboards should publish it instead of the Wald
    interval (the companion of stats_ratio_delta_ci, which handles
    RATIO-of-continuous metrics). z = 1.96 and z^2 = 3.8416 are
    spelled as exact literals on both sides (never computed as
    1.96*1.96 on one side only — the _DAMP lesson).

    Exactness: n and s are exact integer aggregates; both engines
    evaluate one identical double expression per group.

    Scale shape: one scan, one partial-agg shuffle to 5 type rows,
    constant-size arithmetic — the cheapest family shape."""
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("value") > 100, 1).otherwise(0)).cast("long").alias("s"),
    )
    nD = F.col("n").cast("double")
    p = F.col("s").cast("double") / nD
    z2 = F.lit(3.8416)
    center = p + z2 / (F.lit(2.0) * nD)
    half = F.lit(1.96) * F.sqrt(
        p * (F.lit(1.0) - p) / nD + z2 / (F.lit(4.0) * nD * nD)
    )
    denom = F.lit(1.0) + z2 / nD
    return agg.select(
        "event_type",
        "n",
        "s",
        F.round(p, 6).alias("p_hat"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    )


@query(
    "stats_cmh_pooled_odds",
    oracle="""
    WITH cells AS (
      SELECT CAST(c_nationkey AS BIGINT) AS k,
             CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END AS exp,
             CASE WHEN c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
                  THEN 1 ELSE 0 END AS outc,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM customer GROUP BY 1, 2, 3
    ), strata AS (
      SELECT k,
             CAST(SUM(CASE WHEN exp = 1 AND outc = 1 THEN c ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(SUM(CASE WHEN exp = 1 AND outc = 0 THEN c ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(SUM(CASE WHEN exp = 0 AND outc = 1 THEN c ELSE 0 END)
                  AS BIGINT) AS cc,
             CAST(SUM(CASE WHEN exp = 0 AND outc = 0 THEN c ELSE 0 END)
                  AS BIGINT) AS d,
             CAST(SUM(c) AS BIGINT) AS n
      FROM cells GROUP BY 1
    ), terms AS (
      SELECT k,
             ROUND(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                   / CAST(n AS DOUBLE), 8) AS rterm,
             ROUND(CAST(b AS DOUBLE) * CAST(cc AS DOUBLE)
                   / CAST(n AS DOUBLE), 8) AS sterm,
             ROUND(CAST(a AS DOUBLE)
                   - CAST(a + b AS DOUBLE) * CAST(a + cc AS DOUBLE)
                     / CAST(n AS DOUBLE), 8) AS dev,
             ROUND(CAST(a + b AS DOUBLE) * CAST(cc + d AS DOUBLE)
                   * CAST(a + cc AS DOUBLE) * CAST(b + d AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                      * (CAST(n AS DOUBLE) - 1.0)), 8) AS var
      FROM strata WHERE n > 1
    ), folds AS (
      SELECT list_aggregate(list(rterm ORDER BY k), 'sum') AS r,
             list_aggregate(list(sterm ORDER BY k), 'sum') AS s,
             list_aggregate(list(dev ORDER BY k), 'sum') AS devs,
             list_aggregate(list(var ORDER BY k), 'sum') AS vars,
             CAST(COUNT(*) AS BIGINT) AS n_strata
      FROM terms
    )
    SELECT n_strata,
           ROUND(r / s, 6) AS or_mh,
           ROUND(devs * devs / vars, 6) AS cmh_chi2
    FROM folds
    """,
    tags=("statistics", "stratified", "odds-ratio"),
)
def stats_cmh_pooled_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel pooled odds ratio + chi-square across
    the 25 nation strata (exposure = high balance, outcome = premium
    segment) — the stratified 2x2 analysis that controls a
    confounder BEFORE pooling, i.e. the Simpson's-paradox-proof twin
    of stats_chi_square (which pools first and can reverse sign).
    OR_MH = Sum(a_k d_k/n_k) / Sum(b_k c_k/n_k); the CMH statistic is
    (Sum a_k - Sum E[a_k])^2 / Sum Var[a_k] with the hypergeometric
    variance per stratum.

    Exactness: strata cells are exact integer aggregates; per-stratum
    terms round at 8 and fold in nation order (the
    agg_entropy_by_group discipline — 25 domain-bounded terms).

    Scale shape: one scan, ONE partial-agg shuffle to <=100 (k, exp,
    outc) cells, stratum rollup, constant-size fold. Scan-bound at
    100 TB."""
    cust = load_table(spark, sf_dir, "customer")
    cells = cust.groupBy(
        F.col("c_nationkey").cast("long").alias("k"),
        F.when(F.col("c_acctbal") > 5000, 1).otherwise(0).alias("exp"),
        F.when(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"), 1)
        .otherwise(0)
        .alias("outc"),
    ).agg(F.count(F.lit(1)).alias("c"))

    def cell(e, o):
        return F.sum(
            F.when((F.col("exp") == e) & (F.col("outc") == o), F.col("c")).otherwise(
                F.lit(0)
            )
        ).cast("long")

    strata = cells.groupBy("k").agg(
        cell(1, 1).alias("a"),
        cell(1, 0).alias("b"),
        cell(0, 1).alias("cc"),
        cell(0, 0).alias("d"),
        F.sum("c").cast("long").alias("n"),
    ).where(F.col("n") > 1)
    aD, bD = F.col("a").cast("double"), F.col("b").cast("double")
    cD, dD = F.col("cc").cast("double"), F.col("d").cast("double")
    nD = F.col("n").cast("double")
    terms = strata.select(
        "k",
        F.round(aD * dD / nD, 8).alias("rterm"),
        F.round(bD * cD / nD, 8).alias("sterm"),
        F.round(aD - (aD + bD) * (aD + cD) / nD, 8).alias("dev"),
        F.round(
            (aD + bD) * (cD + dD) * (aD + cD) * (bD + dD)
            / (nD * nD * (nD - F.lit(1.0))),
            8,
        ).alias("var"),
    )

    def fold(col):
        arr = F.array_sort(F.collect_list(F.struct(F.col("k"), F.col(col).alias("e"))))
        return F.aggregate(
            F.transform(arr, lambda s: s["e"]), F.lit(0.0), lambda a, e: a + e
        )

    folds = terms.agg(
        fold("rterm").alias("r"),
        fold("sterm").alias("s"),
        fold("dev").alias("devs"),
        fold("var").alias("vars"),
        F.count(F.lit(1)).cast("long").alias("n_strata"),
    )
    return folds.select(
        "n_strata",
        F.round(F.col("r") / F.col("s"), 6).alias("or_mh"),
        F.round(F.col("devs") * F.col("devs") / F.col("vars"), 6).alias("cmh_chi2"),
    )


@query(
    "stats_hedges_g",
    oracle="""
    WITH units AS (
      SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS x
      FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ), suff AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS s,
             CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT)
               AS ss
      FROM units GROUP BY 1
    ), wide AS (
      SELECT
        (SELECT n FROM suff WHERE grp = 'R') AS n1,
        (SELECT CAST(s AS DOUBLE) FROM suff WHERE grp = 'R') AS s1,
        (SELECT CAST(ss AS DOUBLE) FROM suff WHERE grp = 'R') AS ss1,
        (SELECT n FROM suff WHERE grp = 'N') AS n2,
        (SELECT CAST(s AS DOUBLE) FROM suff WHERE grp = 'N') AS s2,
        (SELECT CAST(ss AS DOUBLE) FROM suff WHERE grp = 'N') AS ss2
    )
    SELECT CAST(n1 AS BIGINT) AS n_r, CAST(n2 AS BIGINT) AS n_n,
           ROUND((s1 / CAST(n1 AS DOUBLE) - s2 / CAST(n2 AS DOUBLE))
                 / SQRT(((ss1 - s1 * s1 / CAST(n1 AS DOUBLE))
                         + (ss2 - s2 * s2 / CAST(n2 AS DOUBLE)))
                        / CAST(n1 + n2 - 2 AS DOUBLE)), 6) AS cohens_d,
           ROUND((s1 / CAST(n1 AS DOUBLE) - s2 / CAST(n2 AS DOUBLE))
                 / SQRT(((ss1 - s1 * s1 / CAST(n1 AS DOUBLE))
                         + (ss2 - s2 * s2 / CAST(n2 AS DOUBLE)))
                        / CAST(n1 + n2 - 2 AS DOUBLE))
                 * (1.0 - 3.0 / (4.0 * CAST(n1 + n2 AS DOUBLE) - 9.0)), 6)
             AS hedges_g
    FROM wide
    """,
    tags=("statistics", "effect-size"),
)
def stats_hedges_g(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d and its small-sample-corrected twin Hedges' g for
    the returned-vs-not quantity gap — the EFFECT SIZE companion of
    stats_welch_tstat: a t-statistic says whether a difference is
    detectable, d/g say whether it is big enough to matter, which is
    the number an experiment review actually argues about. Pooled-SD
    d with the J = 1 - 3/(4N - 9) correction factor.

    Exactness: quantity is integer-valued, so n, Sum x, Sum x^2 are
    exact integer aggregates per group (DECIMAL(38,0) vs HUGEINT);
    both engines then evaluate one identical double expression — the
    statistics.py sufficient-statistics discipline.

    Scale shape: one scan, one partial-agg shuffle to 2 group rows,
    constant arithmetic. Scan-bound at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("R", "N")
    )
    d38 = "decimal(38,0)"
    x = F.col("l_quantity").cast(d38)
    suff = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("s"),
        F.sum(x * x).alias("ss"),
    )
    # ONE conditional-aggregation pivot, not two filtered branches
    # crossJoined: a branch pivot returns 0 rows when either group is
    # empty while the oracle's scalar subqueries always return one
    # (NULL-filled) row — the round-9 review's degenerate-shape
    # finding. This shape is always exactly 1 row, and needs no pin
    # (single consumer).
    def side(g, col, cast=None):
        v = F.max(F.when(F.col("grp") == g, F.col(col)))
        return v.cast(cast) if cast else v

    wide = suff.agg(
        side("R", "n").alias("n1"),
        side("R", "s", "double").alias("s1"),
        side("R", "ss", "double").alias("ss1"),
        side("N", "n").alias("n2"),
        side("N", "s", "double").alias("s2"),
        side("N", "ss", "double").alias("ss2"),
    )
    n1D, n2D = F.col("n1").cast("double"), F.col("n2").cast("double")
    mean_diff = F.col("s1") / n1D - F.col("s2") / n2D
    pooled = F.sqrt(
        (
            (F.col("ss1") - F.col("s1") * F.col("s1") / n1D)
            + (F.col("ss2") - F.col("s2") * F.col("s2") / n2D)
        )
        / (F.col("n1") + F.col("n2") - 2).cast("double")
    )
    d_val = mean_diff / pooled
    j = F.lit(1.0) - F.lit(3.0) / (
        F.lit(4.0) * (F.col("n1") + F.col("n2")).cast("double") - F.lit(9.0)
    )
    return wide.select(
        F.col("n1").alias("n_r"),
        F.col("n2").alias("n_n"),
        F.round(d_val, 6).alias("cohens_d"),
        F.round(d_val * j, 6).alias("hedges_g"),
    )


_FRIEDMAN_CHI2 = """12.0 * srr
                 / (CAST(n_blocks AS DOUBLE) * CAST(k AS DOUBLE)
                    * CAST(k + 1 AS DOUBLE))
                 - 3.0 * CAST(n_blocks AS DOUBLE) * CAST(k + 1 AS DOUBLE)"""


def _block_rank_sums(spark: SparkSession, sf_dir: str):
    """(rsums, nb, kdf): the blocked-design rank machinery shared by
    stats_friedman_test (omnibus) and stats_page_trend (ordered
    alternative) — (nation, priority) exact cent-sum cells (pinned:
    k derivation, completeness filter, and ranking all branch off
    it), complete blocks only, within-block row_number ranks (value
    desc, treatment tie-break), per-treatment rank sums. The Python
    twin of _BLOCK_RANK_CTES; one fact scan, everything downstream
    block/treatment-grain."""
    ords = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    d38 = "decimal(38,0)"
    cells = (
        ords.join(
            cust.select("c_custkey", "c_nationkey"),
            ords["o_custkey"] == cust["c_custkey"],
        )
        .groupBy(
            F.col("c_nationkey").cast("long").alias("g"),
            F.col("o_orderpriority").alias("t"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast(d38)).alias("v")
        )
        .transform(_pin)  # k derivation + block filter + ranking branch here
    )
    kdf = cells.agg(F.countDistinct("t").cast("long").alias("k"))
    ok = (
        cells.groupBy("g")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .crossJoin(F.broadcast(kdf))
        .where(F.col("c") == F.col("k"))
        .select("g")
    )
    rnk = F.row_number().over(
        Window.partitionBy("g").orderBy(F.col("v").desc(), "t")
    )
    ranked = cells.join(ok, "g").select("t", rnk.cast("long").alias("r"))
    rsums = ranked.groupBy("t").agg(F.sum("r").cast("long").alias("rs"))
    nb = ok.agg(F.count(F.lit(1)).cast("long").alias("n_blocks"))
    return rsums, nb, kdf


# cells -> complete blocks -> within-block ranks -> per-treatment rank
# sums: the blocked-design rank machinery shared by stats_friedman_test
# (omnibus) and stats_page_trend (ordered alternative).
_BLOCK_RANK_CTES = """cells AS (
      SELECT CAST(c.c_nationkey AS BIGINT) AS g, o.o_orderpriority AS t,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
                  AS HUGEINT) AS v
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), kk AS (
      SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS k FROM cells
    ), ok AS (
      SELECT g FROM cells GROUP BY g HAVING COUNT(*) = (SELECT k FROM kk)
    ), ranked AS (
      SELECT c2.t,
             CAST(ROW_NUMBER() OVER (PARTITION BY c2.g
                                     ORDER BY c2.v DESC, c2.t) AS BIGINT) AS r
      FROM cells c2 JOIN ok ON c2.g = ok.g
    ), rsums AS (
      SELECT t, CAST(SUM(r) AS BIGINT) AS rs FROM ranked GROUP BY 1
    )"""


@query(
    "stats_friedman_test",
    oracle=f"""
    WITH {_BLOCK_RANK_CTES}, agg AS (
      SELECT CAST((SELECT COUNT(*) FROM ok) AS BIGINT) AS n_blocks,
             (SELECT k FROM kk) AS k,
             CAST(SUM(CAST(rs AS HUGEINT) * CAST(rs AS HUGEINT)) AS DOUBLE)
               AS srr,
             (SELECT t FROM rsums ORDER BY rs, t LIMIT 1) AS top_t
      FROM rsums
    )
    SELECT n_blocks, k AS k_treatments, k - 1 AS dof,
           ROUND({_FRIEDMAN_CHI2}, 6) AS chi2_f,
           CAST(CASE WHEN {_FRIEDMAN_CHI2} > {_CHI2_CRIT} THEN 1 ELSE 0 END
                AS BIGINT) AS reject_05,
           top_t AS top_treatment
    FROM agg
    """,
    tags=("stats", "rank-test", "friedman", "blocked-design"),
)
def stats_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman chi-square over the blocked design (blocks = the 25
    customer nations, treatments = the 5 order priorities, response =
    total order value per cell) — the REPEATED-MEASURES member of the
    rank-test family: stats_kruskal_wallis compares independent
    groups, Friedman compares k treatments measured on the SAME
    blocks, which is exactly the shape of "k model variants scored on
    the same eval tasks". chi2_F = 12/(n.k.(k+1)) . Sum R_j^2 -
    3.n.(k+1), dof k-1; blocks missing any treatment are excluded
    (the complete-design requirement), and the block count is
    reported so the exclusion is visible.

    Exactness: cell values are exact HUGEINT/DECIMAL(38,0) cent sums,
    so the within-block row_number ranking (value desc, priority
    tie-break) is a deterministic permutation in both engines; rank
    sums R_j and Sum R_j^2 are exact integer aggregates; the final
    statistic is ONE identical double expression (the
    stats_kruskal_wallis discipline, minus the tie machinery —
    row_number permutations have no ties by construction, matching
    eval_kendall_w).

    Scale shape: the orders scan joins the customer dim on its key
    (co-keyed hash join; AQE may broadcast the dim at small SF) and
    collapses to a <= 125-row (nation, priority) cell relation in one
    partial-agg shuffle. The cell relation is pinned — three
    consumers branch off it (k derivation, complete-block filter,
    ranking) and an unpinned plan re-scanned the fact table per
    branch. Ranking runs PARTITIONED by block. Scan-bound at
    100 TB."""
    rsums, nb, kdf = _block_rank_sums(spark, sf_dir)
    d38 = "decimal(38,0)"
    agg = (
        rsums.agg(
            F.sum(F.col("rs").cast(d38) * F.col("rs").cast(d38))
            .cast("double")
            .alias("srr"),
            F.min(F.struct("rs", "t")).getField("t").alias("top_t"),
        )
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(kdf))
    )
    nbD = F.col("n_blocks").cast("double")
    kD = F.col("k").cast("double")
    chi2 = (
        F.lit(12.0) * F.col("srr") / (nbD * kD * (F.col("k") + 1).cast("double"))
        - F.lit(3.0) * nbD * (F.col("k") + 1).cast("double")
    )
    crit = (
        F.when(F.col("k") - 1 == 1, 3.841)
        .when(F.col("k") - 1 == 2, 5.991)
        .when(F.col("k") - 1 == 3, 7.815)
        .when(F.col("k") - 1 == 4, 9.488)
        .otherwise(F.lit(1e308))
    )
    return agg.select(
        "n_blocks",
        F.col("k").alias("k_treatments"),
        (F.col("k") - 1).cast("long").alias("dof"),
        F.round(chi2, 6).alias("chi2_f"),
        F.when(chi2 > crit, 1).otherwise(0).cast("long").alias("reject_05"),
        F.col("top_t").alias("top_treatment"),
    )


_COCHRAN_Q = """CAST(k * (k - 1) AS DOUBLE) * ssc
                 / (CAST(k AS DOUBLE) * sr - srr2)"""


@query(
    "stats_cochran_q",
    oracle=f"""
    WITH cellsum AS (
      SELECT CAST(c.c_nationkey AS BIGINT) AS g, o.o_orderpriority AS t,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
                  AS HUGEINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), blocksum AS (
      SELECT g, CAST(SUM(s) AS HUGEINT) AS bs, CAST(SUM(n) AS BIGINT) AS bn
      FROM cellsum GROUP BY 1
    ), cells AS (
      SELECT cellsum.g, cellsum.t,
             CAST(CASE WHEN cellsum.s * CAST(blocksum.bn AS HUGEINT)
                            > blocksum.bs * CAST(cellsum.n AS HUGEINT)
                       THEN 1 ELSE 0 END AS BIGINT) AS b
      FROM cellsum JOIN blocksum ON cellsum.g = blocksum.g
    ), kk AS (
      SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS k FROM cells
    ), ok AS (
      SELECT g FROM cells GROUP BY g HAVING COUNT(*) = (SELECT k FROM kk)
    ), kept AS (
      SELECT cells.g, cells.t, cells.b FROM cells JOIN ok ON cells.g = ok.g
    ), rows_ AS (
      SELECT g, CAST(SUM(b) AS BIGINT) AS r FROM kept GROUP BY 1
    ), rowagg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
             CAST(COALESCE(SUM(r), 0) AS BIGINT) AS nn,
             CAST(COALESCE(SUM(r), 0) AS DOUBLE) AS sr,
             CAST(COALESCE(SUM(CAST(r AS HUGEINT) * CAST(r AS HUGEINT)), 0)
                  AS DOUBLE) AS srr2
      FROM rows_
    ), cols AS (
      SELECT t, CAST(SUM(b) AS BIGINT) AS cj FROM kept GROUP BY 1
    ), colagg AS (
      SELECT CAST(SUM((CAST(k AS HUGEINT) * CAST(cj AS HUGEINT)
                       - CAST(nn AS HUGEINT))
                      * (CAST(k AS HUGEINT) * CAST(cj AS HUGEINT)
                         - CAST(nn AS HUGEINT))) AS DOUBLE)
               / (CAST(MAX(k) AS DOUBLE) * CAST(MAX(k) AS DOUBLE)) AS ssc
      FROM cols CROSS JOIN kk CROSS JOIN rowagg
    )
    SELECT n_blocks, k AS k_treatments, k - 1 AS dof, nn AS n_successes,
           ROUND({_COCHRAN_Q}, 6) AS q_stat,
           CAST(CASE WHEN {_COCHRAN_Q} > {_CHI2_CRIT} THEN 1 ELSE 0 END
                AS BIGINT) AS reject_05
    FROM rowagg CROSS JOIN kk CROSS JOIN colagg
    """,
    tags=("stats", "rank-test", "cochran-q", "blocked-design"),
)
def stats_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q over the blocked binary design (blocks = customer
    nations, treatments = order priorities, response = whether the
    cell's average order value beats its block's average — a
    within-block comparison, so the response has variance at every
    scale factor where values differ at all) — the k-treatment
    generalization of eval_mcnemar_paired exactly as
    stats_friedman_test generalizes the paired rank test: k binary
    raters/checks evaluated on the SAME blocks ("did guardrail j fire
    on task i"). Q = k(k-1) . Sum_j (C_j - N/k)^2 / (k.Sum R_i -
    Sum R_i^2), dof k-1; incomplete blocks are excluded and the kept
    block count reported.

    Exactness: the binary response is an INTEGER cross-multiplication
    (cell_sum . block_n > block_sum . cell_n in exact cents — no
    double averages, no threshold ulp); row/column totals and both
    quadratic sums are exact integer aggregates
    (HUGEINT / DECIMAL(38,0)); Sum (C_j - N/k)^2 is computed as
    Sum (k.C_j - N)^2 / k^2 so the deviation stays integral whatever
    N mod k is; the final statistic is ONE identical double
    expression, guarded by try_divide so the degenerate denominator
    (every block all-0 or all-1) yields NULL in BOTH engines (DuckDB
    returns NULL on any zero divisor; Spark ANSI mode would throw).

    Scale shape: identical to stats_friedman_test — one fact scan,
    co-keyed dim join, <= 125-row pinned cell relation (consumers: k
    derivation, completeness filter, row sums, column sums), then
    block-grain and treatment-grain aggregates of a 25/5-row
    relation. Scan-bound at 100 TB."""
    ords = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    d38 = "decimal(38,0)"
    cellsum = (
        ords.join(
            cust.select("c_custkey", "c_nationkey"),
            ords["o_custkey"] == cust["c_custkey"],
        )
        .groupBy(
            F.col("c_nationkey").cast("long").alias("g"),
            F.col("o_orderpriority").alias("t"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast(d38)).alias(
                "s"
            ),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .transform(_pin)  # block rollup + cells join both read this
    )
    blocksum = cellsum.groupBy("g").agg(
        F.sum("s").alias("bs"), F.sum("n").cast("long").alias("bn")
    )
    cells = (
        cellsum.join(
            blocksum.select(F.col("g").alias("g2"), "bs", "bn"),
            F.col("g") == F.col("g2"),
        )
        .select(
            "g",
            "t",
            F.when(
                F.col("s") * F.col("bn").cast(d38)
                > F.col("bs") * F.col("n").cast(d38),
                1,
            )
            .otherwise(0)
            .cast("long")
            .alias("b"),
        )
        .transform(_pin)  # k + completeness + row sums + col sums branch here
    )
    kdf = cells.agg(F.countDistinct("t").cast("long").alias("k"))
    ok = (
        cells.groupBy("g")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .crossJoin(F.broadcast(kdf))
        .where(F.col("c") == F.col("k"))
        .select("g")
    )
    kept = cells.join(ok, "g").select("g", "t", "b")
    rows_ = kept.groupBy("g").agg(F.sum("b").cast("long").alias("r"))
    rowagg = rows_.agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("nn"),
        F.coalesce(F.sum("r"), F.lit(0)).cast("double").alias("sr"),
        F.coalesce(
            F.sum(F.col("r").cast(d38) * F.col("r").cast(d38)), F.lit(0)
        )
        .cast("double")
        .alias("srr2"),
    )
    cols = kept.groupBy("t").agg(F.sum("b").cast("long").alias("cj"))
    dev = F.col("k").cast(d38) * F.col("cj").cast(d38) - F.col("nn").cast(d38)
    colagg = (
        cols.crossJoin(F.broadcast(kdf))
        .crossJoin(F.broadcast(rowagg))
        .agg(
            (
                F.sum(dev * dev).cast("double")
                / (F.max(F.col("k")).cast("double") * F.max(F.col("k")).cast("double"))
            ).alias("ssc")
        )
    )
    agg = (
        rowagg.crossJoin(F.broadcast(kdf)).crossJoin(F.broadcast(colagg))
    )
    kD = F.col("k").cast("double")
    q = F.try_divide(
        (F.col("k") * (F.col("k") - 1)).cast("double") * F.col("ssc"),
        kD * F.col("sr") - F.col("srr2"),
    )
    crit = (
        F.when(F.col("k") - 1 == 1, 3.841)
        .when(F.col("k") - 1 == 2, 5.991)
        .when(F.col("k") - 1 == 3, 7.815)
        .when(F.col("k") - 1 == 4, 9.488)
        .otherwise(F.lit(1e308))
    )
    return agg.select(
        "n_blocks",
        F.col("k").alias("k_treatments"),
        (F.col("k") - 1).cast("long").alias("dof"),
        F.col("nn").alias("n_successes"),
        F.round(q, 6).alias("q_stat"),
        F.when(q > crit, 1).otherwise(0).cast("long").alias("reject_05"),
    )


_PAGE_NUM = """CAST(l_stat AS DOUBLE)
                 - CAST(n_blocks AS DOUBLE) * CAST(k AS DOUBLE)
                   * CAST(k + 1 AS DOUBLE) * CAST(k + 1 AS DOUBLE) / 4.0"""
_PAGE_DEN = """SQRT(CAST(n_blocks AS DOUBLE) * CAST(k AS DOUBLE)
                    * CAST(k AS DOUBLE) * CAST(k + 1 AS DOUBLE)
                    * CAST(k + 1 AS DOUBLE)
                    * (CAST(k AS DOUBLE) - 1.0) / 144.0)"""


@query(
    "stats_page_trend",
    oracle=f"""
    WITH {_BLOCK_RANK_CTES}, jd AS (
      SELECT t, rs, CAST(ROW_NUMBER() OVER (ORDER BY t) AS BIGINT) AS j
      FROM rsums
    ), pagg AS (
      SELECT CAST((SELECT COUNT(*) FROM ok) AS BIGINT) AS n_blocks,
             (SELECT k FROM kk) AS k,
             CAST(COALESCE(SUM(CAST(j AS HUGEINT) * CAST(rs AS HUGEINT)), 0)
                  AS BIGINT) AS l_stat
      FROM jd
    )
    SELECT n_blocks, k AS k_treatments, l_stat,
           ROUND(({_PAGE_NUM}) / ({_PAGE_DEN}), 6) AS z_stat,
           CAST(CASE WHEN ({_PAGE_NUM}) / ({_PAGE_DEN}) > 1.645
                     THEN 1 ELSE 0 END AS BIGINT) AS reject_05
    FROM pagg
    """,
    tags=("stats", "rank-test", "page-trend", "blocked-design"),
)
def stats_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L trend test over the same blocked design as
    stats_friedman_test — the ORDERED-alternative member of the
    blocked-rank family: Friedman asks "does ANY priority differ",
    Page asks "do the treatments trend MONOTONICALLY along their
    natural order" (priorities 1-URGENT..5-LOW are ordered; the LLM
    shape is "do model checkpoints improve monotonically on shared
    eval tasks"). L = Sum_j j . R_j with j the treatment's position
    in name order; z = (L - n.k.(k+1)^2/4) /
    sqrt(n.k^2.(k+1)^2.(k-1)/144), one-sided 5% rejection at 1.645.
    Positive z means rank numbers GROW along the priority order,
    i.e. cell value decreases with declining urgency.

    Exactness: L is an exact integer (HUGEINT/DECIMAL(38,0) product
    sum of the integral rank sums from the shared _block_rank_sums
    machinery); the treatment index j is a row_number over the
    name-sorted k-row treatment relation — deterministic in both
    engines; z is ONE identical double expression, guarded by
    try_divide so the empty-design denominator yields NULL in both
    engines (the stats_cochran_q discipline).

    Scale shape: identical to stats_friedman_test — one fact scan to
    the pinned <= 125-row cell relation, partitioned block ranking;
    the only unpartitioned window orders the <= 5-row TREATMENT
    relation (domain-bounded, allowlisted). Scan-bound at 100 TB."""
    rsums, nb, kdf = _block_rank_sums(spark, sf_dir)
    d38 = "decimal(38,0)"
    jd = rsums.select(
        "t",
        "rs",
        F.row_number().over(Window.orderBy("t")).cast("long").alias("j"),
    )
    pagg = (
        jd.agg(
            F.coalesce(
                F.sum(F.col("j").cast(d38) * F.col("rs").cast(d38)), F.lit(0)
            )
            .cast("long")
            .alias("l_stat")
        )
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(kdf))
    )
    nD = F.col("n_blocks").cast("double")
    kD = F.col("k").cast("double")
    kp1 = (F.col("k") + 1).cast("double")
    num = F.col("l_stat").cast("double") - nD * kD * kp1 * kp1 / F.lit(4.0)
    den = F.sqrt(
        nD * kD * kD * kp1 * kp1 * (kD - F.lit(1.0)) / F.lit(144.0)
    )
    z = F.try_divide(num, den)
    return pagg.select(
        "n_blocks",
        F.col("k").alias("k_treatments"),
        "l_stat",
        F.round(z, 6).alias("z_stat"),
        F.when(z > 1.645, 1).otherwise(0).cast("long").alias("reject_05"),
    )


_BARTLETT_T = """(CAST(n - k AS DOUBLE)
                   * ROUND(LN((CAST(sq2 AS DOUBLE) / 1000000.0)
                              / CAST(n - k AS DOUBLE)) * 1000000.0, 0)
                   / 1000000.0
                 - CAST(sq1 AS DOUBLE) / 1000000.0)
                 / (1.0 + (CAST(sq3 AS DOUBLE) / 1000000000000.0
                           - 1.0 / CAST(n - k AS DOUBLE))
                          / (3.0 * (CAST(k AS DOUBLE) - 1.0)))"""


@query(
    "stats_bartlett",
    oracle=f"""
    WITH units AS (
      SELECT event_type AS grp,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS x
      FROM events
    ), per_group AS (
      SELECT grp,
             CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sgx,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS ssgx
      FROM units GROUP BY 1
      HAVING COUNT(*) >= 2
         AND CAST(COUNT(*) AS HUGEINT) * SUM(CAST(x AS HUGEINT) * x)
             > SUM(CAST(x AS HUGEINT)) * SUM(CAST(x AS HUGEINT))
    ), terms AS (
      SELECT ng,
             CAST(ROUND((CAST(ng AS DOUBLE) - 1.0)
                        * LN((CAST(ssgx AS DOUBLE)
                              - CAST(sgx AS DOUBLE) * CAST(sgx AS DOUBLE)
                                / CAST(ng AS DOUBLE))
                             / (CAST(ng AS DOUBLE) - 1.0))
                        * 1000000.0, 0) AS HUGEINT) AS q1,
             CAST(ROUND((CAST(ssgx AS DOUBLE)
                         - CAST(sgx AS DOUBLE) * CAST(sgx AS DOUBLE)
                           / CAST(ng AS DOUBLE))
                        * 1000000.0, 0) AS HUGEINT) AS q2,
             CAST(ROUND(1000000000000.0 / (CAST(ng AS DOUBLE) - 1.0), 0)
                  AS BIGINT) AS q3
      FROM per_group
    ), folded AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(COALESCE(SUM(ng), 0) AS BIGINT) AS n,
             CAST(COALESCE(SUM(q1), 0) AS HUGEINT) AS sq1,
             CAST(COALESCE(SUM(q2), 0) AS HUGEINT) AS sq2,
             CAST(COALESCE(SUM(q3), 0) AS BIGINT) AS sq3
      FROM terms
    )
    SELECT k AS k_groups, n, k - 1 AS dof,
           ROUND({_BARTLETT_T}, 6) AS t_stat,
           CAST(CASE WHEN {_BARTLETT_T} > {_CHI2_CRIT} THEN 1 ELSE 0 END
                AS BIGINT) AS reject_05
    FROM folded
    """,
    tags=("stats", "variance-test", "bartlett"),
)
def stats_bartlett(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test of variance homogeneity across the event-type
    cohorts — the PARAMETRIC companion of stats_levene_bf (Levene is
    robust to non-normality; Bartlett is the more powerful test when
    normality holds) and the assumption check stats_anova_oneway
    silently relies on: T = [(N-k).ln(sp^2) - Sum (n_i-1).ln(s_i^2)]
    / C with the usual correction C, rejected against chi-square(k-1)
    at 5%. Groups with fewer than 2 rows or zero variance are
    excluded by an EXACT integer guard (ng.Sum x^2 > (Sum x)^2 in
    HUGEINT/DECIMAL(38,0)) before any double arithmetic.

    Exactness: the ln terms are engine libm calls whose last ulp is
    not contractually identical across engines, so every per-group
    log/reciprocal term is QUANTIZED to an e6/e12 integer and summed
    exactly (the agg_theil_inequality discipline — order-independent,
    map-side combinable, no ordered fold needed); ln(sp^2) is
    quantized once at the end; the final statistic is ONE identical
    double expression over exact integers, with the empty-design
    divisions yielding NULL in both engines (DuckDB zero-divisor
    NULL / Spark try_divide).

    Scale shape: one scan, one partial-agg shuffle to the <= 5-row
    type-grain relation, constant arithmetic. Scan-bound at
    100 TB."""
    ev = load_table(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    units = ev.select(
        F.col("event_type").alias("grp"),
        F.round(F.col("value") * 100, 0).cast("long").alias("x"),
    )
    xd = F.col("x").cast(d38)
    per_group = (
        units.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("ng"),
            F.sum(xd).alias("sgx"),
            F.sum(xd * xd).alias("ssgx"),
        )
        .where(
            (F.col("ng") >= 2)
            & (
                F.col("ng").cast(d38) * F.col("ssgx")
                > F.col("sgx") * F.col("sgx")
            )
        )
    )
    ngD = F.col("ng").cast("double")
    s2 = (
        F.col("ssgx").cast("double")
        - F.col("sgx").cast("double") * F.col("sgx").cast("double") / ngD
    ) / (ngD - F.lit(1.0))
    ss_part = (
        F.col("ssgx").cast("double")
        - F.col("sgx").cast("double") * F.col("sgx").cast("double") / ngD
    )
    terms = per_group.select(
        "ng",
        F.round((ngD - F.lit(1.0)) * F.log(s2) * F.lit(1000000.0), 0)
        .cast(d38)
        .alias("q1"),
        F.round(ss_part * F.lit(1000000.0), 0).cast(d38).alias("q2"),
        F.round(F.lit(1000000000000.0) / (ngD - F.lit(1.0)), 0)
        .cast("long")
        .alias("q3"),
    )
    folded = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.coalesce(F.sum("ng"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.sum("q1"), F.lit(0).cast(d38)).alias("sq1"),
        F.coalesce(F.sum("q2"), F.lit(0).cast(d38)).alias("sq2"),
        F.coalesce(F.sum("q3"), F.lit(0)).cast("long").alias("sq3"),
    )
    nkD = (F.col("n") - F.col("k")).cast("double")
    kD = F.col("k").cast("double")
    sp2 = F.try_divide(
        F.col("sq2").cast("double") / F.lit(1000000.0), nkD
    )
    num = nkD * F.round(F.log(sp2) * F.lit(1000000.0), 0) / F.lit(
        1000000.0
    ) - F.col("sq1").cast("double") / F.lit(1000000.0)
    corr = F.lit(1.0) + F.try_divide(
        F.col("sq3").cast("double") / F.lit(1000000000000.0)
        - F.try_divide(F.lit(1.0), nkD),
        F.lit(3.0) * (kD - F.lit(1.0)),
    )
    t = F.try_divide(num, corr)
    crit = (
        F.when(F.col("k") - 1 == 1, 3.841)
        .when(F.col("k") - 1 == 2, 5.991)
        .when(F.col("k") - 1 == 3, 7.815)
        .when(F.col("k") - 1 == 4, 9.488)
        .otherwise(F.lit(1e308))
    )
    return folded.select(
        F.col("k").alias("k_groups"),
        "n",
        (F.col("k") - 1).cast("long").alias("dof"),
        F.round(t, 6).alias("t_stat"),
        F.when(t > crit, 1).otherwise(0).cast("long").alias("reject_05"),
    )


@query(
    "stats_icc_oneway",
    oracle="""
    WITH units AS (
      SELECT user_id AS g, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
      FROM events
    ), per_group AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sg,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS ssg
      FROM units GROUP BY 1
    ), gq AS (
      SELECT ng, sg, ssg,
             CAST(ROUND(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                        / CAST(ng AS DOUBLE) * 1000000.0, 0) AS HUGEINT) AS q
      FROM per_group
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(COALESCE(SUM(ng), 0) AS BIGINT) AS n,
             CAST(COALESCE(SUM(CAST(ng AS HUGEINT) * ng), 0) AS HUGEINT)
               AS sn2,
             CAST(COALESCE(SUM(q), 0) AS HUGEINT) AS sq,
             CAST(COALESCE(SUM(sg), 0) AS HUGEINT) AS gx,
             CAST(COALESCE(SUM(ssg), 0) AS HUGEINT) AS gxx
      FROM gq
    ), ms AS (
      SELECT k, n,
             (CAST(sq AS DOUBLE) / 1000000.0
              - CAST(gx AS DOUBLE) * CAST(gx AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(k AS DOUBLE) - 1.0) AS msb,
             (CAST(gxx AS DOUBLE) - CAST(sq AS DOUBLE) / 1000000.0)
             / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) AS msw,
             (CAST(n AS DOUBLE) - CAST(sn2 AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(k AS DOUBLE) - 1.0) AS n0
      FROM tot
    )
    SELECT k AS k_targets, n,
           ROUND(msb, 4) AS msb,
           ROUND(msw, 4) AS msw,
           ROUND((msb - msw) / (msb + (n0 - 1.0) * msw), 6) AS icc
    FROM ms
    """,
    tags=("stats", "reliability", "icc", "variance-components"),
)
def stats_icc_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way random-effects intraclass correlation ICC(1) over each
    user's event values — the RELIABILITY statistic of the agreement
    family: Cohen/Fleiss/Krippendorff score categorical votes,
    Kendall W scores rankings, ICC scores CONTINUOUS ratings ("how
    much of the score variance is the target, not the measurement"),
    which is the number an LLM-judge calibration review asks for.
    ICC = (MSB - MSW)/(MSB + (n0-1).MSW) with the unbalanced-design
    n0 = (N - Sum n_i^2/N)/(k-1).

    Exactness: per-target n, Sum x, Sum x^2 are exact integer
    aggregates (HUGEINT/DECIMAL(38,0) cents); the cross-target float
    term Sum S_i^2/n_i quantizes per target to an e6 integer and SUMS
    exactly (the stats_bartlett/Theil discipline — order-free,
    map-side combinable, no ordered fold over the DATA-SIZED target
    set); Sum n_i^2 is exact; the mean squares and ICC are ONE
    identical double expression, with the degenerate designs (k <= 1,
    every target a singleton) yielding NULL in both engines (DuckDB
    zero-divisor NULL / Spark try_divide).

    Scale shape: one scan, one partial-agg shuffle to target grain,
    then a second aggregate folds the target relation to ONE row —
    both map-side combinable. Scan-bound at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    units = ev.select(
        F.col("user_id").alias("g"),
        F.round(F.col("value") * 100, 0).cast("long").alias("x"),
    )
    xd = F.col("x").cast(d38)
    per_group = units.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum(xd).alias("sg"),
        F.sum(xd * xd).alias("ssg"),
    )
    ngD = F.col("ng").cast("double")
    q = F.round(
        F.col("sg").cast("double")
        * F.col("sg").cast("double")
        / ngD
        * F.lit(1000000.0),
        0,
    ).cast(d38)
    gq = per_group.select("ng", "sg", "ssg", q.alias("q"))
    z38 = F.lit(0).cast(d38)
    tot = gq.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.coalesce(F.sum("ng"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(
            F.sum(F.col("ng").cast(d38) * F.col("ng").cast(d38)), z38
        ).alias("sn2"),
        F.coalesce(F.sum("q"), z38).alias("sq"),
        F.coalesce(F.sum("sg"), z38).alias("gx"),
        F.coalesce(F.sum("ssg"), z38).alias("gxx"),
    )
    kD = F.col("k").cast("double")
    nD = F.col("n").cast("double")
    sqD = F.col("sq").cast("double") / F.lit(1000000.0)
    gxD = F.col("gx").cast("double")
    msb = F.try_divide(
        sqD - F.try_divide(gxD * gxD, nD), kD - F.lit(1.0)
    )
    msw = F.try_divide(
        F.col("gxx").cast("double") - sqD, nD - kD
    )
    n0 = F.try_divide(
        nD - F.try_divide(F.col("sn2").cast("double"), nD), kD - F.lit(1.0)
    )
    icc = F.try_divide(msb - msw, msb + (n0 - F.lit(1.0)) * msw)
    return tot.select(
        F.col("k").alias("k_targets"),
        "n",
        F.round(msb, 4).alias("msb"),
        F.round(msw, 4).alias("msw"),
        F.round(icc, 6).alias("icc"),
    )
