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
from pyspark.sql import functions as F

from serverless_datalake_spark.queries import query
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
