"""Time-series resampling over `events` — the hypertable-style
continuous-aggregate surface (regular-grid rollup + gap fill) that
metric/telemetry pipelines layer on an event stream.

Determinism discipline: bucket keys are exact integer epoch-hours,
observed bucket values are ROUND(SUM, 2)/COUNT (the sum's intrinsic
decimal precision is 2 — fixture values carry 2 decimals — so the
round erases engine ulp-drift and both engines then hold bit-identical
doubles), and interpolation is one identical +,-,*,/ DAG over those
doubles — bit-portable with no further rounding care needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window

from serverless_datalake_spark.operators import pin as _pin
from pyspark.sql import functions as F

from serverless_datalake_spark.operators.ranking import with_global_cumsum
from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_table



def _hourly_obs(e: DataFrame) -> DataFrame:
    """(event_type, h, v): the module's canonical hourly rollup —
    hour = CAST(ts AS LONG) DIV 3600 (floor semantics identical in
    both engines), v = round(sum(value), 2). The exact spelling is
    LOAD-BEARING for cross-engine bit-identity (the round-2
    discipline), so it lives in ONE place; the round-8 review counted
    ten verbatim copies that a precision fix would each have needed."""
    return e.groupBy(
        "event_type", F.expr("CAST(ts AS LONG) DIV 3600").alias("h")
    ).agg(F.round(F.sum("value"), 2).alias("v"))


def _series_arr(obs: DataFrame) -> DataFrame:
    """(event_type, arr): each type's (h, v) series as ONE sorted
    array — the collect-then-fold shape the ordered-fold queries
    (ewma, holt, autocorr, …) share."""
    return obs.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("h", "v"))).alias("arr")
    )


@query(
    "ts_resample_interpolate",
    oracle="""
    WITH obs AS (
      SELECT event_type,
             CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) // 3600 AS h,
             ROUND(SUM(value), 2) / COUNT(*) AS v_obs,
             COUNT(*) AS n
      FROM events
      GROUP BY 1, 2
    ), spine AS (
      SELECT event_type, unnest(range(lo, hi + 1)) AS h
      FROM (SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM obs GROUP BY 1)
    ), grid AS (
      SELECT s.event_type, s.h, obs.v_obs, COALESCE(obs.n, 0) AS n,
             obs.v_obs IS NOT NULL AS is_observed
      FROM spine s LEFT JOIN obs ON obs.event_type = s.event_type AND obs.h = s.h
    ), filled AS (
      SELECT event_type, h, v_obs, n, is_observed,
             LAST_VALUE(v_obs IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             LAST_VALUE(CASE WHEN is_observed THEN h END IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
             FIRST_VALUE(v_obs IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             FIRST_VALUE(CASE WHEN is_observed THEN h END IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      FROM grid
    )
    SELECT event_type, h * 3600 AS bucket_start, is_observed, CAST(n AS BIGINT) AS n,
           ROUND(CASE
             WHEN is_observed THEN v_obs
             WHEN pv IS NOT NULL AND nv IS NOT NULL
               THEN pv + (nv - pv) * (CAST(h - ph AS DOUBLE) / (nh - ph))
             WHEN pv IS NOT NULL THEN pv
             ELSE nv
           END, 4) AS value_interp
    FROM filled
    """,
    tags=("timeseries", "resample", "interpolate"),
)
def ts_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample events to a regular 1-hour grid per event_type and
    linearly interpolate the empty buckets (TimescaleDB
    time_bucket_gapfill + interpolate, InfluxDB fill(linear)):
    hourly mean value per type, a dense hour spine from each type's
    first to last observation, and for missing buckets
    v = prev + (next − prev) · Δt/Δspan between the nearest observed
    neighbors (carry-forward/backward at the edges).

    Scale shape: the rollup is one partial-aggregated shuffle on
    (type, hour) — the raw events are never joined against the spine;
    the spine join and both gap-fill windows run on the ALREADY
    AGGREGATED grid (rows = types × hours, orders of magnitude smaller
    than the input), partitioned by event_type. At 100 TB the grid for
    a year of hourly buckets is ~9k rows per series — driver-trivial
    regardless of input volume."""
    e = load_table(spark, sf_dir, "events")
    obs = (
        e.groupBy(
            "event_type",
            F.expr("CAST(ts AS LONG) DIV 3600").alias("h"),
        )
        .agg(
            (F.round(F.sum("value"), 2) / F.count(F.lit(1))).alias("v_obs"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    spine = (
        obs.groupBy("event_type")
        .agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("h"),
        )
    )
    grid = (
        spine.join(obs, ["event_type", "h"], "left")
        .select(
            "event_type",
            "h",
            "v_obs",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.col("v_obs").isNotNull().alias("is_observed"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("h")
    w_back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_h = F.when(F.col("is_observed"), F.col("h"))
    filled = grid.select(
        "event_type",
        "h",
        "v_obs",
        "n",
        "is_observed",
        F.last("v_obs", ignorenulls=True).over(w_back).alias("pv"),
        F.last(obs_h, ignorenulls=True).over(w_back).alias("ph"),
        F.first("v_obs", ignorenulls=True).over(w_fwd).alias("nv"),
        F.first(obs_h, ignorenulls=True).over(w_fwd).alias("nh"),
    )
    interp = (
        F.when(F.col("is_observed"), F.col("v_obs"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * ((F.col("h") - F.col("ph")).cast("double") / (F.col("nh") - F.col("ph"))),
        )
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
    )
    return filled.select(
        "event_type",
        (F.col("h") * 3600).alias("bucket_start"),
        "is_observed",
        F.col("n").cast("long").alias("n"),
        F.round(interp, 4).alias("value_interp"),
    )


@query(
    "ts_anomaly_zscore",
    oracle="""
    WITH obs AS (
      SELECT event_type,
             CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) // 3600 AS h,
             ROUND(SUM(value), 2) AS v
      FROM events
      GROUP BY 1, 2
    ), stats AS (
      SELECT event_type, h, v,
             ROUND(SUM(v) OVER w, 2) AS rsum,
             ROUND(SUM(v * v) OVER w, 4) AS rssq,
             COUNT(*) OVER w AS rn
      FROM obs
      WINDOW w AS (PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, h * 3600 AS bucket_start, v,
           ROUND(z, 4) AS zscore,
           COALESCE(abs(z) > 3.0, FALSE) AS is_anomaly
    FROM (
      SELECT *,
             CASE WHEN rn >= 12 AND (rssq / rn - (rsum / rn) * (rsum / rn)) > 0.0
                  THEN (v - rsum / rn)
                       / SQRT(rssq / rn - (rsum / rn) * (rsum / rn))
             END AS z
      FROM stats
    )
    """,
    tags=("timeseries", "anomaly"),
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each hourly bucket's total
    is scored against the trailing 24 observed buckets' mean/std
    (current bucket excluded — the detector must not see the point it
    judges); |z| > 3 flags the anomaly. Needs ≥12 trailing buckets,
    else no score (warm-up).

    Cross-engine float discipline: the rolling SUM and SUM-of-squares
    are rounded at the series' intrinsic decimal precision (the bucket
    totals carry 2 decimals, their squares 4), because the two engines
    accumulate moving-window sums in different orders (Spark re-scans
    the frame; DuckDB uses segment trees) — after the round both hold
    bit-identical doubles and the variance/z arithmetic is one shared
    DAG.

    Scale shape: identical to ts_resample_interpolate — one partial
    aggregation down to (type, hour), then per-type windows over the
    tiny grid."""
    e = load_table(spark, sf_dir, "events")
    obs = _hourly_obs(e)
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-24, -1)
    )
    stats = obs.select(
        "event_type",
        "h",
        "v",
        F.round(F.sum("v").over(w), 2).alias("rsum"),
        F.round(F.sum(F.col("v") * F.col("v")).over(w), 4).alias("rssq"),
        F.count(F.lit(1)).over(w).alias("rn"),
    )
    mean = F.col("rsum") / F.col("rn")
    var = F.col("rssq") / F.col("rn") - mean * mean
    z = F.when((F.col("rn") >= 12) & (var > 0.0), (F.col("v") - mean) / F.sqrt(var))
    return stats.select(
        "event_type",
        (F.col("h") * 3600).alias("bucket_start"),
        "v",
        F.round(z, 4).alias("zscore"),
        F.coalesce(F.abs(z) > 3.0, F.lit(False)).alias("is_anomaly"),
    )


@query(
    "ts_ewma",
    oracle="""
    WITH obs AS (
      SELECT event_type,
             CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) // 3600 AS h,
             ROUND(SUM(value), 2) AS v
      FROM events
      GROUP BY 1, 2
    ), ser AS (
      SELECT event_type,
             list(h ORDER BY h) AS hs,
             list(v ORDER BY h) AS vs
      FROM obs GROUP BY event_type
    )
    SELECT event_type,
           unnest(hs) * 3600 AS bucket_start,
           unnest(vs) AS v,
           unnest(list_transform(range(1, len(vs) + 1),
                  i -> ROUND(list_reduce(vs[1:i], (s, x) -> 0.3 * x + 0.7 * s), 6))) AS ewma
    FROM ser
    """,
    tags=("timeseries", "smoothing"),
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α = 0.3, s₀ = first
    bucket) over each type's hourly totals — the smoothing pass
    monitoring pipelines run before thresholding, and the simplest
    member of the Holt-Winters family.

    EWMA is a sequential recurrence, which is exactly why it's
    expressed as a LEFT FOLD over the per-type series (prefix folds:
    s_i = reduce(v₁..v_i)); both engines run the identical fold order
    on identical round-2 bucket totals, so every smoothed value is
    bit-identical before the final round. The O(n²) prefix-fold cost
    is bounded by series length (hours per type — ~9k/year), never by
    event volume; the raw events collapse to the grid in one
    partial-agg shuffle first."""
    e = load_table(spark, sf_dir, "events")
    obs = _hourly_obs(e)
    ser = _series_arr(obs)
    vs = F.transform(F.col("arr"), lambda x: x["v"])
    hs = F.transform(F.col("arr"), lambda x: x["h"])
    ewmas = F.transform(
        F.sequence(F.lit(1), F.size(vs)),
        lambda i: F.round(
            F.aggregate(
                F.slice(vs, F.lit(2), i - 1),
                F.element_at(vs, F.lit(1)),
                lambda s, x: 0.3 * x + 0.7 * s,
            ),
            6,
        ),
    )
    z = ser.select("event_type", F.explode(F.arrays_zip(hs.alias("h"), vs.alias("v"), ewmas.alias("e"))).alias("t"))
    return z.select(
        "event_type",
        (F.col("t.h") * 3600).alias("bucket_start"),
        F.col("t.v").alias("v"),
        F.col("t.e").alias("ewma"),
    )


@query(
    "ts_holt_linear",
    oracle="""
    WITH obs AS (
      SELECT event_type,
             CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) // 3600 AS h,
             ROUND(SUM(value), 2) AS v
      FROM events
      GROUP BY 1, 2
    ), ser AS (
      SELECT event_type,
             list(h ORDER BY h) AS hs,
             list([v, v, CAST(0.0 AS DOUBLE)] ORDER BY h) AS es
      FROM obs GROUP BY event_type
    ), folded AS (
      SELECT event_type, hs,
             list_transform(range(1, len(es) + 1),
               i -> list_reduce(es[1:i], (s, x) -> [
                      x[1],
                      0.3 * x[1] + 0.7 * (s[2] + s[3]),
                      0.1 * ((0.3 * x[1] + 0.7 * (s[2] + s[3])) - s[2])
                           + 0.9 * s[3]])) AS st
      FROM ser
    )
    SELECT event_type,
           unnest(hs) * 3600 AS bucket_start,
           unnest(list_transform(st, s -> s[1])) AS v,
           unnest(list_transform(st, s -> ROUND(s[2], 6))) AS level,
           unnest(list_transform(st, s -> ROUND(s[3], 6))) AS trend,
           unnest(list_transform(st, s -> ROUND(s[2] + s[3], 6))) AS forecast_next
    FROM folded
    """,
    tags=("timeseries", "smoothing", "forecast"),
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing — the next
    member of the Holt-Winters family after ts_ewma: a level AND a
    trend state per series (α=0.3, β=0.1, l₁=v₁, b₁=0), plus the
    one-step-ahead forecast l+b that alerting pipelines threshold
    against.

    The recurrence carries a 2-component state, so the fold
    accumulator is a STRUCT — both engines reduce the identical
    struct stream in identical order (Spark F.aggregate / DuckDB
    list_reduce share "first element is the initial state"), and the
    trend update re-spells the level expression verbatim instead of
    referencing it, so every intermediate double is bit-identical
    before the final 6-decimal round.

    Scale shape is ts_ewma's: raw events collapse to the hourly grid
    in one partial-agg shuffle; the O(n²) prefix folds are bounded by
    series length (hours per type), never event volume; series fold
    independently — per-key parallelism."""
    e = load_table(spark, sf_dir, "events")
    obs = _hourly_obs(e)
    ser = _series_arr(obs)
    hs = F.transform(F.col("arr"), lambda x: x["h"])
    # state vector [v, l, b] as a plain double array: DuckDB's
    # list_reduce updates a STRUCT accumulator field-by-field in
    # place (later field expressions see earlier NEW values), so the
    # cross-engine-safe encoding is an immutable list value.
    es = F.transform(
        F.col("arr"), lambda x: F.array(x["v"], x["v"], F.lit(0.0))
    )

    def step(s, x):
        v = F.element_at(x, 1)
        lvl = 0.3 * v + 0.7 * (F.element_at(s, 2) + F.element_at(s, 3))
        trd = (
            0.1 * ((0.3 * v + 0.7 * (F.element_at(s, 2) + F.element_at(s, 3)))
                   - F.element_at(s, 2))
            + 0.9 * F.element_at(s, 3)
        )
        return F.array(v, lvl, trd)

    sts = F.transform(
        F.sequence(F.lit(1), F.size(es)),
        lambda i: F.aggregate(
            F.slice(es, F.lit(2), i - 1), F.element_at(es, F.lit(1)), step
        ),
    )
    z = ser.select(
        "event_type",
        F.explode(F.arrays_zip(hs.alias("h"), sts.alias("s"))).alias("t"),
    )
    st = F.col("t.s")
    return z.select(
        "event_type",
        (F.col("t.h") * 3600).alias("bucket_start"),
        F.element_at(st, 1).alias("v"),
        F.round(F.element_at(st, 2), 6).alias("level"),
        F.round(F.element_at(st, 3), 6).alias("trend"),
        F.round(F.element_at(st, 2) + F.element_at(st, 3), 6).alias("forecast_next"),
    )


@query(
    "ts_autocorrelation",
    oracle="""
    WITH obs AS (
      SELECT event_type,
             CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) // 3600 AS h,
             ROUND(SUM(value), 2) AS v
      FROM events
      GROUP BY 1, 2
    ), ser AS (
      SELECT event_type, list(v ORDER BY h) AS vs FROM obs GROUP BY event_type
    ), stats AS (
      SELECT event_type, vs, len(vs) AS n,
             list_aggregate(vs, 'sum') / CAST(len(vs) AS DOUBLE) AS m
      FROM ser
    ), parts AS (
      SELECT event_type, CAST(n AS BIGINT) AS n_buckets,
             list_aggregate(list_transform(vs, x -> (x - m) * (x - m)), 'sum') AS den,
             list_aggregate(list_transform(range(1, n),
               i -> (vs[i] - m) * (vs[i + 1] - m)), 'sum') AS num1,
             list_aggregate(list_transform(range(1, n - 23),
               i -> (vs[i] - m) * (vs[i + 24] - m)), 'sum') AS num24
      FROM stats
    )
    SELECT event_type, n_buckets,
           CASE WHEN n_buckets > 1 THEN ROUND(num1 / den, 6) END AS acf_1,
           CASE WHEN n_buckets > 24 THEN ROUND(num24 / den, 6) END AS acf_24
    FROM parts
    """,
    tags=("timeseries", "statistics"),
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of each type's hourly totals at lag 1
    (persistence) and lag 24 (daily seasonality) — the two numbers a
    forecasting pipeline inspects before picking a model, and the
    statistical counterpart of ts_ewma/ts_holt_linear's smoothing
    assumptions.

    ACF_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)² computed entirely as
    ordered HOF folds over the per-type series array (mean, variance
    and lagged products all fold in identical order in both engines;
    inputs are the 2-decimal bucket totals, so every term is
    bit-identical before the final 6-decimal round).

    Scale shape: the ts_ewma profile — one partial-agg shuffle to the
    (type, hour) grid, per-type arrays bounded by grid length (hours,
    not events), series processed independently."""
    e = load_table(spark, sf_dir, "events")
    obs = _hourly_obs(e)
    ser = _series_arr(obs)
    vs = F.transform(F.col("arr"), lambda x: x["v"])
    stats = ser.select(
        "event_type",
        vs.alias("vs"),
        F.size(vs).alias("n"),
        (
            F.aggregate(vs, F.lit(0.0), lambda s, x: s + x)
            / F.size(vs).cast("double")
        ).alias("m"),
    )

    def fold(expr):
        return F.aggregate(expr, F.lit(0.0), lambda s, x: s + x)

    den = fold(
        F.transform(F.col("vs"), lambda x: (x - F.col("m")) * (x - F.col("m")))
    )
    num1 = fold(
        F.transform(
            F.sequence(F.lit(1), F.col("n") - 1),
            lambda i: (F.element_at("vs", i) - F.col("m"))
            * (F.element_at("vs", i + 1) - F.col("m")),
        )
    )
    num24 = fold(
        F.transform(
            F.sequence(F.lit(1), F.col("n") - 24),
            lambda i: (F.element_at("vs", i) - F.col("m"))
            * (F.element_at("vs", i + 24) - F.col("m")),
        )
    )
    # guard short series: Spark's sequence(1, n-k) turns DESCENDING
    # when n <= k (it would fold bogus terms) while DuckDB's range
    # goes empty — align both on an explicit NULL
    return stats.select(
        "event_type",
        F.col("n").cast("long").alias("n_buckets"),
        F.when(F.col("n") > 1, F.round(num1 / den, 6)).alias("acf_1"),
        F.when(F.col("n") > 24, F.round(num24 / den, 6)).alias("acf_24"),
    )


@query(
    "ts_cross_correlation",
    oracle="""
    WITH obs AS (
      SELECT event_type,
             CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) // 3600 AS h,
             ROUND(SUM(value), 2) AS v
      FROM events
      GROUP BY 1, 2
    ), paired AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b, a.h,
             a.v AS va, b.v AS vb
      FROM obs a JOIN obs b ON a.h = b.h AND a.event_type < b.event_type
    ), ser AS (
      SELECT type_a, type_b,
             CAST(COUNT(*) AS BIGINT) AS n,
             list(va ORDER BY h) AS xs,
             list(vb ORDER BY h) AS ys
      FROM paired GROUP BY 1, 2
    ), sums AS (
      SELECT type_a, type_b, n,
             list_aggregate(xs, 'sum') AS sx,
             list_aggregate(ys, 'sum') AS sy,
             list_aggregate(list_transform(xs, x -> x * x), 'sum') AS sxx,
             list_aggregate(list_transform(ys, y -> y * y), 'sum') AS syy,
             list_aggregate(list_transform(list_zip(xs, ys), p -> p[1] * p[2]), 'sum') AS sxy
      FROM ser
    )
    SELECT type_a, type_b, n AS n_hours,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / SQRT((CAST(n AS DOUBLE) * sxx - sx * sx)
                        * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS corr
    FROM sums
    """,
    tags=("timeseries", "statistics", "correlation"),
)
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between event types' hourly-total
    series (common hours only) — the co-movement matrix that catches
    coupled metrics (clicks↔views) and flags decoupling incidents;
    the multivariate sibling of ts_autocorrelation.

    All five sufficient statistics (Σx, Σy, Σx², Σy², Σxy) are ordered
    folds over the h-sorted common grid, so the numerator/denominator
    doubles are bit-identical across engines before the 6-decimal
    round.

    Scale shape: the type-pair join runs on the (type, hour) GRID
    (hour-keyed self-join, pair fan-out bounded by #types² per hour),
    never on raw events; per-pair fold length is common-grid-bounded."""
    e = load_table(spark, sf_dir, "events")
    obs = _hourly_obs(e)
    a = obs.select(F.col("event_type").alias("type_a"), "h", F.col("v").alias("va"))
    b = obs.select(F.col("event_type").alias("type_b"), "h", F.col("v").alias("vb"))
    paired = a.join(b, "h").where(F.col("type_a") < F.col("type_b"))
    ser = paired.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.array_sort(F.collect_list(F.struct("h", "va", "vb"))).alias("arr"),
    )
    xs = F.transform(F.col("arr"), lambda r: r["va"])
    ys = F.transform(F.col("arr"), lambda r: r["vb"])

    def fold(expr):
        return F.aggregate(expr, F.lit(0.0), lambda s, x: s + x)

    sx = fold(xs)
    sy = fold(ys)
    sxx = fold(F.transform(xs, lambda x: x * x))
    syy = fold(F.transform(ys, lambda y: y * y))
    sxy = fold(F.zip_with(xs, ys, lambda x, y: x * y))
    nd = F.col("n").cast("double")
    corr = (nd * sxy - sx * sy) / F.sqrt(
        (nd * sxx - sx * sx) * (nd * syy - sy * sy)
    )
    return ser.select(
        "type_a",
        "type_b",
        F.col("n").cast("long").alias("n_hours"),
        F.round(corr, 6).alias("corr"),
    )


@query(
    "ts_changepoint_meanshift",
    oracle="""
    WITH obs AS (
      SELECT event_type,
             CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) // 3600 AS h,
             ROUND(SUM(value), 2) AS v
      FROM events
      GROUP BY 1, 2
    ), ser AS (
      SELECT event_type,
             list(h ORDER BY h) AS hs,
             list(v ORDER BY h) AS vs,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM obs GROUP BY event_type
    ), d AS (
      SELECT event_type, hs, vs, n,
             list_transform(range(1, n),
               t -> ROUND(ABS(list_aggregate(vs[1:t], 'sum') / CAST(t AS DOUBLE)
                              - (list_aggregate(vs, 'sum') - list_aggregate(vs[1:t], 'sum'))
                                / CAST(n - t AS DOUBLE)), 8)) AS diffs
      FROM ser WHERE n >= 2
    ), arg AS (
      SELECT event_type, hs, vs, n, diffs,
             CAST(list_position(diffs, list_aggregate(diffs, 'max')) AS BIGINT) AS t
      FROM d
    )
    SELECT event_type, n AS n_buckets,
           hs[t + 1] * 3600 AS change_start,
           ROUND(list_aggregate(vs[1:t], 'sum') / CAST(t AS DOUBLE), 6) AS mean_before,
           ROUND((list_aggregate(vs, 'sum') - list_aggregate(vs[1:t], 'sum'))
                 / CAST(n - t AS DOUBLE), 6) AS mean_after
    FROM arg
    """,
    tags=("timeseries", "changepoint"),
)
def ts_changepoint_meanshift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection by maximal mean shift: for every
    split point of each type's hourly series, compare the mean before
    vs after; report the split with the largest absolute shift (first
    such split on ties) — the at-most-one-changepoint core of binary
    segmentation / CUSUM-style monitoring.

    Split scores round at 8 decimals before the argmax (array_position
    on the max finds the same first index in both engines); prefix
    sums are left folds over the h-sorted series, so every candidate
    score is bit-identical cross-engine.

    Scale shape: the ts_ewma profile — one partial-agg shuffle to the
    (type, hour) grid; the O(n²) fold cost is bounded by series
    length (hours), never events, and series parallelize per key."""
    e = load_table(spark, sf_dir, "events")
    obs = _hourly_obs(e)
    ser = obs.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("h", "v"))).alias("arr"),
        F.count(F.lit(1)).alias("n"),
    ).where(F.col("n") >= 2)
    hs = F.transform(F.col("arr"), lambda x: x["h"])
    vs = F.transform(F.col("arr"), lambda x: x["v"])

    def fold(expr):
        return F.aggregate(expr, F.lit(0.0), lambda s, x: s + x)

    tot = fold(vs)

    def pre(t):
        return fold(F.slice(vs, F.lit(1), t))

    nd = F.col("n").cast("double")
    diffs = F.transform(
        F.sequence(F.lit(1), F.col("n") - 1),
        lambda t: F.round(
            F.abs(
                pre(t) / t.cast("double")
                - (tot - pre(t)) / (nd - t.cast("double"))
            ),
            8,
        ),
    )
    d = ser.select("event_type", hs.alias("hs"), vs.alias("vs"), "n", diffs.alias("diffs"))
    t = F.array_position(F.col("diffs"), F.array_max(F.col("diffs"))).cast("long")
    vs2 = F.col("vs")
    tot2 = fold(vs2)

    def pre2(tt):
        return fold(F.slice(vs2, F.lit(1), tt))

    arg = d.select("event_type", "hs", "vs", "n", t.alias("t"))
    return arg.select(
        "event_type",
        F.col("n").cast("long").alias("n_buckets"),
        (F.element_at("hs", (F.col("t") + 1).cast("int")) * 3600).alias("change_start"),
        F.round(pre2(F.col("t")) / F.col("t").cast("double"), 6).alias("mean_before"),
        F.round(
            (tot2 - pre2(F.col("t")))
            / (F.col("n").cast("double") - F.col("t").cast("double")),
            6,
        ).alias("mean_after"),
    )


@query(
    "ts_seasonal_strength",
    oracle="""
    WITH obs AS (
      SELECT event_type,
             CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) // 3600 AS h,
             ROUND(SUM(value), 2) AS v
      FROM events
      GROUP BY 1, 2
    ), hod AS (
      SELECT event_type, h % 24 AS hour_of_day, h, v FROM obs
    ), prof AS (
      SELECT event_type, hour_of_day,
             list_aggregate(list(v ORDER BY h), 'sum')
               / CAST(COUNT(*) AS DOUBLE) AS season_mean
      FROM hod GROUP BY 1, 2
    ), joined AS (
      SELECT hod.event_type, hod.h, hod.v, prof.season_mean
      FROM hod JOIN prof USING (event_type, hour_of_day)
    ), ser AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             list(v ORDER BY h) AS vs,
             list(ROUND(v - season_mean, 8) ORDER BY h) AS rs
      FROM joined GROUP BY event_type
    ), stats AS (
      SELECT event_type, n,
             list_aggregate(vs, 'sum') / CAST(n AS DOUBLE) AS mv,
             list_aggregate(rs, 'sum') / CAST(n AS DOUBLE) AS mr,
             vs, rs
      FROM ser
    )
    SELECT event_type, n AS n_buckets,
           ROUND(GREATEST(0.0, 1.0 -
             (list_aggregate(list_transform(rs, x -> (x - mr) * (x - mr)), 'sum')
              / list_aggregate(list_transform(vs, x -> (x - mv) * (x - mv)), 'sum'))), 6)
             AS seasonal_strength
    FROM stats
    """,
    tags=("timeseries", "seasonality"),
)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-strength diagnostic (the STL-decomposition statistic
    F_s = max(0, 1 − Var(remainder)/Var(series)) with an hour-of-day
    seasonal component): ~0 means the daily profile explains nothing
    (aseasonal — what synthetic fixtures should show), →1 means the
    series is dominated by its daily cycle. Decides whether ts_ewma
    (aseasonal) or a seasonal model should smooth each series.

    Hour-of-day means are ordered folds over each (type, hour-of-day)
    cell; remainders round at 8 before the variance folds, all in
    h-order — bit-identical cross-engine.

    Scale shape: one partial-agg shuffle to the grid, a 24-cell
    profile per type joined back (broadcast-sized), and per-type
    variance folds bounded by grid length."""
    e = load_table(spark, sf_dir, "events")
    obs = _hourly_obs(e)
    hod = obs.select("event_type", (F.col("h") % 24).alias("hour_of_day"), "h", "v")
    parr = F.array_sort(F.collect_list(F.struct("h", "v")))
    prof = hod.groupBy("event_type", "hour_of_day").agg(
        (
            F.aggregate(
                F.transform(parr, lambda x: x["v"]), F.lit(0.0), lambda s, x: s + x
            )
            / F.count(F.lit(1)).cast("double")
        ).alias("season_mean")
    )
    joined = hod.join(prof, ["event_type", "hour_of_day"])
    sarr = F.array_sort(
        F.collect_list(
            F.struct("h", "v", F.round(F.col("v") - F.col("season_mean"), 8).alias("r"))
        )
    )
    ser = joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), sarr.alias("arr")
    )
    vs = F.transform(F.col("arr"), lambda x: x["v"])
    rs = F.transform(F.col("arr"), lambda x: x["r"])

    def fold(expr):
        return F.aggregate(expr, F.lit(0.0), lambda s, x: s + x)

    nd = F.col("n").cast("double")
    mv = fold(vs) / nd
    mr = fold(rs) / nd
    var_v = fold(F.transform(vs, lambda x: (x - mv) * (x - mv)))
    var_r = fold(F.transform(rs, lambda x: (x - mr) * (x - mr)))
    return ser.select(
        "event_type",
        F.col("n").cast("long").alias("n_buckets"),
        F.round(F.greatest(F.lit(0.0), 1.0 - var_r / var_v), 6).alias(
            "seasonal_strength"
        ),
    )


@query(
    "ts_rolling_quantile",
    oracle="""
    WITH obs AS (
      SELECT event_type,
             CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) // 3600 AS h,
             ROUND(SUM(value), 2) AS v
      FROM events
      GROUP BY 1, 2
    ), win AS (
      SELECT event_type, h, v,
             list_sort(list(v) OVER (PARTITION BY event_type ORDER BY h
                       ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)) AS wv
      FROM obs
    )
    SELECT event_type, h * 3600 AS bucket_start, v,
           wv[CAST(CEIL(0.9 * len(wv)) AS BIGINT)] AS p90_trailing_24h,
           CAST(len(wv) AS BIGINT) AS window_n
    FROM win
    """,
    tags=("timeseries", "quantile", "rolling"),
)
def ts_rolling_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact p90 over the trailing 24 hourly buckets — the
    adaptive thresholding statistic behind 'alert when above the p90
    of the last day' monitors (ts_anomaly_zscore's z-score assumes
    symmetric noise; a rolling ORDER STATISTIC is the robust twin).

    Exactness: the lower p90 (sorted element ⌈0.9·n⌉, no
    interpolation) over the frame-collected list — both engines sort
    identical 2-decimal bucket totals, so the picked element is
    identical; ramp-up rows (window_n < 24) report their partial
    window honestly.

    Scale shape: one grid shuffle then a bounded-frame window whose
    per-row cost is the 24-element collect+sort — O(w log w) with
    w = 24, constant; state never exceeds the frame."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    obs = _hourly_obs(e)
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-23, 0)
    wv = F.sort_array(F.collect_list("v").over(w))
    return obs.select(
        "event_type",
        (F.col("h") * 3600).alias("bucket_start"),
        "v",
        F.element_at(wv, F.ceil(0.9 * F.size(wv)).cast("int")).alias(
            "p90_trailing_24h"
        ),
        F.size(wv).cast("long").alias("window_n"),
    )


@query(
    "ts_period_over_period",
    oracle="""
    WITH wk AS (
      SELECT event_type,
             CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) // 604800 AS w,
             ROUND(SUM(value), 2) AS total
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, w * 604800 AS week_start, total,
           LAG(total) OVER (PARTITION BY event_type ORDER BY w) AS prev_total,
           CASE WHEN LAG(total) OVER (PARTITION BY event_type ORDER BY w) IS NULL THEN NULL
                ELSE ROUND((total - LAG(total) OVER (PARTITION BY event_type ORDER BY w))
                           / LAG(total) OVER (PARTITION BY event_type ORDER BY w) * 100.0, 2)
           END AS wow_pct
    FROM wk
    """,
    tags=("timeseries", "bi", "period"),
)
def ts_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week change — the BI staple: weekly totals per type
    with the previous week's total and the percentage delta (NULL for
    the first week, honestly, instead of a fake 0). The number every
    weekly report leads with; ts_anomaly_zscore is its alerting
    sibling at hourly grain.

    Scale shape: raw events collapse to (type, week) in one
    partial-agg shuffle; LAG runs on the week grid."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    wk = e.groupBy(
        "event_type", F.expr("CAST(ts AS LONG) DIV 604800").alias("w")
    ).agg(F.round(F.sum("value"), 2).alias("total"))
    w = Window.partitionBy("event_type").orderBy("w")
    prev = F.lag("total").over(w)
    return wk.select(
        "event_type",
        (F.col("w") * 604800).alias("week_start"),
        "total",
        prev.alias("prev_total"),
        F.when(
            prev.isNotNull(),
            F.round((F.col("total") - prev) / prev * 100.0, 2),
        ).alias("wow_pct"),
    )


@query(
    "ts_mann_kendall",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) // 86400 AS d,
             ROUND(SUM(value), 2) AS v
      FROM events GROUP BY 1, 2
    ), pairs AS (
      SELECT a.event_type,
             CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END AS sgn
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.d < b.d
    ), stat AS (
      SELECT p.event_type,
             CAST(SUM(p.sgn) AS BIGINT) AS s,
             CAST(MIN(g.n) AS BIGINT) AS n
      FROM pairs p
      JOIN (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM daily GROUP BY event_type) g
        ON g.event_type = p.event_type
      GROUP BY p.event_type
    )
    SELECT event_type, n AS n_days, s,
           ROUND(CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0)
                           / SQRT(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                                  * (2.0 * CAST(n AS DOUBLE) + 5.0) / 18.0)
                      WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0)
                           / SQRT(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                                  * (2.0 * CAST(n AS DOUBLE) + 5.0) / 18.0)
                      ELSE 0.0 END, 6) AS z,
           CASE WHEN s > 0 AND (CAST(s AS DOUBLE) - 1.0)
                     / SQRT(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                            * (2.0 * CAST(n AS DOUBLE) + 5.0) / 18.0) > 1.96
                THEN 'increasing'
                WHEN s < 0 AND (CAST(s AS DOUBLE) + 1.0)
                     / SQRT(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                            * (2.0 * CAST(n AS DOUBLE) + 5.0) / 18.0) < -1.96
                THEN 'decreasing'
                ELSE 'no_trend' END AS verdict
    FROM stat
    """,
    tags=("timeseries", "statistics", "robust"),
)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotonic-trend test over each type's daily-total
    series: the S statistic (sum of pairwise signs), its normal
    approximation z (continuity-corrected, no-ties variance
    n(n-1)(2n+5)/18 — ties are counted as sign 0 and the formula is
    spelled identically in both engines), and the 5%-level verdict.
    The hypothesis-test companion of ts_theil_sen's slope estimate.

    Scale shape: identical to ts_theil_sen — the O(g²) sign pairing
    runs on the aggregated daily grid, never raw events; S is an
    integer sum so distributed aggregation is exact."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.expr("CAST(ts AS LONG) DIV 86400").alias("d")
    ).agg(F.round(F.sum("value"), 2).alias("v"))
    a = daily.select("event_type", F.col("d").alias("da"), F.col("v").alias("va"))
    b = daily.select(
        F.col("event_type").alias("et_b"), F.col("d").alias("db"), F.col("v").alias("vb")
    )
    pairs = a.join(b, (a.event_type == b.et_b) & (a.da < b.db)).select(
        "event_type",
        F.when(F.col("vb") > F.col("va"), 1)
        .when(F.col("vb") < F.col("va"), -1)
        .otherwise(0)
        .alias("sgn"),
    )
    g = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    stat = (
        pairs.groupBy("event_type")
        .agg(F.sum("sgn").cast("long").alias("s"))
        .join(F.broadcast(g.withColumnRenamed("event_type", "et_g")),
              F.col("event_type") == F.col("et_g"))
        .select("event_type", "s", F.col("n").cast("long").alias("n"))
    )
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    denom = F.sqrt(nd * (nd - 1.0) * (2.0 * nd + 5.0) / 18.0)
    z = (
        F.when(F.col("s") > 0, (sd - 1.0) / denom)
        .when(F.col("s") < 0, (sd + 1.0) / denom)
        .otherwise(F.lit(0.0))
    )
    return stat.select(
        "event_type",
        F.col("n").alias("n_days"),
        "s",
        F.round(z, 6).alias("z"),
        F.when((F.col("s") > 0) & (((sd - 1.0) / denom) > 1.96), "increasing")
        .when((F.col("s") < 0) & (((sd + 1.0) / denom) < -1.96), "decreasing")
        .otherwise("no_trend")
        .alias("verdict"),
    )


@query(
    "ts_concurrency_sweep",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL THEN 1
                  WHEN EPOCH(ts) - EPOCH(LAG(ts) OVER (PARTITION BY user_id
                                                       ORDER BY ts, event_id))
                       > 1800.0 THEN 1
                  ELSE 0 END AS new_s
      FROM events
    ), sess AS (
      -- (ts, event_id) tie-break like the LAG above: with ORDER BY ts
      -- alone, a duplicate (user_id, ts) at a session boundary joins
      -- the previous or the new session depending on engine tie order
      -- (round-8 review finding) — the module's total-order discipline
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_no
      FROM ordered
    ), intervals AS (
      SELECT user_id, session_no, MIN(ts) AS s, MAX(ts) AS e
      FROM sess GROUP BY 1, 2
    ), deltas AS (
      SELECT s AS t, 1 AS delta, user_id, session_no FROM intervals
      UNION ALL
      SELECT e AS t, -1 AS delta, user_id, session_no FROM intervals
    ), swept AS (
      SELECT t, delta,
             SUM(delta) OVER (ORDER BY t, delta DESC, user_id, session_no
                              ROWS UNBOUNDED PRECEDING) AS running
      FROM deltas
    )
    SELECT strftime(date_trunc('hour', t), '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(MAX(running) AS BIGINT) AS peak_concurrent,
           CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts
    FROM swept GROUP BY 1
    """,
    tags=("timeseries", "sweep", "concurrency"),
)
def ts_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per hour by SWEEP LINE: sessionize
    (30-minute inactivity gap), emit +1/-1 boundary deltas, cumulative-
    sum them in boundary order (starts before ends at the same
    instant — point-touching sessions count as overlapping). This is
    the canonical replacement for the quadratic interval×interval
    overlap join: concurrency at every instant from ONE sorted pass
    over 2·|sessions| boundary rows.

    Exactness: gaps compare exact micro-resolution epoch doubles; the
    running sum is integer; the sweep order is total
    (t, delta DESC, user, session).

    Scale shape: sessionization is one window partitioned by user
    (co-partitioned shuffle); the sweep relation is session-sized
    (2 rows per session) — but session-grain still GROWS with the
    data, so the prefix sum runs through `with_global_cumsum`
    (operators/ranking.py): range-partition on the sweep order,
    per-partition running sums in parallel windows, broadcast
    carry-in offsets. Integer deltas make the decomposition exact,
    bit-identical to the single-partition window the oracle
    expresses — and no task ever holds more than one key range."""
    ev = load_table(spark, sf_dir, "events")
    uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag(F.col("ts")).over(uw)
    ordered = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(lag_ts.isNull(), 1)
        .when(F.col("ts").cast("double") - lag_ts.cast("double") > 1800.0, 1)
        .otherwise(0)
        .alias("new_s"),
    )
    # (ts, event_id) tie-break like the LAG window: with ts alone, a
    # duplicate (user_id, ts) at a session boundary joins the previous
    # or the new session depending on shuffle tie order (round-8
    # review finding)
    sw = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = ordered.select("user_id", "ts", F.sum("new_s").over(sw).alias("session_no"))
    intervals = sess.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    deltas = intervals.select(
        F.col("s").alias("t"), F.lit(1).alias("delta"), "user_id", "session_no"
    ).unionAll(
        intervals.select(
            F.col("e").alias("t"), F.lit(-1).alias("delta"), "user_id", "session_no"
        )
    ).transform(_pin)
    # input pinned: repartitionByRange SAMPLES its child to pick
    # bounds, so an un-pinned delta relation would run the two
    # sessionize windows twice (sample + shuffle) — measured 1.59 vs
    # 1.24 s at sf0.1 with the pin
    swept = with_global_cumsum(
        deltas,
        [F.col("t"), F.col("delta").desc(), F.col("user_id"), F.col("session_no")],
        "delta",
        out="running",
    ).select("t", "delta", "running")
    # hour is emitted as a STRING, not a timestamp: PySpark collect()
    # converts TimestampType through the DRIVER OS timezone
    # (datetime.fromtimestamp), so a raw timestamp output shifts under
    # a non-UTC host even though the session tz is pinned UTC — found
    # by the round-7 hostile-timezone pre-sim. date_format evaluates
    # JVM-side in the session tz (tz-stable end to end), applied AFTER
    # the aggregation so only hour-grain rows pay the formatting.
    return (
        swept.groupBy(F.date_trunc("hour", F.col("t")).alias("hour_ts"))
        .agg(
            F.max("running").cast("long").alias("peak_concurrent"),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_starts"),
        )
        .select(
            F.date_format("hour_ts", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "peak_concurrent",
            "n_starts",
        )
    )


@query(
    "ts_rolling_ols_slope",
    oracle="""
    WITH grid AS (
      SELECT CAST(FLOOR(EPOCH(date_trunc('hour', ts)) / 3600.0) AS BIGINT)
               - CAST(FLOOR(EPOCH(TIMESTAMP '2024-01-01 00:00:00') / 3600.0) AS BIGINT)
               AS t,
             CAST(SUM(CAST(ROUND(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1
    ), rolled AS (
      SELECT t, y,
             CAST(COUNT(*) OVER w AS BIGINT) AS n,
             CAST(SUM(t) OVER w AS BIGINT) AS st,
             CAST(SUM(y) OVER w AS BIGINT) AS sy,
             CAST(SUM(t * t) OVER w AS BIGINT) AS stt,
             CAST(SUM(t * y) OVER w AS BIGINT) AS sty
      FROM grid
      -- RANGE on the hour INDEX, not ROWS over observed buckets: on a
      -- gappy grid a 24-ROW window reaches back more than 24 wall-clock
      -- hours, which is not the 'trailing 24-hour' statistic promised
      -- (round-8 review finding); WHERE n = 24 keeps full windows only
      WINDOW w AS (ORDER BY t RANGE BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT t AS hour_idx, n,
           ROUND(CAST(n * sty - st * sy AS DOUBLE)
                 / CAST(n * stt - st * st AS DOUBLE) / 100.0, 6) AS slope_per_hour
    FROM rolled WHERE n = 24
    """,
    tags=("timeseries", "rolling", "regression"),
)
def ts_rolling_ols_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 24-hour rolling OLS trend: per hour, the least-squares
    slope of hourly revenue (integer cents) against the hour index —
    the moving-regression smoother analysts use where a moving average
    lags and ts_holt_linear's exponential weights are unwanted.

    Exactness: the hour index is RE-BASED to the fixture epoch so
    every windowed co-moment (Σt, Σt², Σty) is an exact small-integer
    LONG — the slope's numerator/denominator are exact longs cast to
    double for ONE division (the agg_correlation_pinned discipline;
    computing Σt² on raw epoch-hours would lose the cancellation to
    float round-off).

    Scale shape: the window runs on the aggregated hourly grid
    (ts_resample discipline — never raw events), with one partial-agg
    shuffle to grid grain; co-moments are plain windowed sums, so the
    rolling state is O(1) per row."""
    ev = load_table(spark, sf_dir, "events")
    base_h = 473352  # floor(epoch('2024-01-01')/3600), fixture epoch
    grid = ev.groupBy(
        (
            F.floor(F.col("ts").cast("double") / 3600.0).cast("long") - base_h
        ).alias("t")
    ).agg(
        F.sum(F.round(F.col("value") * 100.0, 0).cast("long")).cast("long").alias("y")
    )
    # RANGE frame on the hour index (not ROWS over observed buckets):
    # see the oracle note — a gappy grid must not stretch the window
    w = Window.orderBy("t").rangeBetween(-23, Window.currentRow)
    rolled = grid.select(
        "t",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("t").over(w).cast("long").alias("st"),
        F.sum("y").over(w).cast("long").alias("sy"),
        F.sum(F.col("t") * F.col("t")).over(w).cast("long").alias("stt"),
        F.sum(F.col("t") * F.col("y")).over(w).cast("long").alias("sty"),
    )
    return rolled.where(F.col("n") == 24).select(
        F.col("t").alias("hour_idx"),
        "n",
        F.round(
            (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")).cast("double")
            / (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).cast("double")
            / F.lit(100.0),
            6,
        ).alias("slope_per_hour"),
    )


@query(
    "ts_backtest_snaive",
    oracle="""
    WITH grid AS (
      SELECT CAST(FLOOR(EPOCH(ts) / 3600.0) AS BIGINT) AS h,
             CAST(SUM(CAST(ROUND(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1
    ), with_pred AS (
      -- the forecast joins the value exactly 24 HOURS earlier, not 24
      -- observed rows back: LAG(y, 24) over a gappy grid reached past
      -- 24 wall-clock hours and compared a different hour-of-day —
      -- not the seasonal-naive statistic promised (round-8 review)
      SELECT g.h, g.y, p.y AS yhat
      FROM grid g JOIN grid p ON p.h = g.h - 24
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_backtest,
           ROUND(CAST(SUM(ABS(y - yhat)) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) / 100.0, 4) AS mae,
           ROUND(CAST(MAX(ABS(y - yhat)) AS DOUBLE) / 100.0, 4) AS max_abs_err,
           CAST(SUM(CASE WHEN ABS(y - yhat) * 10 <= y THEN 1 ELSE 0 END) AS BIGINT)
             AS n_within_10pct
    FROM with_pred WHERE yhat IS NOT NULL
    """,
    tags=("timeseries", "forecast", "backtest"),
)
def ts_backtest_snaive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each hour's revenue
    with the value 24 hours earlier (the benchmark every fancier
    forecaster must beat — if Holt/ARIMA can't outperform s-naive,
    ship s-naive) and score MAE, worst error, and the within-10% hit
    rate over the whole backtest window.

    Exactness: the series is integer cents on the hourly grid; errors
    and comparisons are exact integers (the 10% test is spelled
    multiplicatively — |err|·10 ≤ y — to stay in integer arithmetic);
    only the final MAE division touches doubles.

    Scale shape: grid aggregate (one partial-agg shuffle), one lag
    window over the grid, one global reduce. The backtest never
    re-trains anything — s-naive's forecast IS the lag, which is why
    it is the canonical cheap baseline at any scale."""
    ev = load_table(spark, sf_dir, "events")
    grid = ev.groupBy(
        F.floor(F.col("ts").cast("double") / 3600.0).cast("long").alias("h")
    ).agg(
        F.sum(F.round(F.col("value") * 100.0, 0).cast("long")).cast("long").alias("y")
    )
    # self-join on h-24 (see the oracle note): the forecast must be the
    # value exactly 24 HOURS earlier, which a 24-ROW lag only equals on
    # a gap-free grid
    pred = grid.select((F.col("h") + 24).alias("h"), F.col("y").alias("yhat"))
    wp = grid.join(pred, "h")
    err = F.abs(F.col("y") - F.col("yhat"))
    return wp.agg(
        F.count(F.lit(1)).alias("n_backtest"),
        F.round(
            F.sum(err).cast("double") / F.count(F.lit(1)).cast("double") / F.lit(100.0),
            4,
        ).alias("mae"),
        F.round(F.max(err).cast("double") / F.lit(100.0), 4).alias("max_abs_err"),
        F.sum(F.when(err * 10 <= F.col("y"), 1).otherwise(0))
        .cast("long")
        .alias("n_within_10pct"),
    )


@query(
    "ts_cusum_drift",
    oracle="""
    WITH obs AS (
      SELECT event_type,
             CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) // 3600 AS h,
             ROUND(SUM(value), 2) AS v
      FROM events
      GROUP BY 1, 2
    ), ser AS (
      SELECT event_type,
             list(h ORDER BY h) AS hs,
             list(v ORDER BY h) AS vs
      FROM obs GROUP BY event_type
    ), params AS (
      SELECT event_type, hs, vs,
             list_reduce(vs, (a, x) -> a + x) / len(vs) AS mu,
             SQRT(list_reduce(list_transform(vs,
                    x -> (x - list_reduce(vs, (a, y) -> a + y) / len(vs))
                       * (x - list_reduce(vs, (a, y) -> a + y) / len(vs))),
                  (a, x) -> a + x) / (len(vs) - 1)) AS sigma
      FROM ser
    )
    SELECT event_type,
           unnest(hs) * 3600 AS bucket_start,
           unnest(vs) AS v,
           unnest(list_transform(range(1, len(vs) + 1),
             i -> ROUND(list_reduce(list_prepend(0.0, vs[1:i]),
                        (s, x) -> GREATEST(0.0, s + (x - (mu + 0.5 * sigma)))),
                        4))) AS cusum_hi,
           unnest(list_transform(range(1, len(vs) + 1),
             i -> CASE WHEN list_reduce(list_prepend(0.0, vs[1:i]),
                        (s, x) -> GREATEST(0.0, s + (x - (mu + 0.5 * sigma))))
                        > 4.0 * sigma THEN 1 ELSE 0 END)) AS alarm
    FROM params
    """,
    tags=("timeseries", "changepoint", "monitoring"),
)
def ts_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM control chart over each type's hourly totals:
    S_i = max(0, S_{i-1} + (x_i − (μ + 0.5σ))), alarm when S exceeds
    4σ — the sequential drift detector that catches SUSTAINED small
    shifts a per-point z-score (ts_anomaly_zscore) never accumulates,
    and the page-Hinkley/SPC machinery behind data-quality drift
    monitors.

    Exactness: the recurrence is inherently sequential, so it runs as
    the family's LEFT PREFIX FOLD over the per-type series (the
    ts_ewma scheme) with an explicit 0 init (list_prepend on the
    DuckDB side); μ and σ come from the same ordered folds, so every
    value is bit-identical before the final round.

    Scale shape: raw events collapse to the (type, hour) grid in one
    partial-agg shuffle; fold cost is bounded by series length per
    type, never event volume. A year of hourly buckets is ~9k
    elements — the O(n²) prefix spelling stays sub-second; the
    streaming twin carries S as one scalar of state per key."""
    e = load_table(spark, sf_dir, "events")
    obs = _hourly_obs(e)
    ser = _series_arr(obs)
    vs = F.transform(F.col("arr"), lambda x: x["v"])
    hs = F.transform(F.col("arr"), lambda x: x["h"])
    n = F.size(F.col("__vs"))
    fold_sum = F.aggregate(F.col("__vs"), F.lit(0.0), lambda a, x: a + x)
    p = ser.select(
        "event_type",
        hs.alias("__hs"),
        vs.alias("__vs"),
    ).select(
        "event_type",
        "__hs",
        "__vs",
        (fold_sum / n.cast("double")).alias("mu"),
    )
    dev2 = F.transform(
        F.col("__vs"), lambda x: (x - F.col("mu")) * (x - F.col("mu"))
    )
    p = p.select(
        "*",
        F.sqrt(
            F.aggregate(dev2, F.lit(0.0), lambda a, x: a + x)
            / (F.size(F.col("__vs")) - F.lit(1)).cast("double")
        ).alias("sigma"),
    )
    target = F.col("mu") + 0.5 * F.col("sigma")

    def cusum_at(i):
        return F.aggregate(
            F.slice(F.col("__vs"), F.lit(1), i),
            F.lit(0.0),
            lambda s, x: F.greatest(F.lit(0.0), s + (x - target)),
        )

    idx = F.sequence(F.lit(1), F.size(F.col("__vs")))
    cus = F.transform(idx, lambda i: F.round(cusum_at(i), 4))
    alarms = F.transform(
        idx,
        lambda i: F.when(cusum_at(i) > 4.0 * F.col("sigma"), 1).otherwise(0),
    )
    z = p.select(
        "event_type",
        F.explode(
            F.arrays_zip(
                F.col("__hs").alias("h"),
                F.col("__vs").alias("v"),
                cus.alias("c"),
                alarms.alias("a"),
            )
        ).alias("t"),
    )
    return z.select(
        "event_type",
        (F.col("t.h") * 3600).alias("bucket_start"),
        F.col("t.v").alias("v"),
        F.col("t.c").alias("cusum_hi"),
        F.col("t.a").alias("alarm"),
    )


@query(
    "ts_decompose_classical",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(time_bucket(INTERVAL '1 day', ts) AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ), ma AS (
      SELECT event_type, day, cents,
             CAST(SUM(cents) OVER w AS BIGINT) AS trend7,
             CAST(COUNT(*) OVER w AS BIGINT) AS wn
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), det AS (
      SELECT event_type, day, cents, trend7,
             7 * cents - trend7 AS det7,
             DAYOFWEEK(day) AS dow
      FROM ma WHERE wn = 7
    ), seas AS (
      SELECT event_type, dow,
             CAST(SUM(det7) AS BIGINT) AS s_num,
             CAST(7 * COUNT(*) AS BIGINT) AS s_den
      FROM det GROUP BY 1, 2
    )
    SELECT d.event_type, d.day,
           d.cents,
           ROUND(CAST(d.trend7 AS DOUBLE) / 7.0, 4) AS trend,
           ROUND(CAST(s.s_num AS DOUBLE) / CAST(s.s_den AS DOUBLE), 4) AS seasonal,
           ROUND(CAST(d.det7 AS DOUBLE) / 7.0
                 - CAST(s.s_num AS DOUBLE) / CAST(s.s_den AS DOUBLE), 4)
             AS remainder
    FROM det d JOIN seas s ON s.event_type = d.event_type AND s.dow = d.dow
    """,
    tags=("ts", "decomposition", "seasonal"),
)
def ts_decompose_classical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the daily revenue series
    per event type: trend = centered 7-day moving average, seasonal =
    day-of-week mean of the detrended series, remainder = the rest —
    the moving-average decomposition STL generalizes (STL's loess is
    iterative and engine-specific; the classical form is exact).

    Exactness: daily totals are integer cents; the trick is to keep
    the MA exact by working in SEVENTHS — trend7 = Σ of 7 integer
    days, detrended7 = 7·x − trend7, seasonal numerator/denominator
    exact integers — so every reported double is ONE correctly-
    rounded division (or two, in remainder's fixed order) of exact
    integers. Edge days without a full 7-day window are excluded
    (the classical convention). Seasonal means are reported raw
    (without the sum-to-zero re-centering, which would introduce a
    cross-group float sum — consumers re-center the 7 values if
    needed).

    Scale shape: one shuffle to (type, day) grain, a partitioned
    window over day-grain rows, a dow-grain re-aggregate broadcast
    back — series-bounded everywhere."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.window("ts", "1 day").alias("w")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents")
    ).select("event_type", F.col("w.start").cast("date").alias("day"), "cents")
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    ma = daily.select(
        "event_type", "day", "cents",
        F.sum("cents").over(w).alias("trend7"),
        F.count(F.lit(1)).over(w).alias("wn"),
    )
    det = ma.where(F.col("wn") == 7).select(
        "event_type", "day", "cents", "trend7",
        (F.lit(7) * F.col("cents") - F.col("trend7")).alias("det7"),
        F.dayofweek("day").alias("dow"),
    )
    seas = det.groupBy("event_type", "dow").agg(
        F.sum("det7").alias("s_num"),
        (F.lit(7) * F.count(F.lit(1))).alias("s_den"),
    )
    j = det.join(F.broadcast(seas), ["event_type", "dow"])
    seasonal = F.col("s_num").cast("double") / F.col("s_den").cast("double")
    return j.select(
        "event_type",
        "day",
        "cents",
        F.round(F.col("trend7").cast("double") / 7.0, 4).alias("trend"),
        F.round(seasonal, 4).alias("seasonal"),
        F.round(F.col("det7").cast("double") / 7.0 - seasonal, 4).alias("remainder"),
    )


@query(
    "ts_ljung_box",
    oracle="""
    WITH obs AS (
      SELECT event_type,
             CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) // 3600 AS h,
             ROUND(SUM(value), 2) AS v
      FROM events
      GROUP BY 1, 2
    ), ser AS (
      SELECT event_type, list(v ORDER BY h) AS vs FROM obs GROUP BY event_type
    ), stats AS (
      SELECT event_type, vs, len(vs) AS n,
             list_aggregate(vs, 'sum') / CAST(len(vs) AS DOUBLE) AS m
      FROM ser
    ), parts AS (
      SELECT event_type, CAST(n AS BIGINT) AS n_buckets,
             LEAST(12, n - 1) AS hh,
             list_aggregate(list_transform(vs, x -> (x - m) * (x - m)), 'sum')
               AS den,
             list_transform(range(1, LEAST(12, n - 1) + 1), k ->
               list_aggregate(list_transform(range(1, n - k + 1),
                 i -> (vs[i] - m) * (vs[i + k] - m)), 'sum')) AS nums
      FROM stats
      WHERE n > 1
    )
    SELECT event_type, n_buckets,
           CAST(hh AS BIGINT) AS h_used,
           ROUND(CAST(n_buckets AS DOUBLE) * (CAST(n_buckets AS DOUBLE) + 2.0)
                 * list_aggregate(list_transform(range(1, hh + 1), k ->
                     (nums[k] / den) * (nums[k] / den)
                     / (CAST(n_buckets AS DOUBLE) - CAST(k AS DOUBLE))), 'sum'),
                 6) AS q_stat,
           CASE WHEN hh = 12 AND
                CAST(n_buckets AS DOUBLE) * (CAST(n_buckets AS DOUBLE) + 2.0)
                * list_aggregate(list_transform(range(1, hh + 1), k ->
                    (nums[k] / den) * (nums[k] / den)
                    / (CAST(n_buckets AS DOUBLE) - CAST(k AS DOUBLE))), 'sum')
                > 21.026 THEN CAST(1 AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS reject_white_noise_05
    FROM parts
    """,
    tags=("timeseries", "statistics", "diagnostics"),
)
def ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test (h = 12 lags) on each type's hourly
    totals — the white-noise diagnostic a forecasting pipeline runs on
    RESIDUALS before trusting a model (ts_autocorrelation reads two
    individual lags; Q pools the first twelve into one chi-square
    statistic, df = 12, 5% critical value 21.026 embedded as a shared
    literal).

    Q = n(n+2) * Sum_{k=1..h} r_k^2/(n-k) with r_k the lag-k
    autocorrelation; every r_k folds lag products in identical index
    order in both engines over the 2-decimal bucket totals (the
    ts_autocorrelation discipline generalized over k via a nested
    HOF), and the outer sum folds in ascending k — bit-identical
    before the 6-decimal round. h clamps to n-1 on short series (and
    the reject flag only claims df = 12 when h is 12); Spark's
    DESCENDING sequence(1, n-k) hazard cannot fire because k <= n-1
    keeps every inner sequence ascending.

    Scale shape: the ts_ewma profile — one partial-agg shuffle to the
    (type, hour) grid, per-type arrays bounded by grid length (hours,
    not events); the h x n fold work is per-type CPU, no shuffle."""
    e = load_table(spark, sf_dir, "events")
    ser = _series_arr(_hourly_obs(e))
    vs = F.transform(F.col("arr"), lambda x: x["v"])
    stats = ser.select(
        "event_type",
        vs.alias("vs"),
        F.size(vs).alias("n"),
        (
            F.aggregate(vs, F.lit(0.0), lambda s, x: s + x)
            / F.size(vs).cast("double")
        ).alias("m"),
    ).where(F.col("n") > 1)

    def fold(expr):
        return F.aggregate(expr, F.lit(0.0), lambda s, x: s + x)

    m = F.col("m")
    den = fold(F.transform(F.col("vs"), lambda x: (x - m) * (x - m)))
    hh = F.least(F.lit(12), F.col("n") - 1)

    def lag_num(k):
        return fold(
            F.transform(
                F.sequence(F.lit(1), F.col("n") - k),
                lambda i: (F.element_at("vs", i) - m)
                * (F.element_at("vs", i + k) - m),
            )
        )

    parts = stats.select(
        "event_type",
        F.col("n").cast("long").alias("n_buckets"),
        hh.alias("hh"),
        den.alias("den"),
        F.transform(F.sequence(F.lit(1), hh), lag_num).alias("nums"),
    )
    nd = F.col("n_buckets").cast("double")
    q = nd * (nd + F.lit(2.0)) * fold(
        F.transform(
            F.col("nums"),
            lambda x, i: (x / F.col("den"))
            * (x / F.col("den"))
            / (nd - (i + 1).cast("double")),
        )
    )
    return parts.select(
        "event_type",
        "n_buckets",
        F.col("hh").cast("long").alias("h_used"),
        F.round(q, 6).alias("q_stat"),
        F.when((F.col("hh") == 12) & (q > 21.026), 1)
        .otherwise(0)
        .cast("long")
        .alias("reject_white_noise_05"),
    )


@query(
    "ts_granger_lag1",
    oracle="""
    WITH obs AS (
      SELECT event_type,
             CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) // 3600 AS h,
             CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS v
      FROM events
      GROUP BY 1, 2
    ), trip AS (
      SELECT c.event_type AS cause, e.event_type AS effect,
             CAST(e.v AS HUGEINT) AS y, CAST(el.v AS HUGEINT) AS a,
             CAST(c.v AS HUGEINT) AS b
      FROM obs e
      JOIN obs el ON el.event_type = e.event_type AND el.h = e.h - 1
      JOIN obs c  ON c.event_type <> e.event_type AND c.h = e.h - 1
    ), mom AS (
      SELECT cause, effect,
             CAST(COUNT(*) AS BIGINT) AS t,
             CAST(SUM(y) AS DOUBLE) AS sy, CAST(SUM(a) AS DOUBLE) AS sa,
             CAST(SUM(b) AS DOUBLE) AS sb,
             CAST(SUM(y * y) AS DOUBLE) AS syy,
             CAST(SUM(a * a) AS DOUBLE) AS saa,
             CAST(SUM(b * b) AS DOUBLE) AS sbb,
             CAST(SUM(y * a) AS DOUBLE) AS sya,
             CAST(SUM(y * b) AS DOUBLE) AS syb,
             CAST(SUM(a * b) AS DOUBLE) AS sab
      FROM trip GROUP BY 1, 2
    ), cen AS (
      SELECT cause, effect, t,
             syy - sy * sy / CAST(t AS DOUBLE) AS cyy,
             saa - sa * sa / CAST(t AS DOUBLE) AS caa,
             sbb - sb * sb / CAST(t AS DOUBLE) AS cbb,
             sya - sy * sa / CAST(t AS DOUBLE) AS cya,
             syb - sy * sb / CAST(t AS DOUBLE) AS cyb,
             sab - sa * sb / CAST(t AS DOUBLE) AS cab
      FROM mom
    ), fit AS (
      SELECT cause, effect, t, cyy, cya, caa, cyb, cbb,
             (cya * cbb - cyb * cab) / (caa * cbb - cab * cab) AS beta_a,
             (cyb * caa - cya * cab) / (caa * cbb - cab * cab) AS beta_b
      FROM cen
    )
    SELECT cause, effect, t AS n_obs,
           ROUND(beta_b, 6) AS beta_cause,
           ROUND(((cyy - cya * cya / caa)
                  - (cyy - beta_a * cya - beta_b * cyb))
                 * (CAST(t AS DOUBLE) - 3.0)
                 / (cyy - beta_a * cya - beta_b * cyb), 6) AS f_stat
    FROM fit
    """,
    tags=("timeseries", "causality", "regression"),
)
def ts_granger_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger causality at lag 1 between every ordered pair of event
    types' hourly totals — does yesterday's CAUSE series improve the
    one-step forecast of the EFFECT series beyond its own history?
    F = (RSS_restricted - RSS_full)(T-3)/RSS_full for y_t ~ [1,
    y_{t-1}] vs y_t ~ [1, y_{t-1}, x_{t-1}]; the lead/lag-aware
    companion of ts_cross_correlation (which is symmetric and
    direction-blind).

    Exactness: hourly totals quantize to cents, so all nine
    sufficient moments are exact integer sums (HUGEINT vs
    DECIMAL(38,0)) — order-independent, no ordered folds — and both
    engines evaluate the identical closed-form (centered 2x2 normal
    equations) in doubles. The statistics.py discipline applied to a
    two-regressor fit.

    Scale shape: one partial-agg shuffle to the (type, hour) grid,
    two self-joins keyed on the hour grid (grid-sized, not
    event-sized), one partial-agg shuffle to 20 ordered-pair rows of
    nine moments. Scan-bound at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    # NOT _hourly_obs on purpose: the moments need INTEGER CENTS per
    # bucket (exact HUGEINT/decimal sums), and deriving cents from the
    # helper's 2-decimal double would nest ROUND(ROUND(..)*100) in the
    # oracle — the round-4 rewrite-explosion gotcha. Same hour
    # spelling (CAST(ts AS LONG) DIV 3600), different value grain.
    obs = e.groupBy(
        "event_type", F.expr("CAST(ts AS LONG) DIV 3600").alias("h")
    ).agg(F.round(F.sum("value") * 100, 0).cast("long").alias("v"))
    obs = obs.transform(_pin)  # feeds all three legs of the triple join
    d38 = "decimal(38,0)"
    eff = obs.select(
        F.col("event_type").alias("effect"), F.col("h"), F.col("v").alias("y")
    )
    el = obs.select(
        F.col("event_type").alias("e2"), (F.col("h") + 1).alias("h2"),
        F.col("v").alias("a"),
    )
    cz = obs.select(
        F.col("event_type").alias("cause"), (F.col("h") + 1).alias("h3"),
        F.col("v").alias("b"),
    )
    trip = (
        eff.join(el, (F.col("effect") == F.col("e2")) & (F.col("h") == F.col("h2")))
        .join(cz, (F.col("cause") != F.col("effect")) & (F.col("h") == F.col("h3")))
        .select(
            "cause",
            "effect",
            F.col("y").cast(d38).alias("y"),
            F.col("a").cast(d38).alias("a"),
            F.col("b").cast(d38).alias("b"),
        )
    )
    mom = trip.groupBy("cause", "effect").agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("a").cast("double").alias("sa"),
        F.sum("b").cast("double").alias("sb"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("a") * F.col("a")).cast("double").alias("saa"),
        F.sum(F.col("b") * F.col("b")).cast("double").alias("sbb"),
        F.sum(F.col("y") * F.col("a")).cast("double").alias("sya"),
        F.sum(F.col("y") * F.col("b")).cast("double").alias("syb"),
        F.sum(F.col("a") * F.col("b")).cast("double").alias("sab"),
    )
    tD = F.col("t").cast("double")
    cen = mom.select(
        "cause",
        "effect",
        "t",
        (F.col("syy") - F.col("sy") * F.col("sy") / tD).alias("cyy"),
        (F.col("saa") - F.col("sa") * F.col("sa") / tD).alias("caa"),
        (F.col("sbb") - F.col("sb") * F.col("sb") / tD).alias("cbb"),
        (F.col("sya") - F.col("sy") * F.col("sa") / tD).alias("cya"),
        (F.col("syb") - F.col("sy") * F.col("sb") / tD).alias("cyb"),
        (F.col("sab") - F.col("sa") * F.col("sb") / tD).alias("cab"),
    )
    det = F.col("caa") * F.col("cbb") - F.col("cab") * F.col("cab")
    beta_a = (F.col("cya") * F.col("cbb") - F.col("cyb") * F.col("cab")) / det
    beta_b = (F.col("cyb") * F.col("caa") - F.col("cya") * F.col("cab")) / det
    fit = cen.select(
        "cause", "effect", "t", "cyy", "cya", "caa", "cyb",
        beta_a.alias("beta_a"), beta_b.alias("beta_b"),
    )
    rss_u = F.col("cyy") - F.col("beta_a") * F.col("cya") - F.col("beta_b") * F.col("cyb")
    rss_r = F.col("cyy") - F.col("cya") * F.col("cya") / F.col("caa")
    tD2 = F.col("t").cast("double")
    return fit.select(
        "cause",
        "effect",
        F.col("t").alias("n_obs"),
        F.round(F.col("beta_b"), 6).alias("beta_cause"),
        F.round((rss_r - rss_u) * (tD2 - F.lit(3.0)) / rss_u, 6).alias("f_stat"),
    )


@query(
    "ts_hampel_filter",
    oracle="""
    WITH obs AS (
      SELECT event_type,
             CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) // 3600 AS h,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events
      GROUP BY 1, 2
    ), win AS (
      SELECT event_type, h, x,
             list_sort(list(x) OVER (PARTITION BY event_type ORDER BY h
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS wv
      FROM obs
    ), med AS (
      SELECT event_type, h, x, wv, wv[4] AS m
      FROM win WHERE len(wv) = 7
    )
    SELECT event_type, h * 3600 AS bucket_start, x,
           m AS med,
           list_sort(list_transform(wv, v -> ABS(v - m)))[4] AS mad,
           CAST(CASE WHEN CAST(ABS(x - m) AS DOUBLE)
                          > 3.0 * 1.4826
                            * CAST(list_sort(
                                list_transform(wv, v -> ABS(v - m)))[4]
                              AS DOUBLE)
                     THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
    FROM med
    """,
    tags=("timeseries", "outlier", "robust", "hampel"),
)
def ts_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel identifier over per-type hourly event counts — the
    robust OUTLIER DETECTOR of the rolling family: ts_anomaly_zscore
    flags against a mean/stddev that the outlier itself inflates
    (masking); Hampel flags |x - median| > 3 . 1.4826 . MAD over a
    centered 7-bucket window, and one wild spike cannot move either
    the median or the MAD. The telemetry-cleaning primitive every
    metrics pipeline runs before fitting anything.

    Exactness: counts are exact integers; the window holds exactly 7
    of them (edge buckets with partial windows are excluded, honestly
    reported by their absence), so the median is the 4th sorted
    element and the MAD the 4th sorted absolute deviation — exact
    integer order statistics, no interpolation, identical in both
    engines; the only double arithmetic is the final threshold
    comparison, one identical expression. Both outputs (med, mad) are
    emitted so the flag is auditable.

    Scale shape: raw events collapse to the (type, hour) grid in one
    partial-agg shuffle (the _hourly_obs discipline, count-valued);
    the bounded 7-row frame costs one O(w log w) sort per grid row
    with w = 7 constant; windows are PARTITIONED by event_type and
    the grid is time-bounded, not data-bounded. Scan-bound at
    100 TB."""
    e = load_table(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type", F.expr("CAST(ts AS LONG) DIV 3600").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-3, 3)
    win = obs.select(
        "event_type",
        "h",
        "x",
        F.sort_array(F.collect_list("x").over(w)).alias("wv"),
    ).where(F.size("wv") == 7)
    m = F.element_at(F.col("wv"), 4)
    mad = F.element_at(
        F.array_sort(F.transform(F.col("wv"), lambda v: F.abs(v - m))), 4
    )
    return win.select(
        "event_type",
        (F.col("h") * 3600).alias("bucket_start"),
        "x",
        m.cast("long").alias("med"),
        mad.cast("long").alias("mad"),
        F.when(
            F.abs(F.col("x") - m).cast("double")
            > F.lit(3.0) * F.lit(1.4826) * mad.cast("double"),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("is_outlier"),
    )


@query(
    "ts_seasonal_mann_kendall",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) // 86400 AS d,
             ROUND(SUM(value), 2) AS v
      FROM events GROUP BY 1, 2
    ), seas AS (
      SELECT event_type, d % 7 AS w, d, v FROM daily
    ), pairs AS (
      SELECT a.event_type, a.w,
             CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END
               AS sgn
      FROM seas a JOIN seas b
        ON a.event_type = b.event_type AND a.w = b.w AND a.d < b.d
    ), per_season AS (
      SELECT g.event_type, g.w,
             CAST(COALESCE(p.s, 0) AS BIGINT) AS s,
             CAST(g.n * (g.n - 1) * (2 * g.n + 5) AS BIGINT) AS v18
      FROM (SELECT event_type, w, CAST(COUNT(*) AS BIGINT) AS n
            FROM seas GROUP BY 1, 2) g
      LEFT JOIN (SELECT event_type, w, CAST(SUM(sgn) AS BIGINT) AS s
                 FROM pairs GROUP BY 1, 2) p
        ON g.event_type = p.event_type AND g.w = p.w
    ), stat AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_seasons,
             CAST(SUM(s) AS BIGINT) AS s,
             CAST(SUM(v18) AS BIGINT) AS v18
      FROM per_season GROUP BY 1
    )
    SELECT event_type, n_seasons, s,
           ROUND(CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0)
                           / SQRT(CAST(v18 AS DOUBLE) / 18.0)
                      WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0)
                           / SQRT(CAST(v18 AS DOUBLE) / 18.0)
                      ELSE 0.0 END, 6) AS z,
           CASE WHEN s > 0 AND (CAST(s AS DOUBLE) - 1.0)
                     / SQRT(CAST(v18 AS DOUBLE) / 18.0) > 1.96
                THEN 'increasing'
                WHEN s < 0 AND (CAST(s AS DOUBLE) + 1.0)
                     / SQRT(CAST(v18 AS DOUBLE) / 18.0) < -1.96
                THEN 'decreasing'
                ELSE 'no_trend' END AS verdict
    FROM stat
    """,
    tags=("timeseries", "statistics", "robust", "seasonal"),
)
def ts_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall (Hirsch-Slack) trend test over each
    type's daily totals with day-of-week seasons: ts_mann_kendall
    compares EVERY day pair, so a strong weekly cycle (weekend dips)
    reads as noise that masks a real drift; the seasonal variant
    compares only like-with-like (Mondays with Mondays), summing each
    season's S and variance. The standard telemetry-trend test for
    anything with a weekly rhythm.

    Exactness: per-season S is an integer pair-sign sum; the no-ties
    variance n(n-1)(2n+5)/18 is kept as the exact integer NUMERATOR
    (18ths resolution) per season and summed exactly — one division
    by 18.0 at the end, so the cross-season sum needs no ordered
    fold; z is the continuity-corrected normal approximation, ONE
    identical double expression; seasons with no comparable pairs
    contribute S=0 via the LEFT JOIN (both engines).

    Scale shape: the O(g^2) sign pairing runs on the aggregated
    (type, weekday) grid — 7x smaller pair blocks than
    ts_mann_kendall since pairs never cross seasons; raw events
    collapse in one partial-agg shuffle first. The grid is
    time-bounded, not data-bounded. Scan-bound at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.expr("CAST(ts AS LONG) DIV 86400").alias("d")
    ).agg(F.round(F.sum("value"), 2).alias("v"))
    seas = daily.select(
        "event_type", (F.col("d") % 7).alias("w"), "d", "v"
    ).transform(_pin)  # pair self-join + per-season counts branch here
    a = seas.select(
        "event_type", "w", F.col("d").alias("da"), F.col("v").alias("va")
    )
    b = seas.select(
        F.col("event_type").alias("et_b"),
        F.col("w").alias("w_b"),
        F.col("d").alias("db"),
        F.col("v").alias("vb"),
    )
    pairs = a.join(
        b,
        (a.event_type == b.et_b) & (a.w == b.w_b) & (a.da < b.db),
    ).select(
        "event_type",
        "w",
        F.when(F.col("vb") > F.col("va"), 1)
        .when(F.col("vb") < F.col("va"), -1)
        .otherwise(0)
        .alias("sgn"),
    )
    g = seas.groupBy("event_type", "w").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    p = pairs.groupBy("event_type", "w").agg(
        F.sum("sgn").cast("long").alias("s")
    )
    per_season = (
        g.join(
            p.select(
                F.col("event_type").alias("et_p"),
                F.col("w").alias("w_p"),
                "s",
            ),
            (g.event_type == F.col("et_p")) & (g.w == F.col("w_p")),
            "left",
        )
        .select(
            "event_type",
            F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("s"),
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
            )
            .cast("long")
            .alias("v18"),
        )
    )
    stat = per_season.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_seasons"),
        F.sum("s").cast("long").alias("s"),
        F.sum("v18").cast("long").alias("v18"),
    )
    sd = F.col("s").cast("double")
    den = F.sqrt(F.col("v18").cast("double") / F.lit(18.0))
    z = (
        F.when(F.col("s") > 0, (sd - F.lit(1.0)) / den)
        .when(F.col("s") < 0, (sd + F.lit(1.0)) / den)
        .otherwise(F.lit(0.0))
    )
    return stat.select(
        "event_type",
        "n_seasons",
        "s",
        F.round(z, 6).alias("z"),
        F.when((F.col("s") > 0) & (((sd - F.lit(1.0)) / den) > 1.96),
               "increasing")
        .when((F.col("s") < 0) & (((sd + F.lit(1.0)) / den) < -1.96),
              "decreasing")
        .otherwise("no_trend")
        .alias("verdict"),
    )


@query(
    "ts_durbin_watson",
    oracle="""
    WITH obs0 AS (
      SELECT event_type,
             CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) // 3600 AS h,
             ROUND(SUM(value), 2) AS v
      FROM events GROUP BY 1, 2
    ), obs AS (
      SELECT event_type, h, CAST(ROUND(v * 100, 0) AS BIGINT) AS vc
      FROM obs0
    ), suff AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(h AS HUGEINT)) AS HUGEINT) AS sh,
             CAST(SUM(CAST(vc AS HUGEINT)) AS HUGEINT) AS sv,
             CAST(SUM(CAST(h AS HUGEINT) * vc) AS HUGEINT) AS shv,
             CAST(SUM(CAST(h AS HUGEINT) * h) AS HUGEINT) AS shh
      FROM obs GROUP BY 1
    ), coef AS (
      SELECT event_type, n,
             CAST(CAST(n AS HUGEINT) * shv - sh * sv AS DOUBLE)
             / CAST(CAST(n AS HUGEINT) * shh - sh * sh AS DOUBLE) AS beta,
             sh, sv
      FROM suff
    ), coef2 AS (
      SELECT event_type, n, beta,
             (CAST(sv AS DOUBLE) - beta * CAST(sh AS DOUBLE))
             / CAST(n AS DOUBLE) AS alpha
      FROM coef
    ), resid AS (
      SELECT o.event_type, o.h,
             CAST(o.vc AS DOUBLE)
             - (c.alpha + c.beta * CAST(o.h AS DOUBLE)) AS e
      FROM obs o JOIN coef2 c ON o.event_type = c.event_type
    ), lagged AS (
      SELECT event_type, e,
             LAG(e) OVER (PARTITION BY event_type ORDER BY h) AS ep
      FROM resid
    ), qs AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_buckets,
             CAST(SUM(CASE WHEN ep IS NULL THEN 0
                           ELSE CAST(ROUND((e - ep) * (e - ep)
                                           * 1000000.0, 0) AS HUGEINT)
                      END) AS HUGEINT) AS qn,
             CAST(SUM(CAST(ROUND(e * e * 1000000.0, 0) AS HUGEINT))
                  AS HUGEINT) AS qd
      FROM lagged GROUP BY 1
    )
    SELECT event_type, n_buckets,
           ROUND(CAST(qn AS DOUBLE) / CAST(qd AS DOUBLE), 6) AS dw,
           CASE WHEN CAST(qn AS DOUBLE) / CAST(qd AS DOUBLE) < 1.5
                THEN 'positive_autocorr'
                WHEN CAST(qn AS DOUBLE) / CAST(qd AS DOUBLE) > 2.5
                THEN 'negative_autocorr'
                ELSE 'none' END AS verdict
    FROM qs
    """,
    tags=("timeseries", "statistics", "autocorrelation", "regression"),
)
def ts_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic on the residuals of each type's hourly
    linear trend fit — the REGRESSION-DIAGNOSTIC member of the
    autocorrelation family: ts_autocorrelation measures the raw
    series, ts_ljung_box tests many lags jointly, DW asks the
    specific question every trend fit must answer before its standard
    errors are believed ("are the residuals serially correlated?").
    DW = Sum (e_t - e_{t-1})^2 / Sum e_t^2, ~2 under independence;
    the usual rough calls at 1.5/2.5 are reported as a verdict.

    Exactness: the OLS slope/intercept come from exact integer
    sufficient statistics (epoch-hour x cent-value products in
    HUGEINT/DECIMAL(38,0); the normal-equation numerator and
    denominator are exact integer DIFFERENCES cast to double once) so
    both engines hold bit-identical coefficients; each residual is
    then one identical double expression per grid row, and the two
    quadratic sums QUANTIZE per row to e6 integers and sum exactly
    (the stats_bartlett discipline — order-free across the grid);
    the single-bucket degenerate fit and the perfect-fit qd = 0 both
    yield NULL identically (DuckDB zero-divisor NULL / Spark
    try_divide), with verdict 'none'.

    Scale shape: raw events collapse to the (type, hour) grid in one
    partial-agg shuffle; the grid relation is pinned (the sufficient-
    statistics rollup and the residual join both consume it); LAG
    runs PARTITIONED by type; everything else is type-grain. The
    grid is time-bounded, not data-bounded. Scan-bound at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    obs = (
        e.groupBy(
            "event_type", F.expr("CAST(ts AS LONG) DIV 3600").alias("h")
        )
        .agg(F.round(F.sum("value"), 2).alias("v"))
        .select(
            "event_type",
            "h",
            F.round(F.col("v") * 100, 0).cast("long").alias("vc"),
        )
        .transform(_pin)  # sufficient-stats rollup + residual join
    )
    hd, vd = F.col("h").cast(d38), F.col("vc").cast(d38)
    suff = obs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(hd).alias("sh"),
        F.sum(vd).alias("sv"),
        F.sum(hd * vd).alias("shv"),
        F.sum(hd * hd).alias("shh"),
    )
    nd38 = F.col("n").cast(d38)
    beta = F.try_divide(
        (nd38 * F.col("shv") - F.col("sh") * F.col("sv")).cast("double"),
        (nd38 * F.col("shh") - F.col("sh") * F.col("sh")).cast("double"),
    )
    coef = suff.select(
        F.col("event_type").alias("et_c"),
        beta.alias("beta"),
        (
            (F.col("sv").cast("double") - beta * F.col("sh").cast("double"))
            / F.col("n").cast("double")
        ).alias("alpha"),
    )
    resid = obs.join(
        F.broadcast(coef), obs["event_type"] == coef["et_c"]
    ).select(
        "event_type",
        "h",
        (
            F.col("vc").cast("double")
            - (F.col("alpha") + F.col("beta") * F.col("h").cast("double"))
        ).alias("e"),
    )
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = resid.select(
        "event_type", "e", F.lag("e").over(w).alias("ep")
    )
    ed, epd = F.col("e"), F.col("ep")
    qs = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(
            F.when(epd.isNull(), F.lit(0).cast(d38)).otherwise(
                F.round((ed - epd) * (ed - epd) * F.lit(1000000.0), 0).cast(
                    d38
                )
            )
        ).alias("qn"),
        F.sum(F.round(ed * ed * F.lit(1000000.0), 0).cast(d38)).alias("qd"),
    )
    dw = F.try_divide(F.col("qn").cast("double"), F.col("qd").cast("double"))
    return qs.select(
        "event_type",
        "n_buckets",
        F.round(dw, 6).alias("dw"),
        F.when(dw < 1.5, "positive_autocorr")
        .when(dw > 2.5, "negative_autocorr")
        .otherwise("none")
        .alias("verdict"),
    )
