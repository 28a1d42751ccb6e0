"""Feature-engineering operators over the fact table: the
normalization/clipping passes an ML pipeline applies to numeric
columns before training. Each is the production aggregate shape
(partial aggregation map-side, one tiny stats reduce, broadcast back),
with exactness arranged so the DuckDB oracle matches bit-for-bit:

* min/max are order-independent → minmax scaling is trivially exact
  under any partitioning;
* l_quantity is integer-valued (1..50) and COUNT is integer, so SUM
  and SUM of squares are exact in IEEE doubles (< 2^53) regardless of
  summation order → z-scores are exact with distributed partial sums,
  PROVIDED mean/variance are spelled with the identical expression on
  both sides (one division each, same operand order);
* winsorization picks its clip bounds from exact order statistics
  (row_number against a counted rank, linear interpolation written as
  the same expression both sides) rather than engine quantile
  functions, whose interpolation arithmetic differs across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_table


@query(
    "feature_minmax_scale",
    oracle="""
    WITH stats AS (
      SELECT l_returnflag AS grp, MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_orderkey, l_linenumber, grp,
           ROUND(CASE WHEN mx = mn THEN 0.5
                      ELSE (l_extendedprice - mn) / (mx - mn) END, 6) AS price_scaled
    FROM lineitem JOIN stats ON l_returnflag = grp
    WHERE l_orderkey < 1000
    """,
    tags=("feature", "scaling"),
)
def feature_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max scaling of a price column to [0, 1]. Stats
    are one tiny aggregate (min/max are order-independent → exact
    under any partitioning) broadcast back onto the fact scan; the
    output filter keeps the comparison set bounded."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx")
    )
    return (
        li.join(F.broadcast(stats), li.l_returnflag == stats.grp)
        .where(F.col("l_orderkey") < 1000)
        .select(
            "l_orderkey",
            "l_linenumber",
            "grp",
            F.round(
                # constant-valued group: map everything to mid-range
                # rather than NULL-from-0/0 (same CASE in the oracle)
                F.when(F.col("mx") == F.col("mn"), F.lit(0.5)).otherwise(
                    (F.col("l_extendedprice") - F.col("mn")) / (F.col("mx") - F.col("mn"))
                ),
                6,
            ).alias("price_scaled"),
        )
    )


@query(
    "feature_zscore",
    oracle="""
    WITH stats AS (
      SELECT l_returnflag AS grp,
             SUM(l_quantity) AS s, SUM(l_quantity * l_quantity) AS ss,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_orderkey, l_linenumber, grp,
           ROUND(CASE WHEN n <= 1 OR ss - (s / n) * s <= 0 THEN 0.0
                      ELSE (l_quantity - s / n) / SQRT((ss - (s / n) * s) / (n - 1)) END,
                 6) AS qty_z
    FROM lineitem JOIN stats ON l_returnflag = grp
    WHERE l_orderkey < 1000
    """,
    tags=("feature", "scaling"),
)
def feature_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score normalization of l_quantity. Sums and
    sums-of-squares of the integer-valued column are EXACT doubles
    under distributed partial aggregation (all intermediates < 2^53),
    so no ordered-fold workaround is needed — the production
    partial-agg shape is already bit-deterministic. mean and variance
    are spelled as the identical expression on both sides
    ((x − s/n) / sqrt((ss − (s/n)·s)/(n−1)))."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.sum("l_quantity").alias("s"),
        F.sum(F.col("l_quantity") * F.col("l_quantity")).alias("ss"),
        F.count("*").cast("double").alias("n"),
    )
    mean = F.col("s") / F.col("n")
    # single-row or constant group: z := 0 rather than NULL-from-0/0
    # (same CASE in the oracle; the ss − mean·s compare is exact since
    # both operands are exact — see module header)
    z = F.when(
        (F.col("n") <= 1) | (F.col("ss") - mean * F.col("s") <= 0), F.lit(0.0)
    ).otherwise(
        (F.col("l_quantity") - mean)
        / F.sqrt((F.col("ss") - mean * F.col("s")) / (F.col("n") - 1))
    )
    return (
        li.join(F.broadcast(stats), li.l_returnflag == stats.grp)
        .where(F.col("l_orderkey") < 1000)
        .select("l_orderkey", "l_linenumber", "grp", F.round(z, 6).alias("qty_z"))
    )


@query(
    "feature_winsorize",
    oracle="""
    WITH ranked AS (
      SELECT l_extendedprice AS v,
             ROW_NUMBER() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
             COUNT(*) OVER () AS n
      FROM lineitem
    ), bounds AS (
      SELECT
        MAX(CASE WHEN rn = CAST(floor(0.01 * (n - 1)) AS BIGINT) + 1 THEN v END) +
          MAX(CASE WHEN rn = CAST(floor(0.01 * (n - 1)) AS BIGINT) + 1
                   THEN 0.01 * (n - 1) - floor(0.01 * (n - 1)) END) *
          (MAX(CASE WHEN rn = CAST(floor(0.01 * (n - 1)) AS BIGINT) + 2 THEN v END) -
           MAX(CASE WHEN rn = CAST(floor(0.01 * (n - 1)) AS BIGINT) + 1 THEN v END)) AS lo,
        MAX(CASE WHEN rn = CAST(floor(0.99 * (n - 1)) AS BIGINT) + 1 THEN v END) +
          MAX(CASE WHEN rn = CAST(floor(0.99 * (n - 1)) AS BIGINT) + 1
                   THEN 0.99 * (n - 1) - floor(0.99 * (n - 1)) END) *
          (MAX(CASE WHEN rn = CAST(floor(0.99 * (n - 1)) AS BIGINT) + 2 THEN v END) -
           MAX(CASE WHEN rn = CAST(floor(0.99 * (n - 1)) AS BIGINT) + 1 THEN v END)) AS hi
      FROM ranked
    )
    SELECT l_orderkey, l_linenumber,
           ROUND(CASE WHEN l_extendedprice < lo THEN lo
                      WHEN l_extendedprice > hi THEN hi
                      ELSE l_extendedprice END, 6) AS price_winsorized
    FROM lineitem, bounds
    WHERE l_orderkey < 1000
    """,
    tags=("feature", "clipping"),
)
def feature_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clip a heavy-tailed column to its [p01, p99]
    range. The bounds come from EXACT order statistics (global
    row_number with a total tie-break, linear interpolation spelled
    identically on both sides: v_lo + frac·(v_hi − v_lo)) instead of
    percentile_approx/quantile_cont, whose sketches and interpolation
    arithmetic differ across engines.

    Scale note: the exact global sort exists for oracle parity; the
    production twin computes the two bounds with approxQuantile (one
    Greenwald–Khanna scan, no sort — the zorder_key_approx pattern)
    and clips with the same expression."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    ranked = li.select(
        F.col("l_extendedprice").alias("v"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )

    def bound(p: float):
        idx = F.floor(F.lit(p) * (F.col("n") - 1))
        frac = F.lit(p) * (F.col("n") - 1) - idx
        v1 = F.max(F.when(F.col("rn") == idx + 1, F.col("v")))
        v2 = F.max(F.when(F.col("rn") == idx + 2, F.col("v")))
        # idx/frac are per-row constants; fold them into the aggregate
        f1 = F.max(F.when(F.col("rn") == idx + 1, frac))
        return v1 + f1 * (v2 - v1)

    bounds = ranked.agg(bound(0.01).alias("lo"), bound(0.99).alias("hi"))
    clipped = F.when(F.col("l_extendedprice") < F.col("lo"), F.col("lo")).when(
        F.col("l_extendedprice") > F.col("hi"), F.col("hi")
    ).otherwise(F.col("l_extendedprice"))
    return (
        li.crossJoin(F.broadcast(bounds))
        .where(F.col("l_orderkey") < 1000)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(clipped, 6).alias("price_winsorized"),
        )
    )


def winsorize_bounds_approx(
    df: DataFrame, col: str, p_lo: float = 0.01, p_hi: float = 0.99, rel_err: float = 0.001
) -> tuple[float, float]:
    """Production twin of feature_winsorize's bound computation: one
    Greenwald–Khanna sketch scan (approxQuantile), no global sort —
    the zorder_key_approx pattern. Clip with the same CASE expression;
    at 100 TB the exact-order-statistic path would single-partition a
    corpus-wide sort just to find two numbers."""
    lo, hi = df.stat.approxQuantile(col, [p_lo, p_hi], rel_err)
    return lo, hi


_FH_DIM = 64


def _hashing_trick_oracle() -> str:
    from serverless_datalake_spark.queries.llm_dedup import _hex8_int

    h1 = _hex8_int("substr(md5(t), 1, 8)")
    h2 = _hex8_int("substr(md5(t), 9, 8)")
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      FROM documents
    ), hashed AS (
      SELECT doc_id,
             {h1} % {_FH_DIM} AS bucket,
             CASE WHEN {h2} % 2 = 0 THEN 1 ELSE -1 END AS sign
      FROM tok
    )
    SELECT doc_id, bucket, CAST(SUM(sign) AS BIGINT) AS weight
    FROM hashed GROUP BY 1, 2
    HAVING SUM(sign) <> 0
    """


@query(
    "feature_hashing_trick",
    oracle=_hashing_trick_oracle(),
    tags=("feature", "hashing", "llm"),
)
def feature_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al. feature hashing): project
    an unbounded token vocabulary into a fixed 64-dim space with a
    signed hash — bucket = h1(t) mod d, sign = ±1 from h2(t) — so
    downstream linear models train on a fixed-width feature space
    with no vocabulary dictionary to build, ship, or keep consistent.
    The signed variant keeps collision bias zero-mean; sign
    cancellation is real (HAVING weight != 0 drops annihilated
    cells), which the fixture's small d exercises.

    Output is the SPARSE (doc_id, bucket, weight) triplet form — the
    honest representation at 100 TB (a dense array column would carry
    d cells per doc regardless of sparsity; the triplet stream is
    exactly what a distributed SGD or feature-store sink consumes).
    Scale shape: one explode + one (doc, bucket) partial-agg shuffle;
    no vocabulary-sized state anywhere — the point of the trick."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("t"),
    )
    h1 = F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5("t"), 9, 8), 16, 10).cast("long")
    hashed = tok.select(
        "doc_id",
        (h1 % _FH_DIM).alias("bucket"),
        F.when(h2 % 2 == 0, F.lit(1)).otherwise(F.lit(-1)).alias("sign"),
    )
    return (
        hashed.groupBy("doc_id", "bucket")
        .agg(F.sum("sign").alias("weight"))
        .where(F.col("weight") != 0)
    )
