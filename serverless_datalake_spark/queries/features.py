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

from serverless_datalake_spark.operators.ranking import (
    with_global_ntile,
    with_global_rank,
)
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

    Scale note: the exact rank runs through `with_global_rank`
    (operators/ranking.py) — range-partitioned two-pass, bit-identical
    to the global window, no single-task sort over the FACT table —
    and the row count rides out of the rank's own pass-1 stats as a
    literal (one fact scan total, not two). The production
    twin (`winsorize_bounds_approx` below) still computes the two
    bounds with approxQuantile (one Greenwald–Khanna scan, no rank at
    all) when exactness is negotiable."""
    li = load_table(spark, sf_dir, "lineitem")
    # n rides out of the rank's own pass-1 stats — no second fact scan
    ranked = with_global_rank(
        li.select(
            F.col("l_extendedprice").alias("v"), "l_orderkey", "l_linenumber"
        ),
        [F.col("v"), F.col("l_orderkey"), F.col("l_linenumber")],
        out="rn",
        n_out="n",
    ).select("v", "rn", "n")

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


@query(
    "feature_target_encode",
    oracle="""
    WITH tgt AS (
      SELECT o.o_custkey,
             CAST(ROUND(o.o_totalprice * 100.0, 0) AS BIGINT) AS cents
      FROM orders o
    ), seg AS (
      SELECT c.c_mktsegment AS segment,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t.cents) AS BIGINT) AS cents_sum
      FROM customer c JOIN tgt t ON t.o_custkey = c.c_custkey
      GROUP BY 1
    ), gstats AS (
      SELECT CAST(SUM(cents_sum) AS BIGINT) AS g_cents,
             CAST(SUM(n) AS BIGINT) AS g_n
      FROM seg
    )
    SELECT seg.segment, seg.n,
           ROUND(CAST(seg.cents_sum AS DOUBLE) / CAST(seg.n AS DOUBLE) / 100.0, 4)
             AS seg_mean,
           ROUND((CAST(seg.cents_sum AS DOUBLE) / 100.0
                  + 20.0 * (CAST(gstats.g_cents AS DOUBLE)
                            / CAST(gstats.g_n AS DOUBLE) / 100.0))
                 / (CAST(seg.n AS DOUBLE) + 20.0), 4) AS encoded
    FROM seg CROSS JOIN gstats
    """,
    tags=("feature", "encoding"),
)
def feature_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed mean target encoding of a categorical (customer market
    segment) against a continuous target (order totalprice): the
    m-estimate blend (m=20) of the per-category mean with the global
    mean — the standard high-cardinality categorical encoder (CatBoost
    et al. add fold-ordering on top; the smoothing core is this).

    Exactness: the target is summed as integer CENTS (exact,
    order-independent under distributed partial aggregation — the
    agg_pricing_summary discipline); means and the smoothing blend are
    then a fixed sequence of double ops written identically in both
    engines.

    Scale shape: one fact-dim broadcast join, one hash aggregate to
    category grain (map-side partials), a 1-row global reduce, and a
    broadcast-back — encoder tables stay dimension-sized no matter the
    fact row count."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    tgt = orders.select(
        "o_custkey", F.round(F.col("o_totalprice") * 100.0, 0).cast("long").alias("cents")
    )
    seg = (
        cust.join(tgt, tgt["o_custkey"] == cust["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").cast("long").alias("cents_sum"),
        )
    )
    glob = seg.agg(
        F.sum("cents_sum").cast("long").alias("g_cents"),
        F.sum("n").cast("long").alias("g_n"),
    )
    return seg.crossJoin(F.broadcast(glob)).select(
        "segment",
        "n",
        F.round(
            F.col("cents_sum").cast("double") / F.col("n").cast("double") / F.lit(100.0),
            4,
        ).alias("seg_mean"),
        F.round(
            (
                F.col("cents_sum").cast("double") / F.lit(100.0)
                + F.lit(20.0)
                * (F.col("g_cents").cast("double") / F.col("g_n").cast("double") / F.lit(100.0))
            )
            / (F.col("n").cast("double") + F.lit(20.0)),
            4,
        ).alias("encoded"),
    )


@query(
    "feature_quantile_bucketize",
    oracle="""
    SELECT c_custkey, c_acctbal,
           CAST(NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS decile
    FROM customer
    """,
    tags=("feature", "bucketize"),
)
def feature_quantile_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (decile) bucketing of a numeric feature — the
    QuantileDiscretizer shape. The (c_acctbal, c_custkey) total order
    makes NTILE's remainder distribution deterministic (both engines
    give the first buckets the extra rows).

    Scale shape: the exact global NTILE runs through
    `with_global_ntile` (operators/ranking.py): range-partition on
    (c_acctbal, c_custkey), parallel per-range rank windows, broadcast
    prefix-count offsets, then the ANSI remainder arithmetic on the
    global rank — bit-identical to the single-partition NTILE
    (including the ragged first-buckets-get-the-extra-row edge,
    pinned by tests/test_ranking.py) with every sort partition-
    parallel. The approxQuantile boundary twin remains the documented
    option when exactness is negotiable; this query no longer needs
    the trade."""
    c = load_table(spark, sf_dir, "customer")
    return with_global_ntile(
        c.select("c_custkey", "c_acctbal"),
        [F.col("c_acctbal"), F.col("c_custkey")],
        10,
        out="decile",
    ).select("c_custkey", "c_acctbal", F.col("decile").cast("long"))


@query(
    "feature_onehot_topn",
    oracle="""
    WITH counts AS (
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n FROM part GROUP BY 1
    ), top3 AS (
      SELECT p_brand, ROW_NUMBER() OVER (ORDER BY n DESC, p_brand) AS r
      FROM counts
    ), b AS (
      SELECT MAX(CASE WHEN r = 1 THEN p_brand END) AS b1,
             MAX(CASE WHEN r = 2 THEN p_brand END) AS b2,
             MAX(CASE WHEN r = 3 THEN p_brand END) AS b3
      FROM top3 WHERE r <= 3
    )
    SELECT p.p_partkey, p.p_brand,
           CAST(CASE WHEN p.p_brand = b.b1 THEN 1 ELSE 0 END AS BIGINT) AS oh_1,
           CAST(CASE WHEN p.p_brand = b.b2 THEN 1 ELSE 0 END AS BIGINT) AS oh_2,
           CAST(CASE WHEN p.p_brand = b.b3 THEN 1 ELSE 0 END AS BIGINT) AS oh_3,
           CAST(CASE WHEN p.p_brand = b.b1 OR p.p_brand = b.b2
                          OR p.p_brand = b.b3 THEN 0 ELSE 1 END
                AS BIGINT) AS oh_other
    FROM part p CROSS JOIN b
    """,
    tags=("feature", "encoding", "onehot"),
)
def feature_onehot_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N one-hot encoding with an "other" bucket — the vocabulary
    cap every production encoder applies so feature width stays fixed
    while category cardinality grows (StringIndexer + OneHotEncoder
    with handleInvalid='keep', collapsed to one pass). The top-3
    brands are chosen by (count DESC, brand) — a total order, so the
    vocabulary is deterministic.

    Scale shape: vocabulary selection is a category-grain aggregate
    reduced to ONE broadcast row (three scalars); encoding is then a
    map-only projection over the fact scan — no shuffle touches fact
    rows, which is what makes capped one-hot viable at 100 TB."""
    p = load_table(spark, sf_dir, "part")
    counts = p.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), "p_brand")
    b = (
        counts.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= 3)
        .agg(
            F.max(F.when(F.col("r") == 1, F.col("p_brand"))).alias("b1"),
            F.max(F.when(F.col("r") == 2, F.col("p_brand"))).alias("b2"),
            F.max(F.when(F.col("r") == 3, F.col("p_brand"))).alias("b3"),
        )
    )
    return p.crossJoin(F.broadcast(b)).select(
        "p_partkey",
        "p_brand",
        F.when(F.col("p_brand") == F.col("b1"), 1).otherwise(0).cast("long").alias("oh_1"),
        F.when(F.col("p_brand") == F.col("b2"), 1).otherwise(0).cast("long").alias("oh_2"),
        F.when(F.col("p_brand") == F.col("b3"), 1).otherwise(0).cast("long").alias("oh_3"),
        F.when(
            (F.col("p_brand") == F.col("b1"))
            | (F.col("p_brand") == F.col("b2"))
            | (F.col("p_brand") == F.col("b3")),
            0,
        )
        .otherwise(1)
        .cast("long")
        .alias("oh_other"),
    )


@query(
    "feature_woe_binned",
    oracle="""
    WITH lab AS (
      SELECT o_orderpriority AS bin,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ), bins AS (
      SELECT bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS n_pos,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg
      FROM lab GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(n_pos) AS BIGINT) AS t_pos,
             CAST(SUM(n_neg) AS BIGINT) AS t_neg
      FROM bins
    ), scored AS (
      SELECT bin, n, n_pos, n_neg,
             ROUND(LN(((CAST(n_pos AS DOUBLE) + 0.5) / CAST(t_pos AS DOUBLE))
                      / ((CAST(n_neg AS DOUBLE) + 0.5) / CAST(t_neg AS DOUBLE))),
                   6) AS woe
      FROM bins CROSS JOIN tot
    )
    SELECT bin, n, n_pos, n_neg, woe,
           ROUND((CAST(n_pos AS DOUBLE) / (SELECT t_pos FROM tot)
                  - CAST(n_neg AS DOUBLE) / (SELECT t_neg FROM tot)) * woe,
                 6) AS iv_term
    FROM scored
    """,
    tags=("feature", "woe", "encoding"),
)
def feature_woe_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence encoding table — the credit-scoring /
    risk-modeling categorical encoder: per bin (order priority),
    WoE = ln(p_pos/p_neg) with a +0.5 Laplace floor on the bin counts,
    plus each bin's information-value contribution
    (p_pos − p_neg)·WoE. The output IS the deployable encoder: a
    pipeline broadcast-joins it back onto the fact table to replace
    the category with its WoE (monotone-in-risk, NULL-safe, no
    high-cardinality one-hot blowup).

    Determinism: all counts are exact integers; the single LN rounds
    at 6 on creation, and iv_term is a per-bin projection (no
    cross-bin float sum — consumers needing total IV sum the rounded
    terms). Scale shape: one partial-agg shuffle to bin grain, a
    1-row totals broadcast, map-only scoring — bin-bounded output."""
    o = load_table(spark, sf_dir, "orders")
    lab = o.select(
        F.col("o_orderpriority").alias("bin"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    bins = lab.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("y")).alias("n_neg"),
    )
    tot = bins.groupBy().agg(
        F.sum("n_pos").alias("t_pos"), F.sum("n_neg").alias("t_neg")
    )
    j = bins.crossJoin(F.broadcast(tot))
    woe = F.round(
        F.log(
            ((F.col("n_pos").cast("double") + F.lit(0.5)) / F.col("t_pos").cast("double"))
            / ((F.col("n_neg").cast("double") + F.lit(0.5)) / F.col("t_neg").cast("double"))
        ),
        6,
    )
    return j.select(
        "bin",
        "n",
        "n_pos",
        "n_neg",
        woe.alias("woe"),
        F.round(
            (
                F.col("n_pos").cast("double") / F.col("t_pos").cast("double")
                - F.col("n_neg").cast("double") / F.col("t_neg").cast("double")
            )
            * woe,
            6,
        ).alias("iv_term"),
    )


@query(
    "feature_mutual_info",
    oracle="""
    WITH cells AS (
      SELECT c_mktsegment AS x, CAST(c_nationkey AS BIGINT) AS y,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM customer GROUP BY 1, 2
    ), tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells
    ), mx AS (
      SELECT x, CAST(SUM(c) AS BIGINT) AS nx FROM cells GROUP BY 1
    ), my AS (
      SELECT y, CAST(SUM(c) AS BIGINT) AS ny FROM cells GROUP BY 1
    ), mi_terms AS (
      SELECT cells.x, cells.y,
             ROUND((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                   * LN(CAST(n AS DOUBLE) * CAST(c AS DOUBLE)
                        / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))), 8) AS e
      FROM cells JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot
    ), hx_terms AS (
      SELECT x, ROUND(-(CAST(nx AS DOUBLE) / CAST(n AS DOUBLE))
                      * LN(CAST(nx AS DOUBLE) / CAST(n AS DOUBLE)), 8) AS e
      FROM mx CROSS JOIN tot
    ), hy_terms AS (
      SELECT y, ROUND(-(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE))
                      * LN(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE)), 8) AS e
      FROM my CROSS JOIN tot
    ), folds AS (
      SELECT (SELECT list_aggregate(list(e ORDER BY x, y), 'sum') FROM mi_terms) AS mi,
             (SELECT list_aggregate(list(e ORDER BY x), 'sum') FROM hx_terms) AS hx,
             (SELECT list_aggregate(list(e ORDER BY y), 'sum') FROM hy_terms) AS hy,
             (SELECT n FROM tot) AS n
    )
    SELECT n AS n_rows,
           ROUND(mi, 6) AS mi_nats,
           ROUND(hx, 6) AS h_segment,
           ROUND(hy, 6) AS h_nation,
           ROUND(mi / SQRT(hx * hy), 6) AS nmi
    FROM folds
    """,
    tags=("features", "mutual-information", "selection"),
)
def feature_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (and sqrt-normalized MI) between market
    segment and nation — the model-free dependence screen a feature
    pipeline runs before committing a categorical column to training
    (feature_woe_binned scores features against a LABEL; MI here
    scores feature-feature redundancy, which is what you prune on).

    MI = Sum p_xy.ln(p_xy/(p_x.p_y)) over the JOINT CONTINGENCY
    GRAIN: 5 segments x 25 nations = 125 cells, each an exact integer
    count. Per-cell terms round at 8 decimals and sum as an ordered
    fold over the (x, y)-sorted cell list (the agg_entropy_by_group
    precedent); the two marginal entropies fold the same way, so NMI
    = MI/sqrt(Hx.Hy) is one double expression over three
    bit-identical folds.

    Scale shape: ONE partial-agg shuffle of the customer scan to the
    125-cell relation (pinned: feeds both marginal rollups + the term
    join), then broadcast joins of the two marginal relations and a
    constant-size fold — row-count independent past the scan, the
    same profile as stats_kendall_tau."""
    from serverless_datalake_spark.operators import pin as _pin

    cust = load_table(spark, sf_dir, "customer")
    cells = (
        cust.groupBy(
            F.col("c_mktsegment").alias("x"),
            F.col("c_nationkey").cast("long").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(_pin)  # feeds tot + both marginals + the term join
    )
    tot = cells.agg(F.sum("c").cast("long").alias("n"))
    mx = cells.groupBy("x").agg(F.sum("c").cast("long").alias("nx"))
    my = cells.groupBy("y").agg(F.sum("c").cast("long").alias("ny"))
    nD = F.col("n").cast("double")

    def fold(keys, term):
        arr = F.array_sort(F.collect_list(F.struct(*keys, term.alias("e"))))
        return F.aggregate(
            F.transform(arr, lambda s: s["e"]), F.lit(0.0), lambda s, x: s + x
        )

    joined = (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
    )
    mi_term = F.round(
        (F.col("c").cast("double") / nD)
        * F.log(
            nD * F.col("c").cast("double")
            / (F.col("nx").cast("double") * F.col("ny").cast("double"))
        ),
        8,
    )
    mi = joined.agg(fold([F.col("x"), F.col("y")], mi_term).alias("mi"))
    hx_j = mx.crossJoin(F.broadcast(tot))
    px = F.col("nx").cast("double") / nD
    hx = hx_j.agg(fold([F.col("x")], F.round(-px * F.log(px), 8)).alias("hx"))
    hy_j = my.crossJoin(F.broadcast(tot))
    py = F.col("ny").cast("double") / nD
    hy = hy_j.agg(fold([F.col("y")], F.round(-py * F.log(py), 8)).alias("hy"))
    out = (
        tot.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
    )
    return out.select(
        F.col("n").alias("n_rows"),
        F.round(F.col("mi"), 6).alias("mi_nats"),
        F.round(F.col("hx"), 6).alias("h_segment"),
        F.round(F.col("hy"), 6).alias("h_nation"),
        F.round(F.col("mi") / F.sqrt(F.col("hx") * F.col("hy")), 6).alias("nmi"),
    )
