"""Second relational batch (§2b width): right outer join, self-join,
null-safe equality, stddev/variance, RANGE window frames, bitwise ops."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_table


@query(
    "join_right_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey
    FROM (SELECT * FROM orders WHERE o_totalprice > 250000) o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    tags=("join",),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer equi-join preserving unmatched right-side rows."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 250000)
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "c_name", "o_orderkey"
    )


@query(
    "join_self_pairs",
    oracle="""
    SELECT a.l_orderkey, a.l_linenumber AS line_a, b.l_linenumber AS line_b,
           ROUND(a.l_extendedprice + b.l_extendedprice, 2) AS pair_price
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
    WHERE a.l_orderkey % 50 = 0
    """,
    tags=("join", "self"),
)
def join_self_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join: within-order line pairs. Same-key self-joins reuse
    one shuffle of the table (Catalyst reuses the exchange)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 50 == 0)
    a = li.alias("a")
    b = li.alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") < F.col("b.l_linenumber")),
    ).select(
        F.col("a.l_orderkey").alias("l_orderkey"),
        F.col("a.l_linenumber").alias("line_a"),
        F.col("b.l_linenumber").alias("line_b"),
        F.round(F.col("a.l_extendedprice") + F.col("b.l_extendedprice"), 2).alias("pair_price"),
    )


@query(
    "fn_nullsafe_eq",
    oracle="""
    SELECT x.o_orderkey,
           (NULLIF(x.o_orderstatus, 'P') IS NOT DISTINCT FROM NULLIF(x.o_orderpriority, '1-URGENT')) AS both_null_or_eq,
           (NULLIF(x.o_orderstatus, 'P') = NULLIF(x.o_orderpriority, '1-URGENT')) AS plain_eq
    FROM orders x
    WHERE x.o_orderkey % 21 = 0
    """,
    tags=("functions", "nullsafe"),
)
def fn_nullsafe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=> / IS NOT DISTINCT FROM) vs plain `=`
    three-valued logic, side by side."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 21 == 0)
    left = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    right = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    return o.select(
        "o_orderkey",
        left.eqNullSafe(right).alias("both_null_or_eq"),
        (left == right).alias("plain_eq"),
    )


@query(
    "agg_stddev_var",
    oracle="""
    SELECT o_orderstatus,
           ROUND(STDDEV_SAMP(o_totalprice), 2) AS sd_price,
           ROUND(VAR_SAMP(o_totalprice), 0) AS var_price,
           ROUND(STDDEV_POP(o_totalprice), 2) AS sd_pop
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg", "stats"),
)
def agg_stddev_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample/population stddev + variance — distributed via the
    single-pass (count, mean, M2) merge formula on both engines."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.stddev_samp("o_totalprice"), 2).alias("sd_price"),
        F.round(F.var_samp("o_totalprice"), 0).alias("var_price"),
        F.round(F.stddev_pop("o_totalprice"), 2).alias("sd_pop"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
               RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS n_similar,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
               RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING), 2) AS sum_similar
    FROM orders
    WHERE o_custkey % 10 = 0
    """,
    tags=("window", "range-frame"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-based) frames — the frame is defined by the order
    key's VALUE distance, not row offsets; unlike ROWS frames the
    result is insensitive to tie order, so no tie-break is needed."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") % 10 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 10000)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.count("*").over(w).alias("n_similar"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("sum_similar"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT l_orderkey,
           l_orderkey & 255 AS low_byte,
           l_orderkey | 4096 AS with_flag,
           xor(l_orderkey, l_partkey) AS mixed,
           l_orderkey << 2 AS shifted_l,
           l_orderkey >> 3 AS shifted_r,
           CAST(bit_count(l_orderkey) AS BIGINT) AS popcount
    FROM lineitem
    WHERE l_orderkey % 37 = 0 AND l_linenumber = 1
    """,
    tags=("functions", "bitwise"),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise suite (the primitives under SimHash/bucketing)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_orderkey") % 37 == 0) & (F.col("l_linenumber") == 1)
    )
    return li.select(
        "l_orderkey",
        F.col("l_orderkey").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("l_orderkey").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_partkey")).alias("mixed"),
        F.shiftleft("l_orderkey", 2).alias("shifted_l"),
        F.shiftright("l_orderkey", 3).alias("shifted_r"),
        F.bit_count("l_orderkey").cast("long").alias("popcount"),
    )


@query(
    "skyline_frontier_2d",
    oracle="""
    WITH pts AS (
      SELECT p_partkey, CAST(p_size AS BIGINT) AS s,
             CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS cents
      FROM part
    ), sz AS (
      SELECT s, MIN(cents) AS minp FROM pts GROUP BY 1
    ), fr AS (
      SELECT s, minp,
             MIN(minp) OVER (ORDER BY s DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS mgt
      FROM sz
    )
    SELECT p.p_partkey, p.s AS p_size,
           ROUND(CAST(p.cents AS DOUBLE) / 100.0, 2) AS retail_price
    FROM pts p JOIN fr ON p.s = fr.s
    WHERE p.cents = fr.minp AND (fr.mgt IS NULL OR p.cents < fr.mgt)
    """,
    tags=("relational", "skyline", "pareto"),
)
def skyline_frontier_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-dimensional SKYLINE (Pareto-optimal set): the parts no
    other part dominates under (maximize size, minimize price) — the
    multi-criteria shortlist operator (Borzsony/Kossmann/Stocker's
    SKYLINE OF) that product search and supplier selection run, and
    that naive SQL spells as a quadratic NOT EXISTS self-join.

    The scalable identity: with the size axis domain-bounded (1..50),
    a part p survives iff (a) p.price equals the min price AT its
    size (same-size strict dominance) and (b) p.price beats the min
    price over all STRICTLY LARGER sizes (cross-size dominance),
    which is one reverse exclusive running-min over the 50-row
    size-grain relation. Prices compare in exact cents. The dominated
    check never touches part pairs — the O(n^2) NOT EXISTS collapses
    to a domain-grain window plus one hash join back to the scan.

    Scale shape: one scan -> 50-row aggregate -> 50-row window
    (domain-bounded, allowlisted) -> broadcast join back to the scan.
    At 100 TB: scan-bound, like stats_kendall_tau; for continuous
    BOTH-axes skylines, bucketize one axis first (the standard
    grid-skyline reduction)."""
    from serverless_datalake_spark.operators import pin as _pin

    pts = (
        load_table(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.col("p_size").cast("long").alias("s"),
            F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("cents"),
        )
        .transform(_pin)  # feeds the size rollup AND the output join
    )
    sz = pts.groupBy("s").agg(F.min("cents").alias("minp"))
    rev = (
        Window.orderBy(F.col("s").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fr = sz.select("s", "minp", F.min("minp").over(rev).alias("mgt"))
    return (
        pts.join(F.broadcast(fr), "s")
        .where(
            (F.col("cents") == F.col("minp"))
            & (F.col("mgt").isNull() | (F.col("cents") < F.col("mgt")))
        )
        .select(
            "p_partkey",
            F.col("s").alias("p_size"),
            F.round(F.col("cents").cast("double") / 100.0, 2).alias("retail_price"),
        )
    )
