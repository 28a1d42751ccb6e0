"""TPC-H query shapes, batch 3 — Q2, Q11, Q20: the three shapes that
need the partsupp relation, which the fixtures lack. A derived supply
relation stands in:

  supply(ps_partkey, ps_suppkey, ps_supplycost, ps_availqty)
    = lineitem GROUP BY (l_partkey, l_suppkey)
      with ps_supplycost = MIN(unit price), ps_availqty = SUM(qty)

so the canonical plan shapes are preserved exactly: Q2's correlated
scalar-MIN subquery over a 4-way dim join, Q11's group value vs
global-total scalar threshold, Q20's nested-IN semi-join chain with a
correlated aggregate threshold. With these, all 22 TPC-H patterns are
covered (Q1,Q3–Q22 across tpch_shapes*.py).

Determinism notes: ps_supplycost is a MIN (order-independent, unlike a
float SUM); quantity sums are cast to BIGINT first (fixture quantities
are integral), so every aggregate either is exact integer math or an
order-independent extreme — value-hash-stable under any partitioning.

Scale notes (100 TB posture): supply is ONE hash aggregate over
lineitem; all dimension joins broadcast; the correlated subqueries are
decorrelated into pre-aggregated joins (one shuffle each) instead of
per-row probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_table

_SUPPLY_SQL = """
    supply AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(l_extendedprice / l_quantity) AS ps_supplycost,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ps_availqty
      FROM lineitem GROUP BY 1, 2
    )
"""


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
        F.sum(F.col("l_quantity").cast("long")).alias("ps_availqty"),
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH {_SUPPLY_SQL},
    regional AS (
      SELECT s.s_suppkey, s.s_acctbal, s.s_name, n.n_name,
             sp.ps_partkey, sp.ps_supplycost
      FROM supply sp
      JOIN supplier s ON s.s_suppkey = sp.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT rg.s_acctbal, rg.s_name, rg.n_name, p.p_partkey, p.p_name,
           ROUND(rg.ps_supplycost, 4) AS ps_supplycost
    FROM regional rg
    JOIN part p ON p.p_partkey = rg.ps_partkey
    WHERE p.p_size <= 10 AND p.p_type = 'ECONOMY'
      AND rg.ps_supplycost = (
        SELECT MIN(r2.ps_supplycost) FROM regional r2
        WHERE r2.ps_partkey = rg.ps_partkey
      )
    ORDER BY rg.s_acctbal DESC, rg.n_name, rg.s_name, p.p_partkey, rg.s_suppkey
    LIMIT 20
    """,
    tags=("tpch", "q2"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: minimum-cost supplier per part within a region — a
    correlated scalar-MIN subquery over a supplier→nation→region
    chain, decorrelated into a per-part MIN joined back on (part,
    cost). The MIN-equality join is safe on doubles: both sides are
    the same untouched value. Dims broadcast; supply aggregates once."""
    sp = _supply(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") <= 10) & (F.col("p_type") == "ECONOMY")
    )
    regional = (
        sp.join(F.broadcast(s), sp.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name", "ps_partkey", "ps_supplycost")
    )
    min_cost = regional.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("__min_cost")
    )
    return (
        regional.join(min_cost, "ps_partkey")
        .where(F.col("ps_supplycost") == F.col("__min_cost"))
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey", "s_suppkey"
        )
        .limit(20)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("ps_supplycost", 4).alias("ps_supplycost"),
        )
    )


@query(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH {_SUPPLY_SQL},
    val AS (
      SELECT sp.ps_partkey,
             CAST(ROUND(sp.ps_supplycost * 100, 0) AS BIGINT) * sp.ps_availqty AS v
      FROM supply sp
      JOIN supplier s ON s.s_suppkey = sp.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
    )
    SELECT ps_partkey, CAST(SUM(v) AS BIGINT) AS part_value
    FROM val
    GROUP BY ps_partkey
    HAVING SUM(v) > (SELECT SUM(v) * 0.001 FROM val)
    """,
    tags=("tpch", "q11"),
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-part stock value filtered against a scalar
    fraction of the GLOBAL total — the classic group-vs-grand-total
    HAVING. Value is integer cents × quantity so the sums are exact
    under any aggregation order. The grand total is a 1-row broadcast
    cross join, not a per-row subquery."""
    sp = _supply(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    val = (
        sp.join(F.broadcast(s), sp.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            (
                F.round(F.col("ps_supplycost") * 100, 0).cast("long")
                * F.col("ps_availqty")
            ).alias("v"),
        )
    )
    per_part = val.groupBy("ps_partkey").agg(F.sum("v").alias("part_value"))
    total = val.agg((F.sum("v") * 0.001).alias("__threshold"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("part_value") > F.col("__threshold"))
        .select("ps_partkey", "part_value")
    )


@query(
    "tpch_q20_potential_promotion",
    oracle=f"""
    WITH {_SUPPLY_SQL},
    q96 AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty96
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1, 2
    ),
    promo_supp AS (
      SELECT DISTINCT sp.ps_suppkey
      FROM supply sp
      JOIN q96 ON q96.l_partkey = sp.ps_partkey AND q96.l_suppkey = sp.ps_suppkey
      WHERE sp.ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        AND sp.ps_availqty > 2 * q96.qty96
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_regionkey = 2
      AND s.s_suppkey IN (SELECT ps_suppkey FROM promo_supp)
    ORDER BY s.s_name
    """,
    tags=("tpch", "q20"),
)
def tpch_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested IN subqueries — suppliers of name-matched
    parts whose availability beats a CORRELATED per-(part,supplier)
    quantity aggregate, then an outer IN against that supplier set.
    Decorrelated: the inner aggregate is a pre-grouped join, the part
    filter a broadcast semi join, the outer IN a left-semi join.
    Integer quantity sums keep the threshold comparison exact."""
    sp = _supply(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    q96 = (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01 00:00:00")
            & (F.col("l_shipdate") < "1997-01-01 00:00:00")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty96"))
    )
    small_parts = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("small%")
    )
    promo_supp = (
        sp.join(
            q96,
            (sp.ps_partkey == q96.l_partkey) & (sp.ps_suppkey == q96.l_suppkey),
        )
        .where(F.col("ps_availqty") > 2 * F.col("qty96"))
        .join(
            F.broadcast(small_parts),
            F.col("ps_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .select("ps_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_regionkey") == 2)
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(promo_supp, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
