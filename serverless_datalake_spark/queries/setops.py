"""Set operations: UNION ALL / UNION / INTERSECT / EXCEPT (§2b)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_table


def _buyers(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.where(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("custkey"))


def _urgent(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )


_BUYERS_SQL = "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000"
_URGENT_SQL = "SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'"


@query(
    "set_union_all",
    oracle=f"""
    SELECT custkey, COUNT(*) AS n FROM ({_BUYERS_SQL} UNION ALL {_URGENT_SQL})
    GROUP BY custkey
    """,
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL keeps duplicates (bag semantics) — aggregated so the
    result is deterministic for hashing."""
    u = _buyers(spark, sf_dir).unionAll(_urgent(spark, sf_dir))
    return u.groupBy("custkey").agg(F.count("*").alias("n"))


@query(
    "set_union_distinct",
    oracle=f"SELECT custkey FROM ({_BUYERS_SQL} UNION {_URGENT_SQL})",
    tags=("setop",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two projections — union + dedup in one operator."""
    return _buyers(spark, sf_dir).union(_urgent(spark, sf_dir)).distinct()


@query(
    "set_intersect",
    oracle=f"{_BUYERS_SQL} INTERSECT {_URGENT_SQL}",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: rows present in both inputs (set semantics)."""
    return _buyers(spark, sf_dir).intersect(_urgent(spark, sf_dir))


@query(
    "set_except",
    oracle=f"{_BUYERS_SQL} EXCEPT {_URGENT_SQL}",
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: rows of the left input absent from the right (set semantics)."""
    # subtract == SQL EXCEPT (set semantics); exceptAll would keep
    # multiplicity differences, which is a different operator.
    return _buyers(spark, sf_dir).subtract(_urgent(spark, sf_dir))


@query(
    "set_intersect_all",
    oracle=f"""
    SELECT custkey, COUNT(*) AS n
    FROM ({_BUYERS_SQL} INTERSECT ALL {_URGENT_SQL})
    GROUP BY custkey
    """,
    tags=("setop", "multiset"),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection (each row kept
    min(count_left, count_right) times), the bag-algebra sibling of
    set_intersect; Catalyst plans it as a counted left-semi shape, not
    a distinct + join."""
    i = _buyers(spark, sf_dir).intersectAll(_urgent(spark, sf_dir))
    return i.groupBy("custkey").agg(F.count("*").alias("n"))


@query(
    "set_except_all",
    oracle=f"""
    SELECT custkey, COUNT(*) AS n
    FROM ({_BUYERS_SQL} EXCEPT ALL {_URGENT_SQL})
    GROUP BY custkey
    """,
    tags=("setop", "multiset"),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (counts subtract, floor at
    zero): the dedup-free 'what remains after removing one occurrence
    per match' semantics CDC reconciliation uses (txlog_changes is
    built on exceptAll for exactly this reason)."""
    e = _buyers(spark, sf_dir).exceptAll(_urgent(spark, sf_dir))
    return e.groupBy("custkey").agg(F.count("*").alias("n"))
