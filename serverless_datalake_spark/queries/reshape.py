"""Reshaping operators (§2b extensions): pivot (long→wide), unpivot /
stack (wide→long), and explicit null-ordering sorts."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_table


@query(
    "reshape_pivot",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("reshape", "pivot"),
)
def reshape_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot long→wide with an EXPLICIT value list — at scale an
    implicit pivot adds a full distinct-values job before the real
    aggregation; pinning the columns keeps it one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return out.select(
        "l_returnflag", F.col("F").alias("qty_F"), F.col("O").alias("qty_O")
    )


@query(
    "reshape_unpivot",
    oracle="""
    SELECT c_custkey, metric, val FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val FROM customer
    )
    """,
    tags=("reshape", "unpivot"),
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot wide→long via the native unpivot (melt) — one Generate
    node, no self-union scans."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey", F.col("c_acctbal").alias("acctbal"), F.col("c_nationkey").cast("double").alias("nationkey")
    ).unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "val")


@query(
    "sort_nulls_ordering",
    oracle="""
    SELECT o_orderkey, val
    FROM (SELECT o_orderkey, NULLIF(o_totalprice, 0) AS val
          FROM orders WHERE o_orderkey % 9 = 0)
    ORDER BY val DESC NULLS FIRST, o_orderkey
    LIMIT 200
    """,
    tags=("sort", "nulls"),
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST with a descending key + tie-break —
    null-ordering defaults differ between engines, so it's always
    pinned explicitly."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderkey") % 9 == 0)
        .select("o_orderkey", F.nullif(F.col("o_totalprice"), F.lit(0)).alias("val"))
        .orderBy(F.col("val").desc_nulls_first(), F.col("o_orderkey"))
        .limit(200)
    )
