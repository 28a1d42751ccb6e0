"""Core scan / project / filter / sort-limit queries.

Generalizes the reference's only query shape — partition-pruned EQ +
BETWEEN range scan (replayer:15–41, SURVEY.md §2a R12) — and covers the
§2b predicate/projection/sort surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_events_pushdown, load_table


@query(
    "replay_range",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    WHERE event_type = 'purchase'
      AND ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'
    GROUP BY CAST(ts AS DATE)
    """,
    tags=("flagship", "filter", "between", "agg"),
)
def replay_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's replay query shape (EQ on source +
    BETWEEN on timestamp; replayer:19–39) generalized with a rollup.

    At scale the events table is ``partitionBy(event_type)`` so the EQ
    predicate prunes partitions and the ts range hits Parquet min/max
    row-group skipping — the Spark analog of DynamoDB pk EQ + sk
    BETWEEN (stack.py:63–77). load_events_pushdown applies the range
    on the raw int64 ns column so it reaches the parquet scan even on
    the ns-typed fixtures (tests/test_plans.py pins this).
    """
    e = load_events_pushdown(
        spark, sf_dir, ts_between=("2024-01-05 00:00:00", "2024-01-20 00:00:00")
    )
    return (
        e.where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


@query(
    "scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 2) AS net_price,
           upper(l_returnflag) AS flag
    FROM lineitem
    WHERE l_quantity > 45
    """,
    tags=("scan", "project"),
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + computed column + filter; Catalyst pushes the
    quantity predicate and prunes to 6 of 11 columns at the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_quantity") > 45).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("net_price"),
        F.upper("l_returnflag").alias("flag"),
    )


@query(
    "filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice BETWEEN 1000 AND 100000
      AND o_orderpriority LIKE '%URGENT%'
      AND NOT (o_custkey < 10)
      AND o_orderdate IS NOT NULL
    """,
    tags=("filter",),
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §2b predicate suite: IN, BETWEEN, LIKE, NOT, IS NULL —
    all pushed to the Parquet scan where the format allows."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(1000, 100000)
        & F.col("o_orderpriority").like("%URGENT%")
        & ~(F.col("o_custkey") < 10)
        & F.col("o_orderdate").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
    tags=("sort", "limit"),
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 by price. o_orderkey tie-break makes the limit
    deterministic. Spark plans this as TakeOrderedAndProject — a
    per-partition top-k then a k-row merge, no global sort shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .limit(100)
    )


@query(
    "distinct_values",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    tags=("distinct",),
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a two-column projection (dedup-then-project shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@query(
    "conditional_case",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 150000 THEN 'big'
                WHEN o_totalprice > 50000 THEN 'mid'
                ELSE 'small' END AS bucket,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS status_norm
    FROM orders
    WHERE o_orderkey % 7 = 0
    """,
    tags=("conditional",),
)
def conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise + coalesce + nullif (R14 dispatch generalized)."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 150000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending")).alias(
            "status_norm"
        ),
    )
