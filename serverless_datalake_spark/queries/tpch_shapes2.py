"""TPC-H query shapes, batch 2 — the remaining canonical patterns:
scan-only aggregate (Q6), correlated EXISTS (Q4), nation-pair volume
(Q7), market share with conditional ratio (Q8), profit rollup (Q9),
conditional counts (Q12), promo ratio (Q14), scalar-subquery max
(Q15), correlated-average anti-pattern (Q17), HAVING-IN fact filter
(Q18), disjunctive multi-column predicates (Q19), double-correlated
EXISTS/NOT EXISTS (Q21), NOT EXISTS + scalar threshold (Q22).

Columns the fixtures lack (partsupp, commit/receipt dates, ship
modes, phones) are substituted with available ones — the plan shapes
(join order, semi/anti strategy, partial agg, subquery decorrelation)
are the point, per SURVEY.md §2b "north star".

Scale notes (100 TB posture): every dim join is broadcast; the
correlated subqueries are expressed as pre-aggregated joins on the
Spark side (one shuffle each) instead of per-row subquery execution;
Q21's double EXISTS becomes a single per-order aggregate joined back
— O(1) passes over lineitem rather than two correlated probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_table


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("tpch", "q6"),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: pure scan + filter + global agg — the pushdown showcase.
    All four predicates reach the Parquet scan (min/max row-group
    skipping on l_shipdate); no shuffle beyond the 1-row final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01 00:00:00")
            & (F.col("l_shipdate") < "1997-01-01 00:00:00")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"))
    )


@query(
    "tpch_q4_priority_check",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
    tags=("tpch", "q4"),
)
def tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: correlated EXISTS → left-semi join with a compound
    condition (equi key + row-vs-row date comparison), then a tiny
    agg. Catalyst decorrelates to a semi join on l_orderkey."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00")
        & (F.col("o_orderdate") < "1996-07-01 00:00:00")
    )
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           ROUND(SUM(volume), 4) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                             AND TIMESTAMP '1996-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "q7"),
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: bilateral trade volume between two nations by year. The
    nation-pair disjunction lands after both nation joins (broadcast);
    the fact tables shuffle once each on their join keys."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1995-01-01 00:00:00", "1996-12-31 00:00:00")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = F.broadcast(load_table(spark, sf_dir, "nation")).alias("n1")
    n2 = F.broadcast(load_table(spark, sf_dir, "nation")).alias("n2")
    pair = (
        (F.col("n1.n_name") == "NATION_3") & (F.col("n2.n_name") == "NATION_7")
    ) | ((F.col("n1.n_name") == "NATION_7") & (F.col("n2.n_name") == "NATION_3"))
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, s.s_nationkey == F.col("n1.n_nationkey"))
        .join(n2, c.c_nationkey == F.col("n2.n_nationkey"))
        .where(pair)
        .groupBy(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
                 / SUM(volume), 4) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
        AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                              AND TIMESTAMP '1996-12-31 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
    tags=("tpch", "q8"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: one nation's share of PROMO-part revenue in a region by
    year — conditional-sum ratio over an 8-way join. part is the
    selective filter; all dims broadcast."""
    p = F.broadcast(
        load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between("1995-01-01 00:00:00", "1996-12-31 00:00:00")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = F.broadcast(load_table(spark, sf_dir, "nation")).alias("n1")
    n2 = F.broadcast(load_table(spark, sf_dir, "nation")).alias("n2")
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, c.c_nationkey == F.col("n1.n_nationkey"))
        .join(r, F.col("n1.n_regionkey") == r.r_regionkey)
        .where(r.r_name == "EUROPE")
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(n2, s.s_nationkey == F.col("n2.n_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n2.n_name") == "NATION_5", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "tpch_q9_product_profit",
    oracle="""
    SELECT nation, o_year, ROUND(SUM(amount), 4) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.1 * p.p_retailprice * l.l_quantity AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    """,
    tags=("tpch", "q9"),
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit by supplier-nation and order-year for parts
    matching a name pattern. partsupp is absent from the fixtures, so
    supply cost is modeled as 10% of p_retailprice — the join/agg
    topology (two facts, two dims, LIKE filter) is Q9's."""
    p = F.broadcast(
        load_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.round(F.sum(amount), 4).alias("sum_profit"))
    )


@query(
    "tpch_q12_priority_counts",
    oracle="""
    SELECT l.l_linestatus,
           COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag = 'N'
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
    tags=("tpch", "q12"),
)
def tpch_q12_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional counts per category after a fact-fact
    join (ship modes are absent; l_linestatus stands in). COUNT(CASE)
    keeps both engines in BIGINT — SUM(INTEGER) would be HUGEINT in
    DuckDB and break type parity."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_returnflag") == "N")
        & (F.col("l_shipdate") >= "1997-01-01 00:00:00")
        & (F.col("l_shipdate") < "1998-01-01 00:00:00")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q14_promo_effect",
    oracle="""
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
    tags=("tpch", "q14"),
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: percentage of one month's revenue from PROMO parts —
    conditional-sum ratio over a broadcast part join."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-03-01 00:00:00")
        & (F.col("l_shipdate") < "1997-04-01 00:00:00")
    )
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(p, li.l_partkey == p.p_partkey).agg(
        F.round(
            100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev),
            4,
        ).alias("promo_revenue")
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("tpch", "q15"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) achieving the quarter's max revenue — CTE +
    scalar subquery. Spark side computes the revenue aggregate once
    and reuses it for both the max and the equality filter (the max
    is a 1-row broadcast cross join, not a per-row subquery)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1996-04-01 00:00:00")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "total_revenue"
        )
    )
    mx = F.broadcast(revenue.agg(F.max("total_revenue").alias("max_rev")))
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .join(mx, F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q17_small_quantity",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (
        SELECT 0.3 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    """,
    tags=("tpch", "q17"),
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue from small-quantity orders of one brand/type —
    the correlated-average pattern. Spark side decorrelates by hand:
    per-part averages in one pass, broadcast back onto the filtered
    fact (quantities are integral doubles, so AVG is bit-identical
    across engines: exact integer sum, one division). Threshold is
    0.3×avg on brand alone — brand+type is empty at sf0.001."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    )
    part_avg = (
        li.groupBy(F.col("l_partkey").alias("avg_partkey"))
        .agg((0.3 * F.avg("l_quantity")).alias("qty_threshold"))
    )
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .join(F.broadcast(part_avg), F.col("avg_partkey") == li.l_partkey)
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@query(
    "tpch_q18_large_volume",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS orderdate,
           o.o_totalprice,
           CAST(SUM(l.l_quantity) AS BIGINT) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey,
             CAST(o.o_orderdate AS DATE), o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
    tags=("tpch", "q18"),
)
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: customers with orders above 300 total quantity — IN over
    a HAVING aggregate → semi join on the pre-aggregated keys (one
    extra pass over lineitem, broadcastable key set), then the detail
    rollup. Quantities are integral doubles → exact BIGINT cast."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .where(F.col("sq") > 300)
        .select("l_orderkey")
    )
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(
            F.broadcast(big.withColumnRenamed("l_orderkey", "big_orderkey")),
            F.col("o_orderkey") == F.col("big_orderkey"),
            "left_semi",
        )
        .join(c, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("orderdate"),
            "o_totalprice",
        )
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@query(
    "tpch_q19_disjunctive_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("tpch", "q19"),
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: disjunction of conjunctive brand/size/quantity ranges
    spanning both join sides. Catalyst extracts the common p_partkey
    equi-key and keeps the OR as a post-join filter; the brand/size
    half pushes into the broadcast build side."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@query(
    "tpch_q21_waiting_supplier",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
    tags=("tpch", "q21"),
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: the sole at-fault supplier in multi-supplier orders
    — double-correlated EXISTS / NOT EXISTS. Rather than two
    correlated probes (two extra shuffles of lineitem), the Spark
    plan aggregates per order once — distinct supplier count and
    distinct R-flagged supplier count — and joins that back:
    EXISTS(other supplier)      ⇔ n_supp ≥ 2
    NOT EXISTS(other R supplier) ⇔ n_r_supp = 1 (l1 itself is R).
    One pass over lineitem instead of three; the per-order aggregate
    is orders-sized and broadcastable."""
    li = load_table(spark, sf_dir, "lineitem")
    order_stats = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))).alias(
            "n_r_supp"
        ),
    )
    l1 = li.where(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    return (
        l1.join(o, o.o_orderkey == l1.l_orderkey)
        .join(order_stats, F.col("ok") == l1.l_orderkey)
        .where((F.col("n_supp") >= 2) & (F.col("n_r_supp") == 1))
        .join(s, s.s_suppkey == l1.l_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


@query(
    "tpch_q22_dormant_customers",
    oracle="""
    SELECT cntrycode, COUNT(*) AS numcust,
           ROUND(SUM(c_acctbal), 4) AS totacctbal
    FROM (
      SELECT CAST(c.c_nationkey % 5 AS INTEGER) AS cntrycode, c.c_acctbal
      FROM customer c
      WHERE c.c_acctbal > (
        SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      )
    ) custsale
    GROUP BY cntrycode
    """,
    tags=("tpch", "q22"),
)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: wealthy customers dormant since 1999, bucketed by a
    country code (nationkey mod 5 stands in for the phone prefix).
    Every fixture customer has ≥1 order, so "never ordered" would be
    empty — the recency predicate keeps Q22's anti-join shape with a
    non-degenerate answer. Scalar AVG subquery → 1-row broadcast;
    NOT EXISTS → left-anti against the date-filtered orders keys."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = F.broadcast(
        c.where(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= "1999-01-01 00:00:00"
    )
    return (
        c.join(avg_bal)
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 5).cast("int").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    tags=("tpch", "q13"),
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: histogram of per-customer order counts (excluding one
    priority class) — LEFT JOIN so zero-order customers land in the
    c_count=0 bucket, then a second aggregation over the first.
    COUNT(o_orderkey) counts matches only (NULL-safe), which is the
    whole point of the outer join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "tpch_q16_supplier_counting",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT IN ('PROMO', 'ECONOMY')
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    tags=("tpch", "q16"),
)
def tpch_q16_supplier_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct suppliers per (brand, type, size) slice,
    excluding a blacklist via NOT IN (→ left-anti; the blacklist is
    'suppliers in deficit' since the fixtures lack comments). partsupp
    is absent, so the part↔supplier relation comes from lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part").where(
            (F.col("p_brand") != "Brand#1")
            & ~F.col("p_type").isin("PROMO", "ECONOMY")
            & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
        )
    )
    bad = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0.0
    ).select("s_suppkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )
