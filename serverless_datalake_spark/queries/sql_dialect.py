"""SQL front-end parity (SURVEY.md §2b: "SQL of any dialect" is
absent from the reference — here the engine exposes the full Spark
SQL dialect over the same tables). These queries run through
``spark.sql`` against registered temp views, proving the declarative
surface is not DataFrame-API-only: GROUPING SETS, CTEs, correlated
scalar subqueries, EXISTS, and a TPC-H-shaped multi-join."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import register_views


@query(
    "sql_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           ROUND(SUM(l_extendedprice), 2) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    tags=("sql", "grouping-sets"),
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube) via the SQL
    front-end — one Expand node, one shuffle for all three set levels."""
    register_views(spark, sf_dir, only=("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               ROUND(SUM(l_extendedprice), 2) AS revenue
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "sql_correlated_subquery",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
    """,
    tags=("sql", "subquery"),
)
def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + join (no per-row re-execution; verify with .explain)."""
    register_views(spark, sf_dir, only=("customer",))
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@query(
    "sql_cte_multijoin",
    oracle="""
    WITH big_orders AS (
      SELECT o_orderkey, o_custkey, o_orderdate
      FROM orders WHERE o_totalprice > 150000
    )
    SELECT n.n_name AS nation,
           YEAR(b.o_orderdate) AS order_year,
           COUNT(DISTINCT b.o_orderkey) AS n_orders,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM big_orders b
    JOIN lineitem l ON l.l_orderkey = b.o_orderkey
    JOIN customer c ON c.c_custkey = b.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name, YEAR(b.o_orderdate)
    """,
    tags=("sql", "cte", "tpch"),
)
def sql_cte_multijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + 4-way join + mixed agg (TPC-H Q3/Q5 shape). Catalyst
    reorders joins and broadcasts the small sides; YEAR cast to BIGINT
    for oracle type parity."""
    register_views(spark, sf_dir, only=("orders", "lineitem", "customer", "nation"))
    return spark.sql(
        """
        WITH big_orders AS (
          SELECT o_orderkey, o_custkey, o_orderdate
          FROM orders WHERE o_totalprice > 150000
        )
        SELECT n.n_name AS nation,
               CAST(YEAR(b.o_orderdate) AS BIGINT) AS order_year,
               COUNT(DISTINCT b.o_orderkey) AS n_orders,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        FROM big_orders b
        JOIN lineitem l ON l.l_orderkey = b.o_orderkey
        JOIN customer c ON c.c_custkey = b.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name, YEAR(b.o_orderdate)
        """
    )


@query(
    "sql_exists_not_exists",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey
                  AND l.l_quantity > 45)
      AND NOT EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_suppkey = s.s_suppkey
                      AND l2.l_returnflag = 'R' AND l2.l_quantity > 48
                      AND l2.l_discount > 0.08)
    """,
    tags=("sql", "exists"),
)
def sql_exists_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS + NOT EXISTS in one predicate → planned as a left-semi
    and a left-anti join over the same scan. Predicates picked to be
    non-degenerate at BOTH fixture scales (2/10 suppliers at sf0.001,
    35/100 at sf0.01) — a 0-row result would pass parity trivially."""
    register_views(spark, sf_dir, only=("supplier", "lineitem"))
    return spark.sql(
        """
        SELECT s.s_suppkey, s.s_name
        FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey
                      AND l.l_quantity > 45)
          AND NOT EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_suppkey = s.s_suppkey
                          AND l2.l_returnflag = 'R' AND l2.l_quantity > 48
                          AND l2.l_discount > 0.08)
        """
    )


@query(
    "sql_in_subquery_topn",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10
    )
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
    tags=("sql", "in-subquery"),
)
def sql_in_subquery_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) predicate against a top-n derived set."""
    register_views(spark, sf_dir, only=("orders", "customer"))
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (
          SELECT c_custkey FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10
        )
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 50
        """
    )


@query(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE spine(d) AS (
      SELECT DATE '1995-01-01'
      UNION ALL
      SELECT CAST(d + INTERVAL 1 DAY AS DATE) FROM spine WHERE d < DATE '1995-03-31'
    )
    SELECT spine.d AS day, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
    FROM spine LEFT JOIN orders ON CAST(o_orderdate AS DATE) = spine.d
    GROUP BY spine.d
    """,
    tags=("sql", "recursive", "gapfill"),
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4's recursive CTE): generate a dense
    90-day date spine, left-join daily order counts — the calendar
    gap-fill every reporting pipeline needs (days with zero orders
    appear as 0, which a plain GROUP BY over fact rows cannot
    produce). The spine is driver-tiny and broadcast; recursion depth
    is bounded by the date range, not data size. Identical SQL text
    runs on both engines."""
    register_views(spark, sf_dir, only=("orders",))
    return spark.sql(
        """
        WITH RECURSIVE spine(d) AS (
          SELECT DATE '1995-01-01'
          UNION ALL
          SELECT CAST(d + INTERVAL 1 DAY AS DATE) FROM spine WHERE d < DATE '1995-03-31'
        )
        SELECT spine.d AS day, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
        FROM spine LEFT JOIN orders ON CAST(o_orderdate AS DATE) = spine.d
        GROUP BY spine.d
        """
    )


@query(
    "sql_lateral_topn",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, ROUND(o.o_totalprice, 2) AS o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) o
    """,
    tags=("sql", "lateral"),
)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery — top-2 orders per customer
    written as a per-row dependent subquery, the SQL idiom ORMs and
    analysts reach for before they know window functions. Catalyst
    decorrelates the LATERAL into a ranked join (DomainJoin →
    window + filter), so it executes as the same one-shuffle
    WindowGroupLimit plan as topk_per_group — per-row re-execution
    never happens."""
    register_views(spark, sf_dir, only=("customer", "orders"))
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, ROUND(o.o_totalprice, 2) AS o_totalprice
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) o
        """
    )


@query(
    "sql_named_window",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(o_totalprice, 2) AS o_totalprice,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           ROUND(SUM(o_totalprice) OVER w, 2) AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("sql", "window"),
)
def sql_named_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named WINDOW clause — one window definition shared by several
    analytic functions (the SQL spec's answer to copy-pasted OVER
    clauses, and a guarantee both functions compute over the SAME
    frame → one Window operator in the plan, not two)."""
    register_views(spark, sf_dir, only=("orders",))
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               ROUND(o_totalprice, 2) AS o_totalprice,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
               ROUND(SUM(o_totalprice) OVER w, 2) AS running_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """
    )


@query(
    "sql_pivot_syntax",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS BIGINT) END)
                AS BIGINT) AS qty_open,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS BIGINT) END)
                AS BIGINT) AS qty_filled,
           CAST(COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS n_open,
           CAST(COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS n_filled
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("sql", "pivot"),
)
def sql_pivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-dialect PIVOT clause (Spark's `FROM ... PIVOT (agg FOR
    col IN (...))` syntax — reshape_pivot covers the DataFrame
    `groupBy().pivot()` API; this covers the parser path, with
    multiple aggregates per pivot value). Quantities ride as integers
    so the pivoted sums are exact under any partitioning.

    Scale: compiles to the identical partial-agg + final-agg plan as
    a conditional aggregation — pivot values are enumerated at plan
    time, so no extra shuffle versus a plain groupBy."""
    register_views(spark, sf_dir, only=("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag,
               o_sq AS qty_open, f_sq AS qty_filled,
               o_n AS n_open, f_n AS n_filled
        FROM (
          SELECT l_returnflag, l_linestatus, CAST(l_quantity AS BIGINT) AS q
          FROM lineitem
        )
        PIVOT (
          SUM(q) AS sq, COUNT(q) AS n
          FOR l_linestatus IN ('O' AS o, 'F' AS f)
        )
        """
    )


@query(
    "sql_grouping_id",
    oracle="""
    SELECT * FROM (
      SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
             COALESCE(l_linestatus, '<all>') AS linestatus,
             CAST(2 * GROUPING(l_returnflag) + GROUPING(l_linestatus) AS BIGINT) AS grain,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ) WHERE grain <> 1
    """,
    tags=("sql", "rollup", "grouping"),
)
def sql_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() grain identification over a ROLLUP — the mechanism
    that lets one Expand pass serve multiple report grains while
    consumers filter/route by grain id (here: HAVING drops the
    mid grain, keeping leaf and grand-total rows). The bitmask is
    spelled 2·g(a)+g(b) — portable across engines, unlike native
    GROUPING_ID whose bit order is engine-defined.

    Scale: ROLLUP is one Expand (row replication per grain) into one
    partial-agg shuffle — the grain filter prunes before the final
    aggregate, not after."""
    register_views(spark, sf_dir, only=("lineitem",))
    return spark.sql(
        """
        SELECT * FROM (
          SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
                 COALESCE(l_linestatus, '<all>') AS linestatus,
                 CAST(2 * grouping(l_returnflag) + grouping(l_linestatus) AS BIGINT) AS grain,
                 COUNT(*) AS n
          FROM lineitem
          GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ) WHERE grain <> 1
        """
    )


@query(
    "sql_unpivot_syntax",
    oracle="""
    WITH s AS (
      SELECT o_orderpriority,
             CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
             CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
      FROM orders GROUP BY 1
    )
    SELECT o_orderpriority, 'n_open' AS status_col, n_open AS n FROM s
    UNION ALL
    SELECT o_orderpriority, 'n_filled', n_filled FROM s
    UNION ALL
    SELECT o_orderpriority, 'n_pending', n_pending FROM s
    """,
    tags=("sql", "unpivot"),
)
def sql_unpivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-dialect UNPIVOT clause (Spark 3.4+ parser syntax —
    reshape_unpivot covers the DataFrame `unpivot()` API; this covers
    the `FROM ... UNPIVOT (val FOR col IN (...))` parser path),
    widening a per-status count matrix back to long form. The oracle
    spells the same relation as the UNION ALL it desugars to.

    Scale: UNPIVOT compiles to Expand (one pass emitting N rows per
    input row) over the already-aggregated relation — no join, no
    extra shuffle; the wide aggregate beneath is one partial-agg
    pass over orders."""
    register_views(spark, sf_dir, only=("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority, status_col, n
        FROM (
          SELECT o_orderpriority,
                 CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
                 CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
                 CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
          FROM orders GROUP BY o_orderpriority
        )
        UNPIVOT (
          n FOR status_col IN (n_open, n_filled, n_pending)
        )
        """
    )


@query(
    "sql_parameterized_query",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)) AS BIGINT) AS cents
    FROM orders
    WHERE o_totalprice > 150000.0 AND o_orderkey % 5 = 0
    GROUP BY 1
    """,
    tags=("sql", "parameterized"),
)
def sql_parameterized_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 3.4+/4 named parameter markers —
    `spark.sql(query, args={...})`): the injection-safe way to
    template queries, binding `:minp` and `:modulus` as TYPED
    literals at parse time rather than string-formatting them in. The
    oracle inlines the same literal values.

    Scale: parameters are plan-time literals, so pushdown works
    exactly as with inline constants (the o_totalprice predicate
    reaches the scan) — unlike string concat, with no quoting hazard."""
    register_views(spark, sf_dir, only=("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)) AS BIGINT) AS cents
        FROM orders
        WHERE o_totalprice > :minp AND o_orderkey % :modulus = 0
        GROUP BY o_orderpriority
        """,
        args={"minp": 150000.0, "modulus": 5},
    )


@query(
    "sql_filter_clause",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) FILTER (WHERE l_quantity >= 25) AS BIGINT) AS n_bulk,
           CAST(COUNT(*) FILTER (WHERE l_discount = 0.0) AS BIGINT) AS n_undiscounted,
           CAST(SUM(CAST(l_quantity AS BIGINT)) FILTER (WHERE l_linestatus = 'O')
                AS BIGINT) AS qty_open,
           CAST(COUNT(DISTINCT l_suppkey) FILTER (WHERE l_tax > 0.04)
                AS BIGINT) AS n_taxed_suppliers
    FROM lineitem GROUP BY 1
    """,
    tags=("sql", "filter-clause"),
)
def sql_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL:2003 aggregate FILTER clause (`agg(...) FILTER (WHERE
    p)`) — per-aggregate predicates in one pass, including the
    FILTER + DISTINCT combination; the declarative spelling of the
    conditional-aggregation CASE pattern. DuckDB shares the syntax,
    so the oracle is the literal same query.

    Scale: compiles to the same partial-agg + final-agg plan as
    CASE-based conditional aggregation — one scan, one shuffle at
    group grain, no per-predicate passes."""
    register_views(spark, sf_dir, only=("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(COUNT(*) FILTER (WHERE l_quantity >= 25) AS BIGINT) AS n_bulk,
               CAST(COUNT(*) FILTER (WHERE l_discount = 0.0) AS BIGINT) AS n_undiscounted,
               CAST(SUM(CAST(l_quantity AS BIGINT)) FILTER (WHERE l_linestatus = 'O')
                    AS BIGINT) AS qty_open,
               CAST(COUNT(DISTINCT l_suppkey) FILTER (WHERE l_tax > 0.04)
                    AS BIGINT) AS n_taxed_suppliers
        FROM lineitem GROUP BY l_returnflag
        """
    )


@query(
    "sql_scalar_udf",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0)
                    AS BIGINT)) AS BIGINT) AS net_e4,
           CAST(SUM(CASE WHEN l_quantity >= 40 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk
    FROM lineitem GROUP BY 1
    """,
    tags=("sql", "sql-udf"),
)
def sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDFs (Spark 3.4+ `CREATE TEMPORARY FUNCTION ...
    RETURNS ... RETURN expr`): reusable expression-level functions
    defined IN SQL — they inline into the caller's plan at analysis
    time, so unlike Python UDFs they stay inside whole-stage codegen
    and cost nothing at runtime. The oracle spells the inlined
    expressions directly, proving the inlining is semantics-neutral.

    Scale: zero — the functions vanish into the same partial-agg plan
    the inline expression produces; this is the mechanism for sharing
    business logic (net price, bulk thresholds) across a query fleet
    without a UDF tax."""
    register_views(spark, sf_dir, only=("lineitem",))
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION net_e4(price DOUBLE, disc DOUBLE)
        RETURNS BIGINT
        RETURN CAST(ROUND(price * (1 - disc) * 10000, 0) AS BIGINT)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION is_bulk(qty DOUBLE)
        RETURNS INT
        RETURN CASE WHEN qty >= 40 THEN 1 ELSE 0 END
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(net_e4(l_extendedprice, l_discount)) AS BIGINT) AS net_e4,
               CAST(SUM(is_bulk(l_quantity)) AS BIGINT) AS n_bulk
        FROM lineitem GROUP BY l_returnflag
        """
    )


@query(
    "sql_group_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem
    GROUP BY ALL
    """,
    tags=("sql", "group-by-all"),
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (Spark 3.4+ adopted DuckDB's shorthand): every
    non-aggregate select item becomes a grouping key — the
    keep-the-query-in-sync-with-itself dialect feature analysts lean
    on. Both engines support the syntax natively, so the oracle is
    the literal same text.

    Scale: identical plan to the explicit GROUP BY — resolution
    happens at analysis."""
    register_views(spark, sf_dir, only=("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem
        GROUP BY ALL
        """
    )


@query(
    "sql_lateral_alias",
    oracle="""
    SELECT o_orderkey,
           CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT) AS cents,
           CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT) / 100000 AS price_band,
           CASE WHEN CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT) / 100000 >= 200
                THEN 'high' ELSE 'normal' END AS band_label
    FROM orders WHERE o_orderkey % 50 = 0
    """,
    tags=("sql", "lateral-alias"),
)
def sql_lateral_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases (Spark 3.4+): a SELECT item referencing
    an alias defined EARLIER IN THE SAME SELECT LIST (`cents`,
    `price_band`), removing the subquery-per-derivation stutter. The
    oracle expands the aliases manually — proving the lateral
    resolution is pure syntax.

    Scale: zero — aliases inline at analysis; one map-only
    projection."""
    register_views(spark, sf_dir, only=("orders",))
    return spark.sql(
        """
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT) AS cents,
               cents / 100000 AS price_band,
               CASE WHEN price_band >= 200 THEN 'high' ELSE 'normal' END AS band_label
        FROM orders WHERE o_orderkey % 50 = 0
        """
    )


@query(
    "sql_join_hint_broadcast",
    oracle="""
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(ROUND(c.c_acctbal * 100.0, 0) AS BIGINT)) AS BIGINT)
             AS cents
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY 1
    """,
    tags=("sql", "hints"),
)
def sql_join_hint_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL join-strategy hints (`/*+ BROADCAST(n) */`): the
    parser-path way to pin a physical strategy when statistics
    mislead the optimizer — semantically a no-op (the oracle is the
    plain join), which is exactly what the equality check proves;
    the physical effect (broadcast side selection) is what
    tests/test_plans pins elsewhere. Hints are the escape hatch of
    last resort; AQE's runtime re-selection makes most of them
    unnecessary, and a hint naming a missing relation is silently
    ignored rather than an error — both reasons to prefer
    F.broadcast in code."""
    register_views(spark, sf_dir, only=("customer", "nation"))
    return spark.sql(
        """
        SELECT /*+ BROADCAST(n) */ n.n_name,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(ROUND(c.c_acctbal * 100.0, 0) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name
        """
    )


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag AS flag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    WHERE l_quantity > 30
    GROUP BY l_returnflag
    """,
    tags=("sql", "dialect", "pipe-syntax"),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe-operator syntax (|>, Spark 4.0+): the same logical
    plan as the classic SELECT spelling, written as a left-to-right
    dataflow — scan |> filter |> aggregate. Catalyst compiles both
    spellings to the identical optimized plan (filter pushed to the
    scan, partial aggregate below the shuffle), which is the point:
    pipe syntax is parser surface, not a different engine path."""
    register_views(spark, sf_dir, only=("lineitem",))
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_quantity > 30
        |> AGGREGATE COUNT(*) AS n_items,
                     ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
           GROUP BY l_returnflag AS flag
        """
    )


@query(
    "sql_session_variable",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    WHERE o_totalprice > 200000.0
    GROUP BY o_orderpriority
    """,
    tags=("sql", "dialect", "session-variable"),
)
def sql_session_variable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (DECLARE / SET VARIABLE, Spark 4.0+):
    the threshold is bound once as a typed session variable and
    referenced by name — the SQL-native parameterization path (the
    python-side twin is sql_parameterized_query's named-parameter
    binding). Constant-folded at plan time, so the predicate still
    pushes to the scan exactly like a literal."""
    register_views(spark, sf_dir, only=("orders",))
    spark.sql("DECLARE OR REPLACE VARIABLE price_floor DOUBLE DEFAULT 0.0")
    spark.sql("SET VARIABLE price_floor = 200000.0")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders
        WHERE o_totalprice > price_floor
        GROUP BY o_orderpriority
        """
    )


@query(
    "sql_identifier_dynamic",
    oracle="""
    SELECT c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("sql", "dialect", "identifier-clause"),
)
def sql_identifier_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER() clause (Spark 4.0+): table and column names
    supplied as runtime string expressions without string-splicing
    SQL (the injection-safe dynamic-name path for templated jobs —
    name resolution happens in the analyzer, so an invalid name fails
    analysis rather than executing spliced text)."""
    register_views(spark, sf_dir, only=("customer",))
    return spark.sql(
        """
        SELECT IDENTIFIER('c_' || 'mktsegment') AS segment,
               COUNT(*) AS n_rows
        FROM IDENTIFIER('cust' || 'omer')
        GROUP BY IDENTIFIER('c_' || 'mktsegment')
        """
    )


@query(
    "sql_select_star_except_replace",
    oracle="""
    SELECT n_nationkey, n_regionkey,
           lower(n_name) AS n_name
    FROM nation
    """,
    tags=("sql", "dialect", "star-modifiers"),
)
def sql_select_star_except_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * EXCEPT(...) with a projected replacement — the wide-
    table ergonomics modifier (BigQuery/DuckDB pioneered it; Spark
    4 supports * EXCEPT natively): drop-and-recompute a column
    without enumerating the schema. On a 1000-column feature table
    this is the difference between a readable job and a maintenance
    hazard; column pruning still reaches the scan because EXCEPT
    resolves in the analyzer."""
    register_views(spark, sf_dir, only=("nation",))
    return spark.sql(
        """
        SELECT * EXCEPT (n_name),
               lower(n_name) AS n_name
        FROM nation
        """
    )
