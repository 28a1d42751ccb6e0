"""Join surface: inner/outer/semi/anti, broadcast, non-equi, cross,
as-of (SURVEY.md §2b). All north-star extensions over the reference
(which has no joins — SURVEY.md §2a end-note).

Scale notes: the fact-to-fact joins shuffle on their keys and rely on
AQE for skew; dimension joins broadcast (nation/region are constant
size, ~O(10..100) rows at any SF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_spark.operators.asof import asof_join
from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_table


@query(
    "join_inner",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_items,
           ROUND(SUM(l.l_extendedprice), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY c.c_mktsegment
    """,
    tags=("join",),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way equi-join, fact→fact→dim. lineitem⋈orders shuffles on
    orderkey; customer is small at fixture SF so AQE demotes that join
    to broadcast at runtime."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(o.o_orderstatus == "F")
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_totalprice > 100000
    GROUP BY c.c_custkey, c.c_name
    """,
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join with a pushed-into-ON residual predicate; customers
    with no big orders survive with n_orders = 0."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 100000), "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT COALESCE(a.k, b.k) AS k, a.n_small, b.n_big
    FROM (SELECT o_custkey AS k, COUNT(*) AS n_small FROM orders WHERE o_totalprice < 5000 GROUP BY o_custkey) a
    FULL OUTER JOIN (SELECT o_custkey AS k, COUNT(*) AS n_big FROM orders WHERE o_totalprice > 250000 GROUP BY o_custkey) b
      ON a.k = b.k
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer equi-join preserving unmatched rows from both sides."""
    o = load_table(spark, sf_dir, "orders")
    small = (
        o.where(F.col("o_totalprice") < 5000)
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n_small"))
    )
    big = (
        o.where(F.col("o_totalprice") > 250000)
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n_big"))
    )
    return small.join(big, "k", "full_outer").select(
        F.col("k"), F.col("n_small"), F.col("n_big")
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI ≡ EXISTS — no row multiplication, build side only
    needs the key column (Catalyst prunes the rest)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000.0)
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join against the big-order keys. The right side carries a
    price filter because the fixtures are fully dense (every customer
    has ≥1 order) — an unfiltered anti join would be vacuously empty
    and prove nothing."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_broadcast_dims",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           ROUND(SUM(s.s_acctbal), 2) AS total_bal,
           COUNT(*) AS n_suppliers
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    tags=("join", "broadcast"),
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the constant-size dims (nation=25,
    region=5 rows at every SF) — zero shuffle for the join itself;
    only the final groupBy exchanges data."""
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
            F.count("*").alias("n_suppliers"),
        )
    )


@query(
    "join_nonequi_range",
    oracle="""
    SELECT p.p_partkey, COUNT(*) AS n_matches
    FROM part p
    JOIN lineitem l
      ON l.l_partkey = p.p_partkey
     AND l.l_quantity BETWEEN p.p_size - 2 AND p.p_size + 2
    GROUP BY p.p_partkey
    """,
    tags=("join", "nonequi"),
)
def join_nonequi_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + range residual: planner uses the equi-key for the
    shuffle/broadcast and evaluates the BETWEEN as a join filter —
    never a cartesian."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(
            p,
            (li.l_partkey == p.p_partkey)
            & li.l_quantity.between(p.p_size - 2, p.p_size + 2),
        )
        .groupBy("p_partkey")
        .agg(F.count("*").alias("n_matches"))
    )


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    WHERE r.r_regionkey <> n.n_regionkey
    """,
    tags=("join", "cross"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian on the two constant-size dims (5×25 rows).
    Cross joins are only ever safe on bounded inputs — the engine
    keeps them off fact tables by construction."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).where(F.col("r_regionkey") != F.col("n_regionkey")).select(
        "r_name", "n_name"
    )


@query(
    "join_asof",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), signups AS (
      SELECT user_id, ts FROM events WHERE event_type = 'signup'
    )
    SELECT p.user_id,
           CAST(p.ts AS DATE) AS purchase_day,
           ROUND(p.value, 2) AS value,
           CAST(FLOOR(EPOCH(CAST(s.ts AS TIMESTAMP))) AS BIGINT) AS signup_epoch
    FROM purchases p
    LEFT JOIN LATERAL (
      SELECT ts FROM signups s
      WHERE s.user_id = p.user_id AND s.ts <= p.ts
      ORDER BY s.ts DESC LIMIT 1
    ) s ON TRUE
    """,
    tags=("join", "asof"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest
    signup at-or-before it. Spark lacks a native as-of; composed in
    operators/asof.py via union + last(ignorenulls) over a window —
    one shuffle on (user_id), no range-join explosion."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    signups = e.where(F.col("event_type") == "signup").select("user_id", "ts")
    joined = asof_join(
        purchases, signups, on="user_id", left_ts="ts", right_ts="ts", right_cols=["ts"]
    )
    return joined.select(
        "user_id",
        F.to_date("ts").alias("purchase_day"),
        F.round("value", 2).alias("value"),
        F.col("asof_ts").cast("timestamp").cast("long").alias("signup_epoch"),
    )


@query(
    "join_asof_forward",
    oracle="""
    WITH signups AS (
      SELECT user_id, ts FROM events WHERE event_type = 'signup'
    ), purchases AS (
      SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT s.user_id,
           CAST(FLOOR(EPOCH(CAST(s.ts AS TIMESTAMP))) AS BIGINT) AS signup_epoch,
           CAST(FLOOR(EPOCH(CAST(p.ts AS TIMESTAMP))) AS BIGINT) AS purchase_epoch,
           CAST(FLOOR(EPOCH(CAST(p.ts AS TIMESTAMP))) AS BIGINT)
             - CAST(FLOOR(EPOCH(CAST(s.ts AS TIMESTAMP))) AS BIGINT) AS latency_sec
    FROM signups s
    LEFT JOIN LATERAL (
      SELECT ts FROM purchases p
      WHERE p.user_id = s.user_id AND p.ts >= s.ts
      ORDER BY p.ts ASC LIMIT 1
    ) p ON TRUE
    """,
    tags=("join", "asof", "forward"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each signup matched to the user's FIRST
    purchase at-or-after it (conversion attribution). Same one-shuffle
    union+window composition as join_asof with the scan direction
    flipped (operators/asof.py direction='forward')."""
    e = load_table(spark, sf_dir, "events")
    signups = e.where(F.col("event_type") == "signup").select("user_id", "ts")
    purchases = e.where(F.col("event_type") == "purchase").select("user_id", "ts")
    joined = asof_join(
        signups,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts"],
        direction="forward",
    )
    s_epoch = F.col("ts").cast("timestamp").cast("long")
    p_epoch = F.col("asof_ts").cast("timestamp").cast("long")
    return joined.select(
        "user_id",
        s_epoch.alias("signup_epoch"),
        p_epoch.alias("purchase_epoch"),
        (p_epoch - s_epoch).alias("latency_sec"),
    )


@query(
    "join_asof_tolerance",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), signups AS (
      SELECT user_id, ts FROM events WHERE event_type = 'signup'
    )
    SELECT p.user_id,
           CAST(FLOOR(EPOCH(CAST(p.ts AS TIMESTAMP))) AS BIGINT) AS purchase_epoch,
           ROUND(p.value, 2) AS value,
           CASE WHEN EPOCH(CAST(p.ts AS TIMESTAMP)) - EPOCH(CAST(s.ts AS TIMESTAMP)) <= 86400.0
                THEN CAST(FLOOR(EPOCH(CAST(s.ts AS TIMESTAMP))) AS BIGINT) END AS signup_epoch,
           COALESCE(EPOCH(CAST(p.ts AS TIMESTAMP)) - EPOCH(CAST(s.ts AS TIMESTAMP)) <= 86400.0,
                    FALSE) AS matched
    FROM purchases p
    LEFT JOIN LATERAL (
      SELECT ts FROM signups s
      WHERE s.user_id = p.user_id AND s.ts <= p.ts
      ORDER BY s.ts DESC LIMIT 1
    ) s ON TRUE
    """,
    tags=("join", "asof", "tolerance"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match tolerance (pandas merge_asof
    ``tolerance``): each purchase takes the user's latest signup
    at-or-before it, but a match older than 24 hours is discarded —
    the attribution-window rule ad/conversion pipelines apply. Same
    single-shuffle union+window composition as join_asof; the
    tolerance is a post-fill mask on the carried payload
    (operators/asof.py), so the plan shape is identical."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    signups = e.where(F.col("event_type") == "signup").select("user_id", "ts")
    joined = asof_join(
        purchases,
        signups,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts"],
        tolerance_sec=86400,
    )
    return joined.select(
        "user_id",
        F.col("ts").cast("timestamp").cast("long").alias("purchase_epoch"),
        F.round("value", 2).alias("value"),
        F.col("asof_ts").cast("timestamp").cast("long").alias("signup_epoch"),
        F.col("asof_ts").isNotNull().alias("matched"),
    )


@query(
    "join_interval_binned",
    oracle="""
    SELECT o.o_orderkey, COUNT(*) AS n_shipments
    FROM (SELECT o_orderkey,
                 CAST(epoch(o_orderdate) AS BIGINT) AS iv_start,
                 CAST(epoch(o_orderdate) AS BIGINT) + 90 * 86400 AS iv_end
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND o_orderdate < TIMESTAMP '1996-02-01 00:00:00'
            AND o_totalprice > 300000.0) o
    JOIN (SELECT CAST(epoch(l_shipdate) AS BIGINT) AS ship_s
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1996-06-01 00:00:00') l
      ON l.ship_s BETWEEN o.iv_start AND o.iv_end
    GROUP BY o.o_orderkey
    """,
    tags=("join", "range", "binned"),
)
def join_interval_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PURE range join (no equi key): shipments falling inside each
    order's 90-day window. Naively this is BroadcastNestedLoopJoin —
    O(n·m) — so it runs through operators/rangejoin.py instead: bin
    width = the interval length (each interval spans ≤ 2 bins), hash
    join on the bin, BETWEEN as residual. Same rows as the oracle's
    theta join."""
    from serverless_datalake_spark.operators.rangejoin import point_in_interval_join

    o = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= "1996-01-01 00:00:00")
            & (F.col("o_orderdate") < "1996-02-01 00:00:00")
            & (F.col("o_totalprice") > 300000.0)
        )
        .select(
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("iv_start"),
            (F.unix_timestamp("o_orderdate") + 90 * 86400).alias("iv_end"),
        )
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= "1996-01-01 00:00:00")
            & (F.col("l_shipdate") < "1996-06-01 00:00:00")
        )
        .select(F.unix_timestamp("l_shipdate").alias("ship_s"))
    )
    joined = point_in_interval_join(
        li, o, point_col="ship_s", start_col="iv_start", end_col="iv_end",
        bin_width=90 * 86400,
    )
    return joined.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n_shipments"))


@query(
    "join_interval_overlap",
    oracle="""
    WITH iv AS (
      SELECT o_orderkey,
             CAST(epoch(o_orderdate) AS BIGINT) AS s,
             CAST(epoch(o_orderdate) AS BIGINT) + 10 * 86400 AS e
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-01-15 00:00:00'
        AND o_totalprice > 200000.0
    )
    SELECT a.o_orderkey AS key_a, b.o_orderkey AS key_b
    FROM iv a JOIN iv b
      ON a.s <= b.e AND b.s <= a.e AND a.o_orderkey < b.o_orderkey
    """,
    tags=("join", "range", "overlap"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self join (which order windows were
    concurrently open) — pure range predicate, planned through the
    binned operator: pairs meet once, in the first bin of their
    intersection, so the hash join needs no dedup. Oracle runs the
    naive theta join."""
    from serverless_datalake_spark.operators.rangejoin import interval_overlap_join

    iv = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= "1996-01-01 00:00:00")
            & (F.col("o_orderdate") < "1996-01-15 00:00:00")
            & (F.col("o_totalprice") > 200000.0)
        )
        .select(
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("s"),
            (F.unix_timestamp("o_orderdate") + 10 * 86400).alias("e"),
        )
    )
    a = iv.select(F.col("o_orderkey").alias("key_a"), F.col("s").alias("ls"), F.col("e").alias("le"))
    b = iv.select(F.col("o_orderkey").alias("key_b"), F.col("s").alias("rs"), F.col("e").alias("re"))
    return (
        interval_overlap_join(a, b, "ls", "le", "rs", "re", bin_width=10 * 86400)
        .where(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b")
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), signups AS (
      SELECT user_id, ts FROM events WHERE event_type = 'signup'
    ), bwd AS (
      SELECT p.event_id, p.user_id, p.ts, p.value, MAX(s.ts) AS b_ts
      FROM purchases p LEFT JOIN signups s
        ON s.user_id = p.user_id AND s.ts <= p.ts
      GROUP BY 1, 2, 3, 4
    ), fwd AS (
      SELECT p.event_id, MIN(s.ts) AS f_ts
      FROM purchases p LEFT JOIN signups s
        ON s.user_id = p.user_id AND s.ts >= p.ts
      GROUP BY 1
    )
    SELECT bwd.user_id,
           CAST(FLOOR(EPOCH(CAST(bwd.ts AS TIMESTAMP))) AS BIGINT) AS purchase_epoch,
           ROUND(bwd.value, 2) AS value,
           CAST(FLOOR(EPOCH(CAST(
             CASE
               WHEN bwd.b_ts IS NULL THEN fwd.f_ts
               WHEN fwd.f_ts IS NULL THEN bwd.b_ts
               WHEN FLOOR(EPOCH(CAST(bwd.ts AS TIMESTAMP))) - FLOOR(EPOCH(CAST(bwd.b_ts AS TIMESTAMP)))
                    <= FLOOR(EPOCH(CAST(fwd.f_ts AS TIMESTAMP))) - FLOOR(EPOCH(CAST(bwd.ts AS TIMESTAMP)))
                 THEN bwd.b_ts
               ELSE fwd.f_ts
             END AS TIMESTAMP))) AS BIGINT) AS nearest_signup_epoch
    FROM bwd JOIN fwd ON fwd.event_id = bwd.event_id
    """,
    tags=("join", "asof", "nearest"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge_asof direction='nearest': each purchase takes whichever
    signup is closer in time — backward on ties (pandas semantics).
    Composed from the SAME one-shuffle as-of primitive run in both
    directions; the pick is a null-safe closest-of-two projection, so
    nearest costs two window passes over the co-partitioned union,
    never a range join.

    Completes the as-of surface: backward (join_asof), forward
    (join_asof_forward), tolerance (join_asof_tolerance), nearest."""
    e = load_table(spark, sf_dir, "events")
    # event_id rides through both passes as the unique left key so
    # the backward/forward recombine can't multiply duplicate
    # (user, ts) purchases
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    signups = e.where(F.col("event_type") == "signup").select("user_id", "ts")
    bwd = asof_join(
        purchases, signups, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["ts"], direction="backward",
    ).withColumnRenamed("asof_ts", "b_ts")
    fwd = asof_join(
        purchases.select("event_id", "user_id", "ts"), signups, on="user_id",
        left_ts="ts", right_ts="ts", right_cols=["ts"], direction="forward",
    ).withColumnRenamed("asof_ts", "f_ts").select("event_id", "f_ts")
    j = bwd.join(fwd, "event_id")
    lts = F.col("ts").cast("long")
    bts = F.col("b_ts").cast("timestamp").cast("long")
    fts = F.col("f_ts").cast("timestamp").cast("long")
    nearest = (
        F.when(F.col("b_ts").isNull(), fts)
        .when(F.col("f_ts").isNull(), bts)
        .when(lts - bts <= fts - lts, bts)
        .otherwise(fts)
    )
    return j.select(
        "user_id",
        lts.alias("purchase_epoch"),
        F.round("value", 2).alias("value"),
        nearest.alias("nearest_signup_epoch"),
    )


@query(
    "join_fuzzy_blocked",
    oracle="""
    WITH names AS (
      SELECT DISTINCT p_name FROM part
    ), blocked AS (
      SELECT p_name, string_split(p_name, ' ')[2] AS blk FROM names
    )
    SELECT a.blk AS block,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
    FROM blocked a JOIN blocked b
      ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    """,
    tags=("join", "fuzzy", "entity-resolution"),
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy join — the entity-resolution core: candidate
    pairs come from an equi-join on a BLOCKING KEY (here the noun of
    the two-word part name), and only candidates pay the quadratic
    edit-distance check (threshold ≤ 4 catches adjective variants).
    Without blocking, fuzzy matching is an O(n²) cross join — the
    same brute-vs-blocked relationship as dedup_ngram_jaccard vs
    MinHash banding, for STRINGS instead of documents.

    Exactness: levenshtein is the standard integer DP in both
    engines (established by fn_edit_distance); blocking key and
    tie-break ordering are total.

    Scale shape: distinct names are vocabulary-sized; the block join
    hashes on the key; block populations bound the pair fan-out
    (production blocks on phonetic codes / q-gram signatures when a
    single token is too coarse)."""
    p = load_table(spark, sf_dir, "part")
    names = p.select("p_name").distinct()
    blocked = names.select(
        "p_name", F.split(F.col("p_name"), " ").getItem(1).alias("blk")
    )
    a = blocked.select(F.col("p_name").alias("name_a"), F.col("blk").alias("block"))
    b = blocked.select(F.col("p_name").alias("name_b"), F.col("blk").alias("blk_b"))
    return (
        a.join(b, (F.col("block") == F.col("blk_b")) & (F.col("name_a") < F.col("name_b")))
        .where(F.levenshtein(F.col("name_a"), F.col("name_b")) <= 4)
        .select(
            "block",
            "name_a",
            "name_b",
            F.levenshtein(F.col("name_a"), F.col("name_b")).alias("dist"),
        )
    )


@query(
    "join_asof_interpolate",
    oracle="""
    WITH probes AS (
      SELECT user_id, ts FROM events WHERE event_type = 'click'
    ), obs AS (
      SELECT user_id, ts, ROUND(SUM(value), 2) AS v
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ), j AS (
      SELECT c.user_id,
             CAST(FLOOR(EPOCH(CAST(c.ts AS TIMESTAMP))) AS BIGINT) AS t,
             CAST(FLOOR(EPOCH(CAST(p.ts AS TIMESTAMP))) AS BIGINT) AS t0,
             p.v AS v0,
             CAST(FLOOR(EPOCH(CAST(n.ts AS TIMESTAMP))) AS BIGINT) AS t1,
             n.v AS v1
      FROM probes c
      LEFT JOIN LATERAL (
        SELECT ts, v FROM obs p
        WHERE p.user_id = c.user_id AND p.ts <= c.ts
        ORDER BY p.ts DESC LIMIT 1
      ) p ON TRUE
      LEFT JOIN LATERAL (
        SELECT ts, v FROM obs n
        WHERE n.user_id = c.user_id AND n.ts >= c.ts
        ORDER BY n.ts ASC LIMIT 1
      ) n ON TRUE
    )
    SELECT user_id, t AS probe_epoch, t0 AS prev_epoch, t1 AS next_epoch,
           ROUND(CASE WHEN t0 IS NULL AND t1 IS NULL THEN NULL
                      WHEN t0 IS NULL THEN v1
                      WHEN t1 IS NULL THEN v0
                      WHEN t1 = t0 THEN v0
                      ELSE v0 + (v1 - v0) * (CAST(t - t0 AS DOUBLE)
                                             / CAST(t1 - t0 AS DOUBLE))
                 END, 4) AS value_interp,
           CASE WHEN t0 IS NULL AND t1 IS NULL THEN 'none'
                WHEN t0 IS NULL THEN 'backfill'
                WHEN t1 IS NULL THEN 'hold'
                WHEN t1 = t0 THEN 'exact'
                ELSE 'interp' END AS method
    FROM j
    """,
    tags=("join", "asof", "interpolate"),
)
def join_asof_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolating as-of join: each click probe gets the user's
    purchase value LINEARLY INTERPOLATED between the bracketing
    observations — the sensor-fusion variant the backward/forward/
    nearest family cannot express (those snap to ONE side; fusing an
    irregular signal onto another grid wants the value BETWEEN
    samples). Composition of the SAME one-shuffle asof_join operator
    run in both directions (operators/asof.py), so the plan is two
    key-partitioned union+window passes — no range join, no explode.
    Edge semantics are explicit in `method`: before the first
    observation -> backfill, after the last -> hold, observation
    exactly at the probe -> exact, no observations -> none.

    Exactness: observations are pre-aggregated per (user, ts) with
    the round-2 discipline, so asof ties are impossible by
    construction (the LATERAL LIMIT 1 in the oracle would otherwise
    pick an engine-dependent row); epochs are floored integer
    seconds; the interpolation weight is ONE identical double
    expression, its divisor strictly positive in the branch where it
    runs (the t1 = t0 case is caught first — on floored seconds, so
    sub-second brackets degrade to 'exact' identically in both
    engines)."""
    e = load_table(spark, sf_dir, "events")
    probes = e.where(F.col("event_type") == "click").select("user_id", "ts")
    obs = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.round(F.sum("value"), 2).alias("v"))
    )
    j = asof_join(
        probes,
        obs,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts", "v"],
        prefix="prev_",
        direction="backward",
    )
    j = asof_join(
        j,
        obs,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts", "v"],
        prefix="next_",
        direction="forward",
    )
    t = F.col("ts").cast("timestamp").cast("long")
    t0 = F.col("prev_ts").cast("timestamp").cast("long")
    t1 = F.col("next_ts").cast("timestamp").cast("long")
    v0, v1 = F.col("prev_v"), F.col("next_v")
    interp = v0 + (v1 - v0) * (
        (t - t0).cast("double") / (t1 - t0).cast("double")
    )
    val = (
        F.when(t0.isNull() & t1.isNull(), F.lit(None).cast("double"))
        .when(t0.isNull(), v1)
        .when(t1.isNull(), v0)
        .when(t1 == t0, v0)
        .otherwise(interp)
    )
    method = (
        F.when(t0.isNull() & t1.isNull(), "none")
        .when(t0.isNull(), "backfill")
        .when(t1.isNull(), "hold")
        .when(t1 == t0, "exact")
        .otherwise("interp")
    )
    return j.select(
        "user_id",
        t.alias("probe_epoch"),
        t0.alias("prev_epoch"),
        t1.alias("next_epoch"),
        F.round(val, 4).alias("value_interp"),
        method.alias("method"),
    )
