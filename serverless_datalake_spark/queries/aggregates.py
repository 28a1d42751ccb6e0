"""Aggregation surface (SURVEY.md §2b): hash aggregates, distinct,
rollup/cube/grouping sets, collect_list/set, exact + approximate
percentiles / distinct counts. Generalizes the reference's only
grouping (recorder:86–90, group-records-by-source)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_table


@query(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS sum_disc_price_e4,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000, 0) AS BIGINT)) AS BIGINT) AS sum_charge_e6,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order,
           ROUND(MIN(l_extendedprice), 2) AS min_price,
           ROUND(MAX(l_extendedprice), 2) AS max_price
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-11-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "tpch-q1"),
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the canonical wide hash aggregate. Map-side
    partial aggregation means the shuffle carries one row per
    (flag,status,partition), not per input row: scan-bound at 100 TB.

    disc_price/charge are summed as integer 1e-4/1e-6 units: per-row
    doubles are bit-identical across engines, the integer sum is then
    exact and order-independent — immune to both the shuffle-order ulp
    drift and the >15-significant-digit repr divergence that float
    sums of this magnitude hit. (Headroom: int64 caps these columns at
    ~9e18 units ≈ $9e14 — fine per group at any TPC-H SF; a 100 TB
    deployment would widen to DECIMAL(38,x) at the same semantics.)"""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= "2024-11-01 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.sum(F.round(disc_price * 10000, 0).cast("long")).alias("sum_disc_price_e4"),
            F.sum(
                F.round(disc_price * (1 + F.col("l_tax")) * 1000000, 0).cast("long")
            ).alias("sum_charge_e6"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        )
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "distinct"),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct — Catalyst plans it as a two-phase expand +
    aggregate, still fully distributed."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name,
           COUNT(*) AS n_cust,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("agg", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (region, nation) → per-nation, per-region subtotal, and
    grand total in one pass (Catalyst Expand node)."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_cust"), F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 2^2 grouping combinations in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty")
    )


@query(
    "agg_collect",
    oracle="""
    SELECT c_mktsegment,
           array_to_string(list_sort(list(DISTINCT c_nationkey)), ',') AS nations
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("agg", "collect"),
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set + sort_array, serialized to a string so the value
    hash is representation-independent across engines."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("c_nationkey"))).alias("nations")
    )


@query(
    "agg_percentile_exact",
    oracle="""
    SELECT o_orderstatus,
           ROUND(MEDIAN(o_totalprice), 2) AS median_price,
           ROUND(QUANTILE_CONT(o_totalprice, 0.9), 2) AS p90_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg", "percentile"),
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) percentiles — Spark `percentile` matches
    DuckDB QUANTILE_CONT/MEDIAN semantics."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 2).alias("p90_price"),
    )


@query(
    "agg_approx",
    # The sketch VALUES are engine-specific, but their error contract
    # is not: emit the exact values plus within-tolerance certificates,
    # whose expected values DuckDB computes exactly (HLL rsd=0.01 ⇒ 5%
    # tolerance is ~5σ; percentile_approx accuracy=10000 pins the
    # approximate median inside the exact [p45, p55] band).
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS distinct_ok,
           TRUE AS median_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct + approximate percentile, oracle-checked through
    tolerance certificates. The scale story is the point: HLL is O(1)
    memory per group vs O(n) for exact distinct; the exact twins here
    exist only to prove the sketches honest."""
    li = load_table(spark, sf_dir, "lineitem")
    # Two aggregations joined on the 3-row group key, NOT one: mixing
    # count(distinct) with the object-buffered sketch aggregates makes
    # Spark plan a single ObjectHashAggregate whose merge buffer
    # carries the HLL's ~1600 register words as individual columns
    # next to the distinct expansion — measured 57-135 s at sf0.1 for
    # a query whose pieces each run in ~1-2 s. Split, each aggregate
    # keeps its natural physical shape (Object hash for the sketches,
    # expand+hash for the distinct) and the join is group-cardinality.
    sketches = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median"),
        F.percentile("l_extendedprice", F.lit(0.45)).alias("__p45"),
        F.percentile("l_extendedprice", F.lit(0.55)).alias("__p55"),
    )
    exact = li.groupBy(F.col("l_returnflag").alias("rf")).agg(
        F.count_distinct("l_orderkey").alias("exact_orders")
    )
    agged = sketches.join(
        F.broadcast(exact), F.col("l_returnflag") == F.col("rf")
    ).drop("rf")
    return agged.select(
        "l_returnflag",
        "exact_orders",
        (
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            <= 0.05 * F.col("exact_orders")
        ).alias("distinct_ok"),
        F.col("approx_median").between(F.col("__p45"), F.col("__p55")).alias("median_ok"),
    )


@query(
    "agg_minmax_by",
    oracle="""
    SELECT o_custkey,
           max_by(o_orderkey, printf('%015.2f', o_totalprice) || '#' ||
                              lpad(CAST(o_orderkey AS VARCHAR), 12, '0')) AS biggest_order,
           min_by(o_orderkey, printf('%015.2f', o_totalprice) || '#' ||
                              lpad(CAST(o_orderkey AS VARCHAR), 12, '0')) AS smallest_order,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders
    WHERE o_custkey % 7 = 0
    GROUP BY o_custkey
    """,
    tags=("agg", "minmax_by"),
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (argmin/argmax) — the 'row that achieved the
    extreme' aggregate, one pass instead of a self-join on the max.
    Deterministic ties via a fixed-width (price, key) string
    comparator — DuckDB's min/max_by take only scalar comparators, and
    identical input bits format identically on both engines."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") % 7 == 0)
    cmp = F.concat(
        F.format_string("%015.2f", F.col("o_totalprice")),
        F.lit("#"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
    )
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", cmp).alias("biggest_order"),
        F.min_by("o_orderkey", cmp).alias("smallest_order"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@query(
    "agg_having",
    oracle="""
    SELECT l_suppkey, COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS revenue
    FROM lineitem
    GROUP BY l_suppkey
    HAVING COUNT(*) > 100
    """,
    tags=("agg", "having"),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation HAVING filter (groups surviving a count threshold)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
        .where(F.col("n") > 100)
    )


@query(
    "agg_string_concat",
    oracle="""
    SELECT c_mktsegment,
           string_agg(c_name, ',' ORDER BY c_name) AS names
    FROM customer
    WHERE c_custkey <= 60
    GROUP BY c_mktsegment
    """,
    tags=("aggregation", "string_agg"),
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (SQL STRING_AGG / LISTAGG):
    collect_list → sort_array → array_join keeps the concatenation
    deterministic under any partitioning — collect_list alone has
    shuffle-dependent order and would never oracle-match."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 60)
    return c.groupBy("c_mktsegment").agg(
        F.array_join(F.sort_array(F.collect_list("c_name")), ",").alias("names")
    )


@query(
    "agg_hll_mergeable",
    # Same certificate pattern as agg_approx: sketch values are
    # engine-specific, their error contract is not. The POINT of this
    # query is mergeability — partial sketches per fine group unioned
    # into coarse rollups without re-scanning (how a 100 TB pipeline
    # serves distinct counts at several granularities from one pass).
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS merged_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "approx", "sketch"),
)
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: hll_sketch_agg per (returnflag,
    linestatus), then hll_union_agg up to returnflag — the estimate
    comes from UNIONING partials, never re-reading the fact table.
    Certificate: merged estimate within 5% of the exact count
    (lgConfigK=12 ⇒ ~1.6% rsd; 5% is ~3σ)."""
    li = load_table(spark, sf_dir, "lineitem")
    partials = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_orderkey").alias("sk")
    )
    merged = partials.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est")
    )
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("exact_orders")
    )
    return merged.join(exact, "l_returnflag").select(
        "l_returnflag",
        "exact_orders",
        (
            F.abs(F.col("merged_est") - F.col("exact_orders"))
            <= 0.05 * F.col("exact_orders")
        ).alias("merged_ok"),
    )


_QSKETCH_ORACLE = """
    WITH stats AS (
      SELECT l_returnflag, MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi,
             COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag
    ), hist AS (
      SELECT li.l_returnflag,
             CASE WHEN s.hi = s.lo THEN 0
                  ELSE LEAST(CAST(FLOOR((li.l_extendedprice - s.lo)
                                        / ((s.hi - s.lo) / 128.0)) AS INTEGER), 127)
             END AS bin,
             COUNT(*) AS cnt
      FROM lineitem li JOIN stats s USING (l_returnflag)
      GROUP BY 1, 2
    ), cum AS (
      SELECT l_returnflag, bin, cnt,
             SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin) AS cum
      FROM hist
    ), targets AS (
      SELECT l_returnflag, lo, hi, n, p, p * n AS target
      FROM stats, UNNEST([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS u(p)
    ), first_bin AS (
      SELECT * FROM (
        SELECT t.l_returnflag, t.p, t.lo, t.hi, t.n, t.target, c.bin, c.cnt, c.cum,
               ROW_NUMBER() OVER (PARTITION BY t.l_returnflag, t.p ORDER BY c.bin) AS rn
        FROM targets t JOIN cum c USING (l_returnflag)
        WHERE c.cum >= t.target
      ) WHERE rn = 1
    )
    SELECT l_returnflag, p,
           ROUND(CASE WHEN hi = lo THEN lo
                      ELSE lo + ((hi - lo) / 128.0)
                           * (bin + (target - (cum - cnt)) / cnt) END, 4) AS q_est,
           CAST(n AS BIGINT) AS n
    FROM first_bin
    """


@query(
    "agg_quantile_sketch",
    oracle=_QSKETCH_ORACLE,
    tags=("agg", "sketch", "quantile"),
)
def agg_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable histogram quantile sketch (the fixed-bin cousin of
    t-digest): one stats pass (min/max/count per group), one histogram
    pass binning values into 128 equi-width buckets, then p50/p90/p99
    read off the cumulative counts with linear interpolation inside
    the containing bin.

    The sketch IS the (group, bin, count) relation — associative and
    mergeable, so partial aggregation combines map-side and shards
    merge by summing counts; estimating a quantile over 100 TB costs
    two scans and a 128-row-per-group reduction instead of the full
    sort exact percentiles need (agg_percentile_exact is the exact
    twin; error is bounded by one bin width = range/128). All
    arithmetic is +,-,*,/,floor on identical inputs, so both engines
    agree bit-for-bit before the final round."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(128.0)
    bin_ = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("l_extendedprice") - F.col("lo")) / width).cast("int"),
            F.lit(127),
        )
    )
    hist = (
        li.select("l_returnflag", "l_extendedprice")
        .join(F.broadcast(stats), "l_returnflag")
        .withColumn("bin", bin_)
        .groupBy("l_returnflag", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum = hist.withColumn(
        "cum", F.sum("cnt").over(Window.partitionBy("l_returnflag").orderBy("bin"))
    ).select("l_returnflag", "bin", "cnt", "cum")
    targets = stats.select(
        "l_returnflag",
        "lo",
        "hi",
        "n",
        F.explode(F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias("p"),
    ).withColumn("target", F.col("p") * F.col("n"))
    cand = targets.join(cum, "l_returnflag").where(F.col("cum") >= F.col("target"))
    w2 = Window.partitionBy("l_returnflag", "p").orderBy("bin")
    first = cand.withColumn("rn", F.row_number().over(w2)).where(F.col("rn") == 1)
    est = F.when(F.col("hi") == F.col("lo"), F.col("lo")).otherwise(
        F.col("lo")
        + width * (F.col("bin") + (F.col("target") - (F.col("cum") - F.col("cnt"))) / F.col("cnt"))
    )
    return first.select(
        "l_returnflag",
        "p",
        F.round(est, 4).alias("q_est"),
        F.col("n").cast("long").alias("n"),
    )


_CMS_D = 4     # hash rows
_CMS_W = 16    # counters per row — far below vocab so fixtures
               # exercise real collisions (fixture vocab ~31 > w=16)


def _cms_oracle() -> str:
    """DuckDB twin of the deterministic Count-Min Sketch: identical
    md5 double-hashed positions, identical min-over-rows estimate."""
    from serverless_datalake_spark.queries.llm_dedup import _hex8_int

    h1 = _hex8_int("substr(md5(t), 1, 8)")
    h2 = _hex8_int("substr(md5(t), 9, 8)")
    return f"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      FROM documents
    ), cells AS (
      SELECT ({h1} + j * {h2}) % {_CMS_W} AS pos, j
      FROM tok, (SELECT unnest(range({_CMS_D})) AS j)
    ), cms AS (
      SELECT j, pos, CAST(COUNT(*) AS BIGINT) AS c FROM cells GROUP BY 1, 2
    ), tc AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS true_cnt FROM tok GROUP BY 1
    ), probes AS (
      SELECT t, true_cnt, j, ({h1} + j * {h2}) % {_CMS_W} AS pos
      FROM tc, (SELECT unnest(range({_CMS_D})) AS j)
    ), est AS (
      SELECT p.t, p.true_cnt, MIN(cms.c) AS cms_est
      FROM probes p JOIN cms USING (j, pos)
      GROUP BY 1, 2
    ), ranked AS (
      SELECT t AS token, true_cnt, cms_est,
             ROW_NUMBER() OVER (ORDER BY true_cnt DESC, t) AS rank
      FROM est
    )
    SELECT token, true_cnt, cms_est, rank FROM ranked WHERE rank <= 20
    """


@query("agg_cms_heavy_hitters", oracle=_cms_oracle(), tags=("agg", "sketch", "cms"))
def agg_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch heavy hitters — the third mergeable sketch
    (with HLL distinct counts and the histogram quantile sketch): a
    d×w counter grid (4×16, Kirsch–Mitzenmacher double hashing off
    the md5 halves) whose point estimate min_j cms[j][h_j(t)] never
    underestimates. w is deliberately small so the fixture run
    exercises real collisions; the top-20 report carries true_cnt next
    to cms_est so the overestimate is visible and test-assertable.

    Unlike the engine-internal sketches, this one is hash-
    deterministic, so the oracle rebuilds the EXACT grid. Scale shape:
    the sketch build is one (j, pos)-keyed aggregate of d·w cells —
    constant-size output regardless of corpus size, mergeable across
    shards by cell-wise addition; the probe side joins the BROADCAST
    grid (d·w rows). True counts here are fixture-sized verification;
    at 100 TB you'd keep only the sketch and a candidate stream."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("t")
    )
    h1 = F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5("t"), 9, 8), 16, 10).cast("long")
    rows = F.transform(
        F.sequence(F.lit(0), F.lit(_CMS_D - 1)),
        lambda j: F.struct(
            j.cast("long").alias("j"),
            ((h1 + j.cast("long") * h2) % F.lit(_CMS_W)).alias("pos"),
        ),
    )
    cells = tok.select(F.explode(rows).alias("c")).select("c.j", "c.pos")
    cms = cells.groupBy("j", "pos").agg(F.count(F.lit(1)).alias("c"))
    tc = tok.groupBy("t").agg(F.count(F.lit(1)).alias("true_cnt"))
    probes = tc.select(
        "t", "true_cnt", F.explode(rows).alias("p")
    ).select("t", "true_cnt", "p.j", "p.pos")
    est = (
        probes.join(F.broadcast(cms), ["j", "pos"])
        .groupBy("t", "true_cnt")
        .agg(F.min("c").alias("cms_est"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("true_cnt").desc(), "t")
    return (
        est.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 20)
        .select(
            F.col("t").alias("token"),
            "true_cnt",
            "cms_est",
            F.col("rank").cast("long").alias("rank"),
        )
    )


@query(
    "agg_mode_deterministic",
    oracle="""
    SELECT o_orderpriority, mode_status, n
    FROM (
      SELECT o_orderpriority, o_orderstatus AS mode_status,
             CAST(COUNT(*) AS BIGINT) AS n,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY COUNT(*) DESC, o_orderstatus) AS rn
      FROM orders GROUP BY 1, 2
    ) WHERE rn = 1
    """,
    tags=("agg", "mode"),
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE per group: Spark's built-in mode() breaks
    frequency ties arbitrarily (hash order), so this spells the mode
    as count + rank with a total tie-break — the only way a mode is
    reproducible across engines, retries, and partitionings.

    Scale shape: two-level aggregate (partial counts map-side) + a
    group-local rank over the tiny (group, value) relation."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    counted = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("n").desc(), "o_orderstatus"
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("mode_status"),
            "n",
        )
    )


@query(
    "agg_histogram_equiwidth",
    oracle="""
    WITH ext AS (
      SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi FROM lineitem
    ), binned AS (
      SELECT LEAST(CAST(FLOOR((l_extendedprice - ext.lo)
                              / (ext.hi - ext.lo) * 16.0) AS BIGINT), 15) AS bin,
             ext.lo AS lo, ext.hi AS hi
      FROM lineitem CROSS JOIN ext
    )
    SELECT bin,
           ROUND(lo + bin * (hi - lo) / 16.0, 4) AS bin_lo,
           ROUND(lo + (bin + 1) * (hi - lo) / 16.0, 4) AS bin_hi,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM binned GROUP BY bin, lo, hi
    """,
    tags=("agg", "histogram", "profile"),
)
def agg_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (16 bins) of a numeric column — the
    data-profiling staple behind range-partitioning choices, skew
    detection, and cost estimation (profile_columns gives moments;
    this gives the SHAPE). The max value clamps into the top bin
    (LEAST) so the bin index is total.

    Scale shape: the [min, max] envelope is a 1-row broadcast; binning
    is a map-only projection; the count is one 16-group aggregate with
    map-side combine. The whole histogram is two scans of column
    statistics-width data — at 100 TB the first scan can come from
    parquet footer min/max instead."""
    li = load_table(spark, sf_dir, "lineitem")
    ext = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    binned = li.crossJoin(F.broadcast(ext)).select(
        F.least(
            F.floor(
                (F.col("l_extendedprice") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * 16.0
            ).cast("long"),
            F.lit(15).cast("long"),
        ).alias("bin"),
        "lo",
        "hi",
    )
    return binned.groupBy("bin", "lo", "hi").agg(
        F.count(F.lit(1)).alias("n")
    ).select(
        "bin",
        F.round(F.col("lo") + F.col("bin") * (F.col("hi") - F.col("lo")) / 16.0, 4).alias("bin_lo"),
        F.round(F.col("lo") + (F.col("bin") + 1) * (F.col("hi") - F.col("lo")) / 16.0, 4).alias("bin_hi"),
        "n",
    )


@query(
    "agg_entropy_by_group",
    oracle="""
    WITH c AS (
      SELECT event_type, user_id % 10 AS cohort, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT cohort, CAST(SUM(n) AS BIGINT) AS nt FROM c GROUP BY 1
    ), contrib AS (
      SELECT c.cohort, c.event_type,
             ROUND(-(CAST(c.n AS DOUBLE) / CAST(tot.nt AS DOUBLE))
                   * ln(CAST(c.n AS DOUBLE) / CAST(tot.nt AS DOUBLE)), 8) AS e
      FROM c JOIN tot USING (cohort)
    )
    SELECT CAST(cohort AS BIGINT) AS cohort,
           ROUND(list_aggregate(list(e ORDER BY event_type), 'sum'), 6) AS entropy_nats,
           CAST(COUNT(*) AS BIGINT) AS n_types
    FROM contrib GROUP BY cohort
    """,
    tags=("agg", "entropy", "diversity"),
)
def agg_entropy_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each cohort's event-type distribution — the
    behavioral-diversity statistic (uniform usage → ln(5) ≈ 1.609
    nats; single-type cohorts → 0) that monitoring uses to catch bot
    cohorts and mix drift; the grouped sibling of text_kl_divergence's
    corpus-level drift.

    Per-type contributions −p·ln p round at 8 decimals and sum as an
    ordered fold over the type-sorted list (the KL precedent), so both
    engines agree bit-for-bit before the 6-decimal round.

    Scale shape: one (cohort, type) count shuffle, a cohort rollup,
    and a fold bounded by the type cardinality — events are scanned
    once."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    c = e.groupBy(
        "event_type", (F.col("user_id") % 10).alias("cohort")
    ).agg(F.count(F.lit(1)).alias("n"))
    nt = F.sum("n").over(Window.partitionBy("cohort"))
    p = F.col("n").cast("double") / F.col("nt").cast("double")
    contrib = c.select(
        "cohort", "event_type", F.col("n"), nt.alias("nt")
    ).select(
        "cohort",
        "event_type",
        F.round(-p * F.log(p), 8).alias("e"),
    )
    arr = F.array_sort(F.collect_list(F.struct("event_type", "e")))
    folded = F.aggregate(
        F.transform(arr, lambda x: x["e"]), F.lit(0.0), lambda s, x: s + x
    )
    return contrib.groupBy(F.col("cohort").cast("long").alias("cohort")).agg(
        F.round(folded, 6).alias("entropy_nats"),
        F.count(F.lit(1)).alias("n_types"),
    )


@query(
    "agg_gini_concentration",
    oracle="""
    WITH ser AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n,
             list(o_totalprice ORDER BY o_totalprice, o_orderkey) AS xs
      FROM orders GROUP BY 1
    )
    SELECT o_orderpriority, n,
           ROUND(2.0 * list_aggregate(list_transform(range(1, n + 1),
                     i -> CAST(i AS DOUBLE) * xs[i]), 'sum')
                 / (CAST(n AS DOUBLE) * list_aggregate(xs, 'sum'))
                 - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini
    FROM ser
    """,
    tags=("agg", "gini", "concentration"),
)
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order-value concentration per priority
    class — the inequality statistic behind revenue-concentration and
    whale-customer monitoring (0 = perfectly even spend, →1 = one
    order dominates), computed by the exact rank formula
    G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n over the value-sorted series.

    The sort is per-group with a total tie-break (value, orderkey) so
    the rank-weighted fold is deterministic; both engines fold the
    identical sorted list.

    Scale shape: one shuffle on the group key; the per-group sorted
    fold is group-sized. (At extreme group sizes the same statistic
    falls out of a two-pass rank + windowed sum — the formula is
    associative in rank order.)"""
    o = load_table(spark, sf_dir, "orders")
    ser = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.array_sort(
            F.collect_list(F.struct("o_totalprice", "o_orderkey"))
        ).alias("arr"),
    )
    xs = F.transform(F.col("arr"), lambda r: r["o_totalprice"])
    nd = F.col("n").cast("double")
    weighted = F.aggregate(
        F.zip_with(
            F.sequence(F.lit(1), F.col("n")),
            xs,
            lambda i, x: i.cast("double") * x,
        ),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    total = F.aggregate(xs, F.lit(0.0), lambda s, v: s + v)
    return ser.select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n"),
        F.round(2.0 * weighted / (nd * total) - (nd + 1.0) / nd, 6).alias("gini"),
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH pts AS (
      SELECT lang, n_chars AS v,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS w
      FROM documents
    ), ranked AS (
      SELECT lang, v, w,
             CAST(SUM(w) OVER (PARTITION BY lang ORDER BY v, w
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
             CAST(SUM(w) OVER (PARTITION BY lang) AS BIGINT) AS tw
      FROM pts
    )
    SELECT lang,
           CAST(MIN(CASE WHEN 2 * cw >= tw THEN v END) AS BIGINT) AS weighted_median,
           MIN(tw) AS total_weight
    FROM ranked GROUP BY lang
    """,
    tags=("agg", "percentile", "weighted"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median — the importance-weighted quantile every
    mixture-reweighted corpus needs (an unweighted median over
    upsampled data is simply wrong): document length (chars) weighted
    by token count per language; the median is the smallest value
    whose cumulative weight reaches half the total (lower weighted
    median, deterministic under the (v, w) total order).

    Scale shape: one shuffle on the group key; the cumulative weight
    is a per-group running window (WindowGroupLimit-free but
    group-local); the threshold pick folds into the same aggregate.
    No per-group sort materializes beyond the window operator's."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    pts = d.select(
        "lang",
        F.col("n_chars").alias("v"),
        F.size(F.filter(F.split("text", " "), lambda x: x != ""))
        .cast("long")
        .alias("w"),
    )
    w_run = (
        Window.partitionBy("lang")
        .orderBy("v", "w")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = pts.select(
        "lang",
        "v",
        F.sum("w").over(w_run).alias("cw"),
        F.sum("w").over(Window.partitionBy("lang")).alias("tw"),
    )
    return ranked.groupBy("lang").agg(
        F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("v")))
        .cast("long")
        .alias("weighted_median"),
        F.min("tw").alias("total_weight"),
    )


def _bootstrap_thresholds() -> list:
    """Poisson(1) inverse-CDF cut points as 4-hex string literals:
    u < p on a 16-bit uniform ⟺ its 4-hex chunk < hex(floor(p·2^16)+1)
    lexicographically (lowercase hex order IS numeric order, and
    p·2^16 is never an integer for these thresholds). Shared by both
    engines so the comparison is string-identical."""
    ps = [0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
          0.9810118431238462, 0.9963401531726563]
    return [format(int(p * 2**16) + 1, "04x") for p in ps]


def _bootstrap_oracle(reps: int = 32) -> str:
    # one md5 per (row, replica-OCTET): md5(rk_g) for g = b // 8
    # yields 8 independent 16-bit uniforms (4-hex chunks of the
    # 128-bit digest) covering replicas 8g..8g+7 — 4 hashes per row
    # instead of 32. 16-bit uniforms shift each Poisson cell
    # probability by < 2^-16, far below the B=32 resampling noise;
    # hashing is the dominant per-row cost and this is the knob.
    key = "CAST(l_orderkey * 16 + l_linenumber AS VARCHAR) || '_' || CAST(b // 8 AS VARCHAR)"
    chunk = f"substr(md5({key}), (b % 8) * 4 + 1, 4)"
    t = _bootstrap_thresholds()
    w = (
        f"CASE WHEN {chunk} < '{t[0]}' THEN 0 WHEN {chunk} < '{t[1]}' THEN 1 "
        f"WHEN {chunk} < '{t[2]}' THEN 2 WHEN {chunk} < '{t[3]}' THEN 3 "
        f"WHEN {chunk} < '{t[4]}' THEN 4 ELSE 5 END"
    )
    return f"""
    WITH expanded AS (
      SELECT b, {w} AS w,
             CAST(ROUND(l_extendedprice * 100.0, 0) AS BIGINT) AS cents
      FROM lineitem, (SELECT unnest(range({reps})) AS b)
    ), reps AS (
      SELECT b,
             CAST(SUM(w) AS BIGINT) AS n_eff,
             ROUND(CAST(SUM(w * cents) AS DOUBLE) / 100.0
                   / CAST(SUM(w) AS DOUBLE), 6) AS mean_b
      FROM expanded GROUP BY b
    ), base AS (
      SELECT ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100.0, 0) AS BIGINT)) AS DOUBLE)
                   / 100.0 / CAST(COUNT(*) AS DOUBLE), 6) AS point_mean
      FROM lineitem
    ), sorted AS (
      SELECT list(mean_b ORDER BY mean_b) AS ms FROM reps
    )
    SELECT base.point_mean,
           sorted.ms[2] AS boot_p05,
           sorted.ms[16] AS boot_median,
           sorted.ms[31] AS boot_p95,
           CAST({reps} AS BIGINT) AS n_replicas
    FROM base CROSS JOIN sorted
    """


@query("sample_poisson_bootstrap", oracle=_bootstrap_oracle(), tags=("agg", "bootstrap", "statistics"))
def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Poisson bootstrap — THE distributed resampling technique:
    classical bootstrap resampling needs global coordination (sample n
    rows WITH replacement), but for large n the multinomial factors
    into independent per-row Poisson(1) weights, so B=32 bootstrap
    replicas of the mean are computed in ONE pass with per-row
    deterministic weights — no shuffling of data, no driver-side
    resampling. The output is the point estimate with its bootstrap
    p05/median/p95 — the confidence interval a metrics pipeline
    should publish next to every mean.

    Determinism: the uniform driving each (row, replica) weight is an
    md5 hash of the row key and replica id (the split-family
    discipline — stable under retries and repartitioning); the
    Poisson inverse-CDF thresholds are exact double literals shared
    by both engines; replica sums use exact integer cents.

    Scale shape: NO row expansion — the 32 replica weights are agg
    columns over one digest projection (the "wider combiner"), split
    into 4 slice aggregates of 16 columns so every generated method
    stays under the JVM JIT compile limit (see the in-code note).
    The uniforms come from 4 md5 calls per ROW (each 128-bit digest
    is split into 8 independent 16-bit hex chunks) rather than one
    md5 per (row, replica) — an 8× hash reduction."""
    from serverless_datalake_spark.operators import pin as _pin

    li = load_table(spark, sf_dir, "lineitem")
    reps = 32
    cents = F.round(F.col("l_extendedprice") * 100.0, 0).cast("long")
    # The bootstrap is 4 SLICE aggregates of 16 columns each over ONE
    # pinned digest projection, not one 64-column aggregate. The
    # single-aggregate spelling (round 4..9) fused 32 when-chains + 64
    # sum updates into one generated method far past the JVM JIT's
    # compile limit (~8 KB bytecode): HotSpot refused to compile it
    # and the whole stage ran as interpreted bytecode — measured 8.5 s
    # for the aggregate alone at sf0.1, SLOWER than Spark's own
    # interpreted path (wholeStage off: 5.9 s). Slicing the aggregate
    # keeps every generated method JIT-compilable: 16-column slices
    # measured 3.0 s end-to-end (round-10 A/B; 32-col slices 3.4 s,
    # one 64-col agg 8.5 s — the cliff is between 32 and 64). The
    # digest projection is pinned so the 4 slices share one scan +
    # md5 pass; it is (4×32-char hex + cents) per row — at cluster
    # scale each slice needs only ITS digest column d_g (replicas
    # 8g..8g+7), so the same shape works with per-slice single-digest
    # projections (1 md5/row/slice) instead of an executor-resident
    # corpus pin. The original 32× explode + per-replica md5+conv
    # measured ~21 s at sf0.1 — kept out.
    t = _bootstrap_thresholds()
    rk = (F.col("l_orderkey") * 16 + F.col("l_linenumber")).cast("string")
    digests = [F.md5(F.concat_ws("_", rk, F.lit(str(g)))) for g in range(reps // 8)]
    rows = _pin(
        li.select(
            *[d.alias(f"d{g}") for g, d in enumerate(digests)], cents.alias("cents")
        )
    )

    def w_expr(b):
        chunk = F.substring(F.col(f"d{b // 8}"), (b % 8) * 4 + 1, 4)
        return (
            F.when(chunk < t[0], 0)
            .when(chunk < t[1], 1)
            .when(chunk < t[2], 2)
            .when(chunk < t[3], 3)
            .when(chunk < t[4], 4)
            .otherwise(5)
        )

    def slice_agg(lo: int, hi: int) -> DataFrame:
        aggs = []
        for b in range(lo, hi):
            aggs.append(F.sum(w_expr(b)).alias(f"n{b}"))
            aggs.append(F.sum(w_expr(b) * F.col("cents")).alias(f"s{b}"))
        if lo == 0:
            aggs.append(F.sum("cents").alias("tot_cents"))
            aggs.append(F.count(F.lit(1)).alias("n_rows"))
        return rows.agg(*aggs)

    one = slice_agg(0, 8)
    for lo in range(8, reps, 8):
        one = one.crossJoin(slice_agg(lo, lo + 8))
    means = [
        F.round(
            (F.col(f"s{b}").cast("double") / 100.0) / F.col(f"n{b}").cast("double"), 6
        )
        for b in range(reps)
    ]
    return one.select(
        F.round(
            F.col("tot_cents").cast("double") / 100.0 / F.col("n_rows").cast("double"),
            6,
        ).alias("point_mean"),
        F.array_sort(F.array(*means)).alias("ms"),
    ).select(
        "point_mean",
        F.element_at("ms", 2).alias("boot_p05"),
        F.element_at("ms", 16).alias("boot_median"),
        F.element_at("ms", 31).alias("boot_p95"),
        F.lit(reps).cast("long").alias("n_replicas"),
    )


@query(
    "agg_time_hierarchy_rollup",
    oracle="""
    SELECT CAST(FLOOR(EPOCH(CAST(time_bucket(INTERVAL '1 day', ts) AS TIMESTAMP))) AS BIGINT) AS day_start,
           CASE WHEN GROUPING(CAST(FLOOR(EPOCH(CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP))) AS BIGINT)) = 0
                THEN CAST(FLOOR(EPOCH(CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP))) AS BIGINT) END AS hour_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY ROLLUP (
      CAST(FLOOR(EPOCH(CAST(time_bucket(INTERVAL '1 day', ts) AS TIMESTAMP))) AS BIGINT),
      CAST(FLOOR(EPOCH(CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP))) AS BIGINT)
    )
    HAVING GROUPING(CAST(FLOOR(EPOCH(CAST(time_bucket(INTERVAL '1 day', ts) AS TIMESTAMP))) AS BIGINT)) = 0
    """,
    tags=("agg", "rollup", "time"),
)
def agg_time_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-hierarchy rollup: hourly AND daily totals from ONE pass
    (ROLLUP(day, hour) → the Expand node emits both grains into the
    same aggregate; the grand-total row is dropped) — the OLAP cube
    pattern that serves a day-level dashboard and its hour-level
    drill-down without re-scanning. Subtotal rows are identified by a
    NULL hour_start (GROUPING()-guarded so a genuine NULL can't be
    confused).

    Scale shape: one scan, one Expand (2× row multiplication — far
    cheaper than two scans at 100 TB), one partial-agged shuffle."""
    e = load_table(spark, sf_dir, "events")
    day = F.expr("CAST(ts AS LONG) DIV 86400 * 86400")
    hour = F.expr("CAST(ts AS LONG) DIV 3600 * 3600")
    return (
        e.select(day.alias("day_start"), hour.alias("hour_start"), "value")
        .rollup("day_start", "hour_start")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.grouping("day_start").alias("__gd"),
            F.grouping("hour_start").alias("__gh"),
        )
        .where(F.col("__gd") == 0)
        .select(
            "day_start",
            F.when(F.col("__gh") == 0, F.col("hour_start")).alias("hour_start"),
            "n",
            "sum_value",
        )
    )


@query(
    "agg_moments_shape",
    oracle="""
    WITH ser AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n,
             list(o_totalprice ORDER BY o_totalprice, o_orderkey) AS xs
      FROM orders GROUP BY 1
    ), m1 AS (
      SELECT o_orderpriority, n, xs,
             list_aggregate(xs, 'sum') / CAST(n AS DOUBLE) AS mean
      FROM ser
    ), moments AS (
      SELECT o_orderpriority, n, mean,
             list_aggregate(list_transform(xs, x -> (x - mean) * (x - mean)), 'sum')
               / CAST(n AS DOUBLE) AS m2,
             list_aggregate(list_transform(xs, x -> (x - mean) * (x - mean) * (x - mean)), 'sum')
               / CAST(n AS DOUBLE) AS m3,
             list_aggregate(list_transform(xs, x -> (x - mean) * (x - mean) * (x - mean) * (x - mean)), 'sum')
               / CAST(n AS DOUBLE) AS m4
      FROM m1
    )
    SELECT o_orderpriority, n,
           ROUND(mean, 4) AS mean,
           ROUND(m3 / (SQRT(m2) * SQRT(m2) * SQRT(m2)), 6) AS skewness,
           ROUND(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis
    FROM moments
    """,
    tags=("agg", "moments", "profile"),
)
def agg_moments_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shape moments — population skewness g₁ = m₃/m₂^1.5
    and excess kurtosis g₂ = m₄/m₂² − 3 per priority class: the
    two numbers that tell a pipeline whether a column is z-scoreable
    (symmetric, light-tailed) or needs the quantile/winsorize path.
    Spelled as explicit central-moment folds over the value-sorted
    series rather than the built-ins, because Spark's and DuckDB's
    skewness()/kurtosis() disagree on bias correction — the moment
    DEFINITION is pinned here, identically in both engines.

    Scale shape: one group shuffle; at extreme group sizes the same
    moments fall out of one pass of raw power sums (Σx, Σx², Σx³,
    Σx⁴ in integer cents) — the fold spelling exists for bit-exact
    oracle parity."""
    o = load_table(spark, sf_dir, "orders")
    ser = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.array_sort(
            F.collect_list(F.struct("o_totalprice", "o_orderkey"))
        ).alias("arr"),
    )
    xs = F.transform(F.col("arr"), lambda r: r["o_totalprice"])

    def fold(expr):
        return F.aggregate(expr, F.lit(0.0), lambda s, x: s + x)

    nd = F.col("n").cast("double")
    # `mean` MUST arrive as a join attribute, not as an aliased
    # expression in the same projection chain: referencing an aliased
    # fold inside the m2/m3/m4 element lambdas lets Catalyst's project
    # collapsing INLINE the whole O(N) array aggregate per element —
    # O(N²) interpreted HOF eval (measured: this query alone ran >9
    # minutes at sf0.1 and stalled two full-registry sweeps; with the
    # join barrier it runs in ~1 s). Same family as the Bradley–Terry
    # oracle's AS MATERIALIZED note.
    means = ser.select(
        F.col("o_orderpriority").alias("mkey"), (fold(xs) / nd).alias("mean")
    )
    joined = ser.join(means, F.col("o_orderpriority") == F.col("mkey")).drop("mkey")
    mean = F.col("mean")
    d = lambda x: x - mean  # noqa: E731
    m2 = fold(F.transform(xs, lambda x: d(x) * d(x))) / nd
    m3 = fold(F.transform(xs, lambda x: d(x) * d(x) * d(x))) / nd
    m4 = fold(F.transform(xs, lambda x: d(x) * d(x) * d(x) * d(x))) / nd
    return joined.select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n"),
        F.round(mean, 4).alias("mean"),
        F.round(m3 / (F.sqrt(m2) * F.sqrt(m2) * F.sqrt(m2)), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3.0, 6).alias("excess_kurtosis"),
    )


@query(
    "agg_benford_deviation",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS d
      FROM orders WHERE o_totalprice >= 1
    ), obs AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS t FROM obs
    )
    SELECT obs.d AS first_digit, obs.n,
           ROUND(CAST(obs.n AS DOUBLE) / CAST(tot.t AS DOUBLE), 6) AS observed,
           ROUND(ln(1.0 + 1.0 / CAST(obs.d AS DOUBLE)) / ln(10.0), 6) AS benford_expected,
           ROUND(CAST(obs.n AS DOUBLE) / CAST(tot.t AS DOUBLE)
                 - ln(1.0 + 1.0 / CAST(obs.d AS DOUBLE)) / ln(10.0), 6) AS deviation
    FROM obs CROSS JOIN tot
    """,
    tags=("agg", "benford", "quality"),
)
def agg_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit: observed leading-digit shares
    of order totals against log10(1 + 1/d) — the forensic-accounting
    sanity check (organic multiplicative amounts follow Benford;
    fabricated or clamped data deviates visibly). The per-digit
    deviation column is the statistic an anomaly monitor thresholds.

    First digit extracted from the integer part's decimal string —
    identical in both engines (no float log10 on the value itself);
    expected shares spelled ln(1+1/d)/ln(10) identically. One scan,
    one 9-group aggregate, a 1-row total broadcast."""
    o = load_table(spark, sf_dir, "orders")
    d = F.substring(
        F.floor("o_totalprice").cast("long").cast("string"), 1, 1
    ).cast("long")
    obs = (
        o.where(F.col("o_totalprice") >= 1)
        .select(d.alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = obs.groupBy().agg(F.sum("n").alias("t"))
    expected = F.log(1.0 + 1.0 / F.col("d").cast("double")) / F.log(F.lit(10.0))
    share = F.col("n").cast("double") / F.col("t").cast("double")
    return obs.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("first_digit"),
        "n",
        F.round(share, 6).alias("observed"),
        F.round(expected, 6).alias("benford_expected"),
        F.round(share - expected, 6).alias("deviation"),
    )


@query(
    "agg_bitmap_presence",
    oracle="""
    SELECT event_type,
           CAST(bit_or(CAST(1 << CAST(user_id % 8 AS INTEGER) AS BIGINT)) AS BIGINT) AS cohort_bitmap,
           CAST(bit_count(bit_or(CAST(1 << CAST(user_id % 8 AS INTEGER) AS BIGINT))) AS BIGINT) AS cohorts_present,
           CAST(bit_and(CAST(1 << CAST(user_id % 8 AS INTEGER) AS BIGINT)) AS BIGINT) AS common_bits
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "bitmap", "bitwise"),
)
def agg_bitmap_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap presence aggregation — the roaring-bitmap idea in
    miniature: each user cohort is one bit, bit_or() folds a group's
    membership into a single integer (mergeable across shards by OR),
    bit_count reads coverage, bit_and witnesses bits common to every
    row (0 unless a group is single-cohort). This is how presence /
    audience-overlap systems avoid count-distinct state entirely: the
    bitmap IS the aggregate.

    Scale shape: constant-size state per group, map-side combinable,
    order-independent — the cheapest mergeable summary in the whole
    sketch family (HLL/CMS/quantile all carry more state)."""
    e = load_table(spark, sf_dir, "events")
    # F.shiftleft requires a literal bit count; the SQL form takes a
    # column expression
    bit = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 8 AS INT))")
    return e.groupBy("event_type").agg(
        F.bit_or(bit).alias("cohort_bitmap"),
        F.bit_count(F.bit_or(bit)).cast("long").alias("cohorts_present"),
        F.bit_and(bit).alias("common_bits"),
    )


@query(
    "agg_mad_robust",
    oracle="""
    WITH med AS (
      SELECT o_orderpriority, MEDIAN(o_totalprice) AS med
      FROM orders GROUP BY 1
    ), dev AS (
      SELECT o.o_orderpriority, ABS(o.o_totalprice - med.med) AS ad
      FROM orders o JOIN med USING (o_orderpriority)
    )
    SELECT o_orderpriority,
           ROUND(MIN(med.med), 2) AS median_price,
           ROUND(MEDIAN(ad), 2) AS mad,
           ROUND(MEDIAN(ad) * 1.4826, 2) AS robust_sigma
    FROM dev JOIN med USING (o_orderpriority)
    GROUP BY o_orderpriority
    """,
    tags=("agg", "robust", "mad"),
)
def agg_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation — the robust scale estimate
    (MAD·1.4826 ≈ σ under normality, but immune to the outliers that
    poison stddev): the spread number feature_winsorize-style clipping
    and robust z-scores should use on heavy-tailed columns. Two
    interpolated medians (Spark percentile ≡ DuckDB MEDIAN — parity
    proven by agg_percentile_exact), the second over absolute
    deviations from the first.

    Scale shape: two group-keyed aggregates with a broadcast of the
    group medians between them — two passes by definition (MAD is not
    a one-pass statistic); both shuffles are on the same key."""
    o = load_table(spark, sf_dir, "orders")
    med = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("med")
    )
    dev = o.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        "med",
        F.abs(F.col("o_totalprice") - F.col("med")).alias("ad"),
    )
    return dev.groupBy("o_orderpriority").agg(
        F.round(F.min("med"), 2).alias("median_price"),
        F.round(F.percentile("ad", F.lit(0.5)), 2).alias("mad"),
        F.round(F.percentile("ad", F.lit(0.5)) * 1.4826, 2).alias("robust_sigma"),
    )


def _kmv_hex8(expr: str) -> str:
    """BIGINT from the first 8 hex chars of md5(expr) — the llm_dedup
    hash family (engine-portable, no strpos drift)."""
    terms = [
        f"(strpos('0123456789abcdef', substr(md5({expr}), {i + 1}, 1)) - 1)"
        f" * CAST({16 ** (7 - i)} AS BIGINT)"
        for i in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


_KMV_K = 8


@query(
    "agg_kmv_distinct_union",
    oracle=f"""
    WITH hashed AS (
      SELECT DISTINCT event_type, user_id,
             {_kmv_hex8("CAST(user_id AS VARCHAR)")} AS h
      FROM events
    ), per_type AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h, user_id) AS r,
             COUNT(*) OVER (PARTITION BY event_type) AS nd
      FROM hashed
    ), type_est AS (
      SELECT event_type,
             CAST(MAX(nd) AS BIGINT) AS n_exact,
             ROUND(CASE WHEN MAX(nd) < {_KMV_K} THEN CAST(MAX(nd) AS DOUBLE)
                        ELSE ({_KMV_K} - 1.0) * 4294967296.0
                             / CAST(MAX(CASE WHEN r = {_KMV_K} THEN h END) AS DOUBLE)
                   END, 4) AS kmv_estimate
      FROM per_type GROUP BY event_type
    ), guh AS (
      SELECT DISTINCT user_id, {_kmv_hex8("CAST(user_id AS VARCHAR)")} AS h
      FROM events
    ), gr AS (
      SELECT h, ROW_NUMBER() OVER (ORDER BY h, user_id) AS r,
             COUNT(*) OVER () AS nd
      FROM guh
    ), union_est AS (
      SELECT 'ALL' AS event_type,
             CAST(MAX(nd) AS BIGINT) AS n_exact,
             ROUND(CASE WHEN MAX(nd) < {_KMV_K} THEN CAST(MAX(nd) AS DOUBLE)
                        ELSE ({_KMV_K} - 1.0) * 4294967296.0
                             / CAST(MAX(CASE WHEN r = {_KMV_K} THEN h END) AS DOUBLE)
                   END, 4) AS kmv_estimate
      FROM gr
    )
    SELECT * FROM type_est UNION ALL SELECT * FROM union_est
    """,
    tags=("agg", "sketch", "kmv"),
)
def agg_kmv_distinct_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch (k=8) per event type,
    plus the sketch UNION across all types — the mergeability property
    that makes KMV/theta sketches the warehouse standard for
    distinct-count rollups (union = keep the k smallest of the merged
    hash sets; no rescan of the inputs).

    Unlike HLL the whole sketch is deterministic given the hash family
    (md5-derived 32-bit values, the llm_dedup family), so the DuckDB
    oracle recomputes estimates bit-for-bit. n_exact rides along to
    show the estimate error honestly; groups under k fall back to the
    exact count exactly as production sketches do.

    Scale shape: KMV needs only the k SMALLEST hashes per group plus
    an exact count — never a full ranking. The per-type leg ranks
    with a `r <= k` filter so WindowGroupLimit keeps at most k rows
    per group per partition BEFORE the shuffle (partial state = k
    values, the sketch's own bound); the union leg is a distributed
    `sort().limit(k)` (TakeOrderedAndProject: per-partition k-minima
    heaps merged at the driver) crossed with a 1-row exact count —
    no global window, no single-task sort anywhere."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    h = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    hashed = ev.select("event_type", "user_id").distinct().select(
        "event_type", "user_id", h.alias("h")
    )

    def est_expr(n_col, kth_col):
        return F.round(
            F.when(n_col < _KMV_K, n_col.cast("double")).otherwise(
                F.lit(float(_KMV_K - 1))
                * F.lit(4294967296.0)
                / kth_col.cast("double")
            ),
            4,
        ).alias("kmv_estimate")

    # per-type: rank-filter (r <= k) lets WindowGroupLimit bound every
    # partition's state to k rows per group before the group shuffle
    wk = Window.partitionBy("event_type").orderBy("h", "user_id")
    topk = hashed.withColumn("r", F.row_number().over(wk)).where(
        F.col("r") <= _KMV_K
    )
    kth = topk.groupBy("event_type").agg(
        F.max(F.when(F.col("r") == _KMV_K, F.col("h"))).alias("kth_h")
    )
    counts = hashed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    per_type = counts.join(kth, "event_type").select(
        "event_type", "n_exact", est_expr(F.col("n_exact"), F.col("kth_h"))
    )

    # union ("ALL"): global k-minima via sort().limit(k) — the k-th
    # smallest hash is the max over those k rows; exact count is a
    # plain aggregate; both are 1-row relations, crossed
    guh = hashed.select("user_id", "h").distinct()
    kmin = guh.orderBy("h", "user_id").limit(_KMV_K)
    kth_all = kmin.agg(F.max("h").alias("kth_h"))
    n_all = guh.agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    union_row = n_all.crossJoin(kth_all).select(
        F.lit("ALL").alias("event_type"),
        "n_exact",
        est_expr(F.col("n_exact"), F.col("kth_h")),
    )
    return per_type.unionAll(union_row)


@query(
    "agg_median_of_means",
    oracle="""
    WITH assigned AS (
      SELECT CAST(ROUND(l_extendedprice * 100.0, 0) AS BIGINT) AS cents,
             (strpos('0123456789abcdef',
                     substr(md5(CAST(l_orderkey AS VARCHAR) || ':'
                                || CAST(l_linenumber AS VARCHAR)), 1, 1)) - 1) % 8
               AS bucket
      FROM lineitem
    ), bucket_means AS (
      SELECT bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0, 6)
               AS mean_price
      FROM assigned GROUP BY 1
    ), ranked AS (
      SELECT mean_price,
             ROW_NUMBER() OVER (ORDER BY mean_price, bucket) AS rn,
             COUNT(*) OVER () AS k
      FROM bucket_means
    )
    SELECT (SELECT CAST(SUM(n) AS BIGINT) FROM bucket_means) AS n_rows,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM bucket_means) AS k_buckets,
           (SELECT ROUND((MAX(CASE WHEN rn = k / 2 THEN mean_price END)
                          + MAX(CASE WHEN rn = k / 2 + 1 THEN mean_price END)) / 2.0, 6)
            FROM ranked) AS median_of_means,
           (SELECT ROUND(MAX(mean_price) - MIN(mean_price), 6) FROM bucket_means)
             AS bucket_spread
    """,
    tags=("agg", "robust", "median-of-means"),
)
def agg_median_of_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-means — the heavy-tail-robust mean estimator with
    exponential concentration: rows hash DETERMINISTICALLY into k=8
    buckets (md5 of the row key — stable under re-runs and
    repartitioning, the house sampling discipline), each bucket's
    exact-cents mean is computed, and the estimate is the median of
    the 8 means (k even → midpoint of the two central means). The
    bucket spread rides along as the robustness diagnostic.

    Exactness: bucket sums are exact integers; means are single
    divisions; the median picks from 8 exact doubles by rank with a
    bucket tie-break.

    Scale shape: ONE hash aggregate to 8 rows — unlike the exact
    median (a sort), median-of-means is partial-aggregable and
    streaming-friendly, which is why robust-statistics pipelines use
    it at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100.0, 0).cast("long")
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("l_orderkey").cast("string"),
                        F.lit(":"),
                        F.col("l_linenumber").cast("string"),
                    )
                ),
                1,
                1,
            ),
            16,
            10,
        ).cast("long")
        % 8
    )
    bm = (
        li.select(cents.alias("cents"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum("cents").cast("double") / F.count(F.lit(1)).cast("double") / F.lit(100.0),
                6,
            ).alias("mean_price"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("mean_price", "bucket")
    ranked = bm.select(
        "mean_price",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("k"),
    )
    med = ranked.agg(
        F.round(
            (
                F.max(F.when(F.col("rn") == (F.col("k") / 2).cast("long"), F.col("mean_price")))
                + F.max(
                    F.when(F.col("rn") == (F.col("k") / 2).cast("long") + 1, F.col("mean_price"))
                )
            )
            / F.lit(2.0),
            6,
        ).alias("median_of_means")
    )
    summary = bm.agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("k_buckets"),
        F.round(F.max("mean_price") - F.min("mean_price"), 6).alias("bucket_spread"),
    )
    return summary.crossJoin(F.broadcast(med)).select(
        "n_rows", "k_buckets", "median_of_means", "bucket_spread"
    )


_KMVJ_K = 64


@query(
    "agg_kmv_jaccard",
    oracle=f"""
    WITH membership AS (
      SELECT user_id || '|' || CAST(CAST(ts AS DATE) AS VARCHAR) AS el,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_a,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS in_b
      FROM events GROUP BY 1
    ), u AS (
      SELECT el, in_a, in_b, {_kmv_hex8("el")} AS h
      FROM membership WHERE in_a = 1 OR in_b = 1
    ), ranked AS (
      SELECT el, in_a, in_b, h,
             ROW_NUMBER() OVER (ORDER BY h, el) AS r,
             COUNT(*) OVER () AS nd
      FROM u
    ), exacts AS (
      SELECT CAST(SUM(in_a) AS BIGINT) AS n_a,
             CAST(SUM(in_b) AS BIGINT) AS n_b,
             CAST(COUNT(*) AS BIGINT) AS n_union,
             CAST(SUM(in_a * in_b) AS BIGINT) AS n_inter
      FROM u
    ), sketch AS (
      SELECT CAST(SUM(CASE WHEN r <= {_KMVJ_K} THEN in_a * in_b ELSE 0 END) AS BIGINT)
               AS k_match,
             CAST(MAX(CASE WHEN r = {_KMVJ_K} THEN h END) AS BIGINT) AS kth_h,
             CAST(MAX(nd) AS BIGINT) AS nd
      FROM ranked
    ), est AS (
      SELECT e.*, s.k_match,
             CAST(s.k_match AS DOUBLE) / CAST(LEAST(s.nd, {_KMVJ_K}) AS DOUBLE) AS j_raw,
             CASE WHEN s.nd < {_KMVJ_K} THEN CAST(s.nd AS DOUBLE)
                  ELSE ({_KMVJ_K} - 1.0) * 4294967296.0 / CAST(s.kth_h AS DOUBLE)
             END AS u_raw
      FROM exacts e CROSS JOIN sketch s
    )
    SELECT CAST({_KMVJ_K} AS BIGINT) AS k, n_a, n_b, n_union, n_inter,
           ROUND(CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE), 6) AS jaccard_exact,
           ROUND(j_raw, 6) AS jaccard_kmv,
           ROUND(j_raw * u_raw, 3) AS inter_kmv
    FROM est
    """,
    tags=("agg", "sketch", "kmv", "jaccard"),
)
def agg_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-INTERSECTION estimation from KMV/theta sketches: the
    purchase-active and click-active (user, day) sets sketch to their k minimum
    hashes; the k smallest hashes of the UNION double as a uniform
    sample of it, so the fraction that belongs to both sets estimates
    Jaccard, and Jaccard × the union's KMV estimate recovers the
    intersection size — the theta-sketch set algebra (Dasgupta et al.)
    that lets warehouses answer audience-overlap queries from
    mergeable per-segment sketches without rescanning either side.
    Exact counts ride along to show the estimate error honestly;
    sketches narrower than k fall back to exact, as production
    sketches do.

    Exactness: the hash family is the md5-based engine-portable one;
    matches and order statistics are integers; the two estimate
    divisions and one product are spelled identically both engines.

    Scale shape: membership partial-aggregates to user grain map-side;
    the sketch touches only the k SMALLEST hashes, obtained by a
    distributed `sort().limit(k)` (TakeOrderedAndProject — each
    partition keeps a k-heap of (hash, flags), merged at the driver,
    exactly the KMV partial state) crossed with the 1-row exact
    aggregate; no rank window anywhere. `nd` in the estimator is the
    union's exact count, which `exacts` already computes (n_union)."""
    ev = load_table(spark, sf_dir, "events")
    el = F.concat_ws(
        "|", F.col("user_id").cast("string"), F.col("ts").cast("date").cast("string")
    )
    membership = ev.groupBy(el.alias("el")).agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("in_b"),
    )
    u = membership.where((F.col("in_a") == 1) | (F.col("in_b") == 1)).withColumn(
        "h", F.conv(F.substring(F.md5(F.col("el")), 1, 8), 16, 10).cast("long")
    )
    exacts = u.agg(
        F.sum("in_a").cast("long").alias("n_a"),
        F.sum("in_b").cast("long").alias("n_b"),
        F.count(F.lit(1)).cast("long").alias("n_union"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_inter"),
    )
    # the k smallest union hashes (TakeOrderedAndProject); when the
    # union is narrower than k the kth_h max is over fewer rows, but
    # the estimator's nd<k branch never reads it then (same NULL/
    # unused contract as the oracle's CASE WHEN r = k)
    kmin = u.orderBy("h", "el").limit(_KMVJ_K)
    sketch = kmin.agg(
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("k_match"),
        F.max("h").cast("long").alias("kth_h"),
    )
    est = exacts.crossJoin(F.broadcast(sketch)).select(
        "*",
        (
            F.col("k_match").cast("double")
            / F.least(F.col("n_union"), F.lit(_KMVJ_K)).cast("double")
        ).alias("j_raw"),
        F.when(F.col("n_union") < _KMVJ_K, F.col("n_union").cast("double"))
        .otherwise(
            F.lit(float(_KMVJ_K) - 1.0) * F.lit(4294967296.0) / F.col("kth_h").cast("double")
        )
        .alias("u_raw"),
    )
    return est.select(
        F.lit(_KMVJ_K).cast("long").alias("k"),
        "n_a",
        "n_b",
        "n_union",
        "n_inter",
        F.round(F.col("n_inter").cast("double") / F.col("n_union").cast("double"), 6).alias(
            "jaccard_exact"
        ),
        F.round("j_raw", 6).alias("jaccard_kmv"),
        F.round(F.col("j_raw") * F.col("u_raw"), 3).alias("inter_kmv"),
    )


@query(
    "agg_histogram_log2",
    oracle="""
    WITH units AS (
      SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders
    ), bucketed AS (
      SELECT CAST(LENGTH(bin(cents)) AS BIGINT) AS bucket_bits, cents
      FROM units
    ), hist AS (
      SELECT bucket_bits,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(cents) AS BIGINT) AS sum_cents
      FROM bucketed GROUP BY 1
    )
    SELECT bucket_bits,
           CAST(1 AS BIGINT) << CAST(bucket_bits - 1 AS INTEGER) AS lo_cents,
           (CAST(1 AS BIGINT) << CAST(bucket_bits AS INTEGER)) - 1 AS hi_cents,
           n_orders, sum_cents,
           CAST(SUM(n_orders) OVER (ORDER BY bucket_bits
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_orders,
           ROUND(CAST(SUM(n_orders) OVER (ORDER BY bucket_bits
                                          ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / CAST(SUM(n_orders) OVER () AS DOUBLE), 6) AS cum_share
    FROM hist
    """,
    tags=("aggregate", "histogram", "sketch"),
)
def agg_histogram_log2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed value histogram (the HdrHistogram/DDSketch
    at-rest pattern): bucket = position of the value's highest set
    bit, computed EXACTLY as the bit length of the integer cents —
    no floating log whose x = 2^k boundary cells would flip per libm.
    Guarantees ≤ 2× relative error on any percentile read off the
    histogram while the state stays ~64 counters regardless of value
    range — the standard latency/price distribution summary at scale.

    Scale shape: a pure map projection (bin + length) then ONE
    partial-agg shuffle onto tens of bucket rows; the cumulative
    window runs on the bucket rows only. Mergeable across days/
    partitions by adding counters."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    bucketed = o.select(
        F.length(F.bin(cents)).cast("long").alias("bucket_bits"),
        cents.alias("cents"),
    )
    hist = bucketed.groupBy("bucket_bits").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("cents").cast("decimal(38,0)")).cast("long").alias("sum_cents"),
    )
    cw = Window.orderBy("bucket_bits").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum("n_orders").over(cw)
    tot = F.sum("n_orders").over(Window.partitionBy())
    return hist.select(
        "bucket_bits",
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket_bits - 1 AS INT))").alias("lo_cents"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket_bits AS INT)) - 1").alias("hi_cents"),
        "n_orders",
        "sum_cents",
        cum.cast("long").alias("cum_orders"),
        F.round(cum.cast("double") / tot.cast("double"), 6).alias("cum_share"),
    )


@query(
    "agg_sketch_error_audit",
    oracle="WITH est AS (" + _QSKETCH_ORACLE + """
    ), vals AS (
      SELECT l_returnflag, l_extendedprice AS v, COUNT(*) AS cnt
      FROM lineitem GROUP BY 1, 2
    ), vcum AS (
      SELECT l_returnflag, v,
             SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum
      FROM vals
    ), gn AS (
      SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1
    ), targets AS (
      SELECT gn.l_returnflag, p, p * gn.n AS target
      FROM gn, UNNEST([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
                       CAST(0.99 AS DOUBLE)]) AS u(p)
    ), exact AS (
      SELECT l_returnflag, p, MIN(v) AS q_exact
      FROM targets t JOIN vcum c USING (l_returnflag)
      WHERE c.cum >= t.target
      GROUP BY 1, 2
    )
    SELECT e.l_returnflag, e.p,
           e.q_est,
           ROUND(x.q_exact, 4) AS q_exact,
           ROUND(ABS(e.q_est - x.q_exact), 4) AS abs_err,
           ROUND(ABS(e.q_est - x.q_exact) / x.q_exact, 6) AS rel_err
    FROM est e JOIN exact x ON x.l_returnflag = e.l_returnflag AND x.p = e.p
    """,
    tags=("agg", "sketch", "quantile", "audit"),
)
def agg_sketch_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy audit of the histogram quantile sketch against exact
    order statistics — the approx-operator twin of RECALL.md's ANN
    tracking: per (group, percentile), the sketch estimate, the exact
    percentile-disc value (smallest value whose cumulative count
    reaches p·n), and the absolute/relative error. The error bound
    the sketch PROMISES is one bin width (range/128); this query
    MEASURES it, so a fixture or binning change that silently
    degrades the sketch shows up like a recall regression.

    Scale shape: the exact side is value-grain (one count shuffle +
    a per-group cumulative window over distinct values) — affordable
    as an AUDIT on a sample or a group slice even when the full-data
    answer would use the sketch alone; the sketch side is unchanged.
    Join grain is (group × 3 percentiles)."""
    from serverless_datalake_spark.queries import REGISTRY

    est = REGISTRY["agg_quantile_sketch"].fn(spark, sf_dir).select(
        "l_returnflag", "p", "q_est"
    )
    li = load_table(spark, sf_dir, "lineitem")
    vals = li.groupBy("l_returnflag", F.col("l_extendedprice").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    vcum = vals.select(
        "l_returnflag",
        "v",
        F.sum("cnt")
        .over(Window.partitionBy("l_returnflag").orderBy("v"))
        .alias("cum"),
    )
    gn = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
    ps = F.explode(
        F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    ).alias("p")
    targets = gn.select("l_returnflag", ps, "n").select(
        "l_returnflag", "p", (F.col("p") * F.col("n")).alias("target")
    )
    exact = (
        targets.join(vcum, "l_returnflag")
        .where(F.col("cum") >= F.col("target"))
        .groupBy("l_returnflag", "p")
        .agg(F.min("v").alias("q_exact"))
    )
    j = est.join(exact, ["l_returnflag", "p"])
    return j.select(
        "l_returnflag",
        "p",
        "q_est",
        F.round("q_exact", 4).alias("q_exact"),
        F.round(F.abs(F.col("q_est") - F.col("q_exact")), 4).alias("abs_err"),
        F.round(
            F.abs(F.col("q_est") - F.col("q_exact")) / F.col("q_exact"), 6
        ).alias("rel_err"),
    )


@query(
    "agg_sketch_set_algebra",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_click,
             MAX(CASE WHEN event_type = 'purchase' AND value > 150.0 THEN 1 ELSE 0 END) AS has_big
      FROM events GROUP BY 1
    )
    SELECT CAST(SUM(has_click) AS BIGINT) AS n_click_exact,
           CAST(SUM(has_big) AS BIGINT) AS n_big_exact,
           CAST(SUM(has_click * has_big) AS BIGINT) AS n_inter_exact,
           CAST(SUM(has_click * (1 - has_big)) AS BIGINT) AS n_diff_exact,
           CAST(COUNT(*) AS BIGINT) AS n_all_exact,
           TRUE AS hll_click_ok,
           TRUE AS hll_union_ok,
           TRUE AS theta_inter_ok,
           TRUE AS theta_diff_ok
    FROM per_user
    """,
    tags=("agg", "sketch", "datasketches", "theta", "hll"),
)
def agg_sketch_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apache DataSketches set algebra (Spark 4.1 built-ins) — the
    mergeable-sketch pattern every 100 TB audience system runs:
    HLL sketches per segment merged with hll_union_agg for the
    overall distinct-user estimate, and THETA sketches (which, unlike
    HLL, support intersection and difference) for clickers∩big-spenders
    and clickers\\big-spenders (purchase, value > 150). Sketches are tiny mergeable states — at
    rest you store one per partition/day and answer any segment
    overlap at query time without touching raw events.

    Oracle contract (tolerance certificates, the agg_approx pattern):
    the exact counts are driver-verified values; the sketch estimates
    are checked INSIDE the query against relative-error bounds (5%
    for HLL counts, 10% for theta set ops whose error compounds) and
    shipped as booleans the oracle pins to TRUE — so a sketch
    regression fails the driver check without demanding cross-engine
    bit-equality of estimator internals.

    Scale shape: one pass over events builds all four sketches via
    conditional sketch aggregates (NULLs are ignored by the sketch,
    so no pre-filter scans); the exact twins cost one user-grain
    shuffle and exist only to prove the sketches honest."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy().agg(
        F.expr(
            "theta_sketch_agg(CASE WHEN event_type = 'click' THEN user_id END)"
        ).alias("t_click"),
        F.expr(
            "theta_sketch_agg(CASE WHEN event_type = 'purchase' AND value > 150.0 THEN user_id END)"
        ).alias("t_big"),
        F.expr(
            "hll_sketch_agg(CASE WHEN event_type = 'click' THEN user_id END)"
        ).alias("h_click"),
        F.expr("hll_sketch_agg(user_id)").alias("h_all"),
    ).select(
        F.expr("hll_sketch_estimate(h_click)").alias("e_click"),
        F.expr("hll_sketch_estimate(h_all)").alias("e_all"),
        F.expr("theta_sketch_estimate(theta_intersection(t_click, t_big))").alias(
            "e_inter"
        ),
        F.expr("theta_sketch_estimate(theta_difference(t_click, t_big))").alias(
            "e_diff"
        ),
    )
    per_user = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("has_click"),
        F.max(
            F.when((F.col("event_type") == "purchase") & (F.col("value") > 150.0), 1)
            .otherwise(0)
        ).alias("has_big"),
    )
    exact = per_user.groupBy().agg(
        F.sum("has_click").cast("long").alias("n_click_exact"),
        F.sum("has_big").cast("long").alias("n_big_exact"),
        F.sum(F.col("has_click") * F.col("has_big")).cast("long").alias(
            "n_inter_exact"
        ),
        F.sum(F.col("has_click") * (F.lit(1) - F.col("has_big")))
        .cast("long")
        .alias("n_diff_exact"),
        F.count(F.lit(1)).cast("long").alias("n_all_exact"),
    )

    def ok(est, exact_col, tol):
        return (
            F.abs(est - F.col(exact_col).cast("double"))
            <= F.lit(tol) * F.col(exact_col).cast("double")
        )

    return exact.crossJoin(F.broadcast(sk)).select(
        "n_click_exact",
        "n_big_exact",
        "n_inter_exact",
        "n_diff_exact",
        "n_all_exact",
        ok(F.col("e_click"), "n_click_exact", 0.05).alias("hll_click_ok"),
        ok(F.col("e_all"), "n_all_exact", 0.05).alias("hll_union_ok"),
        ok(F.col("e_inter"), "n_inter_exact", 0.10).alias("theta_inter_ok"),
        ok(F.col("e_diff"), "n_diff_exact", 0.10).alias("theta_diff_ok"),
    )


@query(
    "agg_theil_inequality",
    oracle="""
    WITH rows_pos AS (
      SELECT CAST(c_nationkey AS BIGINT) AS g,
             CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS x
      FROM customer WHERE c_acctbal > 0
    ), grp AS (
      SELECT g,
             CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(x) AS HUGEINT) AS sg,
             CAST(SUM(CAST(ROUND(CAST(x AS DOUBLE)
                                 * LN(CAST(x AS DOUBLE)) * 10000, 0)
                           AS HUGEINT)) AS HUGEINT) AS lg
      FROM rows_pos GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(sg) AS HUGEINT) AS s,
             CAST(SUM(lg) AS HUGEINT) AS l
      FROM grp
    ), gterms AS (
      SELECT g,
             ROUND(CAST(sg AS DOUBLE) / CAST(s AS DOUBLE)
                   * LN((CAST(sg AS DOUBLE) / CAST(s AS DOUBLE))
                        / (CAST(ng AS DOUBLE) / CAST(n AS DOUBLE))), 8)
               AS bt,
             ROUND(CAST(sg AS DOUBLE) / CAST(s AS DOUBLE)
                   * (CAST(lg AS DOUBLE) / 10000.0 / CAST(sg AS DOUBLE)
                      - LN(CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE))), 8)
               AS wt
      FROM grp CROSS JOIN tot
    ), folds AS (
      SELECT (SELECT list_aggregate(list(bt ORDER BY g), 'sum') FROM gterms)
               AS t_between,
             (SELECT list_aggregate(list(wt ORDER BY g), 'sum') FROM gterms)
               AS t_within,
             (SELECT n FROM tot) AS n,
             (SELECT s FROM tot) AS s,
             (SELECT l FROM tot) AS l
    )
    SELECT n AS n_rows,
           ROUND(CAST(l AS DOUBLE) / 10000.0
                 / (CAST(n AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                 - LN(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS theil_total,
           ROUND(t_between, 6) AS theil_between,
           ROUND(t_within, 6) AS theil_within
    FROM folds
    """,
    tags=("agg", "inequality", "theil"),
)
def agg_theil_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality of positive customer balances with its
    exact between-/within-nation decomposition — the additive
    inequality index (unlike agg_gini_concentration's Gini, Theil
    splits cleanly: T = T_between + Sum_g share_g * T_g), which is
    what concentration monitoring wants when it must say WHERE the
    inequality lives.

    Order-free exactness at any scale: the only per-row
    transcendental, x*ln(x), is quantized to an e4 integer PER ROW
    and summed exactly (DECIMAL(38,0) vs HUGEINT) — no ordered fold
    over data-sized lists, unlike the entropy family, because
    T = L/(n*mu) - ln(mu) needs only (n, Sum x, Sum x*ln x). The
    25 group terms then fold in nation order (the entropy precedent,
    domain-bounded).

    Scale shape: one fact scan with per-row arithmetic, ONE
    partial-agg shuffle to 25 group rows, constant-size folds — the
    stats_jackknife_groups profile; at 100 TB the scan is the cost."""
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 0)
    d38 = "decimal(38,0)"
    x = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    xd = x.cast("double")
    grp = cust.select(
        F.col("c_nationkey").cast("long").alias("g"),
        x.alias("x"),
        F.round(xd * F.log(xd) * 10000, 0).cast(d38).alias("lx"),
    ).groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum(F.col("x").cast(d38)).alias("sg"),
        F.sum("lx").alias("lg"),
    )
    tot = grp.agg(
        F.sum("ng").cast("long").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("lg").alias("l"),
    )
    j = grp.crossJoin(F.broadcast(tot))
    sh = F.col("sg").cast("double") / F.col("s").cast("double")
    pg = F.col("ng").cast("double") / F.col("n").cast("double")
    mu_g = F.col("sg").cast("double") / F.col("ng").cast("double")
    terms = j.select(
        "g",
        "n",
        "s",
        "l",
        F.round(sh * F.log(sh / pg), 8).alias("bt"),
        F.round(
            sh
            * (
                F.col("lg").cast("double") / F.lit(10000.0) / F.col("sg").cast("double")
                - F.log(mu_g)
            ),
            8,
        ).alias("wt"),
    )
    arr_b = F.array_sort(F.collect_list(F.struct(F.col("g"), F.col("bt").alias("e"))))
    arr_w = F.array_sort(F.collect_list(F.struct(F.col("g"), F.col("wt").alias("e"))))

    def fold(arr):
        return F.aggregate(
            F.transform(arr, lambda s: s["e"]), F.lit(0.0), lambda a, e: a + e
        )

    agg = terms.groupBy("n", "s", "l").agg(
        fold(arr_b).alias("t_between"), fold(arr_w).alias("t_within")
    )
    nD = F.col("n").cast("double")
    sD = F.col("s").cast("double")
    mu = sD / nD
    return agg.select(
        F.col("n").alias("n_rows"),
        F.round(
            F.col("l").cast("double") / F.lit(10000.0) / (nD * mu) - F.log(mu), 6
        ).alias("theil_total"),
        F.round(F.col("t_between"), 6).alias("theil_between"),
        F.round(F.col("t_within"), 6).alias("theil_within"),
    )
