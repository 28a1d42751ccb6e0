"""Scalar-function surface (§2b): string, date/time, math, array/map
higher-order functions, JSON extraction (the reference's opaque-JSON
payload semantics — events.props)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_table


@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           lower(c_name) AS name_lower,
           upper(c_mktsegment) AS seg_upper,
           substring(c_name, 1, 8) AS name_prefix,
           length(c_name) AS name_len,
           trim(concat(c_name, ' ')) AS name_trim,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
           replace(c_mktsegment, 'A', '_') AS seg_repl,
           split_part(c_name, '#', 2) AS name_num
    FROM customer
    """,
    tags=("functions", "string"),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String suite — generalizes R8's key→source split
    (recorder:82, `key.split('/')[0]`)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.trim(F.concat(F.col("c_name"), F.lit(" "))).alias("name_trim"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_digits"),
        F.replace(F.col("c_mktsegment"), F.lit("A"), F.lit("_")).alias("seg_repl"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
    )


@query(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS order_month,
           YEAR(o_orderdate) AS order_year,
           MONTH(o_orderdate) AS order_month_num,
           DAYOFWEEK(CAST(o_orderdate AS DATE)) % 7 AS dow,
           CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) AS epoch_s,
           DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2025-01-01') AS days_to_2025,
           CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS due_date
    FROM orders
    WHERE o_orderkey % 11 = 0
    """,
    tags=("functions", "datetime"),
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time suite. DuckDB DAYOFWEEK is 0=Sun..6; Spark dayofweek
    is 1=Sun..7 — normalized to 0-based on both sides."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") % 11 == 0).select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month_num"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
        # o_orderdate arrives as TIMESTAMP_NTZ; go through TIMESTAMP
        # (session tz is pinned UTC) to reach epoch seconds
        F.col("o_orderdate").cast("timestamp").cast("long").alias("epoch_s"),
        F.datediff(F.lit("2025-01-01").cast("date"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("days_to_2025"),
        F.date_add(F.to_date("o_orderdate"), 90).alias("due_date"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 0) AS price_round,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(FLOOR(l_quantity / 7) AS BIGINT) AS qty_floor,
           CAST(CEIL(l_quantity / 7) AS BIGINT) AS qty_ceil,
           ROUND(POW(l_quantity, 2), 4) AS qty_sq,
           ROUND(LN(l_extendedprice + 1), 6) AS log_price,
           ROUND(SQRT(l_quantity), 6) AS qty_sqrt,
           CAST(l_quantity AS BIGINT) % 5 AS qty_mod
    FROM lineitem
    WHERE l_orderkey % 13 = 0
    """,
    tags=("functions", "math"),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math built-ins (round/abs/floor/ceil/pow/log) over order totals."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_orderkey") % 13 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 0).alias("price_round"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(F.col("l_quantity") / 7).alias("qty_floor"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_ceil"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("log_price"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        (F.col("l_quantity").cast("long") % 5).alias("qty_mod"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k,
           CAST(json_extract(props, '$.missing') AS BIGINT) AS prop_missing
    FROM events
    WHERE event_id % 3 = 0
    """,
    tags=("functions", "json"),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's opaque-JSON payload read on demand
    (SURVEY.md §1.1 Event; props column plays that role)."""
    e = load_table(spark, sf_dir, "events")
    return e.where(F.col("event_id") % 3 == 0).select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
        F.get_json_object("props", "$.missing").cast("long").alias("prop_missing"),
    )


@query(
    "fn_array_hof",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 4) AS sq_norm,
           ROUND(list_aggregate(list_transform(list_filter(embedding, x -> x > 0), x -> CAST(x AS DOUBLE)), 'sum'), 4) AS pos_sum,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_coord
    FROM embeddings
    WHERE vec_id % 5 = 0
    """,
    tags=("functions", "array", "hof"),
)
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform/filter/aggregate) —
    stays inside codegen; this is also the building block for the
    cosine-similarity operators (llm_similarity)."""
    em = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return em.where(F.col("vec_id") % 5 == 0).select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(
            F.aggregate(F.transform(dbl, lambda x: x * x), F.lit(0.0), lambda a, x: a + x), 4
        ).alias("sq_norm"),
        F.round(
            F.aggregate(F.filter(dbl, lambda x: x > 0), F.lit(0.0), lambda a, x: a + x), 4
        ).alias("pos_sum"),
        F.size(F.filter(dbl, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(F.element_at(dbl, 1), 6).alias("first_coord"),
    )


@query(
    "fn_explode_tokens",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token
          FROM documents WHERE doc_id % 10 = 0)
    WHERE token <> ''
    GROUP BY token
    """,
    tags=("functions", "explode"),
)
def fn_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode(split(...)) — the tokenize primitive reused by the
    text-analysis and MinHash operators."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.where(F.col("doc_id") % 10 == 0)
        .select(F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


@query(
    "fn_map_ops",
    oracle="""
    SELECT event_type,
           n AS type_count,
           ROUND(v, 2) AS type_value
    FROM (
      SELECT event_type, COUNT(*) AS n, SUM(value) AS v
      FROM events GROUP BY event_type
    )
    """,
    tags=("functions", "map"),
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + explode round-trip: build a per-type map
    with map_from_entries, then recover rows with explode — proves
    MapType create/access/iterate. Oracle sees only the flattened
    result (map layout is engine-specific)."""
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("value").alias("v")
    )
    as_map = agg.agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", F.struct("n", "v")))
        ).alias("m")
    )
    exploded = as_map.select(F.explode("m").alias("event_type", "stats"))
    return exploded.select(
        "event_type",
        F.col("stats.n").alias("type_count"),
        F.round(F.col("stats.v"), 2).alias("type_value"),
    )
