"""Scalar-function batch 2 (§2b breadth): string padding/translate/
initcap, array manipulation, safe casts (try_cast), interval
arithmetic and struct build/access."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_table


@query(
    "fn_string2",
    oracle="""
    SELECT p_partkey,
           lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
           rpad(p_brand, 12, '.') AS padded_brand,
           translate(p_type, 'AEIOU', 'aeiou') AS type_lower_vowels,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_masked,
           reverse(p_brand) AS brand_rev,
           repeat('*', p_size % 5) AS stars,
           contains(p_type, 'ECONOMY') AS is_economy,
           starts_with(p_name, 'small') AS is_small,
           ends_with(p_name, 'widget') AS is_widget
    FROM part
    """,
    tags=("functions", "string"),
)
def fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-function batch (pad/translate/initcap/levenshtein family)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded_key"),
        F.rpad("p_brand", 12, ".").alias("padded_brand"),
        F.translate("p_type", "AEIOU", "aeiou").alias("type_lower_vowels"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_masked"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.lit("*"), F.col("p_size") % 5).alias("stars"),
        F.contains("p_type", F.lit("ECONOMY")).alias("is_economy"),
        F.startswith("p_name", F.lit("small")).alias("is_small"),
        F.endswith("p_name", F.lit("widget")).alias("is_widget"),
    )


@query(
    "fn_array2",
    oracle="""
    WITH t AS (
      SELECT vec_id,
             list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE vec_id % 25 = 0
    )
    SELECT vec_id,
           array_to_string(list_transform(list_sort(v), x -> CAST(CAST(ROUND(x * 10000, 0) AS BIGINT) AS VARCHAR)), ',') AS sorted_head,
           array_to_string(list_transform(list_reverse_sort(v)[1:3], x -> CAST(CAST(ROUND(x * 10000, 0) AS BIGINT) AS VARCHAR)), ',') AS top3,
           ROUND(v[1] + v[8], 6) AS ends_sum,
           len(list_concat(v, v)) AS doubled_len,
           CAST(list_position(list_sort(v), list_min(v)) AS BIGINT) AS min_pos
    FROM t
    """,
    tags=("functions", "array"),
)
def fn_array2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array manipulation: slice/sort/reverse-sort/concat/position —
    serialized to strings where the layout is the payload (hash-safe
    across engines)."""
    em = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 25 == 0)
    v = F.transform(F.slice("embedding", 1, 8), lambda x: x.cast("double"))
    t = em.select("vec_id", v.alias("v"))
    # integer-scaled serialization: double→VARCHAR formatting differs
    # between engines ("-5.0E-4" vs "-0.0005"); scaled int64 strings
    # are identical everywhere
    fmt = lambda arr: F.concat_ws(
        ",", F.transform(arr, lambda x: F.round(x * 10000, 0).cast("long").cast("string"))
    )
    return t.select(
        "vec_id",
        fmt(F.array_sort("v")).alias("sorted_head"),
        fmt(F.slice(F.sort_array("v", asc=False), 1, 3)).alias("top3"),
        F.round(F.element_at("v", 1) + F.element_at("v", 8), 6).alias("ends_sum"),
        F.size(F.concat("v", "v")).cast("long").alias("doubled_len"),
        F.array_position(F.array_sort("v"), F.array_min("v")).alias("min_pos"),
    )


@query(
    "fn_try_cast",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           TRY_CAST(event_type AS BIGINT) AS type_as_num,
           TRY_CAST(CAST(value AS VARCHAR) AS DOUBLE) AS value_roundtrip
    FROM events
    WHERE event_id % 40 = 0
    """,
    tags=("functions", "trycast"),
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safe casts: malformed input → NULL, never a job failure — the
    ANSI-mode-compatible ingestion idiom."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") % 40 == 0)
    return e.select(
        "event_id",
        F.try_to_number(
            F.get_json_object("props", "$.k"), F.lit("999999999")
        ).cast("long").alias("k_num"),
        F.col("event_type").try_cast("bigint").alias("type_as_num"),
        F.col("value").cast("string").try_cast("double").alias("value_roundtrip"),
    )


@query(
    "fn_interval_struct",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
           CAST(o_orderdate - INTERVAL 45 DAY AS DATE) AS minus_45d,
           ROUND(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2025-06-15') / 30.436875, 1) AS approx_months_to,
           struct_extract({'k': o_orderkey, 'p': o_totalprice}, 'p') AS struct_price
    FROM orders
    WHERE o_orderkey % 33 = 0
    """,
    tags=("functions", "interval", "struct"),
)
def fn_interval_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic + struct build/extract."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 33 == 0)
    return o.select(
        "o_orderkey",
        F.add_months(F.to_date("o_orderdate"), 3).alias("plus_3m"),
        F.date_sub(F.to_date("o_orderdate"), 45).alias("minus_45d"),
        F.round(
            F.datediff(F.lit("2025-06-15").cast("date"), F.to_date("o_orderdate"))
            / 30.436875,
            1,
        ).alias("approx_months_to"),
        F.struct(
            F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")
        )["p"].alias("struct_price"),
    )


@query(
    "fn_edit_distance",
    oracle="""
    SELECT p_partkey,
           CAST(levenshtein(p_name, p_brand) AS INTEGER) AS dist_brand,
           CAST(levenshtein(p_name, reverse(p_name)) AS INTEGER) AS dist_rev
    FROM part
    WHERE p_partkey <= 50
    """,
    tags=("function", "string", "fuzzy"),
)
def fn_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance scalar (fuzzy matching building block for
    record-linkage pipelines). JVM built-in — no UDF."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") <= 50)
    return p.select(
        "p_partkey",
        F.levenshtein("p_name", "p_brand").alias("dist_brand"),
        F.levenshtein("p_name", F.reverse("p_name")).alias("dist_rev"),
    )


@query(
    "fn_datetime2",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(quarter(l_shipdate) AS INTEGER) AS ship_quarter,
           CAST(weekofyear(l_shipdate) AS INTEGER) AS ship_isoweek,
           CAST(dayofyear(l_shipdate) AS INTEGER) AS ship_doy,
           last_day(l_shipdate) AS month_end,
           CAST(l_shipdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
           strftime(l_shipdate, '%Y-%m') AS ship_ym
    FROM lineitem
    WHERE l_orderkey % 31 = 0
    """,
    tags=("functions", "datetime"),
)
def fn_datetime2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time batch 2: calendar navigation — quarter, ISO week,
    day-of-year, month end, month arithmetic (with end-of-month
    clamping, identical in both engines), year-month bucketing. All
    integer/date-exact under the pinned UTC session."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 31 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.quarter("l_shipdate").alias("ship_quarter"),
        F.weekofyear("l_shipdate").alias("ship_isoweek"),
        F.dayofyear("l_shipdate").alias("ship_doy"),
        F.last_day("l_shipdate").alias("month_end"),
        F.add_months("l_shipdate", 3).alias("plus_3m"),
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_ym"),
    )


@query(
    "fn_string3",
    # DuckDB has no overlay(); left||repl||substr is the exact
    # equivalent for the default replace-length form.
    oracle="""
    SELECT p_partkey,
           split_part(p_brand, '#', 2) AS brand_num,
           translate(p_name, 'aeiou', '12345') AS name_translated,
           repeat(left(p_name, 2), 2) AS name_stutter,
           reverse(p_name) AS name_reversed,
           contains(p_name, 'red') AS has_red,
           starts_with(p_name, 'small') AS is_small,
           ends_with(p_type, 'ECONOMY') AS is_economy,
           left(p_name, 1) || '__' || substr(p_name, 4) AS name_overlay
    FROM part
    WHERE p_partkey % 3 = 0
    """,
    tags=("functions", "string"),
)
def fn_string3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String batch 3: split_part, translate, repeat, reverse,
    contains/starts_with/ends_with predicates, overlay — rounding out
    the scalar string surface; all pure codegen expressions."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") % 3 == 0)
    return p.select(
        "p_partkey",
        F.split_part("p_brand", F.lit("#"), F.lit(2)).alias("brand_num"),
        F.translate("p_name", "aeiou", "12345").alias("name_translated"),
        F.repeat(F.left("p_name", F.lit(2)), 2).alias("name_stutter"),
        F.reverse("p_name").alias("name_reversed"),
        F.contains("p_name", F.lit("red")).alias("has_red"),
        F.startswith("p_name", F.lit("small")).alias("is_small"),
        F.endswith("p_type", F.lit("ECONOMY")).alias("is_economy"),
        F.overlay("p_name", F.lit("__"), F.lit(2)).alias("name_overlay"),
    )


@query(
    "fn_variant_json",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 50
    GROUP BY event_type
    """,
    tags=("fn", "variant", "json"),
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion of semi-structured payloads:
    parse_json turns the props JSON string into the binary VARIANT
    encoding once at scan time, try_variant_get extracts typed paths
    without a declared schema — the open-schema half of the lake
    (R6/R7's JSON payloads queried without a schema migration).

    Scale note: VARIANT's binary encoding makes repeated path
    extraction O(field) instead of re-parsing the JSON text per
    expression — the reason it replaces get_json_object for wide
    semi-structured scans; the filter+aggregate after extraction is
    the ordinary partial-agg shape."""
    e = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "long")
    return (
        e.select("event_type", k.alias("k"))
        .where(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


@query(
    "fn_collation_join",
    oracle="""
    WITH dim(name, category) AS (
      VALUES ('CLICK', 'engagement'), ('Purchase', 'revenue'),
             ('SignUp', 'growth'), ('VIEW', 'engagement')
    )
    SELECT lower(e.event_type) AS event_type_ci, d.category,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(e.value), 2) AS sum_value
    FROM events e JOIN dim d ON lower(e.event_type) = lower(d.name)
    GROUP BY 1, 2
    """,
    tags=("fn", "collation"),
)
def fn_collation_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: a case-insensitive (UTF8_LCASE) equi-join
    between the lake's lowercase event types and a mixed-case business
    dimension — the collation is declared ON THE COMPARISON, not
    baked into the data. Output keys are canonicalized to lowercase so
    the result is engine-deterministic (collated GROUP BY keeps an
    arbitrary-case representative — unsafe cross-engine).

    Scale note, measured here: Spark 4.1 refuses hash joins on
    non-binary collations ("keys that don't support binary equality")
    and falls back to BroadcastNestedLoopJoin — acceptable against
    this broadcast 4-row dim, WRONG for large-large joins. Until
    collation-aware hashing lands, canonicalize (lower()) the join
    keys of large-large case-insensitive joins and keep collations
    for comparisons/filters/ORDER BY semantics."""
    e = load_table(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [("CLICK", "engagement"), ("Purchase", "revenue"),
         ("SignUp", "growth"), ("VIEW", "engagement")],
        "name string, category string",
    )
    j = e.join(
        F.broadcast(dim),
        F.collate(e["event_type"], "UTF8_LCASE")
        == F.collate(dim["name"], "UTF8_LCASE"),
    )
    return j.groupBy(
        F.lower("event_type").alias("event_type_ci"), "category"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "fn_try_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE ROUND(l_extendedprice / l_discount, 2) END AS price_per_disc,
           CASE WHEN l_quantity = 0 THEN NULL
                ELSE CAST(CAST(FLOOR(l_extendedprice) AS BIGINT) % CAST(FLOOR(l_quantity) AS BIGINT) AS BIGINT) END AS price_mod_qty,
           ROUND(l_extendedprice + l_tax * 100000.0, 2) AS safe_sum
    FROM lineitem
    WHERE l_linenumber = 1 AND l_orderkey % 7 = 0
    """,
    tags=("fn", "ansi", "try"),
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic (try_divide / try_mod / try_add): under
    ANSI mode a divide-by-zero or overflow KILLS the job; the try_*
    family returns NULL instead — the right contract for curation
    pipelines where one malformed row must not fail a 100 TB pass.
    The oracle spells the same NULL-on-error semantics with guards
    (DuckDB has no try_* family), proving the functions equal their
    guarded expansions."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 7 == 0)
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.try_divide("l_extendedprice", "l_discount"), 2).alias(
            "price_per_disc"
        ),
        F.try_mod(
            F.col("l_extendedprice").cast("long"), F.col("l_quantity").cast("long")
        ).alias("price_mod_qty"),
        F.round(
            F.try_add(F.col("l_extendedprice"), F.col("l_tax") * 100000.0), 2
        ).alias("safe_sum"),
    )


@query(
    "fn_inline_struct_array",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             [struct_pack(kind := 'base', amt := ROUND(o_totalprice, 2)),
              struct_pack(kind := 'tax',  amt := ROUND(o_totalprice * 0.07, 2)),
              struct_pack(kind := 'tip',  amt := ROUND(o_totalprice * 0.02, 2))] AS parts
      FROM orders WHERE o_orderkey % 13 = 0
    )
    SELECT o_orderkey,
           struct_extract(u.p, 'kind') AS kind,
           struct_extract(u.p, 'amt') AS amt
    FROM t, UNNEST(parts) AS u(p)
    """,
    tags=("fn", "struct", "explode"),
)
def fn_inline_struct_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inline() — explode an array of structs directly into columns
    (the one-step form of explode + star-expansion): the ledger-line
    normalization shape that turns a wide computed record into
    typed rows without a UDTF. Charges built inline per order, then
    inlined back out — each row becomes three typed ledger lines."""
    o = load_table(spark, sf_dir, "orders")
    parts = F.array(
        F.struct(
            F.lit("base").alias("kind"),
            F.round(F.col("o_totalprice"), 2).alias("amt"),
        ),
        F.struct(
            F.lit("tax").alias("kind"),
            F.round(F.col("o_totalprice") * 0.07, 2).alias("amt"),
        ),
        F.struct(
            F.lit("tip").alias("kind"),
            F.round(F.col("o_totalprice") * 0.02, 2).alias("amt"),
        ),
    )
    return (
        o.where(F.col("o_orderkey") % 13 == 0)
        .select("o_orderkey", F.inline(parts))
    )


@query(
    "fn_binary_codecs",
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_hex,
           base64(from_hex(md5(text))) AS b64,
           hex(from_base64(base64(from_hex(md5(text))))) = upper(md5(text)) AS roundtrip_ok,
           ascii(substr(text, 1, 1)) AS first_cp,
           chr(CAST(doc_id % 26 + 65 AS INTEGER)) AS bucket_letter
    FROM documents
    """,
    tags=("functions", "binary", "codecs"),
)
def fn_binary_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary codec surface: md5 → hex → bytes (unhex) → base64 →
    bytes (unbase64) → hex round trip, plus ascii/chr codepoint
    helpers — the encode/decode plumbing the reference's firehose
    path exercises (records are base64-wrapped on the wire;
    reference: src/event_recorder/lambda_function.py base64Encode
    semantics re-expressed engine-side).

    All JVM builtins, scan-shaped, zero shuffle."""
    d = load_table(spark, sf_dir, "documents")
    md5h = F.md5(F.col("text"))
    b64 = F.base64(F.unhex(md5h))
    return d.select(
        "doc_id",
        md5h.alias("md5_hex"),
        b64.alias("b64"),
        (F.hex(F.unbase64(b64)) == F.upper(md5h)).alias("roundtrip_ok"),
        F.ascii(F.substring(F.col("text"), 1, 1)).alias("first_cp"),
        F.expr("chr(CAST(doc_id % 26 + 65 AS INT))").alias("bucket_letter"),
    )


@query(
    "fn_url_parse",
    oracle="""
    SELECT doc_id,
           source || '.example.com' AS host,
           '/docs/' || CAST(doc_id AS VARCHAR) AS path,
           'lang=' || lang || '&sz=' || CAST(n_chars AS VARCHAR) AS query,
           lang AS lang_param
    FROM documents WHERE doc_id % 7 = 0
    """,
    tags=("fn", "url"),
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url — Spark's structured URL accessor (HOST / PATH /
    QUERY / single query-parameter extraction), run against URLs
    constructed from fixture columns. The oracle assembles each
    expected component directly from the same columns, so equality
    proves parse_url's decomposition on well-formed URLs without
    DuckDB needing a URL parser.

    Scale: map-only projection; at 100 TB this is the canonical
    crawl-log normalization step (dedup_url_canonical is the
    regexp-based sibling for MALFORMED urls — parse_url returns NULL
    there, which is why both exist)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 7 == 0)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&sz="),
        F.col("n_chars").cast("string"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@query(
    "fn_aes_roundtrip",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_roundtrip_ok,
           CAST(SUM(length(text)) AS BIGINT) AS plain_chars,
           CAST(SUM(16 * (FLOOR(length(text) / 16) + 1)) AS BIGINT) AS cipher_bytes
    FROM documents
    """,
    tags=("fn", "crypto"),
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aes_encrypt / aes_decrypt round-trip (AES-128-ECB — the
    deterministic mode; GCM salts a random IV per call and can never
    be oracle-checked) over the document corpus: every plaintext must
    survive the round-trip byte-identically, and every ciphertext must
    have the PKCS#7 length 16·(⌊len/16⌋+1), which the oracle computes
    arithmetically — DuckDB needs no AES at all.

    The column-level crypto pair is the engine surface for
    application-managed field encryption (the PII family's
    complement: pii_redact destroys, this protects reversibly with a
    key). ECB determinism is also what makes encrypted columns
    JOINABLE — the reason production systems accept its weaker
    secrecy for join keys.

    Scale: map-only projection; JVM-side Cipher, no Python."""
    d = load_table(spark, sf_dir, "documents")
    key = F.lit("0123456789abcdef")
    enc = F.aes_encrypt(F.col("text"), key, F.lit("ECB"))
    dec = F.aes_decrypt(enc, key, F.lit("ECB")).cast("string")
    return d.select(
        F.length("text").alias("plen"),
        F.length(enc.cast("binary")).alias("clen"),
        (dec == F.col("text")).cast("long").alias("ok"),
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ok").cast("long").alias("n_roundtrip_ok"),
        F.sum("plen").cast("long").alias("plain_chars"),
        F.sum("clen").cast("long").alias("cipher_bytes"),
    )


@query(
    "fn_xml_parse",
    oracle="""
    SELECT doc_id,
           lang AS x_lang,
           source AS x_source,
           CAST(n_chars AS BIGINT) AS x_chars
    FROM documents WHERE doc_id % 9 = 0
    """,
    tags=("fn", "xml"),
)
def fn_xml_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_xml (Spark 4's native XML support) against documents
    re-serialized as XML records: the oracle reads the expected field
    values straight from the source columns, so equality proves the
    schema-driven XML parse (attributes + nested elements) is
    lossless — the fn_url_parse construction pattern applied to the
    XML codec.

    Scale: map-only; XML is the config/feed format of enterprise
    integrations — at 100 TB you'd parse it once at ingest into
    parquet (sources/lake.py's JSON path sibling), which is exactly
    the expression exercised here."""
    from pyspark.sql import types as T

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 9 == 0)
    xml = F.concat(
        F.lit('<doc lang="'),
        F.col("lang"),
        F.lit('"><src>'),
        F.col("source"),
        F.lit("</src><chars>"),
        F.col("n_chars").cast("string"),
        F.lit("</chars></doc>"),
    )
    schema = T.StructType(
        [
            T.StructField("_lang", T.StringType()),
            T.StructField("src", T.StringType()),
            T.StructField("chars", T.LongType()),
        ]
    )
    parsed = d.select("doc_id", F.from_xml(xml, schema).alias("x"))
    return parsed.select(
        "doc_id",
        F.col("x._lang").alias("x_lang"),
        F.col("x.src").alias("x_source"),
        F.col("x.chars").alias("x_chars"),
    )


@query(
    "fn_array3",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '')[1:6] AS toks
      FROM documents WHERE doc_id % 13 = 0
    )
    SELECT doc_id,
           array_to_string(list_append(toks, '<eos>'), ' ') AS appended,
           array_to_string(list_prepend('<bos>', toks), ' ') AS prepended,
           array_to_string(toks[1:2] || ['<mask>'] || toks[3:], ' ') AS inserted,
           array_to_string(list_filter(toks, x -> x IS NOT NULL), ' ') AS compacted,
           array_to_string(list_reverse(toks), ' ') AS reversed,
           CAST(len(toks) AS INTEGER) AS n
    FROM t
    """,
    tags=("fn", "array"),
)
def fn_array3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-mutation batch 3 (Spark 3.4/3.5 additions): append /
    prepend / insert-at / compact / reverse over a bounded token
    slice — the sequence-editing surface a tokenization pipeline uses
    for special-token framing (BOS/EOS/mask insertion). The oracle
    spells each as DuckDB list algebra (insert-at = slice ‖ element ‖
    slice, the definition).

    Scale: map-only HOFs, zero shuffle."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 13 == 0)
    toks = F.slice(F.filter(F.split(F.col("text"), " "), lambda t: t != ""), 1, 6)
    t = d.select("doc_id", toks.alias("toks"))
    # the driver compare has no array-column type mapping — registry
    # convention is to serialize array outputs (array_join)
    return t.select(
        "doc_id",
        F.array_join(F.array_append(F.col("toks"), F.lit("<eos>")), " ").alias("appended"),
        F.array_join(F.array_prepend(F.col("toks"), F.lit("<bos>")), " ").alias("prepended"),
        F.array_join(F.array_insert(F.col("toks"), 3, F.lit("<mask>")), " ").alias("inserted"),
        F.array_join(F.array_compact(F.col("toks")), " ").alias("compacted"),
        F.array_join(F.reverse(F.col("toks")), " ").alias("reversed"),
        F.size(F.col("toks")).alias("n"),
    )


@query(
    "fn_datetime3",
    oracle="""
    SELECT o_orderkey,
           CAST(QUARTER(o_orderdate) AS INTEGER) AS q,
           CAST(DAYOFYEAR(o_orderdate) AS INTEGER) AS doy,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           -- Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dayofweek:
           -- 0=Sunday..6=Saturday
           CAST(DAYOFWEEK(o_orderdate) + 1 AS INTEGER) AS dow_sun1,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS plus_month,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start
    FROM orders WHERE o_orderkey % 40 = 0
    """,
    tags=("fn", "datetime"),
)
def fn_datetime3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime batch 3 — the calendar-edge semantics that differ
    between engines unless pinned: quarter/day-of-year extraction,
    LAST_DAY (month-end), day-of-week under the Sunday=1 convention
    (Spark's native numbering; DuckDB's 0-based dow is shifted in the
    oracle), end-of-month-clamping month addition (Jan 31 + 1 month =
    Feb 28/29 in BOTH add_months and DuckDB's +INTERVAL), and
    quarter truncation.

    Scale: map-only projections; these are the grain derivations the
    time-hierarchy rollups build on."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 40 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.quarter(d).alias("q"),
        F.dayofyear(d).alias("doy"),
        F.last_day(d).alias("month_end"),
        F.dayofweek(d).alias("dow_sun1"),
        F.add_months(d.cast("date"), 1).alias("plus_month"),
        F.date_trunc("quarter", d).cast("date").alias("quarter_start"),
    )


@query(
    "fn_map_hof",
    oracle="""
    WITH counts AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
        FROM documents WHERE doc_id % 21 = 0
      ) GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_keys,
           CAST(SUM(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS INTEGER)
             AS n_keys_repeated,
           string_agg(token || ':' || CAST(cnt * 10 AS VARCHAR), ' ' ORDER BY token)
             AS scaled_entries
    FROM counts GROUP BY doc_id
    """,
    tags=("fn", "map", "hof"),
)
def fn_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions — map_from_entries, transform_values,
    map_filter, map_entries — over per-document token-count maps: the
    feature-dictionary shape (sparse categorical features keyed by
    string). The oracle computes the expected CONTENT from the
    underlying pair relation (DuckDB's map type never materializes),
    so equality proves Spark's map algebra end-to-end; output maps
    serialize as key-sorted entry strings (the registry's
    no-complex-output convention).

    Scale shape: counts are (doc, token)-grain; map construction and
    the HOFs are per-row; serialization sorts only each row's own
    entries."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 21 == 0)
    counts = (
        d.select(
            "doc_id",
            F.explode(
                F.filter(F.split(F.col("text"), " "), lambda t: t != "")
            ).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    m = F.map_from_entries(
        F.array_sort(F.collect_list(F.struct("token", "cnt")))
    )
    mapped = counts.groupBy("doc_id").agg(m.alias("m"))
    scaled = F.transform_values(F.col("m"), lambda k, v: v * 10)
    repeated = F.map_filter(F.col("m"), lambda k, v: v >= 2)
    serial = F.array_join(
        F.transform(
            F.array_sort(F.map_entries(scaled)),
            lambda e: F.concat(e["key"], F.lit(":"), e["value"].cast("string")),
        ),
        " ",
    )
    return mapped.select(
        "doc_id",
        F.size(F.col("m")).alias("n_keys"),
        F.size(repeated).alias("n_keys_repeated"),
        serial.alias("scaled_entries"),
    )


@query(
    "fn_surrogate_key_uuid",
    oracle="""
    WITH h AS (
      SELECT o_orderkey,
             md5('order:' || CAST(o_orderkey AS VARCHAR) || ':'
                 || CAST(o_custkey AS VARCHAR)) AS hx
      FROM orders WHERE o_orderkey % 60 = 0
    )
    SELECT o_orderkey,
           substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-'
           || substr(hx, 13, 4) || '-' || substr(hx, 17, 4) || '-'
           || substr(hx, 21, 12) AS surrogate_uuid
    FROM h
    """,
    tags=("fn", "surrogate-key"),
)
def fn_surrogate_key_uuid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate-key minting (UUIDv5-style namespaced
    hashing, md5 core): the same (namespace, business key) always
    yields the same UUID-format id — the property that makes surrogate
    keys RE-RUNNABLE (a re-ingest mints identical ids; random uuid()
    would break every downstream join and is banned in idempotent
    pipelines, exactly the reference's replay requirement R13 applied
    to key minting).

    Scale: map-only; the hash domain-separates via the explicit
    namespace prefix so order keys can never collide with, e.g.,
    customer-derived surrogates."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 60 == 0)
    hx = F.md5(
        F.concat(
            F.lit("order:"),
            F.col("o_orderkey").cast("string"),
            F.lit(":"),
            F.col("o_custkey").cast("string"),
        )
    )
    u = F.concat_ws(
        "-",
        F.substring(hx, 1, 8),
        F.substring(hx, 9, 4),
        F.substring(hx, 13, 4),
        F.substring(hx, 17, 4),
        F.substring(hx, 21, 12),
    )
    return o.select("o_orderkey", u.alias("surrogate_uuid"))


@query(
    "fn_json_struct_roundtrip",
    oracle="""
    SELECT event_id,
           '{"et":"' || event_type || '","uid":' || CAST(user_id AS VARCHAR)
             || ',"k":' || CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS VARCHAR)
             || '}' AS packed,
           event_type AS et_back,
           CAST(user_id AS BIGINT) AS uid_back,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_back
    FROM events WHERE event_id % 120 = 0
    """,
    tags=("fn", "json", "struct"),
)
def fn_json_struct_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct ⇄ JSON round-trip: pack typed columns into a struct,
    serialize with to_json, parse back with a schema'd from_json, and
    return BOTH the wire string and the recovered fields — the
    DataFrame-expression twin of the lake's JSON codec (sources/lake
    handles files; this is the per-cell path used for message payloads
    and props columns). The oracle constructs the expected wire string
    and fields directly from source columns, so equality proves
    serialize∘parse = id and pins the exact field order/format of
    the wire string.

    Scale: map-only; nested k comes from the props JSON (one
    json_extract on both sides), exercising nested-then-repacked
    data."""
    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") % 120 == 0)
    packed = F.to_json(
        F.struct(
            F.col("event_type").alias("et"),
            F.col("user_id").alias("uid"),
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
    )
    schema = T.StructType(
        [
            T.StructField("et", T.StringType()),
            T.StructField("uid", T.LongType()),
            T.StructField("k", T.LongType()),
        ]
    )
    parsed = F.from_json(packed, schema)
    return ev.select(
        "event_id",
        packed.alias("packed"),
        parsed["et"].alias("et_back"),
        parsed["uid"].alias("uid_back"),
        parsed["k"].alias("k_back"),
    )


@query(
    "fn_hof_exists_forall_indexed",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents WHERE doc_id % 17 = 0
    )
    SELECT doc_id,
           len(list_filter(toks, t -> len(t) > 8)) > 0 AS has_long_token,
           len(list_filter(toks, t -> len(t) >= 2)) = len(toks)
             AS all_ge2,
           CAST(len(list_filter(
                  list_transform(toks, (t, i) -> CASE WHEN (i - 1) % 2 = 0
                                                      THEN t ELSE '' END),
                  t -> t <> '')) AS BIGINT) AS n_even_positions
    FROM base
    """,
    tags=("fn", "hof", "exists-forall"),
)
def fn_hof_exists_forall_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The predicate HOFs fn_array_hof leaves out — exists (any
    element matches), forall (every element matches), and the
    POSITIONAL transform lambda (element, index) that underlies
    stride/window tricks (here: count of even-position tokens).
    DuckDB has no exists/forall, so the oracle states them as
    filter-length identities, which also documents the semantics:
    exists ≡ |filter| > 0, forall ≡ |filter| = |input|. The Spark
    side uses the native short-circuiting forms. DuckDB's lambda
    index is 1-based where Spark's is 0-based — normalized in the
    oracle ((i−1) % 2), the same shift rule as DAYOFWEEK."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 17 == 0)
    from serverless_datalake_spark.operators import textops

    base = d.select("doc_id", textops.tokens(F.col("text")).alias("toks"))
    return base.select(
        "doc_id",
        F.exists("toks", lambda t: F.length(t) > 8).alias("has_long_token"),
        F.forall("toks", lambda t: F.length(t) >= 2).alias("all_ge2"),
        F.size(
            F.filter(
                F.transform(
                    "toks",
                    lambda t, i: F.when(i % 2 == 0, t).otherwise(F.lit("")),
                ),
                lambda t: t != "",
            )
        )
        .cast("long")
        .alias("n_even_positions"),
    )
