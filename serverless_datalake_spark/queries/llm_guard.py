"""Data-guard operators for a training-data pipeline over `documents`
and `embeddings`: PII detection/redaction, text normalization, URL
canonicalization dedup, semantic train-vs-eval decontamination, and
per-source heavy hitters.

These are the compliance/safety/cleanliness passes every large-scale
corpus build runs between raw ingest and tokenization. All of them are
scan-shaped (regexp/HOF per row, tiny aggregates) or broadcast-shaped
(the eval set in decontamination is small by construction), so every
operator here scales linearly with corpus bytes and shuffles at most
one small aggregate — the right posture for 100 TB.

The fixture corpus is synthetic word-salad with no real PII/URLs, so
these queries first derive a `raw` column that deterministically
injects email/phone/URL patterns from doc_id (plain integer arithmetic
+ concat, identical SQL text in both engines). The operators
themselves are generic regexp passes — the injection is test harness,
not operator logic.

Engine-portability notes (same discipline as queries/datapipe.py):
* regex patterns avoid backslash escapes entirely (Spark SQL string
  literals interpret `\\`, DuckDB standard strings do not): literal
  dot/question-mark via character classes `[.]` `[?]`, whitespace via
  chr(9)/chr(10)/chr(13) concatenation;
* Spark's regexp_replace is global; DuckDB needs the 'g' flag — the
  oracle SQL carries it;
* counts cast to BIGINT on both sides (DuckDB len() is BIGINT,
  Spark size() is INT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from serverless_datalake_spark.operators.similarity import cosine
from serverless_datalake_spark.queries import query
from serverless_datalake_spark.queries.datapipe import (
    _BUCKET_SQL,
    _TOKS_SQL,
    _bucket_col,
    _toks_col,
)
from serverless_datalake_spark.tables import load_table

# Deterministic PII/URL injection — identical SQL text in both engines.
_RAW_SQL = (
    "text || ' contact user' || CAST(doc_id AS STRING) || '@mail' || "
    "CAST(doc_id % 5 AS STRING) || '.com call 555-' || "
    "CAST(1000 + doc_id % 9000 AS STRING) || ' visit ' || ("
    "'http://' || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END) || "
    "'site' || CAST(doc_id % 7 AS STRING) || '.com/p/' || "
    "CAST(doc_id % 13 AS STRING) || "
    "(CASE WHEN doc_id % 2 = 0 THEN '?utm=x' ELSE '' END))"
)

# The injected URL alone (for canonicalization dedup).
_URL_SQL = (
    "'http://' || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END) || "
    "'site' || CAST(doc_id % 7 AS STRING) || '.com/p/' || "
    "CAST(doc_id % 13 AS STRING) || "
    "(CASE WHEN doc_id % 2 = 0 THEN '?utm=x' ELSE '' END)"
)

_EMAIL_RE = "[a-z0-9]+@[a-z0-9]+[.]com"
_PHONE_RE = "555-[0-9][0-9][0-9][0-9]"
_URL_RE = "http://[a-z0-9./?=]+"


@query(
    "pii_detect",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(raw, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(raw, '{_URL_RE}')) AS BIGINT) AS n_urls
    FROM (SELECT doc_id, {_RAW_SQL} AS raw FROM documents) t
    """,
    tags=("llm", "guard", "pii"),
)
def pii_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII surface counts (emails, phone numbers, URLs)
    via JVM-side regexp_extract_all — the triage pass that decides
    which documents need redaction. One scan, zero shuffles; the
    regexes stay inside whole-stage codegen (no UDF)."""
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.withColumn("raw", F.expr(_RAW_SQL))
    return raw.select(
        "doc_id",
        F.expr(f"CAST(size(regexp_extract_all(raw, '{_EMAIL_RE}', 0)) AS BIGINT)").alias("n_emails"),
        F.expr(f"CAST(size(regexp_extract_all(raw, '{_PHONE_RE}', 0)) AS BIGINT)").alias("n_phones"),
        F.expr(f"CAST(size(regexp_extract_all(raw, '{_URL_RE}', 0)) AS BIGINT)").alias("n_urls"),
    )


@query(
    "pii_redact",
    oracle=f"""
    SELECT doc_id, redacted,
           CAST(length(raw) - length(redacted) AS BIGINT) AS n_chars_removed
    FROM (
      SELECT doc_id, raw,
             regexp_replace(regexp_replace(regexp_replace(raw,
               '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g'),
               '{_URL_RE}', '<URL>', 'g') AS redacted
      FROM (SELECT doc_id, {_RAW_SQL} AS raw FROM documents) t
    ) r
    """,
    tags=("llm", "guard", "pii"),
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: replace every email/phone/URL with a typed
    placeholder token, reporting bytes removed. The write-side twin of
    pii_detect — same single-scan shape; placeholders keep token
    positions roughly stable for downstream tokenization."""
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.withColumn("raw", F.expr(_RAW_SQL))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("raw"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
        _URL_RE,
        "<URL>",
    )
    return raw.select(
        "doc_id",
        redacted.alias("redacted"),
        (F.length("raw") - F.length(redacted)).cast("long").alias("n_chars_removed"),
    )


@query(
    "text_clean_normalize",
    oracle=f"""
    SELECT doc_id,
           trim(regexp_replace(noisy,
                '[' || chr(9) || chr(10) || chr(13) || ' ]+', ' ', 'g')) AS clean_text,
           CAST(length(noisy) AS BIGINT) AS n_raw_chars
    FROM (
      SELECT doc_id,
             chr(9) || text ||
             (CASE WHEN doc_id % 3 = 0 THEN chr(13) || chr(10) ELSE ' ' END) || '  ' AS noisy
      FROM documents
    ) t
    """,
    tags=("llm", "guard", "clean"),
)
def text_clean_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace/control-character normalization: collapse runs of
    tab/CR/LF/space to single spaces and trim — the first cleaning
    pass of every corpus build (tokenizers see one canonical spacing).
    Deterministic noise is injected first since the fixture text is
    already clean. Scan-bound, codegen-only."""
    docs = load_table(spark, sf_dir, "documents")
    noisy = docs.withColumn(
        "noisy",
        F.expr(
            "chr(9) || text || "
            "(CASE WHEN doc_id % 3 = 0 THEN chr(13) || chr(10) ELSE ' ' END) || '  '"
        ),
    )
    clean = F.trim(
        F.expr("regexp_replace(noisy, '[' || chr(9) || chr(10) || chr(13) || ' ]+', ' ')")
    )
    return noisy.select(
        "doc_id",
        clean.alias("clean_text"),
        F.length("noisy").cast("long").alias("n_raw_chars"),
    )


@query(
    "dedup_url_canonical",
    oracle=f"""
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT url) AS BIGINT) AS n_variants,
           MIN(doc_id) AS rep_doc_id
    FROM (
      SELECT doc_id, url,
             regexp_replace(regexp_replace(regexp_replace(url,
               '[?].*$', ''),
               '^http://(www[.])?', ''),
               '/$', '') AS canonical_url
      FROM (SELECT doc_id, {_URL_SQL} AS url FROM documents) t
    ) c
    GROUP BY canonical_url
    """,
    tags=("llm", "guard", "dedup", "url"),
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup: strip scheme, `www.`, query string
    and trailing slash, then group — the standard first-line web-crawl
    dedup (CommonCrawl-style pipelines drop ~40% of fetches on
    canonical-URL identity before any content hashing). One hash
    aggregate on the canonical key; min-id representative."""
    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select("doc_id", F.expr(_URL_SQL).alias("url"))
    canon = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("url"), "[?].*$", ""),
            "^http://(www[.])?",
            "",
        ),
        "/$",
        "",
    )
    return (
        urls.withColumn("canonical_url", canon)
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("url").alias("n_variants"),
            F.min("doc_id").alias("rep_doc_id"),
        )
    )


@query(
    "decontaminate_semantic",
    oracle="""
    WITH ev AS (
      SELECT vec_id AS eval_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id < 10
    ), tr AS (
      SELECT vec_id AS train_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id >= 10
    ), scored AS (
      SELECT tr.train_id, ev.eval_id,
             list_aggregate(list_transform(list_zip(tr.emb, ev.emb),
                            p -> p[1] * p[2]), 'sum')
             / (SQRT(list_aggregate(list_transform(tr.emb, x -> x * x), 'sum'))
                * SQRT(list_aggregate(list_transform(ev.emb, x -> x * x), 'sum'))) AS score
      FROM tr CROSS JOIN ev
    ), best AS (
      SELECT train_id, eval_id, score,
             ROW_NUMBER() OVER (PARTITION BY train_id
                                ORDER BY score DESC, eval_id) AS rn
      FROM scored
    )
    SELECT train_id, eval_id AS closest_eval_id, ROUND(score, 6) AS score
    FROM best WHERE rn = 1 AND score >= 0.30
    """,
    tags=("llm", "guard", "decontamination", "similarity"),
)
def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic train/eval decontamination: flag training vectors whose
    embedding is too close (cosine ≥ 0.30) to any held-out eval vector
    — the embedding-space complement of n-gram contamination checks
    (split_contamination_ngram), catching paraphrased leakage n-grams
    miss. The eval set is small by construction → broadcast; one corpus
    scan, per-row top-1 window. At larger eval sets, pre-bucket both
    sides with lsh_bucket and check only same-bucket pairs (the
    dedup_embedding_lsh layout)."""
    em = load_table(spark, sf_dir, "embeddings")
    ev = em.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("eval_id"), F.col("embedding").alias("__ev")
    )
    tr = em.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("train_id"), F.col("embedding").alias("__tv")
    )
    scored = tr.crossJoin(F.broadcast(ev)).select(
        "train_id", "eval_id", cosine(F.col("__tv"), F.col("__ev")).alias("score")
    )
    w = Window.partitionBy("train_id").orderBy(F.col("score").desc(), F.col("eval_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("score") >= 0.30))
        .select(
            "train_id",
            F.col("eval_id").alias("closest_eval_id"),
            F.round("score", 6).alias("score"),
        )
    )


def _segment_lines(df: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """10-token line segmentation shared by dedup_intra_lines and
    pipeline_guarded_curation → (doc_id, *carry, line_no, line).
    Empty/whitespace-only docs produce zero lines (matching the
    oracles' range(0, 0)); Spark's sequence(0, -1) would instead
    DESCEND and emit two phantom lines, hence the guard."""
    toks = F.col("__toks")
    return (
        df.select("doc_id", *carry, _toks_col().alias("__toks"))
        .where(F.size(toks) > 0)
        .select(
            "doc_id",
            *carry,
            F.posexplode(
                F.transform(
                    F.sequence(
                        F.lit(0), F.ceil(F.size(toks) / F.lit(10.0)).cast("int") - 1
                    ),
                    lambda i: F.array_join(F.slice(toks, i * 10 + 1, 10), " "),
                )
            ).alias("line_no", "line"),
        )
    )


# the matching oracle CTE body (FROM <src>; emits doc_id, line_no, line)
def _lines_sql(src: str, extra_cols: str = "") -> str:
    return f"""
      SELECT doc_id,{extra_cols}
             unnest(list_transform(range(0, CAST(ceil(len({_TOKS_SQL}) / 10.0) AS BIGINT)), i ->
               struct_pack(line_no := i,
                 line := array_to_string(list_slice({_TOKS_SQL}, i * 10 + 1, i * 10 + 10), ' ')))) AS s
      FROM {src}"""


@query(
    "dedup_intra_lines",
    oracle=f"""
    WITH l AS ({_lines_sql("documents")}
    ), lines AS (
      SELECT doc_id, s.line_no AS line_no, s.line AS line FROM l
    ), flagged AS (
      SELECT doc_id, line_no, line,
             ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
      FROM lines
    )
    SELECT doc_id,
           COALESCE(array_to_string(list(line ORDER BY line_no) FILTER (WHERE rn = 1), ' '), '') AS kept_text,
           CAST(COUNT(CASE WHEN rn = 1 THEN 1 END) AS BIGINT) AS n_lines_kept,
           CAST(COUNT(*) AS BIGINT) AS n_lines_total
    FROM flagged
    GROUP BY doc_id
    """,
    tags=("llm", "guard", "dedup", "lines"),
)
def dedup_intra_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level dedup across the corpus: segment each
    document into lines (10-token windows here — the fixture text has
    no newlines), keep only the globally-first occurrence of each
    distinct line (ordered by doc_id, line_no), and rebuild documents
    from their surviving lines in order. This is the pass that strips
    boilerplate (headers, cookie banners, licence blocks) repeated
    across a web corpus.

    Shape at scale: explode → ONE shuffle keyed by line (at 100 TB
    key by md5(line) so the shuffle carries 16-byte keys, not text) →
    window first-occurrence → regroup per doc. Both shuffles are
    linear in corpus lines; no cross-document comparison ever
    materializes."""
    docs = load_table(spark, sf_dir, "documents")
    lines = _segment_lines(docs)
    w = Window.partitionBy("line").orderBy("doc_id", "line_no")
    flagged = lines.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(
        F.col("rn") == 1, F.struct(F.col("line_no").alias("line_no"), F.col("line").alias("line"))
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(kept_struct)), lambda x: x["line"]),
                " ",
            ).alias("kept_text"),
            F.count(F.when(F.col("rn") == 1, 1)).alias("n_lines_kept"),
            F.count("*").alias("n_lines_total"),
        )
    )


@query(
    "pipeline_guarded_curation",
    oracle=f"""
    WITH cleaned AS (
      SELECT doc_id, lang,
             trim(regexp_replace(text, ' +', ' ', 'g')) AS text,
             length({_RAW_SQL}) - length(
               regexp_replace(regexp_replace(regexp_replace({_RAW_SQL},
                 '{_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{_PHONE_RE}', '<PHONE>', 'g'),
                 '{_URL_RE}', '<URL>', 'g')) AS pii_chars_removed
      FROM documents
    ), gated AS (
      SELECT * FROM cleaned
      WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) >= 25
    ), l AS ({_lines_sql("gated", " lang, pii_chars_removed,")}
    ), lines AS (
      SELECT doc_id, lang, pii_chars_removed,
             s.line_no AS line_no, s.line AS line FROM l
    ), flagged AS (
      SELECT doc_id, lang, pii_chars_removed, line,
             ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
      FROM lines
    ), per_doc AS (
      SELECT doc_id, MIN(lang) AS lang, MIN(pii_chars_removed) AS pii_chars_removed,
             CASE WHEN {_BUCKET_SQL} < 90 THEN 'train' ELSE 'test' END AS split,
             CAST(COALESCE(SUM(CASE WHEN rn = 1
               THEN len(list_filter(string_split(line, ' '), x -> x <> '')) END), 0) AS BIGINT)
               AS kept_tokens
      FROM flagged GROUP BY doc_id
    )
    SELECT split, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(kept_tokens) AS BIGINT) AS total_kept_tokens,
           CAST(SUM(pii_chars_removed) AS BIGINT) AS total_pii_chars_removed
    FROM per_doc
    GROUP BY split, lang
    """,
    tags=("llm", "guard", "pipeline", "composed"),
)
def pipeline_guarded_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The guard family composed end-to-end, the shape of a real corpus
    build: normalize whitespace → measure PII redaction (on the
    injected raw form) → token-count quality gate (≥ 25) → global
    line-level dedup → deterministic train/test split → per-(split,
    lang) rollup of documents, surviving tokens, and redacted bytes.

    Every stage keeps its standalone operator's scale shape; composed,
    the job is two line-keyed shuffles (dedup + regroup) plus one tiny
    rollup — Catalyst pipelines the scan-shaped stages into the first
    exchange's map side."""
    docs = load_table(spark, sf_dir, "documents")
    raw = F.expr(_RAW_SQL)
    redacted = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(raw, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"),
        _URL_RE,
        "<URL>",
    )
    cleaned = docs.select(
        "doc_id",
        "lang",
        F.trim(F.regexp_replace(F.col("text"), " +", " ")).alias("text"),
        (F.length(raw) - F.length(redacted)).alias("pii_chars_removed"),
    )
    gated = cleaned.where(F.size(_toks_col()) >= 25)
    # doc metadata rides THROUGH the line explode (first/min per doc on
    # the regroup) — a gated ⨝ kept self-join would rescan the corpus
    # and re-run every regexp, and its build side is corpus-sized (not
    # broadcastable at scale)
    lines = _segment_lines(gated, carry=("lang", "pii_chars_removed"))
    w = Window.partitionBy("line").orderBy("doc_id", "line_no")
    per_doc = (
        lines.withColumn("rn", F.row_number().over(w))
        .groupBy("doc_id")
        .agg(
            F.min("lang").alias("lang"),
            F.min("pii_chars_removed").alias("pii_chars_removed"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("rn") == 1,
                        F.size(F.filter(F.split("line", " "), lambda x: x != "")),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("kept_tokens"),
        )
        .select(
            "lang",
            "pii_chars_removed",
            F.when(_bucket_col() < 90, F.lit("train")).otherwise(F.lit("test")).alias("split"),
            "kept_tokens",
        )
    )
    return per_doc.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("kept_tokens").cast("long").alias("total_kept_tokens"),
        F.sum("pii_chars_removed").cast("long").alias("total_pii_chars_removed"),
    )


@query(
    "text_heavy_hitters",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
      FROM documents
    ), counts AS (
      SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM toks GROUP BY source, token
    ), ranked AS (
      SELECT source, token, cnt,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY cnt DESC, token) AS rank
      FROM counts
    )
    SELECT source, token, cnt, rank FROM ranked WHERE rank <= 5
    """,
    tags=("llm", "guard", "text", "topk"),
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source frequent-token heavy hitters (top-5, deterministic
    tie-break): the vocabulary-skew probe run before tokenizer
    training/mixture weighting. Shape at scale: explode → partial
    count map-side → ONE shuffle on (source, token) → per-source
    window top-k with WindowGroupLimit pushdown; no collect."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(_toks_col()).alias("token"))
    counts = toks.groupBy("source", "token").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("source").orderBy(F.col("cnt").desc(), F.col("token"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("source", "token", "cnt", F.col("rank").cast("long").alias("rank"))
    )


@query(
    "validate_expectations",
    oracle="""
    WITH a AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(o_custkey) AS BIGINT) AS nc,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS nd,
             CAST(COUNT(CASE WHEN o_totalprice >= 0 AND o_totalprice <= 300000 THEN 1 END) AS BIGINT) AS nr,
             CAST(COUNT(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 END) AS BIGINT) AS ns,
             CAST(COUNT(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 END) AS BIGINT) AS np
      FROM orders
    )
    SELECT 'row_count_nonzero' AS check_name, CAST(n AS DOUBLE) AS metric, n > 0 AS passed FROM a
    UNION ALL SELECT 'completeness_o_custkey', ROUND(CAST(nc AS DOUBLE)/CAST(n AS DOUBLE), 6), nc = n FROM a
    UNION ALL SELECT 'uniqueness_o_orderkey', ROUND(CAST(nd AS DOUBLE)/CAST(n AS DOUBLE), 6), nd = n FROM a
    UNION ALL SELECT 'range_o_totalprice_0_300k', ROUND(CAST(nr AS DOUBLE)/CAST(n AS DOUBLE), 6), nr = n FROM a
    UNION ALL SELECT 'domain_o_orderstatus', ROUND(CAST(ns AS DOUBLE)/CAST(n AS DOUBLE), 6), ns = n FROM a
    UNION ALL SELECT 'pattern_o_orderpriority', ROUND(CAST(np AS DOUBLE)/CAST(n AS DOUBLE), 6), np = n FROM a
    """,
    tags=("guard", "quality", "validation"),
)
def validate_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality verification (the Deequ/Great-
    Expectations shape): a suite of expectations — completeness,
    key uniqueness, numeric range, value domain, string pattern —
    evaluated in ONE aggregation pass over the table, emitted as a
    long-format report (check_name, metric, passed). The range check
    is deliberately tight so fixtures exercise the FAILING branch —
    a validation report that can only say "pass" is untested.

    Scale shape: every expectation folds into the same partial
    aggregate, so the whole suite costs one scan + one 1-row shuffle
    regardless of how many checks are registered (the Deequ insight:
    checks are algebraic states, so they share the pass). The
    COUNT(DISTINCT) rides the same aggregate via expand; the stack()
    that reshapes 1 wide row into N report rows is free."""
    o = load_table(spark, sf_dir, "orders")
    a = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_custkey").alias("nc"),
        F.countDistinct("o_orderkey").alias("nd"),
        F.count(
            F.when((F.col("o_totalprice") >= 0) & (F.col("o_totalprice") <= 300000), 1)
        ).alias("nr"),
        F.count(F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1)).alias("ns"),
        F.count(F.when(F.col("o_orderpriority").rlike("^[1-5]-"), 1)).alias("np"),
    )
    return a.selectExpr(
        """stack(6,
          'row_count_nonzero', CAST(n AS DOUBLE), n > 0,
          'completeness_o_custkey', ROUND(CAST(nc AS DOUBLE)/CAST(n AS DOUBLE), 6), nc = n,
          'uniqueness_o_orderkey', ROUND(CAST(nd AS DOUBLE)/CAST(n AS DOUBLE), 6), nd = n,
          'range_o_totalprice_0_300k', ROUND(CAST(nr AS DOUBLE)/CAST(n AS DOUBLE), 6), nr = n,
          'domain_o_orderstatus', ROUND(CAST(ns AS DOUBLE)/CAST(n AS DOUBLE), 6), ns = n,
          'pattern_o_orderpriority', ROUND(CAST(np AS DOUBLE)/CAST(n AS DOUBLE), 6), np = n
        ) AS (check_name, metric, passed)"""
    )


@query(
    "pipeline_dq_quarantine",
    oracle="""
    WITH flagged AS (
      SELECT o_orderkey,
             CASE
               WHEN o_custkey IS NULL THEN 'null_custkey'
               WHEN o_totalprice < 0 OR o_totalprice > 300000 THEN 'price_out_of_range'
               WHEN o_orderstatus NOT IN ('O','F','P') THEN 'bad_status'
               WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 'bad_priority'
             END AS quarantine_reason
      FROM orders
    )
    SELECT COALESCE(quarantine_reason, 'clean') AS disposition,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM flagged GROUP BY 1
    """,
    tags=("guard", "quality", "quarantine"),
)
def pipeline_dq_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantine routing — the per-ROW companion to the table-level
    gates (validate_expectations reports, sources/constraints.py
    blocks): each record gets its FIRST failing rule as a disposition,
    clean rows pass through — the split a production writer uses to
    land good rows and shunt bad ones to a quarantine table for
    repair, instead of failing the batch (constraints.write_checked)
    or silently dropping.

    First-match-wins makes the disposition deterministic when a row
    violates several rules (rule order IS the policy). Scale shape:
    the rule cascade is one CASE projection — map-only; the summary
    here is one tiny aggregate; the row-level split is the same
    projection feeding two filtered writers."""
    o = load_table(spark, sf_dir, "orders")
    reason = (
        F.when(F.col("o_custkey").isNull(), "null_custkey")
        .when(
            (F.col("o_totalprice") < 0) | (F.col("o_totalprice") > 300000),
            "price_out_of_range",
        )
        .when(~F.col("o_orderstatus").isin("O", "F", "P"), "bad_status")
        .when(~F.col("o_orderpriority").rlike("^[1-5]-"), "bad_priority")
    )
    return (
        o.select(F.coalesce(reason, F.lit("clean")).alias("disposition"))
        .groupBy("disposition")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "eval_ngram_novelty",
    oracle="""
    WITH ref_tris AS (
      SELECT DISTINCT t1 || ' ' || t2 || ' ' || t3 AS tri FROM (
        SELECT toks[i] AS t1, toks[i + 1] AS t2, toks[i + 2] AS t3
        FROM (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
              FROM documents WHERE doc_id % 3 <> 0),
             UNNEST(range(1, len(toks) - 1)) AS u(i)
        WHERE len(toks) >= 3
      )
    ), eval_tris AS (
      SELECT doc_id, toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS tri
      FROM (SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents WHERE doc_id % 3 = 0),
           UNNEST(range(1, len(toks) - 1)) AS u(i)
      WHERE len(toks) >= 3
    ), scored AS (
      SELECT e.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tris,
             CAST(SUM(CASE WHEN r.tri IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel
      FROM eval_tris e LEFT JOIN ref_tris r ON r.tri = e.tri
      GROUP BY 1
    )
    SELECT doc_id, n_tris, n_novel,
           ROUND(CAST(n_novel AS DOUBLE) / CAST(n_tris AS DOUBLE), 4) AS novelty
    FROM scored
    """,
    tags=("llm", "evaluation", "novelty", "memorization"),
)
def eval_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram NOVELTY against a reference corpus: the fraction of each
    evaluation document's trigrams never seen in the reference — the
    memorization/copy audit for generated text (novelty ≈ 0 means the
    "generation" is verbatim reference; RETRO/memorization papers
    report exactly this). The complement of the contamination checks:
    decontamination asks "is eval text in train?"; novelty asks "is
    generated text merely retrieved?".

    Exactness: trigram sets are exact string relations; novelty is
    one division of integer counts per doc.

    Scale shape: the reference trigram relation is
    DISTINCT-aggregated once (vocabulary-ish grain) and hash-joined
    against eval trigrams — at 100 TB the reference side becomes the
    dedup family's materialized band/bloom index (probe, not rescan);
    dedup_bloom_incremental is the screening twin."""
    from serverless_datalake_spark.operators import textops

    d = load_table(spark, sf_dir, "documents")

    def tris(df):
        # materialize the token array below the shingle lambda
        # (SCALE.md aliased-fold rule)
        return (
            df.select("doc_id", textops.tokens(F.col("text")).alias("__toks"))
            .where(F.size("__toks") >= 3)
            .select(
                "doc_id",
                F.explode(
                    textops.shingles_of_tokens(F.col("__toks"), k=3)
                ).alias("tri"),
            )
        )

    ref = tris(d.where(F.col("doc_id") % 3 != 0)).select("tri").distinct()
    ev = tris(d.where(F.col("doc_id") % 3 == 0))
    scored = (
        ev.join(ref.withColumnRenamed("tri", "rtri"), ev["tri"] == F.col("rtri"), "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tris"),
            F.sum(F.col("rtri").isNull().cast("long")).cast("long").alias("n_novel"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tris",
        "n_novel",
        F.round(F.col("n_novel").cast("double") / F.col("n_tris").cast("double"), 4).alias(
            "novelty"
        ),
    )


_GAZETTEER = ("join", "filter", "window", "merge", "scan")


@query(
    "text_gazetteer_tag",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      FROM documents
    ), hits AS (
      SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS n_mentions
      FROM toks
      WHERE t IN {str(_GAZETTEER)}
      GROUP BY 1, 2
    )
    SELECT doc_id, term, n_mentions FROM hits
    """,
    tags=("llm", "text", "gazetteer", "ner"),
)
def text_gazetteer_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary (gazetteer) entity tagging: match document tokens
    against a controlled term list and emit per-document mention
    counts — NER-lite, and the exact shape of production term-list
    scans (product catalogs, blocked-word lists, PII keyword
    screens). The gazetteer here is a literal; at fleet size it is a
    BROADCAST relation (or an Aho-Corasick pandas UDF when it
    outgrows IN-list codegen — the documented escape hatch).

    Scale: map-side IN-list filter over the token explode, then a
    (doc, term)-grain aggregate — scan-bound; no shuffle touches
    non-matching tokens."""
    from serverless_datalake_spark.operators import textops

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(textops.tokens(F.col("text"))).alias("t")
    )
    return (
        toks.where(F.col("t").isin(*_GAZETTEER))
        .groupBy("doc_id", F.col("t").alias("term"))
        .agg(F.count(F.lit(1)).alias("n_mentions"))
    )


# ---------------------------------------------------------------------------
# Differentially-private release plumbing (deterministic noise for
# testability — swap the hash-uniform for a real RNG in production)

def _dp_hex8(expr: str) -> str:
    terms = [
        f"(strpos('0123456789abcdef', substr({expr}, {i + 1}, 1)) - 1)"
        f" * CAST({16 ** (7 - i)} AS BIGINT)"
        for i in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


@query(
    "privacy_dp_noisy_counts",
    oracle=f"""
    WITH cells AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_true
      FROM documents GROUP BY 1, 2
    ), seeded AS (
      SELECT source, lang, n_true,
             (CAST({_dp_hex8("substr(md5(source || '|' || lang), 1, 8)")} % 999999
               AS DOUBLE) + 0.5) / 999999.0 AS u
      FROM cells
    )
    SELECT source, lang, n_true,
           ROUND(CAST(n_true AS DOUBLE)
                 + (CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END)
                   * LN(CASE WHEN u < 0.5 THEN 2.0 * u ELSE 2.0 * (1.0 - u) END),
                 3) AS n_noisy,
           CAST(1.0 AS DOUBLE) AS epsilon
    FROM seeded
    """,
    tags=("privacy", "differential-privacy", "aggregate"),
)
def privacy_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private count release: per-(source, lang)
    document counts + Laplace(1/ε) noise via inverse-CDF transform —
    the mechanism a data platform puts in front of small-cell
    statistics before publishing them. Noise here is DETERMINISTIC
    (md5-seeded uniform) so the oracle can replay it and tests stay
    reproducible; production swaps the seed for a secure RNG and
    DROPS the n_true column (kept here as the audit view that
    calibrates expected error against true counts).

    Exactness: the uniform draw is integer-derived (md5 → BIGINT →
    one division); sign/branch and 2u are exact; LN is the one
    transcendental — both engines evaluate it on the identical
    double, and the 1e-3 output rounding absorbs any last-ulp libm
    difference (the sample_temperature_mixture precedent).

    Scale shape: one hash-agg scan to cell grain, then a per-cell
    projection — zero extra shuffle; at 100 TB the release table is
    cells, not rows."""
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy("source", "lang").agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    u = (
        (
            F.conv(
                F.substring(F.md5(F.concat_ws("|", "source", "lang")), 1, 8), 16, 10
            ).cast("long")
            % 999999
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(999999.0)
    seeded = cells.withColumn("u", u)
    noise = F.when(F.col("u") < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0)) * F.log(
        F.when(F.col("u") < 0.5, F.lit(2.0) * F.col("u")).otherwise(
            F.lit(2.0) * (F.lit(1.0) - F.col("u"))
        )
    )
    return seeded.select(
        "source",
        "lang",
        "n_true",
        F.round(F.col("n_true").cast("double") + noise, 3).alias("n_noisy"),
        F.lit(1.0).alias("epsilon"),
    )
