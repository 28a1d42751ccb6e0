"""Text-analysis queries over `documents` (north-star operators:
token counting, quality scoring, language-ID, fingerprinting, tf-idf).
Implementations in operators/textops.py; each has a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from serverless_datalake_spark.operators import textops
from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_table

# Derived from operators/textops.py STOPWORDS so the oracle can never
# drift from the Spark-side list.
_STOP_SQL = "(" + ", ".join(f"'{w}'" for w in sorted(textops.STOPWORDS)) + ")"


@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens,
           len(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS n_distinct,
           length(text) AS n_chars_measured,
           n_chars
    FROM documents
    """,
    tags=("llm", "text"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting — the per-document cost estimator every
    training-data pipeline runs first. Pure HOFs, scan-bound."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        textops.token_count(F.col("text")).cast("long").alias("n_tokens"),
        textops.distinct_token_count(F.col("text")).cast("long").alias("n_distinct"),
        F.length("text").cast("long").alias("n_chars_measured"),
        "n_chars",
    )


@query(
    "text_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           ROUND(CAST(len(list_filter(toks, x -> x IN {_STOP_SQL})) AS DOUBLE)
                 / GREATEST(len(toks), 1), 4) AS stop_ratio,
           ROUND(COALESCE(list_aggregate(list_transform(toks, x -> CAST(length(x) AS DOUBLE)), 'sum'), 0.0)
                 / GREATEST(len(toks), 1), 4) AS avg_tok_len,
           ROUND(0.5 * (CAST(len(list_distinct(toks)) AS DOUBLE) / GREATEST(len(toks), 1))
                 + 0.5 * (1.0 - ABS(CAST(len(list_filter(toks, x -> x IN {_STOP_SQL})) AS DOUBLE)
                                    / GREATEST(len(toks), 1) - 0.1)), 4) AS quality
    FROM t
    """,
    tags=("llm", "text", "quality"),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio, avg token length, composite
    diversity score — the heuristics used to filter pre-training data."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(textops.stopword_ratio(F.col("text")), 4).alias("stop_ratio"),
        F.round(textops.avg_token_len(F.col("text")), 4).alias("avg_tok_len"),
        textops.quality_score(F.col("text")).alias("quality"),
    )


@query(
    "text_langid",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), scored AS (
      SELECT doc_id, lang,
             len(list_filter(toks, x -> x IN ('the', 'a'))) AS en_score,
             len(list_filter(toks, x -> x IN ('zzz'))) AS xx_score
      FROM t
    )
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN xx_score > en_score AND xx_score > 0 THEN 'xx'
                WHEN en_score > 0 THEN 'en'
                ELSE 'und' END AS guessed_lang
    FROM scored
    """,
    tags=("llm", "text", "langid"),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID (marker-token argmax with deterministic
    tie-break) next to the fixture's labeled lang column."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        textops.lang_guess(F.col("text")).alias("guessed_lang"),
    )


@query(
    "text_fingerprint",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             md5(lower(trim(text))) AS fp,
             CASE WHEN len(list_filter(string_split(text, ' '), t -> t <> '')) < 3
                  THEN md5(array_to_string(list_filter(string_split(text, ' '), t -> t <> ''), ' '))
                  ELSE list_min(list_transform(
                       range(1, len(list_filter(string_split(text, ' '), t -> t <> '')) - 1),
                       i -> md5(array_to_string(
                              list_filter(string_split(text, ' '), t -> t <> '')[i:i+2], ' '))))
             END AS shingle_fp
      FROM documents
    )
    SELECT doc_id, fp, shingle_fp FROM f
    """,
    tags=("llm", "text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whole-text md5 + min-shingle-hash
    (1-permutation MinHash) rolling fingerprint."""
    d = load_table(spark, sf_dir, "documents")
    # tokens materialized a projection below the shingle lambda
    # (SCALE.md aliased-fold rule)
    return d.select(
        "doc_id",
        textops.fingerprint_md5(F.col("text")).alias("fp"),
        textops.tokens(F.col("text")).alias("__toks"),
    ).select(
        "doc_id",
        "fp",
        textops.shingle_fingerprint_of_tokens(F.col("__toks"), k=3).alias("shingle_fp"),
    )


@query(
    "text_tfidf",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, token, 1 AS present
      FROM toks
      WHERE doc_id % 20 = 0
    ), df AS (
      SELECT token, COUNT(*) AS doc_freq FROM toks GROUP BY token
    ), n AS (
      SELECT COUNT(*) AS n_docs FROM documents
    )
    SELECT tf.doc_id, tf.token,
           ROUND(LN(CAST(n.n_docs AS DOUBLE) / df.doc_freq), 6) AS idf
    FROM tf JOIN df USING (token) CROSS JOIN n
    """,
    tags=("llm", "text", "tfidf"),
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDF join: per-token document frequency against the corpus size
    (the tf-idf skeleton; tf=1 on the distinct-token sample). The
    token→doc_freq side is tiny relative to the corpus → broadcast."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(textops.tokens(F.col("text")))).alias("token")
    )
    df_tab = toks.groupBy("token").agg(F.count("*").alias("doc_freq"))
    # corpus size stays IN the plan (1-row broadcast) — an eager
    # d.count() here would run a full scan at DataFrame-construction
    # time for every caller that only wants the plan
    nd = d.groupBy().agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    tf = toks.where(F.col("doc_id") % 20 == 0)
    return (
        tf.join(F.broadcast(df_tab), "token")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "token",
            F.round(F.log(F.col("n_docs") / F.col("doc_freq")), 6).alias("idf"),
        )
    )


@query(
    "text_token_bpe",
    # ceil(len/4) per word ≈ subword-unit count: integer math only, so
    # the proxy is exact on both engines.
    oracle="""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_words,
           CAST(list_aggregate(list_transform(toks, x -> CAST(ceil(length(x) / 4.0) AS BIGINT)), 'sum')
                AS BIGINT) AS n_subwords
    FROM t
    WHERE len(toks) > 0
    """,
    tags=("llm", "text", "tokens"),
)
def text_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token-budget estimator: whitespace words plus a subword
    proxy (≈4 chars per BPE unit, the industry rule of thumb) — the
    number a pre-training pipeline actually budgets by. Pure HOFs,
    scan-bound, integer-exact."""
    d = load_table(spark, sf_dir, "documents")
    toks = textops.tokens(F.col("text"))
    n_sub = F.aggregate(
        F.transform(toks, lambda t: F.ceil(F.length(t) / 4.0).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return (
        d.select(
            "doc_id",
            F.size(toks).cast("long").alias("n_words"),
            n_sub.alias("n_subwords"),
        )
        .where(F.col("n_words") > 0)
    )


@query(
    "text_top_bigrams",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), bg AS (
      SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS bigram
      FROM t WHERE len(toks) >= 2
    )
    SELECT bigram, COUNT(*) AS cnt
    FROM bg GROUP BY bigram
    ORDER BY cnt DESC, bigram
    LIMIT 20
    """,
    tags=("llm", "text", "ngram"),
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram statistics (the n-gram LM building block): top-20
    bigrams by exact integer count, total tie-break on the bigram
    string. One explode + one hash aggregate; the ORDER/LIMIT is
    TakeOrderedAndProject — no global sort materialization."""
    d = load_table(spark, sf_dir, "documents")
    # toks as a materialized COLUMN, not an inlined expression: the
    # per-position lambda would otherwise re-run split+filter per
    # element_at (the SCALE.md aliased-fold rule)
    toks = F.col("toks")
    bigrams = F.when(F.size(toks) >= 2, F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )).otherwise(F.array().cast("array<string>"))
    return (
        d.select(textops.tokens(F.col("text")).alias("toks"))
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "bigram")
        .limit(20)
    )


@query(
    "text_quality_model",
    # Linear model + rational squash x/(1+|x|): every op is exact IEEE
    # (multiply/add/divide on the same values in the same order), so
    # unlike a sigmoid there is no cross-engine libm exp() risk.
    oracle="""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), f AS (
      SELECT doc_id,
             CAST(len(toks) AS DOUBLE) AS f_len,
             CAST(len(list_distinct(toks)) AS DOUBLE) / GREATEST(len(toks), 1) AS f_div,
             CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and'))) AS DOUBLE)
               / GREATEST(len(toks), 1) AS f_stop
      FROM t WHERE len(toks) > 0
    ), s AS (
      SELECT doc_id,
             -1.5 + 0.002 * f_len + 2.0 * f_div + 3.0 * f_stop AS z
      FROM f
    )
    SELECT doc_id, ROUND(z / (1 + ABS(z)), 6) AS quality_score,
           z / (1 + ABS(z)) > 0.2 AS keep
    FROM s
    """,
    tags=("llm", "text", "quality", "model"),
)
def text_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring — the 'run a classifier over every
    document' pipeline shape (fastText-style linear model over cheap
    features), with fixed published weights. Inference is a pure
    projection: zero shuffle, scan-bound, trivially 100 TB-parallel.
    Swap the hand weights for trained ones (or the projection for a
    pandas-UDF ONNX call) without touching the plan."""
    d = load_table(spark, sf_dir, "documents")
    toks = textops.tokens(F.col("text"))
    n = F.size(toks)
    f_len = n.cast("double")
    f_div = F.size(F.array_distinct(toks)).cast("double") / F.greatest(n, F.lit(1))
    f_stop = (
        F.size(F.filter(toks, lambda x: x.isin("the", "a", "of", "and"))).cast("double")
        / F.greatest(n, F.lit(1))
    )
    z = F.lit(-1.5) + 0.002 * f_len + 2.0 * f_div + 3.0 * f_stop
    score = z / (1 + F.abs(z))
    return (
        d.where(F.size(toks) > 0)
        .select(
            "doc_id",
            F.round(score, 6).alias("quality_score"),
            (score > 0.2).alias("keep"),
        )
    )


@query(
    "text_kl_divergence",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      FROM documents
    ), st AS (
      SELECT source, t, COUNT(*) AS c FROM tok GROUP BY 1, 2
    ), s_tot AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS ns FROM st GROUP BY 1
    ), g AS (
      SELECT t, CAST(SUM(c) AS BIGINT) AS cg FROM st GROUP BY 1
    ), g_tot AS (
      SELECT CAST(SUM(cg) AS BIGINT) AS ng FROM g
    ), contrib AS (
      SELECT st.source, st.t, s_tot.ns,
             ROUND((CAST(st.c AS DOUBLE) / CAST(s_tot.ns AS DOUBLE))
                   * ln((CAST(st.c AS DOUBLE) / CAST(s_tot.ns AS DOUBLE))
                        / (CAST(g.cg AS DOUBLE) / CAST(g_tot.ng AS DOUBLE))), 8) AS kc
      FROM st
      JOIN s_tot USING (source)
      JOIN g USING (t)
      CROSS JOIN g_tot
    )
    SELECT source,
           ROUND(list_aggregate(list(kc ORDER BY t), 'sum'), 6) AS kl_divergence,
           MIN(ns) AS n_tokens
    FROM contrib
    GROUP BY source
    """,
    tags=("llm", "text", "drift"),
)
def text_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift per source: KL(source unigram distribution ‖
    corpus unigram distribution) — the mixture-monitoring statistic
    that flags a domain whose token distribution has wandered from the
    corpus (new crawl snapshot, contaminated shard, template spam).

    Cross-engine float discipline: each token's contribution
    p·ln(p/q) is rounded at 8 decimals (ln agrees across engines at
    far finer grain — the tf-idf precedent), then summed as an
    ORDERED fold over the token-sorted list so both engines add
    identical doubles in identical order.

    Scale shape: one (source, token) count shuffle, a token-keyed join
    against the global counts (vocabulary-sized, not corpus-sized),
    and a per-source fold bounded by vocabulary size — no pass over
    the raw text after the first count."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "source",
        F.explode(F.filter(F.split(F.col("text"), " "), lambda x: x != "")).alias("t"),
    )
    # NOT pinned: the windowed contribution relation and the 1-row
    # grand total aggregate both hang off the same groupBy(source, t)
    # exchange, which AQE reuses — a pin measured 0.55 -> 0.71 s at
    # sf0.1 (round-9 optimization A/B)
    st = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    # per-source and per-token totals as windows over the ALREADY
    # vocabulary-sized count relation (no self-joins, no recompute of
    # the corpus scan per branch); only the 1-row grand total rides in
    # via a broadcast cross join.
    ns = F.sum("c").over(Window.partitionBy("source"))
    cg = F.sum("c").over(Window.partitionBy("t"))
    g_tot = st.groupBy().agg(F.sum("c").alias("ng"))
    with_tots = st.select("source", "t", "c", ns.alias("ns"), cg.alias("cg"))
    p = F.col("c").cast("double") / F.col("ns").cast("double")
    q = F.col("cg").cast("double") / F.col("ng").cast("double")
    kc = F.round(p * F.log(p / q), 8)
    contrib = with_tots.crossJoin(F.broadcast(g_tot)).select(
        "source", "t", "ns", kc.alias("kc")
    )
    arr = F.array_sort(F.collect_list(F.struct(F.col("t"), F.col("kc"))))
    folded = F.aggregate(
        F.transform(arr, lambda x: x["kc"]), F.lit(0.0), lambda a, x: a + x
    )
    return contrib.groupBy("source").agg(
        F.round(folded, 6).alias("kl_divergence"),
        F.min("ns").alias("n_tokens"),
    )


# CTE chain: corpus unigram LM (Laplace add-one) -> per-doc
# (doc_id, n_tokens, mean_nll) in a CTE named `unigram_scored`.
# Shared by text_unigram_logprob and text_ppl_buckets so the scorer
# definition cannot drift between the two oracles.
_UNIGRAM_SCORED_SQL = """tok AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      FROM documents
    ), cnt AS (
      SELECT t, COUNT(*) AS c FROM tok GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v FROM cnt
    ), lm AS (
      SELECT t,
             ROUND(ln((CAST(c AS DOUBLE) + 1.0)
                      / (CAST(n AS DOUBLE) + CAST(v AS DOUBLE))), 8) AS lp
      FROM cnt CROSS JOIN tot
    ), dt AS (
      SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS k FROM tok GROUP BY 1, 2
    ), contrib AS (
      SELECT dt.doc_id, dt.t, dt.k, CAST(dt.k AS DOUBLE) * lm.lp AS klp
      FROM dt JOIN lm USING (t)
    ), unigram_scored AS (
      SELECT doc_id,
             CAST(SUM(k) AS BIGINT) AS n_tokens,
             ROUND(-list_aggregate(list(klp ORDER BY t), 'sum')
                   / CAST(SUM(k) AS DOUBLE), 6) AS mean_nll
      FROM contrib GROUP BY doc_id
    )"""


@query(
    "text_unigram_logprob",
    oracle=f"""
    WITH {_UNIGRAM_SCORED_SQL}
    SELECT doc_id, n_tokens, mean_nll, ROUND(exp(mean_nll), 4) AS ppl_proxy
    FROM unigram_scored
    """,
    tags=("llm", "text", "quality"),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring — the CCNet-style perplexity
    proxy: train a unigram LM on the corpus itself (Laplace add-one
    smoothing), score each document by its mean negative log
    probability, and expose exp(mean_nll) as a perplexity-like
    number. Documents whose token distribution is far from the corpus
    (template spam, boilerplate, wrong-language shards) score high and
    get filtered before training.

    Cross-engine float discipline (the text_kl_divergence precedent):
    per-token log-probabilities are rounded at 8 decimals, per-doc
    contributions are summed as an ORDERED fold over the token-sorted
    list, the mean is rounded at 6 before exp, and the perplexity at 4
    after — both engines exp() an identical double.

    Scale shape: one corpus token-count shuffle (vocabulary-sized
    output), one (doc, token) count shuffle, a token-keyed join of the
    per-doc counts against the vocabulary-sized LM (AQE broadcasts the
    LM side in practice), and a per-doc fold bounded by the document's
    distinct-token count. The token subtree feeds two different-keyed
    aggregations, so the raw text is read twice (measured round 9:
    pinning the (doc, token) counts to make it one physical scan was
    0.80 -> 1.27 s at sf0.1 — the materialization costs more than the
    vectorized rescan; AQE exchange reuse already dedups the
    identical-keyed branches); no self-joins; nothing corpus-sized
    crosses the driver."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.filter(F.split(F.col("text"), " "), lambda x: x != "")).alias("t"),
    )
    cnt = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy().agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    )
    lm = cnt.crossJoin(F.broadcast(tot)).select(
        "t",
        F.round(
            F.log(
                (F.col("c").cast("double") + F.lit(1.0))
                / (F.col("n").cast("double") + F.col("v").cast("double"))
            ),
            8,
        ).alias("lp"),
    )
    dt = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("k"))
    contrib = dt.join(lm, "t").select(
        "doc_id",
        "t",
        F.col("k").cast("long").alias("k"),
        (F.col("k").cast("double") * F.col("lp")).alias("klp"),
    )
    arr = F.array_sort(F.collect_list(F.struct(F.col("t"), F.col("klp"))))
    folded = F.aggregate(
        F.transform(arr, lambda x: x["klp"]), F.lit(0.0), lambda a, x: a + x
    )
    agg = contrib.groupBy("doc_id").agg(
        F.sum("k").alias("n_tokens"),
        F.round(-folded / F.sum("k").cast("double"), 6).alias("mean_nll"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "mean_nll",
        F.round(F.exp("mean_nll"), 4).alias("ppl_proxy"),
    )


@query(
    "text_ppl_buckets",
    oracle=f"""
    WITH {_UNIGRAM_SCORED_SQL}, bucketed AS (
      SELECT d.lang, s.n_tokens,
             CAST(ROUND(s.mean_nll * 1000000.0, 0) AS BIGINT) AS nll_e6,
             NTILE(3) OVER (PARTITION BY d.lang ORDER BY s.mean_nll, s.doc_id)
               AS tile
      FROM unigram_scored s JOIN documents d USING (doc_id)
    )
    SELECT lang,
           CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
             AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(nll_e6) AS DOUBLE) / 1000000.0
                 / CAST(COUNT(*) AS DOUBLE), 6) AS mean_nll
    FROM bucketed
    GROUP BY lang, tile
    """,
    tags=("llm", "text", "quality", "curation"),
)
def text_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing — the curation pass that runs
    ON TOP of LM scoring: per language, split documents into
    head/middle/tail thirds by unigram mean-NLL (head = most fluent
    under the corpus LM) and report each bucket's doc and token mass.
    CCNet keeps head+middle for pre-training and routes tail to
    re-inspection; this query is that decision table.

    Exactness: per-doc mean_nll is the text_unigram_logprob value
    (rounded at 6); bucket means sum e6-integer units, so partial
    aggregation is order-independent; NTILE over a TOTAL order
    (mean_nll, doc_id) is deterministic in both engines.

    Scale shape: the scoring subtree is text_unigram_logprob
    (vocabulary-keyed join, per-doc fold); bucketing adds one
    doc-grain NTILE per language — at 100 TB swap NTILE for
    quantile-sketch cutpoints (the sample_curriculum_stages note) so
    no per-language total sort is needed; the final aggregate is
    (lang × 3)-grain."""
    d = load_table(spark, sf_dir, "documents")
    scored = text_unigram_logprob(spark, sf_dir).select("doc_id", "n_tokens", "mean_nll")
    bucketed = scored.join(d.select("doc_id", "lang"), "doc_id").select(
        "lang",
        "n_tokens",
        F.round(F.col("mean_nll") * 1000000.0, 0).cast("long").alias("nll_e6"),
        F.ntile(3)
        .over(Window.partitionBy("lang").orderBy("mean_nll", "doc_id"))
        .alias("tile"),
    )
    return bucketed.groupBy("lang", "tile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.round(
            F.sum("nll_e6").cast("double") / 1000000.0
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_nll"),
    ).select(
        "lang",
        F.when(F.col("tile") == 1, "head")
        .when(F.col("tile") == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
        "n_docs",
        "n_tokens",
        "mean_nll",
    )


@query(
    "text_bigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ts
      FROM documents
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ts)),
               i -> struct_pack(w1 := ts[i], w2 := ts[i + 1]))) AS b
      FROM toks WHERE len(ts) >= 2
    ), pairs AS (
      SELECT doc_id, struct_extract(b, 'w1') AS w1, struct_extract(b, 'w2') AS w2 FROM bg
    ), bc AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb FROM pairs GROUP BY 1, 2
    ), uc AS (
      SELECT w1, CAST(SUM(cb) AS BIGINT) AS cu FROM bc GROUP BY 1
    ), vocab AS (
      SELECT CAST(COUNT(DISTINCT w2) AS BIGINT) AS v FROM bc
    ), lm AS (
      SELECT bc.w1, bc.w2,
             ROUND(ln((CAST(bc.cb AS DOUBLE) + 1.0)
                      / (CAST(uc.cu AS DOUBLE) + CAST(vocab.v AS DOUBLE))), 8) AS lp
      FROM bc JOIN uc USING (w1) CROSS JOIN vocab
    ), dt AS (
      SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS k FROM pairs GROUP BY 1, 2, 3
    ), contrib AS (
      SELECT dt.doc_id, dt.w1, dt.w2, dt.k, CAST(dt.k AS DOUBLE) * lm.lp AS klp
      FROM dt JOIN lm USING (w1, w2)
    ), agg AS (
      SELECT doc_id,
             CAST(SUM(k) AS BIGINT) AS n_bigrams,
             ROUND(-list_aggregate(list(klp ORDER BY w1, w2), 'sum')
                   / CAST(SUM(k) AS DOUBLE), 6) AS mean_nll
      FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams, mean_nll FROM agg
    """,
    tags=("llm", "text", "quality", "lm"),
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring — the sharper sibling of
    text_unigram_logprob: P(w_i | w_{i-1}) with add-one smoothing
    over the corpus's own bigram table. Token-ORDER now matters, so
    shuffled/templated text that fools a unigram filter scores badly
    here (the KenLM-filter idea at its smallest).

    Bigrams are formed in ONE pass with an index-zip over the token
    array (no posexplode self-join); the smoothing denominator is the
    context count + continuation-vocabulary size. Float discipline as
    the unigram twin: 8-decimal per-bigram log-probs, ordered fold
    per doc, 6-decimal mean.

    Scale shape: one (w1,w2) count shuffle (bigram-vocabulary-sized
    output), one context rollup, one (doc,bigram) count shuffle, and
    a bigram-keyed join of per-doc counts against the LM relation —
    the bigram subtree feeds two aggregations (two physical reads;
    materialize it for one scan at 100 TB); everything downstream is
    vocabulary-bounded."""
    d = load_table(spark, sf_dir, "documents")
    ts = F.filter(F.split("text", " "), lambda x: x != "")
    bg = (
        d.select("doc_id", ts.alias("ts"))
        .where(F.size("ts") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - 1),
                    lambda i: F.struct(
                        F.element_at("ts", i).alias("w1"),
                        F.element_at("ts", i + 1).alias("w2"),
                    ),
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    bc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    uc = bc.groupBy("w1").agg(F.sum("cb").alias("cu"))
    vocab = bc.groupBy().agg(F.countDistinct("w2").alias("v"))
    lm = (
        bc.join(uc, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    (F.col("cb").cast("double") + F.lit(1.0))
                    / (F.col("cu").cast("double") + F.col("v").cast("double"))
                ),
                8,
            ).alias("lp"),
        )
    )
    dt = bg.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("k"))
    contrib = dt.join(lm, ["w1", "w2"]).select(
        "doc_id",
        "w1",
        "w2",
        F.col("k").cast("long").alias("k"),
        (F.col("k").cast("double") * F.col("lp")).alias("klp"),
    )
    arr = F.array_sort(F.collect_list(F.struct("w1", "w2", "klp")))
    folded = F.aggregate(
        F.transform(arr, lambda x: x["klp"]), F.lit(0.0), lambda a, x: a + x
    )
    return contrib.groupBy("doc_id").agg(
        F.sum("k").alias("n_bigrams"),
        F.round(-folded / F.sum("k").cast("double"), 6).alias("mean_nll"),
    )


@query(
    "text_vocab_coverage",
    oracle="""
    WITH tok AS (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      FROM documents
    ), cnt AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1
    ), ranked AS (
      SELECT t, c,
             ROW_NUMBER() OVER (ORDER BY c DESC, t) AS rnk,
             CAST(SUM(c) OVER (ORDER BY c DESC, t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
             CAST(SUM(c) OVER () AS BIGINT) AS total
      FROM cnt
    )
    SELECT CAST(rnk AS BIGINT) AS vocab_size, cum AS covered_tokens, total AS total_tokens,
           ROUND(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6) AS coverage
    FROM ranked WHERE rnk IN (8, 16, 24)
    """,
    tags=("llm", "text", "tokenizer"),
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary sizing: what fraction of corpus token
    OCCURRENCES does a top-V frequency vocabulary cover? The
    coverage-vs-V curve (here V ∈ {8,16,24} against the fixture's
    ~31-token vocabulary) is the number that picks a vocab budget —
    everything uncovered becomes OOV/byte-fallback cost at training
    time.

    Scale shape: one token-count shuffle (vocabulary-sized output);
    only the top-24 prefix of the coverage curve is reported, so the
    rank is a `r <= 24` filter Spark rewrites to WindowGroupLimit
    (every partition keeps 24 rows before the merge — vocabulary can
    grow without the window growing), the running sum then operates
    on the CONSTANT 24-row shortlist (a prefix of the global order,
    so the prefix sums are identical), and the corpus total is a
    broadcast 1-row aggregate instead of an unbounded SUM window."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("t")
    )
    cnt = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(F.col("c").desc(), "t")
    top = cnt.withColumn(
        "vocab_size", F.row_number().over(w).cast("long")
    ).where(F.col("vocab_size") <= 24)
    tot = cnt.agg(F.sum("c").alias("total_tokens"))
    ranked = top.select(
        "vocab_size",
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "covered_tokens"
        ),
    ).crossJoin(F.broadcast(tot))
    return ranked.where(F.col("vocab_size").isin(8, 16, 24)).select(
        "vocab_size",
        "covered_tokens",
        "total_tokens",
        F.round(
            F.col("covered_tokens").cast("double")
            / F.col("total_tokens").cast("double"),
            6,
        ).alias("coverage"),
    )


@query(
    "text_zipf_fit",
    oracle="""
    WITH tok AS (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      FROM documents
    ), cnt AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1
    ), ranked AS (
      SELECT t, c, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS rnk FROM cnt
    ), pts AS (
      SELECT ROUND(ln(CAST(rnk AS DOUBLE)), 8) AS x,
             ROUND(ln(CAST(c AS DOUBLE)), 8) AS y,
             rnk
      FROM ranked
    ), ser AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             list(x ORDER BY rnk) AS xs,
             list(y ORDER BY rnk) AS ys
      FROM pts
    ), sums AS (
      SELECT n,
             list_aggregate(xs, 'sum') AS sx,
             list_aggregate(ys, 'sum') AS sy,
             list_aggregate(list_transform(xs, v -> v * v), 'sum') AS sxx,
             list_aggregate(list_transform(list_zip(xs, ys), p -> p[1] * p[2]), 'sum') AS sxy
      FROM ser
    )
    SELECT n AS vocab_size,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS zipf_slope,
           ROUND((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                        / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
                 / CAST(n AS DOUBLE), 6) AS intercept
    FROM sums
    """,
    tags=("llm", "text", "statistics"),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: least-squares slope of ln(frequency) against
    ln(rank) over the corpus frequency table. Natural text sits near
    slope −1; synthetic/template corpora deviate hard — a one-number
    corpus-health check run before committing a crawl to training
    (the fixture's word-soup text is deliberately NOT Zipfian, which
    is exactly what the statistic should reveal).

    The regression's sufficient statistics fold in rank order over
    8-decimal-rounded log points; the slope/intercept expressions are
    spelled identically in both engines.

    Scale shape: everything after the one token-count shuffle is
    vocabulary-sized — but vocabulary GROWS with the corpus, so the
    frequency rank runs through `with_global_rank`
    (operators/ranking.py, range-partitioned two-pass, bit-identical)
    rather than a single-task window; the fit itself is four folds
    and a projection."""
    from serverless_datalake_spark.operators import pin
    from serverless_datalake_spark.operators.ranking import with_global_rank

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("t")
    )
    # pinned: the rank's range sampling would re-run the token-count
    # shuffle over the corpus scan; the pinned relation is vocab-grain
    cnt = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c")).transform(pin)
    pts = with_global_rank(
        cnt, [F.col("c").desc(), F.col("t")], out="rnk"
    ).select(
        F.col("rnk"),
        F.col("c"),
    ).select(
        "rnk",
        F.round(F.log(F.col("rnk").cast("double")), 8).alias("x"),
        F.round(F.log(F.col("c").cast("double")), 8).alias("y"),
    )
    arr = F.array_sort(F.collect_list(F.struct("rnk", "x", "y")))
    ser = pts.groupBy().agg(
        F.count(F.lit(1)).alias("n"), arr.alias("arr")
    )
    xs = F.transform(F.col("arr"), lambda r: r["x"])
    ys = F.transform(F.col("arr"), lambda r: r["y"])

    def fold(expr):
        return F.aggregate(expr, F.lit(0.0), lambda s, v: s + v)

    sx, sy = fold(xs), fold(ys)
    sxx = fold(F.transform(xs, lambda v: v * v))
    sxy = fold(F.zip_with(xs, ys, lambda a, b: a * b))
    nd = F.col("n").cast("double")
    slope = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    intercept = (sy - slope * sx) / nd
    return ser.select(
        F.col("n").cast("long").alias("vocab_size"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("intercept"),
    )


@query(
    "text_burstiness",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      FROM documents
    ), dt AS (
      SELECT t, doc_id, CAST(COUNT(*) AS BIGINT) AS k FROM tok GROUP BY 1, 2
    ), nd AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
    ), stats AS (
      SELECT dt.t,
             CAST(SUM(dt.k) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS df,
             list_aggregate(list(CAST(dt.k AS DOUBLE) * CAST(dt.k AS DOUBLE) ORDER BY dt.doc_id), 'sum') AS sumsq
      FROM dt GROUP BY dt.t
    ), scored AS (
      SELECT s.t AS token, s.total, s.df,
             ROUND((s.sumsq / CAST(nd.n_docs AS DOUBLE)
                    - (CAST(s.total AS DOUBLE) / CAST(nd.n_docs AS DOUBLE))
                      * (CAST(s.total AS DOUBLE) / CAST(nd.n_docs AS DOUBLE)))
                   / (CAST(s.total AS DOUBLE) / CAST(nd.n_docs AS DOUBLE)), 6) AS burstiness
      FROM stats s CROSS JOIN nd
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY total DESC, token) AS rank FROM scored
    )
    SELECT token, total, df, burstiness, rank FROM ranked WHERE rank <= 20
    """,
    tags=("llm", "text", "statistics"),
)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token burstiness (variance-to-mean ratio of per-document
    counts, zeros included): Poisson-dispersed tokens score ≈ its
    mean≈VMR≈occurrence rate; bursty tokens (concentrated in few
    docs — topical words, boilerplate, spam markers) score high. The
    corpus-linguistics dispersion test that separates function words
    from content/template words — useful for stopword induction and
    template detection at curation time.

    VMR = (E[k²] − E[k]²)/E[k] over ALL docs (absent docs contribute
    k = 0 — only the sum-of-squares needs the (token, doc) relation;
    zeros enter through dividing by the total doc count). Per-token
    sums of squares fold in doc order.

    Scale shape: one (token, doc) count shuffle, one token rollup;
    the doc count rides in as a 1-row broadcast. Top-20 by frequency
    keeps the report vocabulary-bounded."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("t"),
    )
    dt = tok.groupBy("t", "doc_id").agg(F.count(F.lit(1)).alias("k"))
    nd = d.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
    arr = F.array_sort(F.collect_list(F.struct("doc_id", "k")))
    stats = dt.groupBy("t").agg(
        F.sum("k").alias("total"),
        F.count(F.lit(1)).alias("df"),
        F.aggregate(
            F.transform(arr, lambda x: x["k"].cast("double") * x["k"].cast("double")),
            F.lit(0.0),
            lambda s, x: s + x,
        ).alias("sumsq"),
    )
    mean = F.col("total").cast("double") / F.col("n_docs").cast("double")
    scored = stats.crossJoin(F.broadcast(nd)).select(
        F.col("t").alias("token"),
        F.col("total").cast("long").alias("total"),
        F.col("df").cast("long").alias("df"),
        F.round(
            (F.col("sumsq") / F.col("n_docs").cast("double") - mean * mean) / mean, 6
        ).alias("burstiness"),
    )
    w = Window.orderBy(F.col("total").desc(), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 20)
        .select("token", "total", "df", "burstiness",
                F.col("rank").cast("long").alias("rank"))
    )


@query(
    "text_js_divergence",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      FROM documents
    ), st AS (
      SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
    ), s_tot AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS ns FROM st GROUP BY 1
    ), pairs AS (
      SELECT a.t, a.source AS sa, b.source AS sb,
             CAST(a.c AS DOUBLE) / CAST(ta.ns AS DOUBLE) AS p,
             CAST(b.c AS DOUBLE) / CAST(tb.ns AS DOUBLE) AS q
      FROM st a
      JOIN st b ON a.t = b.t AND a.source < b.source
      JOIN s_tot ta ON ta.source = a.source
      JOIN s_tot tb ON tb.source = b.source
    ), contrib AS (
      SELECT sa, sb, t,
             ROUND(0.5 * p * ln(p / (0.5 * (p + q)))
                   + 0.5 * q * ln(q / (0.5 * (p + q))), 8) AS jc
      FROM pairs
    )
    SELECT sa AS source_a, sb AS source_b,
           ROUND(list_aggregate(list(jc ORDER BY t), 'sum'), 6) AS js_divergence,
           CAST(COUNT(*) AS BIGINT) AS shared_vocab
    FROM contrib GROUP BY sa, sb
    HAVING sa IN ('src0', 'src1', 'src2') AND sb IN ('src1', 'src2', 'src3')
    """,
    tags=("llm", "text", "drift"),
)
def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between source pairs — the SYMMETRIC,
    bounded [0, ln 2] sibling of text_kl_divergence (KL is directional
    and infinite on disjoint support; JS is the metric-like statistic
    mixture schedulers actually compare). Computed over the SHARED
    vocabulary of each pair (the zero-support terms of full JS need
    only each side's own mass — shared-support JS is the standard
    comparable proxy when vocabularies overlap heavily, as the
    per-pair shared_vocab column lets the reader check). Restricted to
    a fixed 3×3 source block to keep the report pair-bounded.

    Same float discipline as KL: 8-decimal contributions, ordered
    fold, 6-decimal result. Scale shape: the pair join runs on the
    vocabulary-sized (source, token) count relation, never raw text."""

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "source",
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("t"),
    )
    st = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    s_tot = st.groupBy("source").agg(F.sum("c").alias("ns"))
    a = st.alias("a").join(s_tot.alias("ta"), "source").select(
        F.col("t"), F.col("source").alias("sa"),
        (F.col("c").cast("double") / F.col("ns").cast("double")).alias("p"),
    )
    b = st.alias("b").join(s_tot.alias("tb"), "source").select(
        F.col("t").alias("tb_t"), F.col("source").alias("sb"),
        (F.col("c").cast("double") / F.col("ns").cast("double")).alias("q"),
    )
    pairs = a.join(b, (F.col("t") == F.col("tb_t")) & (F.col("sa") < F.col("sb")))
    m = 0.5 * (F.col("p") + F.col("q"))
    jc = F.round(
        0.5 * F.col("p") * F.log(F.col("p") / m)
        + 0.5 * F.col("q") * F.log(F.col("q") / m),
        8,
    )
    contrib = pairs.select("sa", "sb", "t", jc.alias("jc")).where(
        F.col("sa").isin("src0", "src1", "src2")
        & F.col("sb").isin("src1", "src2", "src3")
    )
    arr = F.array_sort(F.collect_list(F.struct("t", "jc")))
    folded = F.aggregate(
        F.transform(arr, lambda x: x["jc"]), F.lit(0.0), lambda s, x: s + x
    )
    return contrib.groupBy(
        F.col("sa").alias("source_a"), F.col("sb").alias("source_b")
    ).agg(
        F.round(folded, 6).alias("js_divergence"),
        F.count(F.lit(1)).alias("shared_vocab"),
    )


@query(
    "text_lang_confusion",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), scored AS (
      SELECT doc_id, lang,
             len(list_filter(toks, x -> x IN ('the', 'a'))) AS en_score,
             len(list_filter(toks, x -> x IN ('zzz'))) AS xx_score
      FROM t
    ), guessed AS (
      SELECT lang AS labeled_lang,
             CASE WHEN xx_score > en_score AND xx_score > 0 THEN 'xx'
                  WHEN en_score > 0 THEN 'en'
                  ELSE 'und' END AS guessed_lang
      FROM scored
    ), cells AS (
      SELECT labeled_lang, guessed_lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM guessed GROUP BY 1, 2
    ), tot AS (
      SELECT labeled_lang, CAST(SUM(n) AS BIGINT) AS n_lang FROM cells GROUP BY 1
    )
    SELECT c.labeled_lang, c.guessed_lang, c.n,
           ROUND(CAST(c.n AS DOUBLE) / CAST(t.n_lang AS BIGINT), 4) AS frac
    FROM cells c JOIN tot t USING (labeled_lang)
    """,
    tags=("llm", "text", "langid", "eval"),
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix — the EVALUATION view over the
    same heuristic detector text_langid exposes per-document: labeled
    language × guessed language with per-label fractions (row-
    normalized). The view a curation team checks before trusting a
    detector's routing decisions; a detector change shifts this
    matrix before it shifts anything downstream.

    Scale shape: detection is the same map-only marker scan; the
    matrix is one (label, guess) aggregate — label-cardinality² at
    most — and a label-keyed broadcast join for row totals."""
    d = load_table(spark, sf_dir, "documents")
    guessed = d.select(
        F.col("lang").alias("labeled_lang"),
        textops.lang_guess(F.col("text")).alias("guessed_lang"),
    )
    cells = guessed.groupBy("labeled_lang", "guessed_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cells.groupBy("labeled_lang").agg(F.sum("n").alias("n_lang"))
    return cells.join(F.broadcast(tot), "labeled_lang").select(
        "labeled_lang",
        "guessed_lang",
        "n",
        F.round(F.col("n").cast("double") / F.col("n_lang"), 4).alias("frac"),
    )


_BPE_MERGES = 5


def _bpe_oracle() -> str:
    """Chained-CTE twin of the unrolled merge loop: vN holds the
    symbolization after N merges, bN the N-th winning pair."""
    parts = [
        """
    WITH words AS (
      SELECT t AS w, CAST(COUNT(*) AS BIGINT) AS f FROM (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
        FROM documents
      ) GROUP BY 1
    ), v0 AS (
      SELECT w, f,
             ' ' || array_to_string(
               list_transform(range(1, length(w) + 1), i -> substr(w, i, 1)), ' ')
             || ' ' AS s
      FROM words
    )"""
    ]
    for i in range(1, _BPE_MERGES + 1):
        prev = i - 1
        parts.append(
            f""", p{i} AS (
      SELECT pair, CAST(SUM(f) AS BIGINT) AS c FROM (
        SELECT f, sym[k + 1] || ' ' || sym[k + 2] AS pair
        FROM (SELECT f, string_split(trim(s), ' ') AS sym FROM v{prev}),
             UNNEST(range(0, len(sym) - 1)) AS u(k)
      ) GROUP BY 1
    ), b{i} AS (
      SELECT pair, replace(pair, ' ', '') AS m, c
      FROM p{i} ORDER BY c DESC, pair LIMIT 1
    ), v{i} AS (
      SELECT w, f, replace(s, ' ' || b{i}.pair || ' ', ' ' || b{i}.m || ' ') AS s
      FROM v{prev} CROSS JOIN b{i}
    )"""
        )
    finals = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS merge_rank, pair, m AS merged, c FROM b{i}"
        for i in range(1, _BPE_MERGES + 1)
    )
    parts.append("\n    " + finals)
    return "".join(parts)


@query("tokenizer_bpe_train", oracle=_bpe_oracle(),
       tags=("llm", "tokenizer", "bpe"))
def tokenizer_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge TRAINING (5 merge rounds over the corpus
    vocabulary) — the actual byte-pair-encoding loop, not the budget
    proxy (text_token_bpe): count adjacent symbol-pair frequencies
    weighted by word frequency, adopt the most frequent pair (count
    DESC, pair ASC tie-break — the deterministic twin of GPT-2's
    first-seen tie-break) as a merge rule, rewrite the symbolization,
    repeat. Returns the learned merge table.

    Merge rewrite rides single-pass non-overlapping `replace` over the
    space-sentinel symbol string — VERIFIED identical semantics in
    both engines (adjacent repeats of the winning pair keep their
    second occurrence unmerged in that round and are picked up by a
    later round; a within-round fixpoint would need an iterate-to-
    stable loop both engines would have to share).

    Scale shape: training runs on the VOCABULARY relation (word,
    freq, symbolization) — corpus-sized text reduces to vocab-sized
    state in the first aggregate, which is why BPE training is
    feasible on 100 TB corpora at all (GPT-2's trainer does exactly
    this). Each round is one pair-explode + hash aggregate over the
    vocab and a 1-row broadcast of the winner; the loop is unrolled
    like pagerank's, keeping the plan static."""
    out_rows, _sym = _bpe_run(spark, sf_dir)
    out = out_rows[0]
    for df in out_rows[1:]:
        out = out.unionAll(df)
    return out


def _bpe_run(spark: SparkSession, sf_dir: str):
    """Shared BPE merge loop: returns (per-round merge DataFrames,
    final symbolization DataFrame after all merges)."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(textops.tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    # substring with a column start needs expr (F.substring takes
    # literal ints); ship the char-split as one parsed expression
    sym0 = F.expr(
        "concat(' ', array_join(transform(sequence(1, length(w)), "
        "i -> substr(w, i, 1)), ' '), ' ')"
    )
    sym = words.select("w", "f", sym0.alias("s"))
    out_rows = []
    for i in range(1, _BPE_MERGES + 1):
        arr = F.split(F.trim(F.col("s")), " ")
        pair_arr = F.when(
            F.size(arr) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(arr) - 2),
                lambda k: F.concat(
                    F.element_at(arr, k.cast("int") + 1),
                    F.lit(" "),
                    F.element_at(arr, k.cast("int") + 2),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        pc = (
            sym.select("f", F.explode(pair_arr).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("f").cast("long").alias("c"))
        )
        win = Window.orderBy(F.col("c").desc(), "pair")
        best = (
            pc.withColumn("rn", F.row_number().over(win))
            .where(F.col("rn") == 1)
            .select(
                "pair", F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias("m"), "c"
            )
        )
        out_rows.append(
            best.select(
                F.lit(i).cast("long").alias("merge_rank"), "pair", F.col("m").alias("merged"), "c"
            )
        )
        sym = sym.crossJoin(F.broadcast(best)).select(
            "w",
            "f",
            F.replace(
                F.col("s"),
                F.concat(F.lit(" "), F.col("pair"), F.lit(" ")),
                F.concat(F.lit(" "), F.col("m"), F.lit(" ")),
            ).alias("s"),
        )
    return out_rows, sym


@query(
    "text_keywords_tfidf",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE doc_id % 15 = 0 GROUP BY 1, 2
    ), df AS (
      SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
      FROM toks GROUP BY 1
    ), n AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.token, tf.tf,
             ROUND(CAST(tf.tf AS DOUBLE)
                   * ROUND(LN(n.n_docs / CAST(df.doc_freq AS DOUBLE)), 6), 6)
               AS score
      FROM tf JOIN df USING (token) CROSS JOIN n
    ), ranked AS (
      SELECT doc_id, token, tf, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, token) AS rank
      FROM scored
    )
    SELECT doc_id, token, tf, score, rank FROM ranked WHERE rank <= 3
    """,
    tags=("llm", "text", "keywords"),
)
def text_keywords_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 tokens by tf·idf — the
    classic unsupervised keyworder (text_tfidf exposes the idf
    skeleton; this completes it with real term frequencies and the
    per-doc ranking an indexer/snippeter consumes).

    Exactness: tf and df are exact integer aggregates; the idf LN is
    rounded at 6 on creation (text_tfidf precedent) before the tf
    multiply, and the product rounds at 6; ranking ties break on the
    token text.

    Scale shape: df is a vocabulary-grain aggregate broadcast into
    the sampled-doc tf relation; per-doc top-3 plans as
    WindowGroupLimit. The corpus scan happens twice (tf sample + df)
    — a production indexer fuses them in one pass and keeps df as a
    maintained relation (the matview pattern)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(textops.tokens(F.col("text"))).alias("token")
    )
    tf = (
        toks.where(F.col("doc_id") % 15 == 0)
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_tab = toks.groupBy("token").agg(
        F.countDistinct("doc_id").cast("long").alias("doc_freq")
    )
    nd = d.groupBy().agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_tab), "token")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(
                F.col("tf").cast("double")
                * F.round(F.log(F.col("n_docs") / F.col("doc_freq").cast("double")), 6),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("doc_id", "token", "tf", "score", F.col("rank").cast("long").alias("rank"))
    )


@query(
    "text_subsampling_word2vec",
    oracle="""
    WITH tok AS (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      FROM documents
    ), cnt AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n FROM cnt
    ), scored AS (
      SELECT cnt.t, cnt.c,
             CAST(cnt.c AS DOUBLE) / CAST(tot.n AS DOUBLE) AS f,
             ROUND(GREATEST(LEAST(1.0 - SQRT(0.001
                     / (CAST(cnt.c AS DOUBLE) / CAST(tot.n AS DOUBLE))), 1.0), 0.0), 6)
               AS p_drop
      FROM cnt CROSS JOIN tot
    )
    SELECT t AS token, c AS freq,
           ROUND(f, 8) AS rel_freq,
           p_drop,
           CAST(ROUND(CAST(c AS DOUBLE) * (1.0 - p_drop), 0) AS BIGINT)
             AS expected_kept
    FROM scored WHERE p_drop > 0
    """,
    tags=("llm", "text", "subsampling"),
)
def text_subsampling_word2vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-word subsampling (word2vec's t=1e-3 rule): tokens with
    relative frequency f above the threshold are dropped with
    probability 1 − √(t/f) — the corpus rebalancing that stops 'the'
    from dominating embedding training. Reports the drop probability
    and the expected kept count per affected token; the actual drop
    pass applies the probability via the house deterministic
    multiplicative hash (sample_stratified's mechanism) so re-runs
    keep identical tokens.

    Exactness: frequencies are exact integer counts over one corpus
    scan; the probability expression (SQRT of an exact ratio, clamped)
    is identical both sides, rounded at 6 before the expected-count
    product.

    Scale shape: vocabulary-grain aggregate + a 1-row total — the
    drop table is tiny and broadcasts into the actual filter pass."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(textops.tokens(F.col("text"))).alias("t"))
    cnt = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").cast("long").alias("n"))
    f = F.col("c").cast("double") / F.col("n").cast("double")
    p_drop = F.round(
        F.greatest(
            F.least(F.lit(1.0) - F.sqrt(F.lit(0.001) / f, ), F.lit(1.0)),
            F.lit(0.0),
        ),
        6,
    )
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            F.col("t").alias("token"),
            F.col("c").alias("freq"),
            F.round(f, 8).alias("rel_freq"),
            p_drop.alias("p_drop"),
            F.round(F.col("c").cast("double") * (F.lit(1.0) - p_drop), 0)
            .cast("long")
            .alias("expected_kept"),
        )
        .where(F.col("p_drop") > 0)
    )


def _bpe_encode_oracle() -> str:
    """The training CTE chain (same merges), finalized by reading the
    post-merge symbolization instead of the merge table."""
    chain = _bpe_oracle()
    # drop the training oracle's final merge-table SELECT (the UNION
    # chain starting at merge_rank 1) and substitute the encode SELECT
    cut = chain.index("SELECT CAST(1 AS BIGINT) AS merge_rank")
    return (
        chain[:cut]
        + f"""
    SELECT w, f, trim(s) AS encoded,
           CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS n_pieces
    FROM v{_BPE_MERGES}
    ORDER BY f DESC, w LIMIT 100
    """
    )


@query("tokenizer_bpe_encode", oracle=_bpe_encode_oracle(),
       tags=("llm", "tokenizer", "bpe", "encode"))
def tokenizer_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING with the learned merges — the inference twin of
    tokenizer_bpe_train: after the 5 training rounds, each vocabulary
    word's symbolization IS its encoding under the learned merge
    table, reported for the 100 most frequent words (count DESC, word
    ASC — deterministic cut). n_pieces is the per-word token cost the
    packing/budget operators consume; Σ f·n_pieces over the vocab is
    the corpus token count under the tokenizer.

    Exactness: strings and counts only — no floats anywhere.

    Scale shape: identical to training (vocab-grain state); encoding a
    CORPUS at 100 TB is a broadcast of the merge table + one map-side
    string pass per document, no shuffle — this query reports the
    vocab-grain view the broadcast would carry."""
    _rows, sym = _bpe_run(spark, sf_dir)
    return (
        sym.select(
            "w",
            F.col("f").cast("long").alias("f"),
            F.trim(F.col("s")).alias("encoded"),
            F.size(F.split(F.trim(F.col("s")), " ")).cast("long").alias("n_pieces"),
        )
        .orderBy(F.col("f").desc(), "w")
        .limit(100)
    )


# GPT-2-style pre-tokenizer (ASCII-safe subset: contraction suffixes,
# letter runs, digit runs, punctuation runs, each optionally
# space-prefixed). Both engines' regex dialects agree on this subset —
# verified token-for-token on mixed text.
_GPT_PAT = "'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"
_GPT_PAT_SQL = _GPT_PAT.replace("'", "''")


@query(
    "text_token_regex_gpt",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_ws,
             len(regexp_extract_all(text, '{_GPT_PAT_SQL}')) AS n_bpe_ish,
             length(text) AS n_chars
      FROM documents
    )
    SELECT doc_id,
           CAST(n_ws AS BIGINT) AS n_ws,
           CAST(n_bpe_ish AS BIGINT) AS n_bpe_ish,
           ROUND(CAST(n_bpe_ish AS DOUBLE) / GREATEST(n_ws, 1), 4) AS fertility,
           ROUND(CAST(n_chars AS DOUBLE) / GREATEST(n_bpe_ish, 1), 4)
             AS chars_per_token
    FROM scored
    """,
    tags=("llm", "text", "tokenizer", "regex"),
)
def text_token_regex_gpt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-tokenizer token counting with the GPT-2-style regex
    (contraction suffixes / letter runs / digit runs / punctuation
    runs, optionally space-prefixed) next to the whitespace count —
    the budget estimate every context-window packer and cost model
    needs BEFORE running a real BPE (fertility = regex tokens per
    whitespace word; chars_per_token = the ~4-chars/token rule of
    thumb, measured instead of assumed). The regex subset is pinned
    to constructs whose semantics RE2 (DuckDB) and java.util.regex
    (Spark) share — verified token-identical.

    Exactness: token counts are integers; the two ratios are guarded
    single divisions.

    Scale shape: pure per-row projection — zero shuffle, whole-stage
    codegen; the regex engine cost is the scan cost."""
    d = load_table(spark, sf_dir, "documents")
    n_ws = F.size(textops.tokens(F.col("text")))
    n_bpe = F.size(F.expr(f'regexp_extract_all(text, "{_GPT_PAT}", 0)'))
    scored = d.select(
        "doc_id",
        n_ws.cast("long").alias("n_ws"),
        n_bpe.cast("long").alias("n_bpe_ish"),
        F.length("text").alias("n_chars"),
    )
    return scored.select(
        "doc_id",
        "n_ws",
        "n_bpe_ish",
        F.round(
            F.col("n_bpe_ish").cast("double") / F.greatest(F.col("n_ws"), F.lit(1)), 4
        ).alias("fertility"),
        F.round(
            F.col("n_chars").cast("double") / F.greatest(F.col("n_bpe_ish"), F.lit(1)), 4
        ).alias("chars_per_token"),
    )


@query(
    "text_readability_forcast",
    oracle="""
    WITH t AS (
      SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), per_doc AS (
      SELECT lang,
             len(toks) AS words,
             len(list_filter(toks,
                 w -> len(regexp_extract_all(w, '[aeiouy]+')) = 1)) AS mono
      FROM t
      WHERE len(toks) > 0
    ), q AS (
      SELECT lang, words, mono,
             CAST(ROUND((20.0 - 15.0 * CAST(mono AS DOUBLE)
                         / CAST(words AS DOUBLE)) * 10000.0, 0) AS BIGINT)
               AS grade_e4
      FROM per_doc
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(grade_e4) AS DOUBLE)
                 / (10000.0 * CAST(COUNT(*) AS DOUBLE)), 6) AS mean_grade,
           ROUND(CAST(SUM(mono) AS DOUBLE) / CAST(SUM(words) AS DOUBLE), 6)
             AS mono_share
    FROM q GROUP BY 1
    """,
    tags=("llm", "text", "readability"),
)
def text_readability_forcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORCAST readability grade per language — the readability
    formula that needs NO sentence boundaries (grade = 20 - 150·
    monosyllable_share/10), which is exactly the situation of
    boilerplate-stripped or OCR text where period detection is
    garbage; completes the quality family next to text_quality's
    length/stopword gates and text_gopher_rules. Monosyllables are
    words with exactly one maximal vowel-group run ([aeiouy]+), the
    standard syllable proxy.

    Exactness: per-doc grades quantize to e4 integers and average as
    exact integer sums (the eval_calibration_ece discipline); the
    vowel-group count is a regex both engines evaluate identically.

    Scale shape: one corpus scan with per-row token/regex work, one
    partial-agg shuffle to 5 language rows. Embarrassingly parallel
    at 100 TB."""
    from serverless_datalake_spark.operators import textops

    d = load_table(spark, sf_dir, "documents")
    toks = textops.tokens(F.col("text"))
    per_doc = d.select(
        "lang",
        F.size(toks).alias("words"),
        F.size(
            F.filter(
                toks,
                lambda w: F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0))
                == 1,
            )
        ).alias("mono"),
    ).where(F.col("words") > 0)
    grade_e4 = F.round(
        (
            F.lit(20.0)
            - F.lit(15.0) * F.col("mono").cast("double") / F.col("words").cast("double")
        )
        * 10000.0,
        0,
    ).cast("long")
    q = per_doc.select("lang", "words", "mono", grade_e4.alias("grade_e4"))
    return q.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(
            F.sum("grade_e4").cast("double")
            / (F.lit(10000.0) * F.count(F.lit(1)).cast("double")),
            6,
        ).alias("mean_grade"),
        F.round(
            F.sum("mono").cast("double") / F.sum("words").cast("double"), 6
        ).alias("mono_share"),
    )
