"""Training-data pipeline operators over `documents` — the dataset-
management layer of an LLM data pipeline (north star, BASELINE.json):
deterministic train/test splitting, stratified sampling, Gopher-style
quality gating, intra-document repetition measurement, and cross-
split contamination detection.

Determinism discipline: every "random" choice is a multiplicative
hash on doc_id (Knuth's 2654435761 mod 2^32) written as plain BIGINT
arithmetic so Spark and DuckDB compute bit-identical buckets — never
engine RNG (`rand()`/`sampleBy` would not oracle-match). At 100 TB
this is also the operationally right choice: hash splits are stable
under re-runs, retries, and data re-partitioning, so an incremental
pipeline never migrates a document between train and test.

All token arithmetic is exact-integer (counts, lengths) so derived
doubles (one division) are bit-identical across engines too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window

from serverless_datalake_spark.operators import pin as _pin
from pyspark.sql import functions as F

from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_table

# Knuth multiplicative hash → uniform bucket in [0, 100). Exact in
# int64: doc_id * 2654435761 < 2^63 for fixture ids, and both engines
# define % on BIGINT identically for non-negative operands.
_BUCKET_SQL = "((doc_id * 2654435761) % 4294967296) % 100"


def _bucket_col() -> F.Column:
    return (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296) % F.lit(100)


_TOKS_SQL = "list_filter(string_split(text, ' '), x -> x <> '')"


def _toks_col() -> F.Column:
    return F.filter(F.split(F.col("text"), " "), lambda x: x != "")


@query(
    "split_train_test",
    oracle=f"""
    SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT lang) AS n_langs
    FROM (
      SELECT CASE WHEN {_BUCKET_SQL} < 90 THEN 'train' ELSE 'test' END AS split,
             n_chars, lang
      FROM documents
    ) t
    GROUP BY split
    """,
    tags=("llm", "datapipe", "split"),
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/test split by multiplicative hash of
    doc_id. A narrow projection + tiny agg: at scale this is a pure
    map stage (no shuffle until the 2-group rollup)."""
    d = load_table(spark, sf_dir, "documents")
    split = F.when(_bucket_col() < 90, "train").otherwise("test").alias("split")
    return (
        d.select(split, "n_chars", "lang")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


@query(
    "sample_stratified",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_total,
           COUNT(CASE WHEN {_BUCKET_SQL} <
                 (CASE WHEN lang = 'en' THEN 10 ELSE 50 END) THEN 1 END) AS n_sampled
    FROM documents
    GROUP BY source
    """,
    tags=("llm", "datapipe", "sample"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling with per-stratum rates (10% of English,
    50% of everything else — the domain-mixing move when rebalancing a
    corpus). Hash-gated rather than rand()-gated: reproducible and
    shuffle-free; the count-by-source summarizes the selection."""
    d = load_table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", 10).otherwise(50)
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(_bucket_col() < rate, 1)).alias("n_sampled"),
    )


@query(
    "text_gopher_rules",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks, text FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_words,
           CAST(list_aggregate(list_transform(toks, x -> CAST(length(x) AS DOUBLE)), 'sum')
                / GREATEST(len(toks), 1) AS DOUBLE) AS mean_word_len,
           (len(toks) >= 50 AND len(toks) <= 100000
            AND list_aggregate(list_transform(toks, x -> CAST(length(x) AS DOUBLE)), 'sum')
                / GREATEST(len(toks), 1) >= 3.0
            AND list_aggregate(list_transform(toks, x -> CAST(length(x) AS DOUBLE)), 'sum')
                / GREATEST(len(toks), 1) <= 10.0
            AND len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and'))) > 0
           ) AS passes
    FROM t
    """,
    tags=("llm", "datapipe", "quality"),
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document gate (Rae et al. 2021 §A1.1 shape): word
    count in [50, 100000], mean word length in [3, 10], at least one
    stopword present. One scan, no shuffle — at 100 TB this runs as a
    pure filter stage ahead of every other pipeline op."""
    d = load_table(spark, sf_dir, "documents")
    toks = _toks_col()
    n = F.size(toks)
    mean_len = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.greatest(n, F.lit(1))
    has_stop = (
        F.size(F.filter(toks, lambda x: x.isin("the", "a", "of", "and"))) > 0
    )
    passes = (
        (n >= 50)
        & (n <= 100000)
        & (mean_len >= 3.0)
        & (mean_len <= 10.0)
        & has_stop
    )
    return d.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        mean_len.alias("mean_word_len"),
        passes.alias("passes"),
    )


@query(
    "text_repetition",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ), b AS (
      SELECT doc_id,
             CASE WHEN len(toks) < 2 THEN []
                  ELSE list_transform(range(1, len(toks)),
                                      i -> concat(toks[i], ' ', toks[i + 1]))
             END AS bigrams
      FROM t
    )
    SELECT doc_id,
           CAST(len(bigrams) AS BIGINT) AS n_bigrams,
           CAST(len(bigrams) - len(list_distinct(bigrams)) AS BIGINT) AS n_dup_bigrams,
           CAST(len(bigrams) - len(list_distinct(bigrams)) AS DOUBLE)
             / GREATEST(len(bigrams), 1) AS dup_bigram_frac
    FROM b
    """,
    tags=("llm", "datapipe", "repetition"),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition (the duplicate-2-gram fraction from
    Gopher's repetition filters): documents that loop the same phrases
    score high and get dropped. Array HOFs only — no explode, no
    shuffle; the bigram list lives and dies inside one task."""
    d = load_table(spark, sf_dir, "documents")
    # toks as a materialized COLUMN (SCALE.md aliased-fold rule: an
    # inlined split would re-run per element_at per position)
    toks = F.col("toks")
    bigrams = F.when(F.size(toks) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        )
    )
    b = d.select("doc_id", _toks_col().alias("toks")).select(
        "doc_id", bigrams.alias("bigrams")
    )
    n_b = F.size("bigrams")
    n_dup = n_b - F.size(F.array_distinct("bigrams"))
    return b.select(
        "doc_id",
        n_b.cast("long").alias("n_bigrams"),
        n_dup.cast("long").alias("n_dup_bigrams"),
        (n_dup.cast("double") / F.greatest(n_b, F.lit(1))).alias("dup_bigram_frac"),
    )


@query(
    "split_contamination",
    oracle=f"""
    WITH labeled AS (
      SELECT doc_id, md5(text) AS fp,
             CASE WHEN {_BUCKET_SQL} < 90 THEN 'train' ELSE 'test' END AS split
      FROM documents
    )
    SELECT COUNT(*) AS n_test,
           COUNT(CASE WHEN fp IN (SELECT fp FROM labeled WHERE split = 'train')
                 THEN 1 END) AS n_leaked
    FROM labeled WHERE split = 'test'
    """,
    tags=("llm", "datapipe", "decontamination"),
)
def split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→test leakage check (decontamination): test documents
    whose exact-text fingerprint also appears in train. The train
    fingerprint set reduces to distinct hashes before the join — at
    scale that's a compact build side for a broadcast or bucketed
    semi join, never a text-vs-text comparison."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5("text").alias("fp"),
        F.when(_bucket_col() < 90, "train").otherwise("test").alias("split"),
    )
    train_fp = d.where(F.col("split") == "train").select("fp").distinct()
    test = d.where(F.col("split") == "test")
    leaked = (
        test.join(F.broadcast(train_fp.withColumnRenamed("fp", "tfp")),
                  F.col("fp") == F.col("tfp"), "left")
    )
    return leaked.agg(
        F.count(F.lit(1)).alias("n_test"),
        F.count(F.when(F.col("tfp").isNotNull(), 1)).alias("n_leaked"),
    )


@query(
    "pipeline_curation",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, n_chars, text, {_TOKS_SQL} AS toks FROM documents
    ), gated AS (
      SELECT doc_id, lang, n_chars, text FROM toks
      WHERE len(toks) >= 50 AND len(toks) <= 100000
        AND list_aggregate(list_transform(toks, x -> CAST(length(x) AS DOUBLE)), 'sum')
            / GREATEST(len(toks), 1) BETWEEN 3.0 AND 10.0
        AND len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and'))) > 0
    ), survivors AS (
      SELECT MIN(doc_id) AS sid FROM gated GROUP BY md5(text)
    ), final AS (
      SELECT g.doc_id, g.lang, g.n_chars,
             CASE WHEN {_BUCKET_SQL} < 90 THEN 'train' ELSE 'test' END AS split
      FROM gated g JOIN survivors s ON g.doc_id = s.sid
    )
    SELECT split, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM final GROUP BY split, lang
    """,
    tags=("llm", "datapipe", "pipeline"),
)
def pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline end-to-end: Gopher-style gate →
    exact dedup (min-id survivor per content fingerprint) → hash
    split → per-(split, lang) rollup. The full chain is one scan, one
    fingerprint shuffle, one semi join, one rollup — the shape a
    100 TB curation run takes (the gate prunes before anything
    shuffles; the dedup join carries ids, never text)."""
    d = load_table(spark, sf_dir, "documents")
    toks = _toks_col()
    n = F.size(toks)
    mean_len = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.greatest(n, F.lit(1))
    has_stop = F.size(F.filter(toks, lambda x: x.isin("the", "a", "of", "and"))) > 0
    gated = d.where(
        (n >= 50) & (n <= 100000) & (mean_len >= 3.0) & (mean_len <= 10.0) & has_stop
    )
    survivors = (
        gated.groupBy(F.md5("text").alias("fp"))
        .agg(F.min("doc_id").alias("sid"))
        .select("sid")
    )
    final = gated.join(
        F.broadcast(survivors), gated.doc_id == F.col("sid"), "left_semi"
    ).select(
        "lang",
        "n_chars",
        F.when(_bucket_col() < 90, "train").otherwise("test").alias("split"),
    )
    return final.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@query(
    "pack_greedy_bins",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT doc_id, lang, n_tokens,
           CAST(FLOOR((cum - n_tokens) / 2048.0) AS BIGINT) AS bin_id,
           CAST(cum - n_tokens - 2048 * FLOOR((cum - n_tokens) / 2048.0) AS BIGINT) AS bin_offset
    FROM packed
    """,
    tags=("llm", "datapipe", "packing"),
)
def pack_greedy_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — assign documents to fixed token-budget bins
    (2048) for pre-training batch assembly. Contiguous packing by
    running token count: bin = the budget window the doc STARTS in
    (docs may straddle bins; the trainer splits at bin boundaries).
    Partitioned by lang so the cumulative window parallelizes across
    partitions — at 100 TB you pack per shard, never globally. All
    integer math: exact under any plan."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(_toks_col()).cast("long")
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    packed = d.select("doc_id", "lang", n_tok.alias("n_tokens")).withColumn(
        "cum", F.sum("n_tokens").over(w)
    )
    start = F.col("cum") - F.col("n_tokens")
    bin_id = F.floor(start / 2048.0)
    return packed.select(
        "doc_id",
        "lang",
        "n_tokens",
        bin_id.cast("long").alias("bin_id"),
        (start - 2048 * bin_id).cast("long").alias("bin_offset"),
    )


@query(
    "split_kfold",
    oracle="""
    WITH keyed AS (
      SELECT doc_id,
             ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * CAST(268435456 AS BIGINT)
            + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * CAST(16777216 AS BIGINT)
            + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * CAST(1048576 AS BIGINT)
            + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) * CAST(65536 AS BIGINT)
            + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 5, 1)) - 1) * CAST(4096 AS BIGINT)
            + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 6, 1)) - 1) * CAST(256 AS BIGINT)
            + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 7, 1)) - 1) * CAST(16 AS BIGINT)
            + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 8, 1)) - 1)) AS k32
      FROM documents
    )
    SELECT doc_id, CAST(k32 % 5 AS BIGINT) AS fold, k32 % 5 = 0 AS is_holdout
    FROM keyed
    """,
    tags=("llm", "datapipe", "split"),
)
def split_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment (k=5) from the md5-derived
    32-bit key of the document id — stable under re-runs, re-shards,
    and engine changes (the property a train/eval split must have;
    same portable hash family as the dedup operators). Zero shuffle:
    a pure projection."""
    from serverless_datalake_spark.operators.dedup import md5_key32

    d = load_table(spark, sf_dir, "documents")
    fold = md5_key32(F.col("doc_id").cast("string")) % 5
    return d.select(
        "doc_id", fold.alias("fold"), (fold == 0).alias("is_holdout")
    )


@query(
    "profile_columns",
    oracle="""
    SELECT 'l_quantity' AS col_name,
           COUNT(*) - COUNT(l_quantity) AS n_nulls,
           COUNT(DISTINCT l_quantity) AS n_distinct,
           MIN(l_quantity) AS min_v, MAX(l_quantity) AS max_v
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice',
           COUNT(*) - COUNT(l_extendedprice),
           COUNT(DISTINCT l_extendedprice),
           MIN(l_extendedprice), MAX(l_extendedprice)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount',
           COUNT(*) - COUNT(l_discount),
           COUNT(DISTINCT l_discount),
           MIN(l_discount), MAX(l_discount)
    FROM lineitem
    """,
    tags=("llm", "datapipe", "profiling"),
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling — the data-quality pass every ingestion
    pipeline runs before training on a new source: null counts,
    distinct cardinality, value ranges. ONE scan computes every
    column's stats (a single aggregate row, exploded to one row per
    column) — at 100 TB you never scan once per column."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(c).alias(f"__mn_{c}"),
            F.max(c).alias(f"__mx_{c}"),
        ]
    one = li.agg(*aggs)
    profiled = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("col_name"),
                    F.col(f"__nn_{c}").cast("long").alias("n_nulls"),
                    F.col(f"__nd_{c}").alias("n_distinct"),
                    F.col(f"__mn_{c}").alias("min_v"),
                    F.col(f"__mx_{c}").alias("max_v"),
                )
                for c in cols
            ]
        )
    )
    return one.select(profiled.alias("p")).select(
        "p.col_name", "p.n_nulls", "p.n_distinct", "p.min_v", "p.max_v"
    )


def _contamination_grams(d: DataFrame) -> DataFrame:
    """(doc_id, split, gram) — distinct 5-grams per doc with the
    train/test bucket. Exposed module-level (pre-checkpoint) so
    tests/test_plans.py can pin the tokenize-once property on its
    optimized plan: the token array is materialized as a COLUMN
    before the gram lambda — inlining _toks_col() into the five
    element_at calls re-runs split+filter PER GRAM POSITION (the
    aliased-fold-inside-lambda O(N²) rule from SCALE.md; measured
    9.6 s for a 250k-row gram relation vs ~1 s column-referenced)."""
    toks = F.col("toks")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 4),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
                F.element_at(toks, i + 3),
                F.element_at(toks, i + 4),
            ),
        )
    )
    return (
        d.select(
            "doc_id",
            F.when(_bucket_col() < 90, "train").otherwise("test").alias("split"),
            _toks_col().alias("toks"),
        )
        .where(F.size("toks") >= 5)
        .select("doc_id", "split", F.explode(grams).alias("gram"))
    )


@query(
    "split_contamination_ngram",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks,
             CASE WHEN {_BUCKET_SQL} < 90 THEN 'train' ELSE 'test' END AS split
      FROM documents
    ), g AS (
      SELECT doc_id, split,
             unnest(list_distinct(list_transform(range(1, len(toks) - 3),
                    i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2], ' ', toks[i+3], ' ', toks[i+4])))) AS gram
      FROM t WHERE len(toks) >= 5
    ), train_grams AS (
      SELECT DISTINCT gram FROM g WHERE split = 'train'
    )
    SELECT g.doc_id,
           COUNT(*) AS n_grams,
           COUNT(tg.gram) AS n_overlap,
           COUNT(tg.gram) * 4 >= COUNT(*) AS contaminated
    FROM g LEFT JOIN train_grams tg USING (gram)
    WHERE g.split = 'test'
    GROUP BY g.doc_id
    """,
    tags=("llm", "datapipe", "decontamination"),
)
def split_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-level decontamination (the GPT-3 method, 5-grams here):
    a test document is contaminated when ≥25% of its distinct 5-grams
    also occur anywhere in train. The train side reduces to a distinct
    gram set (at scale: gram HASHES, bucketed) before the join — the
    fact side never shuffles text. Exact integer counts throughout."""
    d = load_table(spark, sf_dir, "documents")
    # the exploded gram relation feeds BOTH the train-side distinct
    # and the test-side probe — pin one materialization so the
    # tokenize+shingle explode runs once, not per branch
    g = _contamination_grams(d).transform(_pin)
    train_grams = (
        g.where(F.col("split") == "train").select(F.col("gram").alias("tgram")).distinct()
    )
    test = g.where(F.col("split") == "test")
    joined = test.join(
        F.broadcast(train_grams), F.col("gram") == F.col("tgram"), "left"
    )
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count(F.col("tgram")).alias("n_overlap"),
        (F.count(F.col("tgram")) * 4 >= F.count(F.lit(1))).alias("contaminated"),
    )


@query(
    "mixture_weights",
    oracle=f"""
    WITH tok AS (
      SELECT lang, CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens FROM documents
    ), per AS (
      SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS actual_tokens
      FROM tok GROUP BY lang
    ), tot AS (
      SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             COUNT(DISTINCT lang) AS n_langs
      FROM tok
    )
    SELECT per.lang, per.n_docs, per.actual_tokens,
           ROUND(CAST(tot.total_tokens AS DOUBLE)
                 / (tot.n_langs * per.actual_tokens), 6) AS weight
    FROM per CROSS JOIN tot
    """,
    tags=("llm", "datapipe", "mixture"),
)
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: per-language sampling weights that
    rebalance the corpus to a uniform token budget per language (the
    mixture move behind every pre-training data recipe; swap the
    uniform target for any vector). Exact integer token sums; one
    division per group — deterministic under any plan. The 1-row
    totals side joins as a broadcast."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("lang", F.size(_toks_col()).cast("long").alias("n_tokens"))
    per = tok.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("actual_tokens")
    )
    tot = tok.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count_distinct("lang").alias("n_langs"),
    )
    return per.join(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "actual_tokens",
        F.round(
            F.col("total_tokens").cast("double")
            / (F.col("n_langs") * F.col("actual_tokens")),
            6,
        ).alias("weight"),
    )


@query(
    "sample_balanced_cap",
    oracle=f"""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY {_BUCKET_SQL}, doc_id) AS rn
      FROM documents
    ) t
    WHERE rn <= 60
    GROUP BY lang
    """,
    tags=("llm", "datapipe", "sampling"),
)
def sample_balanced_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced per-class downsampling: cap every language at 60
    documents, chosen by deterministic hash order (so the cap is
    stable under re-runs and incremental additions — a new document
    only displaces the current max-hash member, never reshuffles the
    whole class). The mixture-balancing step before training when one
    class dominates the corpus. One window shuffle on the class key;
    WindowGroupLimit prunes per-class work map-side."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(_bucket_col(), "doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 60)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@query(
    "sample_weighted",
    oracle=f"""
    SELECT source, doc_id, n_chars,
           ROUND(CAST(((doc_id * 2654435761) % 4294967296) AS DOUBLE)
                 / GREATEST(n_chars, 1), 6) AS priority,
           CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY CAST(((doc_id * 2654435761) % 4294967296) AS DOUBLE)
                        / GREATEST(n_chars, 1), doc_id) AS rn
      FROM documents
    ) t
    WHERE rn <= 20
    """,
    tags=("llm", "datapipe", "sampling", "weighted"),
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (priority
    sampling à la Efraimidis–Spirakis, with the transcendental-free
    key h/w instead of u^(1/w)): each document draws a uniform 32-bit
    hash h from the multiplicative hash family and is ranked by
    h / weight — larger weights (here n_chars: prefer long documents)
    systematically shrink the key, so inclusion probability grows with
    weight while staying a pure function of (doc_id, weight). Top-20
    per source.

    Scale shape: one window shuffle on the stratum key with
    WindowGroupLimit map-side pruning — same plan family as
    sample_balanced_cap, and the key arithmetic (integer hash, one
    IEEE division) is bit-portable across engines, unlike log/pow
    formulations."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr("(doc_id * 2654435761) % 4294967296").cast("double")
    prio = h / F.greatest(F.col("n_chars"), F.lit(1))
    w = Window.partitionBy("source").orderBy(prio, "doc_id")
    return (
        docs.withColumn("priority", prio)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 20)
        .select(
            "source",
            "doc_id",
            "n_chars",
            F.round("priority", 6).alias("priority"),
            F.col("rn").cast("long").alias("rank"),
        )
    )


@query(
    "sample_reservoir_hash",
    oracle="""
    SELECT doc_id, lang, source,
           md5(CAST(doc_id AS VARCHAR) || ':reservoir') AS sample_key
    FROM documents
    ORDER BY sample_key, doc_id
    LIMIT 100
    """,
    tags=("llm", "datapipe", "sampling", "reservoir"),
)
def sample_reservoir_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform k-reservoir: the k documents with the
    smallest md5(doc_id || salt) — the stable replacement for
    reservoir sampling in a distributed pipeline. Unlike a sequential
    reservoir (order-dependent state) or engine RNG (not reproducible
    across runs/engines), the hash key makes the sample a pure
    function of the ids: re-runs, retries, shard re-splits, and
    incremental appends all agree on membership, and two shards'
    samples MERGE by just re-taking the k smallest keys — the
    mergeability that matters when 1000 executors each sample their
    partition. Changing the salt draws an independent sample.

    Scale shape: sort().limit(k) plans as TakeOrderedAndProject — a
    per-partition k-row heap then a k·P-row driver merge, never a
    global sort; no window, no shuffle of the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":reservoir")))
    return (
        docs.select("doc_id", "lang", "source", key.alias("sample_key"))
        .orderBy("sample_key", "doc_id")
        .limit(100)
    )


@query(
    "dedup_keep_longest",
    oracle=f"""
    SELECT doc_id, fingerprint, n_chars
    FROM (
      SELECT doc_id, n_chars,
             md5(array_to_string(list_sort(list_distinct({_TOKS_SQL})), ' ')) AS fingerprint,
             ROW_NUMBER() OVER (
               PARTITION BY md5(array_to_string(list_sort(list_distinct({_TOKS_SQL})), ' '))
               ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents
    ) t
    WHERE rn = 1 AND n_chars >= 300
    """,
    tags=("llm", "datapipe", "dedup", "policy"),
)
def dedup_keep_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup survivor POLICY variant: cluster documents by bag-of-words
    fingerprint (sorted distinct tokens — catches shuffled/reordered
    copies exact hashing misses) and keep the LONGEST member instead of
    the smallest-id one — the 'keep the most complete version' rule
    real pipelines prefer when near-copies differ by truncation. Same
    single-shuffle shape as dedup_exact; the policy is just the window
    order. Output filtered to long docs to keep the check focused."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.array_join(F.array_sort(F.array_distinct(_toks_col())), " "))
    w = Window.partitionBy("fingerprint").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        docs.withColumn("fingerprint", fp)
        .withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("n_chars") >= 300))
        .select("doc_id", "fingerprint", "n_chars")
    )


@query(
    "text_chunk_sliding",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ), c AS (
      SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS start
      FROM t WHERE len(toks) > 0
    )
    SELECT doc_id,
           CAST(start / 48 AS INTEGER) AS chunk_id,
           CAST(len(toks[start + 1 : start + 64]) AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string(toks[start + 1 : start + 64], ' ')) AS chunk_fp
    FROM c
    """,
    tags=("llm", "datapipe", "chunking"),
)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the context-length prep step
    that turns variable-length documents into overlapping training
    windows (64 tokens per chunk, stride 48 → 16-token overlap so no
    boundary n-gram is lost). Emits per-chunk token counts and a
    content fingerprint (the join key for chunk-level dedup and
    contamination checks downstream).

    Scale shape: chunking is a pure per-document HOF expansion — the
    token array lives and dies inside one task, chunks explode to
    ~n/stride rows with no shuffle anywhere; at 100 TB this pipelines
    straight into the pack/split stages as a map-only stage."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks_col()
    t = docs.select("doc_id", toks.alias("toks")).where(F.size("toks") > 0)
    c = t.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.size("toks") - 1, F.lit(48))
        ).alias("start"),
    )
    chunk = F.slice(F.col("toks"), F.col("start") + 1, F.lit(64))
    return c.select(
        "doc_id",
        (F.col("start") / 48).cast("int").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_fp"),
    )


@query(
    "dedup_chunk_exact",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ), c AS (
      SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS start
      FROM t WHERE len(toks) > 0
    ), ch AS (
      SELECT doc_id,
             CAST(start / 48 AS INTEGER) AS chunk_id,
             md5(array_to_string(toks[start + 1 : start + 64], ' ')) AS chunk_fp
      FROM c
    )
    SELECT chunk_fp,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS survivor_doc,
           MIN(CASE WHEN doc_id = sd THEN chunk_id END) AS survivor_chunk
    FROM (SELECT ch.*, MIN(doc_id) OVER (PARTITION BY chunk_fp) AS sd FROM ch)
    GROUP BY chunk_fp
    """,
    tags=("llm", "datapipe", "dedup", "chunking"),
)
def dedup_chunk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (chunk-level) exact dedup: the FineWeb-style pass
    that catches boilerplate shared BETWEEN documents that
    document-level dedup_exact can never see. Chunks come from the
    same sliding windows as text_chunk_sliding; the survivor of each
    fingerprint group is the (smallest doc_id, smallest chunk_id)
    occurrence.

    Scale shape: chunk expansion is map-only (see text_chunk_sliding),
    then ONE hash shuffle on chunk_fp — the identical plan family as
    dedup_exact, just keyed one level finer."""
    chunks = text_chunk_sliding(spark, sf_dir)
    w = Window.partitionBy("chunk_fp")
    enriched = chunks.withColumn("sd", F.min("doc_id").over(w))
    return enriched.groupBy("chunk_fp").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("survivor_doc"),
        F.min(F.when(F.col("doc_id") == F.col("sd"), F.col("chunk_id"))).alias(
            "survivor_chunk"
        ),
    )


@query(
    "sample_temperature_mixture",
    oracle="""
    WITH per AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1
    ), t AS (
      SELECT lang, n_docs,
             ROUND(exp(0.7 * ln(CAST(n_docs AS DOUBLE))), 8) AS ts
      FROM per
    ), tot AS (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS nd,
             list_aggregate(list(ts ORDER BY lang), 'sum') AS tt
      FROM t
    )
    SELECT t.lang, t.n_docs,
           ROUND(CAST(t.n_docs AS DOUBLE) / CAST(tot.nd AS DOUBLE), 6) AS raw_share,
           ROUND(t.ts / tot.tt, 6) AS temp_share,
           ROUND((t.ts / tot.tt) / (CAST(t.n_docs AS DOUBLE) / CAST(tot.nd AS DOUBLE)), 6) AS boost
    FROM t CROSS JOIN tot
    """,
    tags=("llm", "datapipe", "mixture", "sampling"),
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling (the mT5/XLM-R multilingual
    recipe, T = 1/α with α = 0.7): sampling probability p_l ∝ n_l^0.7,
    flattening the language distribution so low-resource languages are
    upsampled (boost > 1) and dominant ones suppressed (the fixture's
    en/fr/es/zh/de skew exercises both directions; the source
    dimension is uniform by construction and would be degenerate) — the standard
    mixture knob between raw proportions (α=1) and uniform (α=0).

    Float discipline: n^0.7 is spelled exp(0.7·ln n) in BOTH engines
    (pow() is libm-dependent; exp/ln agree to well under the 8-decimal
    round — the established tf-idf/unigram precedent), and the
    normalizer is an ordered fold over the source-sorted factors.

    Scale shape: one count aggregate (source-cardinality output), one
    broadcast of the 1-row totals — the corpus is scanned once; at
    100 TB per-partition counts come from lake metadata without
    touching data at all."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    t = per.select(
        "lang",
        "n_docs",
        F.round(F.exp(0.7 * F.log(F.col("n_docs").cast("double"))), 8).alias("ts"),
    )
    arr = F.array_sort(F.collect_list(F.struct("lang", "ts")))
    tot = t.groupBy().agg(
        F.sum("n_docs").alias("nd"),
        F.aggregate(
            F.transform(arr, lambda x: x["ts"]), F.lit(0.0), lambda s, x: s + x
        ).alias("tt"),
    )
    raw = F.col("n_docs").cast("double") / F.col("nd").cast("double")
    temp = F.col("ts") / F.col("tt")
    return t.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.round(raw, 6).alias("raw_share"),
        F.round(temp, 6).alias("temp_share"),
        F.round(temp / raw, 6).alias("boost"),
    )


def _grp_holdout_oracle() -> str:
    from serverless_datalake_spark.queries.llm_dedup import _hex8_int

    k32 = _hex8_int("substr(md5(CAST(user_id AS VARCHAR)), 1, 8)")
    return f"""
    SELECT event_id, user_id,
           CAST({k32} % 5 AS BIGINT) AS fold,
           {k32} % 5 = 0 AS is_holdout
    FROM events
    """


@query("split_group_holdout", oracle=_grp_holdout_oracle(), tags=("datapipe", "split", "leakage"))
def split_group_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware holdout (GroupKFold semantics): the fold is a
    deterministic hash of the GROUP key (user), not the row — every
    event of a user lands in the same fold, so user-level signal can
    never leak across the train/eval boundary (the leakage mode a
    row-level split like split_kfold cannot prevent when rows share an
    entity).

    Scale shape: map-only — the fold is a projection of the key hash;
    no shuffle, no state, stable under retries and repartitioning
    (the md5 determinism discipline of the split family)."""
    from serverless_datalake_spark.operators.dedup import md5_key32

    e = load_table(spark, sf_dir, "events")
    k = md5_key32(F.col("user_id").cast("string"))
    return e.select(
        "event_id",
        "user_id",
        (k % 5).cast("long").alias("fold"),
        (k % 5 == 0).alias("is_holdout"),
    )


@query(
    "privacy_k_anonymity",
    oracle="""
    WITH cells AS (
      SELECT event_type,
             CAST(FLOOR(EPOCH(CAST(time_bucket(INTERVAL '1 day', ts) AS TIMESTAMP))) AS BIGINT) AS day_start,
             CAST(user_id % 10 AS BIGINT) AS user_bucket,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM events
      GROUP BY 1, 2, 3
    )
    SELECT event_type, day_start, user_bucket, k, k < 5 AS at_risk
    FROM cells
    """,
    tags=("privacy", "governance"),
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier cell grid
    (event_type × day × coarse user bucket): cells with k < 5 rows
    are re-identification risks that a release pipeline must suppress
    or generalize — the standard governance gate before sharing
    event-level extracts.

    Scale shape: one partial-agg shuffle on the quasi-identifier
    tuple; the risk flag is a projection. The grid is
    cardinality-bounded by the generalization (that's the point of
    generalizing), so the report never approaches event size."""
    e = load_table(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type",
        F.window("ts", "1 day").alias("w"),
        (F.col("user_id") % 10).cast("long").alias("user_bucket"),
    ).agg(F.count(F.lit(1)).alias("k"))
    return cells.select(
        "event_type",
        F.col("w.start").cast("long").alias("day_start"),
        "user_bucket",
        "k",
        (F.col("k") < 5).alias("at_risk"),
    )


@query(
    "privacy_l_diversity",
    oracle="""
    WITH cells AS (
      SELECT CAST(FLOOR(EPOCH(CAST(time_bucket(INTERVAL '1 day', ts) AS TIMESTAMP))) AS BIGINT)
               AS day_start,
             CAST(user_id % 10 AS BIGINT) AS user_bucket,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS l
      FROM events
      GROUP BY 1, 2
    )
    SELECT day_start, user_bucket, k, l, l < 3 AS low_diversity
    FROM cells
    """,
    tags=("privacy", "governance"),
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the complement of privacy_k_anonymity:
    a quasi-identifier cell can be large (k-anonymous) yet still leak
    if every row shares one sensitive value (homogeneity attack).
    Here the sensitive attribute is event_type; cells where fewer than
    3 distinct values appear are flagged for suppression/generalization
    (distinct-l-diversity with l = 3).

    Scale shape: one shuffle on the QI tuple; COUNT DISTINCT over the
    small sensitive domain expands per-cell (Spark's two-phase
    distinct aggregate), still grid-bounded output."""
    e = load_table(spark, sf_dir, "events")
    cells = e.groupBy(
        F.window("ts", "1 day").alias("w"),
        (F.col("user_id") % 10).cast("long").alias("user_bucket"),
    ).agg(
        F.count(F.lit(1)).alias("k"),
        F.countDistinct("event_type").alias("l"),
    )
    return cells.select(
        F.col("w.start").cast("long").alias("day_start"),
        "user_bucket",
        "k",
        "l",
        (F.col("l") < 3).alias("low_diversity"),
    )


@query(
    "validate_referential_integrity",
    oracle="""
    SELECT 'lineitem.l_orderkey -> orders' AS fk,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
             AS n_orphans,
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_rows
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'customer.c_nationkey -> nation',
           CAST((SELECT COUNT(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT),
           CAST((SELECT COUNT(*) FROM customer) AS BIGINT)
    """,
    tags=("governance", "quality", "join"),
)
def validate_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit across the star schema — the
    cross-TABLE data-quality gate that complements
    validate_expectations' single-table checks: for each declared FK,
    count child rows whose parent is missing (anti-join semantics).

    Scale shape: each check is one LEFT ANTI join; parent key sets
    are dim-sized → broadcast, so the fact scan never shuffles. The
    three audits run as independent branches unioned into one tiny
    report."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")

    def audit(label, child, key, parent, pkey):
        orphans = child.join(
            F.broadcast(parent.select(pkey).distinct()),
            child[key] == parent[pkey],
            "left_anti",
        )
        return (
            orphans.groupBy()
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .crossJoin(
                F.broadcast(child.groupBy().agg(F.count(F.lit(1)).alias("n_rows")))
            )
            .select(F.lit(label).alias("fk"), "n_orphans", "n_rows")
        )

    return (
        audit("lineitem.l_orderkey -> orders", li, "l_orderkey", o, "o_orderkey")
        .unionByName(audit("orders.o_custkey -> customer", o, "o_custkey", c, "c_custkey"))
        .unionByName(
            audit("customer.c_nationkey -> nation", c, "c_nationkey", n, "n_nationkey")
        )
    )


@query(
    "split_time_embargo",
    oracle="""
    WITH b AS (
      SELECT event_id, ts,
             CASE WHEN ts < TIMESTAMP '2024-01-20 00:00:00' THEN 'train'
                  WHEN ts >= TIMESTAMP '2024-01-22 00:00:00' THEN 'test'
                  ELSE 'embargoed' END AS split
      FROM events
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id
    FROM b GROUP BY 1
    """,
    tags=("datapipe", "split", "temporal"),
)
def split_time_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/test split with an EMBARGO gap (2 days between
    the train cutoff and the test start): rows inside the gap are
    quarantined so that leakage through temporally-correlated
    features (sessions, rolling aggregates, label look-ahead) cannot
    straddle the boundary — the purged/embargoed split from
    time-series ML, the correct alternative to a random split whenever
    rows are not exchangeable over time.

    Scale shape: one map-only CASE over the scan (the timestamp
    predicate pushes to the parquet reader for the train/test
    branches); counts partial-aggregate. Deterministic by
    construction — no hashing involved at all."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-20 00:00:00").cast("timestamp")
    test_start = F.lit("2024-01-22 00:00:00").cast("timestamp")
    split = (
        F.when(F.col("ts") < cutoff, "train")
        .when(F.col("ts") >= test_start, "test")
        .otherwise("embargoed")
    )
    return ev.select("event_id", split.alias("split")).groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").cast("long").alias("min_id"),
        F.max("event_id").cast("long").alias("max_id"),
    )


def _dataset_card_oracle() -> str:
    from serverless_datalake_spark.operators import textops

    stop_sql = "(" + ", ".join(f"'{w}'" for w in sorted(textops.STOPWORDS)) + ")"
    quality = (
        "ROUND(0.5 * (CAST(len(list_distinct(toks)) AS DOUBLE) / GREATEST(len(toks), 1))"
        " + 0.5 * (1.0 - ABS(CAST(len(list_filter(toks, x -> x IN "
        + stop_sql
        + ")) AS DOUBLE) / GREATEST(len(toks), 1) - 0.1)), 4)"
    )
    return f"""
    WITH t AS (
      SELECT doc_id, lang, text,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), scored AS (
      SELECT doc_id, lang, text,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(toks, x -> x IN {stop_sql})) AS DOUBLE)
               / GREATEST(len(toks), 1) AS stop_ratio,
             {quality} AS quality
      FROM t
    ), kept AS (
      SELECT * FROM scored WHERE n_tokens >= 20 AND stop_ratio >= 0.05
    ), fp AS (
      SELECT lang, md5(text) AS fp, CAST(COUNT(*) AS BIGINT) AS n
      FROM kept GROUP BY 1, 2
    ), dups AS (
      SELECT lang, CAST(SUM(n - 1) AS BIGINT) AS n_exact_dup FROM fp GROUP BY 1
    ), per_lang AS (
      SELECT k.lang,
             CAST(COUNT(*) AS BIGINT) AS n_kept,
             CAST(SUM(k.n_tokens) AS BIGINT) AS total_tokens,
             CAST(SUM(CAST(ROUND(k.quality * 10000.0, 0) AS BIGINT)) AS BIGINT) AS q_e4
      FROM kept k GROUP BY 1
    ), alldocs AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1
    ), temp AS (
      SELECT p.lang, ROUND(exp(0.7 * ln(CAST(p.n_kept AS DOUBLE))), 8) AS ts
      FROM per_lang p
    ), tt AS (
      SELECT list_aggregate(list(ts ORDER BY lang), 'sum') AS tot FROM temp
    )
    SELECT a.n_docs, p.lang, p.n_kept,
           COALESCE(d.n_exact_dup, 0) AS n_exact_dup,
           p.total_tokens,
           ROUND(CAST(p.q_e4 AS DOUBLE) / CAST(p.n_kept AS DOUBLE) / 10000.0, 4)
             AS mean_quality,
           ROUND(temp.ts / tt.tot, 6) AS temp_share
    FROM per_lang p
    JOIN alldocs a ON a.lang = p.lang
    LEFT JOIN dups d ON d.lang = p.lang
    JOIN temp ON temp.lang = p.lang
    CROSS JOIN tt
    """


@query("pipeline_dataset_card", oracle=_dataset_card_oracle(),
       tags=("llm", "pipeline", "dataset-card", "capstone"))
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DATASET CARD: per-language corpus accounting a training run
    publishes — raw docs, quality-gated survivors (length + stopword
    floor), residual exact-duplicate count among survivors, total
    token budget, mean quality, and the mT5-style temperature mixture
    share (p ∝ n^0.7) — every number the data section of a model card
    reports, in one pass over the corpus.

    Exactness: token counts exact ints; mean quality averages the
    4-rounded per-doc scores as integer 1e-4 units; the temperature
    shares reuse mixture_weights' exp·ln spelling with the
    vocabulary-ordered fold for the normalizer.

    Scale shape: ONE corpus scan feeds scoring (map-only HOFs); the
    fingerprint, per-language, and mixture relations are all
    language- or hash-grain aggregates — the reporting query costs no
    more than the cheapest gate it summarizes."""
    from serverless_datalake_spark.operators import textops

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "lang",
        "text",
        textops.token_count(F.col("text")).cast("long").alias("n_tokens"),
        textops.stopword_ratio(F.col("text")).alias("stop_ratio"),
        textops.quality_score(F.col("text")).alias("quality"),
    )
    kept = scored.where((F.col("n_tokens") >= 20) & (F.col("stop_ratio") >= 0.05))
    fp = kept.groupBy("lang", F.md5("text").alias("fp")).agg(
        F.count(F.lit(1)).alias("n")
    )
    dups = fp.groupBy("lang").agg(
        F.sum(F.col("n") - 1).cast("long").alias("n_exact_dup")
    )
    per_lang = kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum(F.round(F.col("quality") * 10000.0, 0).cast("long"))
        .cast("long")
        .alias("q_e4"),
    )
    alldocs = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    temp = per_lang.select(
        "lang",
        F.round(F.exp(F.lit(0.7) * F.log(F.col("n_kept").cast("double"))), 8).alias("ts"),
    )
    arr = F.array_sort(F.collect_list(F.struct("lang", "ts")))
    tot = temp.agg(
        F.aggregate(
            F.transform(arr, lambda x: x["ts"]), F.lit(0.0), lambda a, x: a + x
        ).alias("tot")
    )
    return (
        per_lang.join(F.broadcast(alldocs), "lang")
        .join(F.broadcast(dups), "lang", "left")
        .join(F.broadcast(temp), "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            "n_docs",
            "lang",
            "n_kept",
            F.coalesce(F.col("n_exact_dup"), F.lit(0)).cast("long").alias("n_exact_dup"),
            "total_tokens",
            F.round(
                F.col("q_e4").cast("double") / F.col("n_kept").cast("double") / F.lit(10000.0),
                4,
            ).alias("mean_quality"),
            F.round(F.col("ts") / F.col("tot"), 6).alias("temp_share"),
        )
    )


@query(
    "privacy_generalize_enforce",
    oracle="""
    WITH g AS (
      SELECT c_custkey,
             n_name AS nation,
             CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS bal_band
      FROM customer JOIN nation ON n_nationkey = c_nationkey
    ), sized AS (
      SELECT nation, bal_band, CAST(COUNT(*) AS BIGINT) AS k
      FROM g GROUP BY 1, 2
    ), enforced AS (
      SELECT g.c_custkey,
             CASE WHEN s.k >= 5 THEN g.nation ELSE '*' END AS nation_out,
             CASE WHEN s.k >= 5 THEN CAST(g.bal_band AS VARCHAR) ELSE '*' END
               AS band_out,
             CASE WHEN s.k >= 5 THEN 0 ELSE 1 END AS suppressed
      FROM g JOIN sized s ON s.nation = g.nation AND s.bal_band = g.bal_band
    )
    SELECT nation_out, band_out,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MAX(suppressed) AS BIGINT) AS is_suppressed_class
    FROM enforced GROUP BY 1, 2
    """,
    tags=("datapipe", "privacy", "k-anonymity"),
)
def privacy_generalize_enforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity ENFORCEMENT (k=5) by generalize-then-suppress:
    quasi-identifiers are generalized (nation kept, balance binned to
    $2000 bands), classes still under k are suppressed to '*' — the
    transform side of the privacy pair (privacy_k_anonymity only
    AUDITS; this produces the releasable view, Samarati's
    generalization/suppression scheme in one pass). Every surviving
    named class has ≥ k members by construction, which the output
    sizes prove.

    Scale shape: class sizes are one quasi-identifier-grain aggregate
    joined back (broadcast — QI grain is small by design; if it were
    not, the release would fail k-anonymity anyway); the enforcement
    is then map-only."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    g = c.join(F.broadcast(n), n["n_nationkey"] == c["c_nationkey"]).select(
        "c_custkey",
        F.col("n_name").alias("nation"),
        F.floor(F.col("c_acctbal") / 2000.0).cast("long").alias("bal_band"),
    )
    sized = g.groupBy("nation", "bal_band").agg(F.count(F.lit(1)).alias("k"))
    enforced = g.join(
        F.broadcast(sized.withColumnRenamed("nation", "sn").withColumnRenamed("bal_band", "sb")),
        (F.col("sn") == F.col("nation")) & (F.col("sb") == F.col("bal_band")),
    ).select(
        F.when(F.col("k") >= 5, F.col("nation")).otherwise("*").alias("nation_out"),
        F.when(F.col("k") >= 5, F.col("bal_band").cast("string"))
        .otherwise("*")
        .alias("band_out"),
        F.when(F.col("k") >= 5, 0).otherwise(1).alias("suppressed"),
    )
    return enforced.groupBy("nation_out", "band_out").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max("suppressed").cast("long").alias("is_suppressed_class"),
    )


@query(
    "sample_neyman_allocation",
    oracle="""
    WITH strata AS (
      SELECT c_mktsegment AS stratum,
             CAST(COUNT(*) AS BIGINT) AS n_h,
             CAST(SUM(CAST(ROUND(c_acctbal * 100.0, 0) AS BIGINT)) AS BIGINT) AS s,
             SUM(CAST(CAST(ROUND(c_acctbal * 100.0, 0) AS BIGINT) AS HUGEINT)
                 * CAST(CAST(ROUND(c_acctbal * 100.0, 0) AS BIGINT) AS HUGEINT)) AS ss
      FROM customer GROUP BY 1
    ), scored AS (
      SELECT stratum, n_h,
             ROUND(CAST(n_h AS DOUBLE)
                   * SQRT(GREATEST((CAST(ss AS DOUBLE)
                           - (CAST(s AS DOUBLE) / CAST(n_h AS DOUBLE))
                             * CAST(s AS DOUBLE)) / CAST(n_h AS DOUBLE), 0.0)), 4)
               AS nh_sh
      FROM strata
    ), tot AS (
      SELECT ROUND(list_aggregate(list(nh_sh ORDER BY stratum), 'sum'), 4) AS t
      FROM scored
    )
    SELECT s.stratum, s.n_h, s.nh_sh,
           CAST(ROUND(500.0 * s.nh_sh / tot.t, 0) AS BIGINT) AS alloc_n
    FROM scored s CROSS JOIN tot
    """,
    tags=("datapipe", "sampling", "neyman"),
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman (optimal) allocation for stratified sampling: a fixed
    budget of 500 samples split across strata ∝ N_h·S_h (stratum size
    × stratum standard deviation) — minimum-variance estimation for a
    fixed cost, the design step BEFORE sample_stratified draws rows
    (proportional allocation wastes budget on large-but-homogeneous
    strata; Neyman spends it where the variance lives).

    Exactness: stratum moments are exact integer cents (128-bit Σx²);
    each N_h·S_h is the pinned variance expression rounded at 4; the
    normalizer folds stratum order; allocations round HALF_UP to
    integers (the oracle's ROUND rides the Spark-exact rewrite).

    Scale shape: one stratum-grain moment aggregate + a 1-row
    normalizer broadcast — the design table costs one scan regardless
    of corpus size."""
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100.0, 0).cast("long")
    strata = c.groupBy(F.col("c_mktsegment").alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum(cents).cast("long").alias("s"),
        F.sum(cents.cast("decimal(38,0)") * cents.cast("decimal(38,0)")).alias("ss"),
    )
    nd = F.col("n_h").cast("double")
    sd = F.col("s").cast("double")
    var = (F.col("ss").cast("double") - (sd / nd) * sd) / nd
    scored = strata.select(
        "stratum",
        "n_h",
        F.round(nd * F.sqrt(F.greatest(var, F.lit(0.0))), 4).alias("nh_sh"),
    )
    arr = F.array_sort(F.collect_list(F.struct("stratum", "nh_sh")))
    tot = scored.agg(
        F.round(
            F.aggregate(
                F.transform(arr, lambda x: x["nh_sh"]), F.lit(0.0), lambda a, x: a + x
            ),
            4,
        ).alias("t")
    )
    return scored.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n_h",
        "nh_sh",
        F.round(F.lit(500.0) * F.col("nh_sh") / F.col("t"), 0)
        .cast("long")
        .alias("alloc_n"),
    )


_SYS_N = 200  # systematic draws


@query(
    "sample_systematic_weighted",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS wt FROM documents
    ), cum AS (
      SELECT doc_id, wt,
             CAST(SUM(wt) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c,
             CAST(COALESCE(SUM(wt) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev
      FROM w
    ), tot AS (
      SELECT CAST(SUM(wt) AS BIGINT) AS tw FROM w
    ), counted AS (
      SELECT doc_id, wt,
             (CASE WHEN 2 * {_SYS_N} * c <= tw THEN 0
                   ELSE CAST(FLOOR(CAST(2 * {_SYS_N} * c - tw AS DOUBLE)
                             / CAST(2 * tw AS DOUBLE)) AS BIGINT) + 1 END)
             - (CASE WHEN 2 * {_SYS_N} * prev <= tw THEN 0
                     ELSE CAST(FLOOR(CAST(2 * {_SYS_N} * prev - tw AS DOUBLE)
                               / CAST(2 * tw AS DOUBLE)) AS BIGINT) + 1 END) AS copies
      FROM cum CROSS JOIN tot
    )
    SELECT doc_id, wt AS weight, CAST(copies AS BIGINT) AS copies
    FROM counted WHERE copies > 0
    """,
    tags=("datapipe", "sampling", "systematic"),
)
def sample_systematic_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic (low-variance) weighted resampling: 200 draw
    positions placed at the exact rational points (2i+1)·W/(2·200)
    along the cumulative-weight axis, each document receiving one copy
    per position inside its weight interval — the resampler particle
    filters and dataset re-balancers use because it guarantees
    copies ∈ [⌊200·w/W⌋, ⌈200·w/W⌉] (zero extra variance), unlike
    independent weighted draws. Deterministic by construction: no RNG
    at all, the draw grid is fixed by the weights.

    Exactness: draw-count-below-c has the closed form
    ⌊(2nc − W)/(2W)⌋ + 1 — all integer products ≪ 2^53, so the double
    FLOOR division is exact; copies are differences of exact integers
    (Σ copies = 200 invariant).

    Scale shape: the cumulative weight axis runs through
    `with_global_cumsum` (operators/ranking.py) — range-partitioned
    per-partition prefix sums + broadcast carry-in offsets, exact for
    the integer weights, bit-identical to the global window — and the
    exclusive prefix is recovered arithmetically (prev = c − wt, two
    exact longs), so ONE distributed pass replaces both windows;
    everything else is per-row arithmetic."""
    from serverless_datalake_spark.operators.ranking import with_global_cumsum

    d = load_table(spark, sf_dir, "documents")
    w = d.select("doc_id", F.col("n_chars").cast("long").alias("wt"))
    cum = with_global_cumsum(w, [F.col("doc_id")], "wt", out="c").select(
        "doc_id",
        "wt",
        "c",
        (F.col("c") - F.col("wt")).cast("long").alias("prev"),
    )
    tot = w.agg(F.sum("wt").cast("long").alias("tw"))

    def g(c):
        num = (F.lit(2 * _SYS_N) * c - F.col("tw")).cast("double")
        return F.when(F.lit(2 * _SYS_N) * c <= F.col("tw"), F.lit(0).cast("long")).otherwise(
            F.floor(num / (F.lit(2).cast("double") * F.col("tw").cast("double"))).cast("long")
            + 1
        )

    counted = cum.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        F.col("wt").alias("weight"),
        (g(F.col("c")) - g(F.col("prev"))).alias("copies"),
    )
    return counted.where(F.col("copies") > 0).select(
        "doc_id", "weight", F.col("copies").cast("long").alias("copies")
    )


@query(
    "mixture_doremi_excess",
    oracle="""
    WITH tok AS (
      SELECT d.source, unnest(list_filter(string_split(d.text, ' '), x -> x <> '')) AS t
      FROM documents d
    ), cnt AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v FROM cnt
    ), lm AS (
      SELECT t, ROUND(ln((CAST(c AS DOUBLE) + 1.0)
                         / (CAST(n AS DOUBLE) + CAST(v AS DOUBLE))), 8) AS lp
      FROM cnt CROSS JOIN tot
    ), st AS (
      SELECT source, t, CAST(COUNT(*) AS BIGINT) AS k FROM tok GROUP BY 1, 2
    ), contrib AS (
      SELECT st.source, st.t, st.k, CAST(st.k AS DOUBLE) * lm.lp AS klp
      FROM st JOIN lm USING (t)
    ), per_source AS (
      SELECT source,
             CAST(SUM(k) AS BIGINT) AS n_tokens,
             ROUND(-list_aggregate(list(klp ORDER BY t), 'sum')
                   / CAST(SUM(k) AS DOUBLE), 6) AS nll
      FROM contrib GROUP BY source
    ), global_nll AS (
      SELECT ROUND(-list_aggregate(list(CAST(c AS DOUBLE) * lp ORDER BY t), 'sum')
                   / CAST(MAX(tot.n) AS DOUBLE), 6) AS g
      FROM cnt JOIN lm USING (t) CROSS JOIN tot
    ), excess AS (
      SELECT s.source, s.n_tokens, s.nll, g.g AS corpus_nll,
             ROUND(GREATEST(s.nll - g.g, 0.0), 6) AS excess
      FROM per_source s CROSS JOIN global_nll g
    ), totx AS (
      SELECT list_aggregate(list(excess ORDER BY source), 'sum') AS te,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM excess
    )
    SELECT e.source, e.n_tokens, e.nll, e.corpus_nll, e.excess,
           CASE WHEN t.te = 0.0 THEN ROUND(1.0 / CAST(t.m AS DOUBLE), 6)
                ELSE ROUND(e.excess / t.te, 6) END AS weight
    FROM excess e CROSS JOIN totx t
    """,
    tags=("datapipe", "mixture", "doremi"),
)
def mixture_doremi_excess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain reweighting by EXCESS LOSS: each source's
    mean unigram NLL under the corpus LM, minus the corpus-wide NLL,
    clipped at zero and normalized — domains the reference model finds
    hardest (positive excess) get upweighted, domains at or below
    corpus difficulty contribute nothing, and an all-zero round falls
    back to uniform. This is the one-round, fixed-reference-LM core
    of DoReMi's Group-DRO loop (the full method iterates this weight
    update against a proxy model; the data-plane part is exactly this
    per-domain excess-loss table).

    Float discipline: per-token log-probs round at 8; per-source and
    corpus NLLs are ordered token-sorted folds rounded at 6; the
    excess normalizer is an ordered source-sorted fold — every double
    on both engines is identical (text_unigram_logprob's discipline
    lifted to source grain).

    Scale shape: one vocabulary count shuffle, one (source, token)
    shuffle, a token-keyed broadcast join of the LM — all reductions
    before any window; the weight table is source-grain (a handful of
    rows at any corpus size). Branches re-reading cnt/excess ride
    AQE's ReusedExchange (identical-keyed subtrees), so the corpus is
    physically tokenized twice, not once per consumer."""
    from serverless_datalake_spark.operators import textops

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(textops.tokens(F.col("text"))).alias("t"))
    # NOT pinned/restructured (round-9 optimization A/B): every branch
    # that re-reads cnt or the (source, token) counts hangs off an
    # identical-keyed exchange, which AQE's ReusedExchange serves from
    # one computation — pinning st+cnt measured 0.97 -> 1.28 s at
    # sf0.1 (materialization > the free reuse).
    cnt = tok.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = cnt.groupBy().agg(
        F.sum("c").cast("long").alias("n"), F.count(F.lit(1)).cast("long").alias("v")
    )
    lm = cnt.crossJoin(F.broadcast(tot)).select(
        "t",
        "c",
        F.round(
            F.log(
                (F.col("c").cast("double") + F.lit(1.0))
                / (F.col("n").cast("double") + F.col("v").cast("double"))
            ),
            8,
        ).alias("lp"),
    )

    def ordered_fold(col_struct_val: str):
        return F.expr(
            f"aggregate(transform(array_sort(collect_list(struct(t, {col_struct_val}))), "
            f"s -> s.{col_struct_val}), CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
        )

    st = tok.groupBy("source", "t").agg(F.count(F.lit(1)).cast("long").alias("k"))
    contrib = st.join(lm.select("t", "lp"), "t").select(
        "source", "t", "k", (F.col("k").cast("double") * F.col("lp")).alias("klp")
    )
    per_source = contrib.groupBy("source").agg(
        F.sum("k").cast("long").alias("n_tokens"),
        F.round(-ordered_fold("klp") / F.sum("k").cast("double"), 6).alias("nll"),
    )
    gl = (
        lm.select("t", (F.col("c").cast("double") * F.col("lp")).alias("klp"))
        .crossJoin(F.broadcast(tot))
        .groupBy()
        .agg(F.round(-ordered_fold("klp") / F.max("n").cast("double"), 6).alias("g"))
    )
    excess = per_source.crossJoin(F.broadcast(gl)).select(
        "source",
        "n_tokens",
        "nll",
        F.col("g").alias("corpus_nll"),
        F.round(F.greatest(F.col("nll") - F.col("g"), F.lit(0.0)), 6).alias("excess"),
    )
    totx = excess.groupBy().agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(source, excess))), "
            "s -> s.excess), CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
        ).alias("te"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    return excess.crossJoin(F.broadcast(totx)).select(
        "source",
        "n_tokens",
        "nll",
        "corpus_nll",
        "excess",
        F.when(F.col("te") == 0.0, F.round(F.lit(1.0) / F.col("m").cast("double"), 6))
        .otherwise(F.round(F.col("excess") / F.col("te"), 6))
        .alias("weight"),
    )


@query(
    "audit_partition_skew",
    oracle="""
    WITH keyed AS (
      SELECT 'event_type' AS key_col, event_type AS k FROM events
      UNION ALL
      SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
      UNION ALL
      SELECT 'event_day', CAST(CAST(ts AS DATE) AS VARCHAR) FROM events
    ), sizes AS (
      SELECT key_col, k, CAST(COUNT(*) AS BIGINT) AS n
      FROM keyed GROUP BY 1, 2
    ), stats AS (
      SELECT key_col,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(n) AS BIGINT) AS n_rows,
             CAST(MAX(n) AS BIGINT) AS max_n
      FROM sizes GROUP BY 1
    )
    SELECT key_col, n_keys, n_rows, max_n,
           ROUND(CAST(max_n AS DOUBLE)
                 / (CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE)), 4)
             AS skew_factor,
           ROUND(CAST(max_n AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS top_share,
           CASE WHEN CAST(max_n AS DOUBLE)
                     / (CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE)) > 4.0
                THEN 'salt-or-aqe' ELSE 'ok' END AS verdict
    FROM stats
    """,
    tags=("datapipe", "audit", "skew"),
)
def audit_partition_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew advisor: for each candidate partitioning key
    of the event stream (type, user, day), the per-key size
    distribution reduced to the two numbers that predict shuffle
    health at 100 TB — skew_factor (largest partition over the mean:
    AQE's skewedPartitionFactor criterion, default 5) and top_share
    (what fraction of ALL rows the hottest key holds — broadcast/salt
    decision input). The verdict column applies the AQE-style
    threshold so layout reviews read one table instead of eyeballing
    histograms; this is the measurement behind every 'salt this key'
    note in SCALE.md.

    Exactness: all counts exact integers; two divisions per row.

    Scale shape: one union scan with partial aggregation per key
    candidate; output is 3 rows regardless of data size."""
    ev = load_table(spark, sf_dir, "events")
    keyed = (
        ev.select(F.lit("event_type").alias("key_col"), F.col("event_type").alias("k"))
        .unionAll(
            ev.select(F.lit("user_id"), F.col("user_id").cast("string"))
        )
        .unionAll(
            ev.select(F.lit("event_day"), F.col("ts").cast("date").cast("string"))
        )
    )
    sizes = keyed.groupBy("key_col", "k").agg(F.count(F.lit(1)).cast("long").alias("n"))
    stats = sizes.groupBy("key_col").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").cast("long").alias("max_n"),
    )
    mean = F.col("n_rows").cast("double") / F.col("n_keys").cast("double")
    skew = F.col("max_n").cast("double") / mean
    return stats.select(
        "key_col",
        "n_keys",
        "n_rows",
        "max_n",
        F.round(skew, 4).alias("skew_factor"),
        F.round(F.col("max_n").cast("double") / F.col("n_rows").cast("double"), 6).alias(
            "top_share"
        ),
        F.when(skew > 4.0, "salt-or-aqe").otherwise("ok").alias("verdict"),
    )


def _curation4_oracle() -> str:
    from serverless_datalake_spark.queries import REGISTRY

    spans = REGISTRY["dedup_ngram_spans"].oracle
    dor = REGISTRY["mixture_doremi_excess"].oracle
    return f"""
    WITH spans AS ({spans}), dor AS ({dor}), gated AS (
      SELECT d.doc_id, d.source
      FROM documents d JOIN spans s ON s.doc_id = d.doc_id
      WHERE s.dup_frac < 0.5
        AND len(list_filter(string_split(d.text, ' '), x -> x <> '')) >= 30
        AND len(list_distinct(list_filter(string_split(d.text, ' '), x -> x <> ''))) * 2
            >= len(list_filter(string_split(d.text, ' '), x -> x <> ''))
    ), per_source AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept FROM gated GROUP BY 1
    )
    SELECT p.source, p.n_kept, w.weight,
           CAST(ROUND(w.weight * 1000.0, 0) AS BIGINT) AS budget_docs
    FROM per_source p JOIN dor w ON w.source = p.source
    """


@query("pipeline_curation4_weighted", oracle=_curation4_oracle(),
       tags=("datapipe", "pipeline", "capstone"))
def pipeline_curation4_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 capstone: the curation DAG wired from this round's
    operators — documents pass the quality gate AND the
    substring-duplication screen (dedup_ngram_spans dup_frac < 0.5),
    survivors roll up per source, and each source receives its
    DoReMi excess-loss mixture weight plus the document budget a
    1000-doc training mix would allocate it. One DAG, three shuffles
    (span fingerprints, source rollup, the LM join inside the weight
    branch) — the shape of a production curation job where gates,
    dedup, and mixture logic share one lineage instead of three
    pipeline hops.

    Exactness: inherits each component's discipline (integer span
    counts, ordered-fold NLLs); the budget is one rounded product.

    Scale shape: see the component queries — nothing here adds a
    corpus-sized structure on top of them."""
    from serverless_datalake_spark.operators import textops
    from serverless_datalake_spark.queries import REGISTRY

    d = load_table(spark, sf_dir, "documents")
    spans = REGISTRY["dedup_ngram_spans"].fn(spark, sf_dir).select("doc_id", "dup_frac")
    dor = REGISTRY["mixture_doremi_excess"].fn(spark, sf_dir).select("source", "weight")
    toks = textops.tokens(F.col("text"))
    gated = (
        d.join(spans, "doc_id")
        .where(
            (F.col("dup_frac") < 0.5)
            & (F.size(toks) >= 30)
            & (F.size(F.array_distinct(toks)) * 2 >= F.size(toks))
        )
        .select("doc_id", "source")
    )
    per_source = gated.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept")
    )
    return per_source.join(F.broadcast(dor), "source").select(
        "source",
        "n_kept",
        "weight",
        F.round(F.col("weight") * 1000.0, 0).cast("long").alias("budget_docs"),
    )


@query(
    "sample_curriculum_stages",
    oracle="""
    WITH staged AS (
      SELECT doc_id, n_chars,
             CAST(NTILE(10) OVER (ORDER BY n_chars, doc_id) AS BIGINT)
               AS stage,
             md5('cur|' || CAST(doc_id AS VARCHAR)) AS skey
      FROM documents
    )
    SELECT doc_id, n_chars, stage,
           CAST(ROW_NUMBER() OVER (ORDER BY stage, skey, doc_id) AS BIGINT)
             AS emit_rank
    FROM staged
    """,
    tags=("llm", "datapipe", "curriculum"),
)
def sample_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-curriculum emission order: documents are staged
    easy→hard by n_chars decile (sequence-length curriculum — the
    cheapest difficulty proxy that demonstrably stabilizes early
    training), and WITHIN each stage the order is a deterministic
    md5 shuffle — curriculum across stages, decorrelated within, and
    bit-reproducible across runs/engines (no RNG state).

    Scale shape at 100 TB: both global orderings run through the
    range-partitioned two-pass primitives (operators/ranking.py) —
    `with_global_ntile` for the decile staging, `with_global_rank`
    for the emission order — each a repartitionByRange + parallel
    per-range windows + broadcast offsets, bit-identical to the
    single-partition spelling the oracle checks. The plan property
    that matters (staging adds no join, emission is one range sort,
    each output partition writable independently) is now what the
    shipped plan actually does, not a documented twin."""
    from serverless_datalake_spark.operators.ranking import (
        with_global_ntile,
        with_global_rank,
    )

    d = load_table(spark, sf_dir, "documents")
    staged = with_global_ntile(
        d.select("doc_id", "n_chars"),
        [F.col("n_chars"), F.col("doc_id")],
        10,
        out="stage",
    ).select(
        "doc_id",
        "n_chars",
        F.col("stage").cast("long"),
        F.md5(F.concat(F.lit("cur|"), F.col("doc_id").cast("string"))).alias(
            "skey"
        ),
    )
    return with_global_rank(
        staged, [F.col("stage"), F.col("skey"), F.col("doc_id")], out="emit_rank"
    ).select(
        "doc_id", "n_chars", "stage", F.col("emit_rank").cast("long")
    )


@query(
    "mixture_caps_floors",
    oracle=f"""
    WITH tok AS (
      SELECT lang, CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens FROM documents
    ), per AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS actual_tokens
      FROM tok GROUP BY lang
    ), shares AS (
      SELECT lang, n_docs, actual_tokens,
             CAST(actual_tokens AS DOUBLE)
               / CAST(SUM(actual_tokens) OVER () AS DOUBLE) AS raw_share
      FROM per
    ), clipped AS (
      SELECT lang, n_docs, actual_tokens, raw_share,
             CASE WHEN raw_share > 0.30 THEN 'cap'
                  WHEN raw_share < 0.14 THEN 'floor'
                  ELSE 'free' END AS clip,
             CASE WHEN raw_share > 0.30 THEN 0.30
                  WHEN raw_share < 0.14 THEN 0.14
                  ELSE raw_share END AS clip_share
      FROM shares
    ), mass AS (
      SELECT lang, n_docs, actual_tokens, raw_share, clip, clip_share,
             SUM(CASE WHEN clip <> 'free' THEN clip_share ELSE 0.0 END)
               OVER () AS fixed_mass,
             SUM(CASE WHEN clip = 'free' THEN raw_share ELSE 0.0 END)
               OVER () AS free_raw
      FROM clipped
    )
    SELECT lang, n_docs, actual_tokens,
           ROUND(raw_share, 6) AS raw_share,
           clip,
           ROUND(CASE WHEN clip = 'free'
                      THEN raw_share * ((1.0 - fixed_mass) / free_raw)
                      ELSE clip_share END, 6) AS final_share
    FROM mass
    """,
    tags=("llm", "datapipe", "mixture"),
)
def mixture_caps_floors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture shares under per-domain caps and floors: raw token
    shares are clipped to [0.14, 0.30] and the remaining mass is
    redistributed PROPORTIONALLY over the unclipped domains — the
    guardrail every production mixture applies on top of its ideal
    weights (a cap bounds epoching of a dominant domain; a floor
    keeps minority domains from vanishing). Single closed-form
    redistribution round (the fully-iterated waterfall re-clips until
    stable; on this corpus the scaled free shares stay inside the
    band, and a production run would iterate the same closed form —
    each round is one window pass over GROUP-cardinality rows). If
    clipping ever fixes EVERY domain, the emitted shares stop summing
    to 1 — that is the infeasibility signal (cap·n_capped +
    floor·n_floored ≠ 1 has no valid mixture), surfaced rather than
    hidden by renormalizing the caps away.

    Scale shape: one token-count scan + partial-agg shuffle onto
    group rows; every window after that runs on the handful of
    domain rows. Deterministic: shares derive from exact integer
    token sums and one fixed expression tree."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("lang", F.size(_toks_col()).cast("long").alias("n_tokens"))
    per = tok.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("actual_tokens"),
    )
    w = Window.partitionBy()
    shares = per.select(
        "*",
        (
            F.col("actual_tokens").cast("double")
            / F.sum("actual_tokens").over(w).cast("double")
        ).alias("raw_share"),
    )
    clip = (
        F.when(F.col("raw_share") > 0.30, "cap")
        .when(F.col("raw_share") < 0.14, "floor")
        .otherwise("free")
    )
    clip_share = (
        F.when(F.col("raw_share") > 0.30, F.lit(0.30))
        .when(F.col("raw_share") < 0.14, F.lit(0.14))
        .otherwise(F.col("raw_share"))
    )
    c = shares.select("*", clip.alias("clip"), clip_share.alias("clip_share"))
    fixed_mass = F.sum(
        F.when(F.col("clip") != "free", F.col("clip_share")).otherwise(0.0)
    ).over(w)
    free_raw = F.sum(
        F.when(F.col("clip") == "free", F.col("raw_share")).otherwise(0.0)
    ).over(w)
    m = c.select("*", fixed_mass.alias("fixed_mass"), free_raw.alias("free_raw"))
    return m.select(
        "lang",
        "n_docs",
        "actual_tokens",
        F.round("raw_share", 6).alias("raw_share"),
        "clip",
        F.round(
            F.when(
                F.col("clip") == "free",
                F.col("raw_share")
                * ((F.lit(1.0) - F.col("fixed_mass")) / F.col("free_raw")),
            ).otherwise(F.col("clip_share")),
            6,
        ).alias("final_share"),
    )


@query(
    "pipeline_dedup_impact",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             md5(lower(trim(text))) AS fp,
             CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens
      FROM documents
    ), survivors AS (
      SELECT fp, MIN(doc_id) AS keep_id FROM toks GROUP BY fp
    ), marked AS (
      SELECT t.lang, t.n_tokens,
             CASE WHEN s.keep_id = t.doc_id THEN 1 ELSE 0 END AS kept
      FROM toks t JOIN survivors s ON s.fp = t.fp
    ), per AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS docs_before,
             CAST(SUM(kept) AS BIGINT) AS docs_after,
             CAST(SUM(n_tokens) AS BIGINT) AS tokens_before,
             CAST(SUM(kept * n_tokens) AS BIGINT) AS tokens_after
      FROM marked GROUP BY 1
    )
    SELECT lang, docs_before, docs_after, tokens_before, tokens_after,
           ROUND(CAST(tokens_before AS DOUBLE)
                 / CAST(SUM(tokens_before) OVER () AS DOUBLE), 6)
             AS share_before,
           ROUND(CAST(tokens_after AS DOUBLE)
                 / CAST(SUM(tokens_after) OVER () AS DOUBLE), 6)
             AS share_after,
           ROUND(CAST(tokens_after AS DOUBLE)
                 / CAST(SUM(tokens_after) OVER () AS DOUBLE)
                 - CAST(tokens_before AS DOUBLE)
                   / CAST(SUM(tokens_before) OVER () AS DOUBLE), 6)
             AS share_delta
    FROM per
    """,
    tags=("llm", "datapipe", "dedup", "mixture", "audit"),
)
def pipeline_dedup_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation accounting: what exact dedup DOES to the language
    mixture — per language, doc/token counts before vs after
    fingerprint dedup and the resulting token-share shift. Duplicates
    never distribute uniformly (crawl boilerplate concentrates in
    dominant languages), so any dedup stage silently moves the
    mixture; this is the report that catches a 2-point share swing
    BEFORE mixture weights (mixture_weights / mixture_caps_floors)
    are fit on the deduped corpus — chain them: dedup → impact
    report → weight fit.

    Scale shape: one fingerprint hash-agg shuffle (the dedup_exact
    cost), one fp-keyed survivor join, one partial-agg onto language
    rows; share windows run on group rows. Exact integer token sums
    throughout."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp"),
        F.size(_toks_col()).cast("long").alias("n_tokens"),
    )
    survivors = toks.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    marked = toks.join(survivors, "fp").select(
        "lang",
        "n_tokens",
        F.when(F.col("keep_id") == F.col("doc_id"), 1).otherwise(0).alias("kept"),
    )
    per = marked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs_before"),
        F.sum("kept").cast("long").alias("docs_after"),
        F.sum("n_tokens").alias("tokens_before"),
        F.sum(F.col("kept") * F.col("n_tokens")).alias("tokens_after"),
    )
    w = Window.partitionBy()
    sb = F.col("tokens_before").cast("double") / F.sum("tokens_before").over(w).cast("double")
    sa = F.col("tokens_after").cast("double") / F.sum("tokens_after").over(w).cast("double")
    return per.select(
        "lang",
        "docs_before",
        "docs_after",
        "tokens_before",
        "tokens_after",
        F.round(sb, 6).alias("share_before"),
        F.round(sa, 6).alias("share_after"),
        F.round(sa - sb, 6).alias("share_delta"),
    )


# ---------------------------------------------------------------------------
# Importance resampling (DSIR) and leakage-free splitting


@query(
    "sample_dsir_importance",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang,
             ((strpos('0123456789abcdef', substr(md5(t), 1, 1)) - 1) * CAST(268435456 AS BIGINT)
            + (strpos('0123456789abcdef', substr(md5(t), 2, 1)) - 1) * CAST(16777216 AS BIGINT)
            + (strpos('0123456789abcdef', substr(md5(t), 3, 1)) - 1) * CAST(1048576 AS BIGINT)
            + (strpos('0123456789abcdef', substr(md5(t), 4, 1)) - 1) * CAST(65536 AS BIGINT)
            + (strpos('0123456789abcdef', substr(md5(t), 5, 1)) - 1) * CAST(4096 AS BIGINT)
            + (strpos('0123456789abcdef', substr(md5(t), 6, 1)) - 1) * CAST(256 AS BIGINT)
            + (strpos('0123456789abcdef', substr(md5(t), 7, 1)) - 1) * CAST(16 AS BIGINT)
            + (strpos('0123456789abcdef', substr(md5(t), 8, 1)) - 1)) % 256 AS b
      FROM (
        SELECT doc_id, lang,
               unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
        FROM documents
      )
    ), qc AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS cq FROM tok GROUP BY 1
    ), pc AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS cp FROM tok WHERE lang = 'en' GROUP BY 1
    ), tots AS (
      SELECT (SELECT CAST(SUM(cq) AS BIGINT) FROM qc) AS nq,
             (SELECT CAST(COALESCE(SUM(cp), 0) AS BIGINT) FROM pc) AS np
    ), llr AS (
      SELECT q.b,
             ROUND(ln((CAST(COALESCE(p.cp, 0) AS DOUBLE) + 1.0)
                      / (CAST(t.np AS DOUBLE) + 256.0)), 8)
             - ROUND(ln((CAST(q.cq AS DOUBLE) + 1.0)
                        / (CAST(t.nq AS DOUBLE) + 256.0)), 8) AS w
      FROM qc q LEFT JOIN pc p USING (b) CROSS JOIN tots t
    ), db AS (
      SELECT doc_id, lang, b, CAST(COUNT(*) AS BIGINT) AS k
      FROM tok GROUP BY 1, 2, 3
    ), contrib AS (
      SELECT db.doc_id, db.lang, db.b, db.k, CAST(db.k AS DOUBLE) * llr.w AS kw
      FROM db JOIN llr USING (b)
    ), scored AS (
      SELECT doc_id, lang,
             CAST(SUM(k) AS BIGINT) AS n_tokens,
             ROUND(list_aggregate(list(kw ORDER BY b), 'sum'), 6) AS logw
      FROM contrib GROUP BY 1, 2
    )
    SELECT doc_id, lang, n_tokens, logw,
           CAST(CASE WHEN NTILE(5) OVER (ORDER BY logw DESC, doc_id) = 1
                THEN 1 ELSE 0 END AS BIGINT) AS selected
    FROM scored
    """,
    tags=("llm", "datapipe", "sampling", "dsir"),
)
def sample_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    2023): score every raw document by how target-like its hashed
    n-gram distribution is — log importance weight
    sum_b k_b * (ln p_target(b) - ln q_raw(b)) over B=256 hashed
    unigram buckets (Laplace-smoothed), here with the English subset
    standing in for the target domain. The top importance quintile is
    flagged `selected` — the resampling pool a DSIR pipeline would
    draw from. Hashing into a fixed bucket count is what makes the
    method corpus-size-independent: the "LM" is 256 floats per side
    regardless of vocabulary.

    Cross-engine float discipline (the text_unigram_logprob
    precedent): per-bucket log-ratios rounded at 8 decimals, per-doc
    contributions summed as an ORDERED fold over the bucket-sorted
    list, final weight rounded at 6.

    Scale shape: TWO tokenize passes — one aggregated to the pinned
    ≤256×n_langs (bucket, lang) relation that derives both LM count
    sides (broadcast back), one to the (doc, bucket) counts — a
    per-doc fold bounded by 256, no corpus-sized state anywhere; the exact
    NTILE(5) selection runs through `with_global_ntile`
    (operators/ranking.py) — range-partitioned two-pass rank, no
    single-task sort at doc grain, bit-identical to the global
    window the oracle expresses."""
    from serverless_datalake_spark.operators.dedup import md5_key32

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "lang",
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("t"),
    ).select("doc_id", "lang", (md5_key32(F.col("t")) % 256).alias("b"))
    # ONE (bucket, lang) aggregate feeds BOTH LM count relations (sums
    # of per-lang counts are the same integers the direct counts
    # were): qc and pc differ only by the en filter, whose pushed-down
    # predicate made their subtrees distinct — no exchange reuse, two
    # full explode+md5 passes. bl is ≤ 256 × n_langs rows, so the pin
    # is free and saves a whole corpus pass. (Pinning the far larger
    # (doc, bucket) relation instead measured SLOWER at sf0.1 — 2.34
    # -> 2.77 s — the round-9 A/B; the materialization exceeded the
    # saved rescan.)
    bl = _pin(tok.groupBy("b", "lang").agg(F.count(F.lit(1)).alias("k")))
    qc = bl.groupBy("b").agg(F.sum("k").alias("cq"))
    pc = bl.where(F.col("lang") == "en").groupBy("b").agg(
        F.sum("k").alias("cp")
    )
    tots = qc.agg(F.sum("cq").alias("nq")).crossJoin(
        pc.agg(F.coalesce(F.sum("cp"), F.lit(0)).alias("np"))
    )
    llr = (
        qc.join(pc, "b", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "b",
            (
                F.round(
                    F.log(
                        (F.coalesce(F.col("cp"), F.lit(0)).cast("double") + F.lit(1.0))
                        / (F.col("np").cast("double") + F.lit(256.0))
                    ),
                    8,
                )
                - F.round(
                    F.log(
                        (F.col("cq").cast("double") + F.lit(1.0))
                        / (F.col("nq").cast("double") + F.lit(256.0))
                    ),
                    8,
                )
            ).alias("w"),
        )
    )
    db = tok.groupBy("doc_id", "lang", "b").agg(F.count(F.lit(1)).alias("k"))
    contrib = db.join(llr, "b").select(
        "doc_id", "lang", "b", F.col("k").cast("long").alias("k"),
        (F.col("k").cast("double") * F.col("w")).alias("kw"),
    )
    arr = F.array_sort(F.collect_list(F.struct(F.col("b"), F.col("kw"))))
    folded = F.aggregate(
        F.transform(arr, lambda x: x["kw"]), F.lit(0.0), lambda a, x: a + x
    )
    # input pinned: with_global_ntile's repartitionByRange samples its
    # child, which would re-run the (doc, bucket) contribution join +
    # ordered fold a second time without the pin (the
    # ts_concurrency_sweep measurement)
    scored = contrib.groupBy("doc_id", "lang").agg(
        F.sum("k").cast("long").alias("n_tokens"),
        F.round(folded, 6).alias("logw"),
    ).transform(_pin)
    from serverless_datalake_spark.operators.ranking import with_global_ntile

    return with_global_ntile(
        scored, [F.col("logw").desc(), F.col("doc_id")], 5, out="__q"
    ).select(
        "doc_id", "lang", "n_tokens", "logw",
        F.when(F.col("__q") == 1, 1).otherwise(0).cast("long").alias("selected"),
    )


def _leakage_free_split_oracle() -> str:
    """Connected components of the LSH bucket graph (the
    dedup_minhash_components recursion, verbatim) + a deterministic
    md5-of-representative split so every near-dup cluster lands on ONE
    side."""
    from serverless_datalake_spark.queries.llm_dedup import _hex8_int, _minhash_ctes

    rep_m = _hex8_int("substr(md5(CAST(rep AS VARCHAR)), 1, 8)")
    return f"""
    WITH RECURSIVE {_minhash_ctes()},
    edges AS (
      SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
      FROM membership a
      JOIN membership b ON a.band_id = b.band_id AND a.band_val = b.band_val
      WHERE a.doc_id <> b.doc_id
    ),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM sigs
      UNION
      SELECT reach.id, e.v FROM reach JOIN edges e ON e.u = reach.r
    ),
    comp AS (
      SELECT id AS doc_id, MIN(r) AS rep FROM reach GROUP BY id
    ),
    assign AS (
      SELECT doc_id, rep,
             CASE WHEN m <= 7 THEN 'train'
                  WHEN m = 8 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT doc_id, rep, {rep_m} % 10 AS m FROM comp)
    ),
    cl AS (
      SELECT split, rep, CAST(COUNT(*) AS BIGINT) AS sz
      FROM assign GROUP BY 1, 2
    )
    SELECT split,
           CAST(SUM(sz) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(MAX(sz) AS BIGINT) AS max_cluster_size,
           ROUND(CAST(SUM(sz) AS DOUBLE)
                 / CAST(SUM(SUM(sz)) OVER () AS DOUBLE), 6) AS doc_share
    FROM cl GROUP BY split
    """


@query(
    "split_leakage_free",
    oracle=_leakage_free_split_oracle(),
    tags=("llm", "datapipe", "split", "dedup"),
)
def split_leakage_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/val/test split: assign each NEAR-DUP CLUSTER
    (MinHash-LSH connected components, the dedup_minhash_components
    recursion) to one side by hashing its representative — so a
    document and its near-duplicates can never straddle the train/test
    boundary (the contamination mode plain hash-of-doc_id splits like
    split_train_test cannot prevent: two 95%-identical docs hash
    independently). 80/10/10 via md5(rep) % 10. Emits per-split doc
    and cluster counts plus the largest cluster — the skew a split
    audit watches (one giant near-dup cluster can unbalance the
    split).

    Leakage-freedom is structural, not statistical: split is a
    function of the cluster representative, so every member of a
    cluster inherits the same side by construction.

    Scale shape: components cost = dedup_minhash_components (pointer-
    jumping label propagation, localCheckpoint-truncated lineage); the
    split assignment and rollup add one cluster-grain aggregate and a
    3-row window — noise next to the signature pass. The same
    rep-hash rule runs incrementally: new documents joining an
    existing cluster inherit its side without re-splitting history."""
    from serverless_datalake_spark.operators import dedup
    from serverless_datalake_spark.operators.dedup import md5_key32

    d = load_table(spark, sf_dir, "documents")
    comp = dedup.minhash_dedup_components(d, "doc_id", "text", bands=8, k=1)
    m = md5_key32(F.col("cluster_rep").cast("string")) % 10
    assign = comp.select(
        "doc_id",
        F.col("cluster_rep").alias("rep"),
        F.when(m <= 7, "train").when(m == 8, "val").otherwise("test").alias("split"),
    )
    cl = assign.groupBy("split", "rep").agg(F.count(F.lit(1)).alias("sz"))
    out = cl.groupBy("split").agg(
        F.sum("sz").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.max("sz").cast("long").alias("max_cluster_size"),
    )
    return out.select(
        "split",
        "n_docs",
        "n_clusters",
        "max_cluster_size",
        F.round(
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(Window.partitionBy()).cast("double"),
            6,
        ).alias("doc_share"),
    )


@query(
    "privacy_t_closeness",
    oracle="""
    WITH cells AS (
      SELECT CAST(FLOOR(EPOCH(CAST(time_bucket(INTERVAL '1 day', ts) AS TIMESTAMP))) AS BIGINT)
               AS day_start,
             CAST(user_id % 10 AS BIGINT) AS user_bucket,
             event_type,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2, 3
    ), gdist AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS g FROM events GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(g) AS BIGINT) AS n FROM gdist
    ), kg AS (
      SELECT day_start, user_bucket, CAST(SUM(c) AS BIGINT) AS k
      FROM cells GROUP BY 1, 2
    ), terms AS (
      SELECT c.day_start, c.user_bucket, kg.k, tot.n,
             ABS(CAST(c.c AS HUGEINT) * tot.n - CAST(gdist.g AS HUGEINT) * kg.k)
               AS term,
             CAST(gdist.g AS HUGEINT) AS g
      FROM cells c
      JOIN gdist USING (event_type)
      JOIN kg ON kg.day_start = c.day_start AND kg.user_bucket = c.user_bucket
      CROSS JOIN tot
    )
    SELECT day_start, user_bucket, CAST(k AS BIGINT) AS k,
           ROUND(CAST(SUM(term) + CAST(k AS HUGEINT) * (n - SUM(g)) AS DOUBLE)
                 / (2.0 * CAST(k AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS t_dist,
           CAST(SUM(term) + CAST(k AS HUGEINT) * (n - SUM(g)) AS DOUBLE)
                 / (2.0 * CAST(k AS DOUBLE) * CAST(n AS DOUBLE)) > 0.3
             AS exceeds_t
    FROM terms GROUP BY day_start, user_bucket, k, n
    """,
    tags=("privacy", "governance", "t-closeness"),
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — completes the k-anonymity / l-diversity
    trio: a cell is unsafe if its SENSITIVE-VALUE DISTRIBUTION
    diverges from the global one (skewness attack: a cell can be
    large AND diverse yet 90% one disease). Distance is total
    variation (the categorical EMD): t = ½ Σ_v |p_cell(v) − p_glob(v)|,
    computed EXACTLY as integer arithmetic — ½ Σ|c_v·N − g_v·k|/(k·N)
    — with the absent-value mass folded in algebraically
    (Σ_{v∉cell} g_v·k = k·(N − Σ_{v∈cell} g_v)), so the sensitive
    domain is never expanded per cell. Cells with t > 0.3 are flagged.

    Scale shape: one shuffle to cell-grain counts, a broadcast join
    of the (tiny) global sensitive-value table, one grid-grain
    re-aggregate. Numerators accumulate in DECIMAL(38,0) (DuckDB
    HUGEINT) — exact past 100 TB row counts; the single division and
    threshold evaluate identically in both engines."""
    e = load_table(spark, sf_dir, "events")
    qi = [
        F.window("ts", "1 day").alias("w"),
        (F.col("user_id") % 10).cast("long").alias("user_bucket"),
    ]
    cells = e.groupBy(qi[0], qi[1], F.col("event_type")).agg(
        F.count(F.lit(1)).alias("c")
    )
    glob = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("g"))
    tot = glob.groupBy().agg(F.sum("g").alias("n"))
    kg = cells.groupBy("w", "user_bucket").agg(F.sum("c").alias("k"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    terms = (
        cells.join(F.broadcast(glob), "event_type")
        .join(kg, ["w", "user_bucket"])
        .crossJoin(F.broadcast(tot))
        .select(
            "w",
            "user_bucket",
            "k",
            "n",
            F.abs(dec("c") * dec("n") - dec("g") * dec("k")).alias("term"),
            dec("g").alias("gd"),
        )
    )
    agg = terms.groupBy("w", "user_bucket", "k", "n").agg(
        F.sum("term").alias("sterm"), F.sum("gd").alias("sg")
    )
    t_num = (F.col("sterm") + dec("k") * (dec("n") - F.col("sg"))).cast("double")
    t = t_num / (2.0 * F.col("k").cast("double") * F.col("n").cast("double"))
    return agg.select(
        F.col("w.start").cast("long").alias("day_start"),
        "user_bucket",
        F.col("k").cast("long").alias("k"),
        F.round(t, 6).alias("t_dist"),
        (t > 0.3).alias("exceeds_t"),
    )
