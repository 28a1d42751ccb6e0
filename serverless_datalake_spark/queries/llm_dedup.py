"""Deduplication queries over `documents` / `embeddings` (north star).
Implementations in operators/dedup.py and operators/similarity.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_spark.operators import dedup, similarity
from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_table


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(lower(trim(text))) AS fp,
           MIN(doc_id) AS survivor_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    tags=("llm", "dedup"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the normalized-content fingerprint
    with a deterministic survivor. One shuffle on the hash — the
    canonical 100 TB exact-dedup plan."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.exact_dedup_survivors(d, "doc_id", "text")


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_distinct(list_filter(string_split(text, ' '), t -> t <> '')) AS toks
      FROM documents WHERE doc_id < 80
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                 / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 4) AS jaccard
    FROM toks a JOIN toks b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
          / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.4
    """,
    tags=("llm", "dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force token-set Jaccard pairs (restricted to doc_id < 80
    — all-pairs is the correctness baseline, not the scale path; the
    scale path is dedup_minhash_lsh below, verified against this)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 80)
    return dedup.ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.4)


@query(
    "dedup_minhash_lsh",
    oracle=None,  # LSH candidate recall is probabilistic → rows-only;
    # tests/test_operators.py asserts candidates ⊇ brute-force pairs.
    tags=("llm", "dedup", "minhash"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + LSH(8 bands × 8) near-dup clustering: every doc
    assigned min-doc_id cluster representative over its LSH buckets,
    NO pair join — linear output even on self-similar corpora (the
    fixture has ~24% of all pairs at J≥0.8; enumerating them is
    inherently quadratic, so the headline operator clusters instead;
    pair enumeration with exact-Jaccard verify remains available as
    operators/dedup.minhash_near_dups and is property-tested against
    brute force). k=1 shingles: the fixture text is unordered word
    soup, so signatures estimate token-set Jaccard. 8×8 banding puts
    the S-curve midpoint at (1/8)^(1/8) ≈ 0.77 — clusters form at
    J ≳ 0.8, matching the pair queries' threshold."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.minhash_dedup_survivors(d, "doc_id", "text", bands=8, k=1)


@query(
    "dedup_minhash_components",
    oracle=None,  # bucket-graph closure is index-specific → rows-only;
    # tests/test_operators.py verifies against a python union-find.
    tags=("llm", "dedup", "minhash", "components"),
)
def dedup_minhash_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive-closure near-dup clustering: label propagation to
    fixpoint over the LSH bucket graph — the full connected-components
    answer the single-pass variant approximates (chain A~B~C collapses
    even when A,C never share a bucket)."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.minhash_dedup_components(d, "doc_id", "text", bands=8, k=1)


@query(
    "dedup_simhash",
    oracle=None,  # signature banding is engine-specific → rows-only
    tags=("llm", "dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(32-bit) near-dup pairs within Hamming distance 3,
    found via pigeonhole chunk banding (4 × 8-bit chunks)."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.simhash_near_dups(d, "doc_id", "text", max_hamming=3)


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id % 5 = 0
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_aggregate(list_transform(list_zip(a.emb, b.emb),
                            p -> p[1] * p[2]), 'sum')
             / (SQRT(list_aggregate(list_transform(a.emb, x -> x * x), 'sum'))
                * SQRT(list_aggregate(list_transform(b.emb, x -> x * x), 'sum'))) AS cs
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, ROUND(cs, 6) AS cos_sim
    FROM pairs WHERE cs >= 0.3
    """,
    tags=("llm", "dedup", "embedding"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (sampled subset — brute force
    is the oracle-verifiable baseline; the scale path pre-buckets with
    operators/similarity.lsh_bucket)."""
    em = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 5 == 0)
    return similarity.embedding_near_dup_pairs(em, "vec_id", "embedding", threshold=0.3)
