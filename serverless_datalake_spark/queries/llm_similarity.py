"""Similarity-search queries over `embeddings` (north star):
brute-force cosine top-k (oracle-verified baseline), LSH-bucketed and
IVF approximate variants (rows-only; recall asserted in tests)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_spark.operators import similarity
from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_table


def _split(spark: SparkSession, sf_dir: str):
    em = load_table(spark, sf_dir, "embeddings")
    queries = em.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = em.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("corpus_id"), "embedding"
    )
    return queries, corpus


@query(
    "sim_topk_bruteforce",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id < 10
    ), c AS (
      SELECT vec_id AS corpus_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id >= 10
    ), scored AS (
      SELECT q.query_id, c.corpus_id,
             list_aggregate(list_transform(list_zip(q.emb, c.emb),
                            p -> p[1] * p[2]), 'sum')
             / (SQRT(list_aggregate(list_transform(q.emb, x -> x * x), 'sum'))
                * SQRT(list_aggregate(list_transform(c.emb, x -> x * x), 'sum'))) AS score
      FROM q CROSS JOIN c
    ), ranked AS (
      SELECT query_id, corpus_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, corpus_id) AS rank
      FROM scored
    )
    SELECT query_id, corpus_id, ROUND(score, 6) AS score, rank
    FROM ranked WHERE rank <= 5
    """,
    tags=("llm", "similarity", "topk"),
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for 10 query vectors: broadcast
    queries × one corpus scan; the ANN baseline every approximate
    index is measured against."""
    queries, corpus = _split(spark, sf_dir)
    return similarity.topk_bruteforce(queries, corpus, k=5)


@query(
    "sim_topk_lsh",
    oracle=None,  # bucket recall is probabilistic → rows-only check;
    # tests assert bucket-restricted results ⊆ brute-force scores.
    tags=("llm", "similarity", "ann"),
)
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH: 8 deterministic hyperplanes →
    256 buckets; a query scans only its own bucket (partition-pruned
    at rest when the corpus is written partitionBy(bucket))."""
    queries, corpus = _split(spark, sf_dir)
    return similarity.topk_lsh(queries, corpus, k=5, n_planes=8, dim=64)


@query(
    "sim_topk_lsh_multiprobe",
    oracle=None,  # probe set is index-specific → rows-only check;
    # tests assert recall >= single-probe and scores ⊆ exact.
    tags=("llm", "similarity", "ann"),
)
def sim_topk_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe ANN: own bucket + all Hamming-1 neighbors (9 probes
    of 256 buckets) — recovers boundary-vector recall without growing
    the index."""
    queries, corpus = _split(spark, sf_dir)
    return similarity.topk_lsh_multiprobe(queries, corpus, k=5, n_planes=8, dim=64)


@query(
    "sim_topk_ivf",
    oracle=None,  # probe set is index-specific → rows-only check
    tags=("llm", "similarity", "ann"),
)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via IVF: label-group centroids, nprobe=2 — the scan reads
    ~2/k_centroids of the corpus instead of all of it."""
    queries, corpus = _split(spark, sf_dir)
    em = load_table(spark, sf_dir, "embeddings")
    corpus_lab = em.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("corpus_id"), "embedding", "label"
    )
    return similarity.topk_ivf(queries, corpus_lab, k=5, nprobe=2)
