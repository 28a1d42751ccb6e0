"""Lloyd's refinement of the PQ codebooks (operators.similarity
.pq_codebook refine_iters): quantization error on the training sample
must not increase (each Lloyd step reassigns to the nearest code and
recenters — both SSE-non-increasing), and in practice the refined
codebook must beat sample initialization by a clear margin. Recall@k
against the exact brute-force neighbors must not degrade."""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_datalake_spark.operators import similarity
from serverless_datalake_spark.operators.similarity import (
    _as_double,
    _explode_subspaces,
    pq_codebook,
)
from serverless_datalake_spark.tables import load_table

M, D = 8, 8


def _split(spark, sf_dir):
    em = load_table(spark, sf_dir, "embeddings")
    q = em.where(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "embedding")
    c = em.where(F.col("vec_id") >= 10).select(F.col("vec_id").alias("corpus_id"), "embedding")
    return q, c


def _train_sse(corpus, cb, sample_n: int = 128) -> float:
    """Sum over the training sample's subvectors of the squared L2
    distance to their nearest code — the quantity Lloyd's minimizes."""
    sample = (
        corpus.select(F.col("corpus_id"), _as_double(F.col("embedding")).alias("__v"))
        .orderBy("corpus_id")
        .limit(sample_n)
    )
    smp = _explode_subspaces(sample, "corpus_id", "__v", M, D, "sub_vec")
    dist = F.aggregate(
        F.zip_with("sub_vec", "code_vec", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return (
        smp.join(F.broadcast(cb), "s")
        .select("corpus_id", "s", dist.alias("d"))
        .groupBy("corpus_id", "s")
        .agg(F.min("d").alias("md"))
        .agg(F.sum("md"))
        .collect()[0][0]
    )


def test_refinement_reduces_quantization_error(spark, sf_dir):
    _, c = _split(spark, sf_dir)
    sse = {
        it: _train_sse(c, pq_codebook(c, "corpus_id", "embedding", refine_iters=it))
        for it in (0, 1, 2)
    }
    # monotone non-increasing per Lloyd step…
    assert sse[1] <= sse[0] + 1e-9
    assert sse[2] <= sse[1] + 1e-9
    # …and a clear win over sample initialization (not a no-op)
    assert sse[2] < sse[0] * 0.95


def test_refinement_does_not_degrade_recall(spark, sf_dir):
    q, c = _split(spark, sf_dir)
    truth = {(r.query_id, r.corpus_id) for r in similarity.topk_bruteforce(q, c, k=5).collect()}

    def recall(iters: int) -> float:
        got = {
            (r.query_id, r.corpus_id)
            for r in similarity.topk_pq(q, c, k=5, refine_iters=iters).collect()
        }
        return len(got & truth) / len(truth)

    assert recall(2) >= recall(0)
