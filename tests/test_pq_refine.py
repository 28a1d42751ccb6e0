"""Lloyd's refinement of the PQ codebooks (operators.similarity
.pq_codebook refine_iters): quantization error on the training sample
must not increase (each Lloyd step reassigns to the nearest code and
recenters — both SSE-non-increasing), and in practice the refined
codebook must beat sample initialization by a clear margin. Recall@k
against the exact brute-force neighbors must not degrade."""

from __future__ import annotations

import os

import pytest
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


def _split_lab(spark, sf_dir):
    em = load_table(spark, sf_dir, "embeddings")
    q = em.where(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "embedding")
    c = em.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("corpus_id"), "embedding", "label"
    )
    return q, c


def test_ivf_refinement_objective_monotone(spark, sf_dir):
    """Spherical k-means: Σ max_c cos(x, c) over the training sample is
    non-decreasing per assignment+mean round (cosine is scale-invariant
    so the unnormalized mean attains the unit-mean's objective)."""
    from serverless_datalake_spark.operators.similarity import ivf_centroids_refined

    _, c = _split_lab(spark, sf_dir)

    def objective(cents) -> float:
        sample = (
            c.select("corpus_id", _as_double(F.col("embedding")).alias("__v"))
            .orderBy("corpus_id")
            .limit(256)
        )
        sc = sample.crossJoin(F.broadcast(cents)).select(
            "corpus_id", similarity.cosine(F.col("__v"), F.col("centroid")).alias("cs")
        )
        return (
            sc.groupBy("corpus_id").agg(F.max("cs").alias("m")).agg(F.sum("m")).collect()[0][0]
        )

    obj = {it: objective(ivf_centroids_refined(c, refine_iters=it)) for it in (0, 1, 2)}
    assert obj[1] >= obj[0] - 1e-9
    assert obj[2] >= obj[1] - 1e-9
    # and a clear win over the medoid initialization (not a no-op)
    assert obj[2] > obj[0] * 1.05


@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.01"), reason="sf0.01 fixtures absent"
)
def test_ivf_refinement_improves_recall_sf001():
    """Recall@5 (nprobe=2) with refined centroids vs label-medoid init.
    Pinned to sf0.01: at sf0.001 the 50-pair sample is too noisy to
    rank variants (±0.06), while at sf0.01 refinement lifts recall
    0.20 → 0.28 and at sf0.1 0.52 → 0.54."""
    from serverless_datalake_spark.operators.similarity import ivf_centroids_refined
    from serverless_datalake_spark.session import get_spark

    spark = get_spark(app_name="tests", shuffle_partitions=8)
    sf_dir = "/root/testdata/sf0.01"
    q, c = _split_lab(spark, sf_dir)
    truth = {
        (r.query_id, r.corpus_id)
        for r in similarity.topk_bruteforce(q, c.drop("label"), k=5).collect()
    }

    def recall(iters: int) -> float:
        cents = ivf_centroids_refined(c, refine_iters=iters)
        got = {
            (r.query_id, r.corpus_id)
            for r in similarity.topk_ivf(q, c, k=5, nprobe=2, centroids=cents).collect()
        }
        return len(got & truth) / len(truth)

    assert recall(2) >= recall(0)


def test_residual_pq_reconstructs_better_than_plain(spark, sf_dir):
    """Residual IVF-PQ (encode x − centroid) must reconstruct strictly
    better than plain PQ for the same code budget; recall must not
    degrade. The fixture embeddings are near-uniform (weak clusters,
    centroid norms ≈ 0.32) so the margin is modest here; on clustered
    corpora it grows with cluster tightness."""
    from serverless_datalake_spark.operators.similarity import (
        ivf_assign_expr,
        ivf_centroid_vec_expr,
        ivf_centroids_refined,
        pq_codebook,
        pq_reconstruct_expr,
        pq_residual_codebook,
    )

    em = load_table(spark, sf_dir, "embeddings")
    c = em.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("corpus_id"), "embedding", "label"
    )
    cent_rows = ivf_centroids_refined(c).collect()
    cb_rows = pq_codebook(c, "corpus_id", "embedding").collect()
    rcb_rows = pq_residual_codebook(
        c, "corpus_id", "embedding", centroid_rows=cent_rows
    ).collect()
    cd = c.select("corpus_id", _as_double(F.col("embedding")).alias("__v"))

    def err(av):
        return F.aggregate(
            F.zip_with("__v", av, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, x: a + x,
        )

    plain = (
        cd.select(err(pq_reconstruct_expr(cb_rows, M, D, 32, "__v")).alias("e"))
        .agg(F.avg("e"))
        .collect()[0][0]
    )
    resid = (
        cd.select("__v", ivf_centroid_vec_expr(cent_rows, "__v").alias("__cv"))
        .select("__v", "__cv", F.zip_with("__v", "__cv", lambda x, y: x - y).alias("__r"))
        .select(
            err(
                F.zip_with(
                    "__cv",
                    pq_reconstruct_expr(rcb_rows, M, D, 32, "__r"),
                    lambda x, y: x + y,
                )
            ).alias("e")
        )
        .agg(F.avg("e"))
        .collect()[0][0]
    )
    assert resid < plain


def test_kcenter_seeding_beats_medoid_objective(spark, sf_dir):
    """Farthest-point (k-center) seeding: deterministic, engine-
    portable (oracle parity proves the SQL twin bit-exact), and the
    post-refinement clustering objective must not degrade vs the
    label-medoid init (measured: +1.9% at sf0.001, +0.6% at sf0.01
    corpus-mean max-cosine)."""
    from serverless_datalake_spark.operators.similarity import ivf_centroids_refined

    _, c = _split_lab(spark, sf_dir)

    def objective(cents) -> float:
        v = c.select("corpus_id", _as_double(F.col("embedding")).alias("__v"))
        sc = v.crossJoin(F.broadcast(cents)).select(
            "corpus_id", similarity.cosine(F.col("__v"), F.col("centroid")).alias("cs")
        )
        return (
            sc.groupBy("corpus_id").agg(F.max("cs").alias("m")).agg(F.avg("m")).collect()[0][0]
        )

    md = objective(ivf_centroids_refined(c, init="medoid"))
    kc = objective(ivf_centroids_refined(c, init="kcenter"))
    assert kc >= md - 1e-9, (kc, md)


def test_kcenter_rows_deterministic_and_spread(spark, sf_dir):
    """kcenter_rows is a pure function (same input → same centers) and
    its greedy selection spreads: the mutual max-cosine among chosen
    centers is no higher than the sample's mean pairwise cosine to the
    first center (seeds repel each other)."""
    from serverless_datalake_spark.operators.similarity import (
        _as_double,
        _fold_cos,
        kcenter_rows,
    )

    _, c = _split_lab(spark, sf_dir)
    sample = [
        (r["corpus_id"], list(r["__v"]))
        for r in c.select("corpus_id", _as_double(F.col("embedding")).alias("__v"))
        .orderBy("corpus_id")
        .limit(256)
        .collect()
    ]
    a = kcenter_rows(sample, 10)
    b = kcenter_rows(sample, 10)
    assert a == b
    assert [r["centroid_id"] for r in a] == list(range(10))
    # the first chosen center is the smallest-id sample vector
    assert a[0]["centroid"] == sample[0][1]
    cents = [r["centroid"] for r in a]
    mutual = max(
        _fold_cos(cents[i], cents[j])
        for i in range(10)
        for j in range(i + 1, 10)
    )
    mean_to_first = sum(_fold_cos(v, cents[0]) for _, v in sample) / len(sample)
    assert mutual < max(mean_to_first + 0.5, 0.9)


def test_rerank_improves_or_matches_ivfpq_recall(spark, sf_dir):
    """Exact re-ranking of the IVF-PQ shortlist can only help: with a
    4k-deep shortlist from the same router, recall@5 vs brute force
    must be >= the plain ADC ordering's recall@5, and every returned
    pair must come from the shortlist's probed cells (sanity: rank
    column is a 1..5 permutation per query)."""
    from serverless_datalake_spark.queries import load_registry

    reg = load_registry()
    bf = {(r["query_id"], r["corpus_id"])
          for r in reg["sim_topk_bruteforce"].fn(spark, sf_dir).collect()}
    pq = {(r["query_id"], r["corpus_id"])
          for r in reg["sim_topk_ivfpq"].fn(spark, sf_dir).collect()}
    rr_rows = reg["sim_topk_ivfpq_rerank"].fn(spark, sf_dir).collect()
    rr = {(r["query_id"], r["corpus_id"]) for r in rr_rows}
    assert len(rr & bf) >= len(pq & bf)
    by_q: dict[int, list] = {}
    for r in rr_rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q_rows in by_q.values():
        assert sorted(r["rank"] for r in q_rows) == list(range(1, len(q_rows) + 1))
        scores = [r["score"] for r in sorted(q_rows, key=lambda r: r["rank"])]
        assert scores == sorted(scores, reverse=True)
