"""Behavior invariants for the evaluation/resampling/peeling family —
properties the DuckDB parity check cannot see (it compares equal
values; these assert the MATH the values must satisfy)."""

from __future__ import annotations

import pytest

from serverless_datalake_spark.queries import load_registry

REG = load_registry()


def rows(spark, sf_dir, name):
    return REG[name].fn(spark, sf_dir).collect()


def test_pass_at_k_monotone_in_k(spark, sf_dir):
    """pass@k is monotonically non-decreasing in k and in [0,1]."""
    by_k = {int(r["k"]): r["mean_pass_at_k"] for r in rows(spark, sf_dir, "eval_pass_at_k")}
    ks = sorted(by_k)
    assert all(0.0 <= by_k[k] <= 1.0 for k in ks)
    assert all(by_k[a] <= by_k[b] + 1e-9 for a, b in zip(ks, ks[1:]))


def test_bradley_terry_strengths_normalized(spark, sf_dir):
    rs = rows(spark, sf_dir, "pref_bradley_terry")
    assert len(rs) == 5
    total = sum(r["strength"] for r in rs)
    assert abs(total - 1.0) < 1e-4
    assert all(r["strength"] > 0 for r in rs)
    # more wins should not mean dramatically weaker strength: the top
    # winner must not rank last (sanity of the MM fixed point)
    by_wins = sorted(rs, key=lambda r: -r["wins"])
    by_strength = sorted(rs, key=lambda r: -r["strength"])
    assert by_wins[0]["item"] != by_strength[-1]["item"]


def test_systematic_resampling_invariants(spark, sf_dir):
    """Σcopies == n_draws exactly; per-doc copies within ±1 of the
    real-valued expectation n·w/W (the zero-extra-variance property)."""
    rs = rows(spark, sf_dir, "sample_systematic_weighted")
    n_draws = 200
    assert sum(r["copies"] for r in rs) == n_draws
    full = REG["sample_systematic_weighted"].fn(spark, sf_dir)
    total_w = sum(
        r["weight"] for r in full.select("weight").collect()
    )  # selected docs only — recompute from documents for the true W
    from serverless_datalake_spark.tables import load_table

    W = load_table(spark, sf_dir, "documents").groupBy().sum("n_chars").collect()[0][0]
    for r in rs:
        expect = n_draws * r["weight"] / W
        assert expect - 1.0 <= r["copies"] <= expect + 1.0, (r, expect)


def test_k_core_monotone_and_converging(spark, sf_dir):
    rs = sorted(rows(spark, sf_dir, "graph_k_core"), key=lambda r: r["round"])
    counts = [r["n_nodes"] for r in rs]
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts
    assert counts[0] > 0


def test_confusion_prf_consistent_with_kappa_marginals(spark, sf_dir):
    """tp+fn per class == truth-class marginal; Σtp == agreement count
    that po in stats_cohens_kappa is built from."""
    prf = rows(spark, sf_dir, "eval_confusion_prf")
    kap = rows(spark, sf_dir, "stats_cohens_kappa")[0]
    total_tp = sum(r["tp"] for r in prf)
    assert abs(kap["po"] - total_tp / kap["n_items"]) < 1e-5
    n_per_truth = sum(r["tp"] + r["fn"] for r in prf)
    assert n_per_truth == kap["n_items"]


def test_auc_between_half_and_one_for_aligned_score(spark, sf_dir):
    """The quality score is constructed from the same signal as the
    label, so AUC must be well above chance (and ≤ 1)."""
    r = rows(spark, sf_dir, "eval_auc_roc")[0]
    assert 0.6 < r["auc"] <= 1.0, r


def test_brier_decomposition_identity_holds_approximately(spark, sf_dir):
    """brier ≈ uncertainty − resolution + reliability (exact only at
    bin granularity — within-bin variance makes a small gap; assert
    the binned identity within that tolerance)."""
    r = rows(spark, sf_dir, "eval_brier_decomposition")[0]
    recomposed = r["uncertainty"] - r["resolution"] + r["reliability"]
    assert abs(r["brier"] - recomposed) < 0.02, r


def test_cost_threshold_beats_trivial_policies(spark, sf_dir):
    r = rows(spark, sf_dir, "eval_cost_threshold")[0]
    assert r["cost"] <= r["cost_accept_all"]
    assert r["cost"] <= r["cost_reject_all"]


def test_markov_stationary_is_distribution(spark, sf_dir):
    rs = rows(spark, sf_dir, "events_markov_stationary")
    total = sum(r["stationary_prob"] for r in rs)
    assert abs(total - 1.0) < 1e-4
    assert all(r["stationary_prob"] > 0 for r in rs)


def test_doremi_weights_normalized_or_uniform(spark, sf_dir):
    rs = rows(spark, sf_dir, "mixture_doremi_excess")
    total = sum(r["weight"] for r in rs)
    assert abs(total - 1.0) < 1e-3
    assert all(r["weight"] >= 0 for r in rs)


def test_kmv_jaccard_sketch_sane(spark, sf_dir):
    r = rows(spark, sf_dir, "agg_kmv_jaccard")[0]
    assert 0.0 <= r["jaccard_kmv"] <= 1.0
    assert r["n_inter"] <= min(r["n_a"], r["n_b"])
    assert r["n_union"] <= r["n_a"] + r["n_b"]


def test_hamming_topk_complete_and_bounded(spark, sf_dir):
    rs = rows(spark, sf_dir, "sim_topk_hamming")
    assert len(rs) == 50  # 10 queries × top-5
    assert all(0 <= r["hamming"] <= 64 for r in rs)
    per_q = {}
    for r in rs:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_ngram_spans_fraction_bounds(spark, sf_dir):
    rs = rows(spark, sf_dir, "dedup_ngram_spans")
    assert all(0.0 <= r["dup_frac"] <= 1.0 for r in rs)
    assert all(r["max_dup_run"] <= r["n_dup"] for r in rs)
    # the fixture contains exact-duplicate docs — spans MUST fire
    assert any(r["n_dup"] > 0 for r in rs)
