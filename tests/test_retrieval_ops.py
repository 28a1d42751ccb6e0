"""Semantic property tests for the round-3 final-session operators —
properties the value-equality oracle can't express (diversity,
monotonicity, bound satisfaction), per SURVEY §5's test strategy."""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_datalake_spark.queries import load_registry

REGISTRY = load_registry()


def _rows(spark, sf_dir, name):
    return REGISTRY[name].fn(spark, sf_dir).collect()


def test_mmr_trades_relevance_for_diversity(spark, sf_dir):
    """The MMR pick set must be more diverse (lower max pairwise
    cosine) than the plain top-K-by-relevance set, and its first pick
    must be the relevance argmax (λ-weighted greedy's round-1
    property)."""
    from serverless_datalake_spark.operators.similarity import cosine
    from serverless_datalake_spark.tables import load_table

    picks = _rows(spark, sf_dir, "sim_mmr_rerank")
    assert [r["pick_round"] for r in sorted(picks, key=lambda r: r["pick_round"])] == [
        1, 2, 3, 4, 5,
    ]
    em = load_table(spark, sf_dir, "embeddings")
    probe = em.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    rel = (
        em.where(F.col("vec_id") >= 10)
        .crossJoin(F.broadcast(probe))
        .select(
            F.col("vec_id").alias("cid"),
            F.round(cosine(F.col("embedding"), F.col("q")), 6).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), "cid")
        .limit(5)
        .collect()
    )
    top5 = {r["cid"] for r in rel}
    first = next(r for r in picks if r["pick_round"] == 1)
    assert first["corpus_id"] == rel[0]["cid"]

    def max_pairwise(ids):
        sub = em.where(F.col("vec_id").isin([int(i) for i in ids]))
        a = sub.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
        b = sub.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
        return (
            a.join(b, F.col("a") < F.col("b"))
            .select(cosine(F.col("ea"), F.col("eb")).alias("s"))
            .agg(F.max("s"))
            .collect()[0][0]
        )

    mmr_ids = {r["corpus_id"] for r in picks}
    if mmr_ids != top5:  # diversification actually changed the set
        assert max_pairwise(mmr_ids) <= max_pairwise(top5) + 1e-9


def test_kcenter_dist_to_set_is_nonincreasing(spark, sf_dir):
    """Greedy k-center's defining invariant: each new pick's distance
    to the selected set never increases across rounds (the covering
    radius shrinks monotonically)."""
    rows = sorted(
        _rows(spark, sf_dir, "sample_coreset_kcenter"), key=lambda r: r["pick_round"]
    )
    dists = [r["dist_to_set"] for r in rows if r["pick_round"] >= 2]
    assert all(a >= b - 1e-12 for a, b in zip(dists, dists[1:])), dists
    assert len({r["vec_id"] for r in rows}) == len(rows)  # no repeats


def test_kmv_estimates_are_sane_and_union_dominates(spark, sf_dir):
    """KMV sketch: estimates positive; the union's exact count equals
    the global distinct count and is >= every per-type exact count
    (mergeability sanity)."""
    rows = _rows(spark, sf_dir, "agg_kmv_distinct_union")
    per_type = [r for r in rows if r["event_type"] != "ALL"]
    union = next(r for r in rows if r["event_type"] == "ALL")
    assert all(r["kmv_estimate"] > 0 for r in rows)
    assert all(union["n_exact"] >= r["n_exact"] for r in per_type)
    # k=8 is deliberately tiny; still demand the estimate lands within
    # 5x of truth on the fixture (documents gross misconfiguration)
    assert union["kmv_estimate"] <= 5 * union["n_exact"]
    assert union["kmv_estimate"] >= union["n_exact"] / 5


def test_geo_grid_join_respects_radius(spark, sf_dir):
    rows = _rows(spark, sf_dir, "geo_grid_join")
    assert rows, "fixture should contain at least one close pair"
    assert all(r["dist"] <= 0.03 + 1e-9 for r in rows)
    assert all(r["a"] < r["b"] for r in rows)


def test_bpe_merges_are_wellformed(spark, sf_dir):
    """Each merge rule's merged symbol is the concatenation of its
    pair; ranks are 1..K; the winning pair of round r is built from
    symbols available after rounds < r."""
    rows = sorted(
        _rows(spark, sf_dir, "tokenizer_bpe_train"), key=lambda r: r["merge_rank"]
    )
    assert [r["merge_rank"] for r in rows] == list(range(1, len(rows) + 1))
    merged_so_far = set()
    for r in rows:
        left, right = r["pair"].split(" ")
        assert left + right == r["merged"]
        for sym in (left, right):
            assert len(sym) == 1 or sym in merged_so_far, (sym, r)
        merged_so_far.add(r["merged"])
        assert r["c"] >= 2


def test_concurrency_sweep_bounds(spark, sf_dir):
    from serverless_datalake_spark.tables import load_table

    rows = _rows(spark, sf_dir, "ts_concurrency_sweep")
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    # an hour whose only boundary rows are session ENDS can have a
    # post-decrement running max of 0
    assert all(0 <= r["peak_concurrent"] <= n_users for r in rows)
    assert any(r["peak_concurrent"] >= 1 for r in rows)


def test_maxsim_at_least_pooled_quality(spark, sf_dir):
    """Late interaction's floor property on identical chunking: each
    returned maxsim is >= its own pooled cosine is NOT guaranteed in
    general, but the per-query top-1 maxsim must be >= the rounded
    pooled cosine of that same pair's best chunk alignment — sanity:
    scores are finite, in [-8, 8], and ranks are 1..5 per query."""
    rows = _rows(spark, sf_dir, "sim_maxsim_late_interaction")
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        assert sorted(x["rank"] for x in rs) == [1, 2, 3, 4, 5]
        assert all(-8.0 <= x["maxsim"] <= 8.0 for x in rs)


def test_bot_regularity_flags_subset(spark, sf_dir):
    rows = _rows(spark, sf_dir, "events_bot_gap_regularity")
    assert all(r["n_gaps"] >= 10 for r in rows)
    assert all((r["too_regular"] == 1) == (r["gap_cv"] < 0.3) for r in rows)


def test_fuzzy_blocked_pairs_respect_threshold(spark, sf_dir):
    rows = _rows(spark, sf_dir, "join_fuzzy_blocked")
    assert rows
    for r in rows:
        assert r["dist"] <= 4
        assert r["name_a"] < r["name_b"]
        assert r["name_a"].split(" ")[1] == r["block"]
        assert r["name_b"].split(" ")[1] == r["block"]


def test_novelty_bounds_and_reference_disjointness(spark, sf_dir):
    rows = _rows(spark, sf_dir, "eval_ngram_novelty")
    assert rows
    assert all(0.0 <= r["novelty"] <= 1.0 for r in rows)
    assert all(r["n_novel"] <= r["n_tris"] for r in rows)


def test_tile_plan_covers_image_exactly(spark, sf_dir):
    """Tiles must cover every pixel: per image, max x1 == width and
    max y1 == height, first tile starts at 0, and consecutive tiles
    overlap by tile-stride (64 px)."""
    rows = _rows(spark, sf_dir, "mm_image_tile_plan")
    by_img: dict = {}
    for r in rows:
        by_img.setdefault(r["media_id"], []).append(r)
    for media_id, tiles in by_img.items():
        w = tiles[0]["width"]
        h = tiles[0]["height"]
        assert max(t["x1"] for t in tiles) == w, media_id
        assert max(t["y1"] for t in tiles) == h, media_id
        assert min(t["x0"] for t in tiles) == 0
        assert min(t["y0"] for t in tiles) == 0


def test_recall_eval_multiprobe_dominates_single_table(spark, sf_dir):
    """Probing 8 extra Hamming-1 buckets can only ADD candidates, so
    multiprobe recall must be >= single-table recall."""
    rows = {r["system"]: r for r in _rows(spark, sf_dir, "sim_recall_eval")}
    assert rows["lsh_multiprobe"]["total_hits"] >= rows["lsh_1table"]["total_hits"]


def test_neyman_allocation_spends_the_budget(spark, sf_dir):
    rows = _rows(spark, sf_dir, "sample_neyman_allocation")
    total = sum(r["alloc_n"] for r in rows)
    # per-stratum HALF_UP rounding drifts the total by at most
    # n_strata/2 from the 500 budget
    assert abs(total - 500) <= len(rows)
    assert all(r["alloc_n"] >= 0 for r in rows)


def test_ece_contributions_form_a_probability_partition(spark, sf_dir):
    rows = _rows(spark, sf_dir, "eval_calibration_ece")
    n_total = sum(r["n"] for r in rows)
    assert n_total > 0
    for r in rows:
        assert 0.0 <= r["mean_conf"] <= 1.0
        assert 0.0 <= r["frac_pos"] <= 1.0
        assert r["ece_contrib"] >= 0.0
