"""Semantic invariants for the round-3 curation/analytics additions
(dedup_semdedup, sample_weighted, agg_quantile_sketch,
ts_resample_interpolate, join_asof_tolerance, text_kl_divergence) —
properties the row-hash oracle parity cannot express."""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_datalake_spark.queries import load_registry

REG = load_registry()


def test_semdedup_survivor_invariants(spark, sf_dir):
    """Every cluster keeps ≥1 survivor; the min-id member of every
    cluster is always a survivor (nobody below it to prune it); a
    non-survivor's cluster contains a lower-id member."""
    rows = REG["dedup_semdedup"].fn(spark, sf_dir).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert len(by_cluster) > 1
    pruned_total = 0
    for members in by_cluster.values():
        survivors = [m for m in members if m["is_survivor"]]
        assert survivors, "cluster lost all members"
        min_id = min(m["vec_id"] for m in members)
        assert next(m for m in members if m["vec_id"] == min_id)["is_survivor"]
        pruned_total += len(members) - len(survivors)
        for m in members:
            if not m["is_survivor"]:
                assert any(o["vec_id"] < m["vec_id"] for o in members)
    assert pruned_total > 0, "fixture must contain semantic near-dups"


def test_semdedup_pruned_have_similar_lower_neighbor(spark, sf_dir):
    """Spot-check the cosine condition: every pruned vector has an
    actual cosine ≥ τ with some lower-id vector in its cluster."""
    from serverless_datalake_spark.operators.similarity import cosine, _as_double
    from serverless_datalake_spark.tables import load_table

    out = REG["dedup_semdedup"].fn(spark, sf_dir)
    em = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    j = out.join(em, "vec_id")
    a = j.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"), "cluster_id"
    )
    b = j.where(~F.col("is_survivor")).select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), "cluster_id"
    )
    witness = (
        a.join(b, "cluster_id")
        .where(F.col("id_a") < F.col("id_b"))
        .where(cosine(F.col("va"), F.col("vb")) >= 0.3)
        .select("id_b")
        .distinct()
    )
    n_pruned = b.count()
    assert witness.count() == n_pruned


def test_sample_weighted_prefers_heavy_docs(spark, sf_dir):
    """Weighted sampling must overrepresent heavy (long) documents:
    the mean n_chars of the sample exceeds the corpus mean."""
    from serverless_datalake_spark.tables import load_table

    sample = REG["sample_weighted"].fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    m_sample = sample.agg(F.avg("n_chars")).collect()[0][0]
    m_all = docs.agg(F.avg("n_chars")).collect()[0][0]
    assert m_sample > m_all, (m_sample, m_all)
    # per-stratum cap respected
    caps = sample.groupBy("source").count().collect()
    assert all(r["count"] <= 20 for r in caps)


def test_quantile_sketch_error_bound(spark, sf_dir):
    """The histogram estimate must sit within one bin width of the
    exact interpolated percentile, and quantiles must be monotone in
    p within each group."""
    from serverless_datalake_spark.tables import load_table

    est = {
        (r["l_returnflag"], r["p"]): r["q_est"]
        for r in REG["agg_quantile_sketch"].fn(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
        *[
            F.percentile("l_extendedprice", F.lit(p)).alias(f"p{int(p * 100)}")
            for p in (0.5, 0.9, 0.99)
        ],
    )
    for r in exact.collect():
        width = (r["hi"] - r["lo"]) / 128.0
        for p in (0.5, 0.9, 0.99):
            e = est[(r["l_returnflag"], p)]
            x = r[f"p{int(p * 100)}"]
            assert abs(e - x) <= width + 1e-9, (r["l_returnflag"], p, e, x, width)
        assert est[(r["l_returnflag"], 0.5)] <= est[(r["l_returnflag"], 0.9)] <= est[
            (r["l_returnflag"], 0.99)
        ]


def test_resample_grid_is_dense_and_faithful(spark, sf_dir):
    """The output grid is dense (one row per hour per type, no holes),
    observed buckets reproduce the hourly mean, and interpolated
    values lie between their neighbors' values."""
    out = REG["ts_resample_interpolate"].fn(spark, sf_dir)
    rows = sorted(
        out.collect(), key=lambda r: (r["event_type"], r["bucket_start"])
    )
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, series in by_type.items():
        hours = [r["bucket_start"] for r in series]
        assert hours == list(range(hours[0], hours[-1] + 3600, 3600)), t
        assert series[0]["is_observed"] and series[-1]["is_observed"], t
        # interpolated values bounded by the surrounding observations
        obs_idx = [i for i, r in enumerate(series) if r["is_observed"]]
        for a, b in zip(obs_idx, obs_idx[1:]):
            lo = min(series[a]["value_interp"], series[b]["value_interp"])
            hi = max(series[a]["value_interp"], series[b]["value_interp"])
            for i in range(a + 1, b):
                v = series[i]["value_interp"]
                assert lo - 1e-6 <= v <= hi + 1e-6, (t, i, v, lo, hi)
    assert any(not r["is_observed"] for r in rows), "fixture must have gaps"


def test_asof_tolerance_is_mask_of_untolerated(spark, sf_dir):
    """Tolerance only ever REMOVES matches: every tolerated match
    appears in the untolerated as-of result with the same signup, and
    the discarded ones are exactly those beyond the window."""
    tol = {
        (r["user_id"], r["purchase_epoch"]): r["signup_epoch"]
        for r in REG["join_asof_tolerance"].fn(spark, sf_dir).collect()
    }
    # recompute the untolerated join directly via the operator
    from serverless_datalake_spark.operators.asof import asof_join
    from serverless_datalake_spark.tables import load_table

    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select("user_id", "ts")
    signups = e.where(F.col("event_type") == "signup").select("user_id", "ts")
    plain = asof_join(
        purchases, signups, on="user_id", left_ts="ts", right_ts="ts", right_cols=["ts"]
    ).select(
        "user_id",
        F.col("ts").cast("long").alias("purchase_epoch"),
        F.col("asof_ts").cast("long").alias("signup_epoch"),
    )
    for r in plain.collect():
        key = (r["user_id"], r["purchase_epoch"])
        assert key in tol
        if tol[key] is not None:
            assert tol[key] == r["signup_epoch"]
            assert r["purchase_epoch"] - r["signup_epoch"] <= 86400
        elif r["signup_epoch"] is not None:
            assert r["purchase_epoch"] - r["signup_epoch"] > 86400 - 1


def test_kl_divergence_nonnegative_and_self_zero(spark, sf_dir):
    """Gibbs' inequality: KL ≥ 0 for every source; and a degenerate
    corpus of one source has KL exactly 0."""
    rows = REG["text_kl_divergence"].fn(spark, sf_dir).collect()
    assert len(rows) > 1
    for r in rows:
        assert r["kl_divergence"] >= 0.0, r
    assert any(r["kl_divergence"] > 0.0 for r in rows)

    one = (
        spark.createDataFrame(
            [(1, "a b c a", "s0"), (2, "a b", "s0")], "doc_id long, text string, source string"
        )
    )
    # inline the same pipeline over a single-source frame
    tok = one.select("source", F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("t"))
    st = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    s_tot = st.groupBy("source").agg(F.sum("c").alias("ns"))
    g = st.groupBy("t").agg(F.sum("c").alias("cg"))
    ng = g.agg(F.sum("cg")).collect()[0][0]
    j = st.join(s_tot, "source").join(g, "t")
    p = F.col("c") / F.col("ns")
    q = F.col("cg") / F.lit(ng)
    kl = j.agg(F.sum(p * F.log(p / q))).collect()[0][0]
    assert abs(kl) < 1e-12


def test_chunking_covers_and_overlaps(spark, sf_dir):
    """Every document's tokens are fully covered: chunk 0 starts at
    token 1; successive chunk starts advance by the 48-token stride;
    every chunk except possibly the last has 64 tokens (or the doc is
    shorter); consecutive chunks overlap by 16 tokens."""
    from serverless_datalake_spark.tables import load_table

    chunks = REG["text_chunk_sliding"].fn(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    docs = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .selectExpr("doc_id", "size(filter(split(text, ' '), x -> x != '')) AS n")
        .collect()
    }
    assert by_doc, "no chunks"
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_id"])
        n = docs[doc_id]
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        assert len(rows) == (n + 47) // 48
        covered = 0
        for i, r in enumerate(rows):
            expected = min(64, n - i * 48)
            assert r["n_chunk_tokens"] == expected, (doc_id, i, r, n)
            covered = i * 48 + r["n_chunk_tokens"]
        assert covered == n


def test_chunk_dedup_consistent_with_chunking(spark, sf_dir):
    """Fingerprint groups partition the chunk set: Σ n_copies equals
    the total chunk count, and each survivor pointer names a real
    chunk bearing that fingerprint."""
    chunks = {
        (r["doc_id"], r["chunk_id"]): r["chunk_fp"]
        for r in REG["text_chunk_sliding"].fn(spark, sf_dir).collect()
    }
    groups = REG["dedup_chunk_exact"].fn(spark, sf_dir).collect()
    assert sum(r["n_copies"] for r in groups) == len(chunks)
    for g in groups:
        assert chunks[(g["survivor_doc"], g["survivor_chunk"])] == g["chunk_fp"]


def test_ewma_is_bounded_convex_smoothing(spark, sf_dir):
    """Each EWMA value is a convex combination of the series so far:
    it lies within [min, max] of the prefix, starts at the first
    bucket's value, and moves toward the latest value by exactly
    α = 0.3 of the gap."""
    rows = sorted(
        REG["ts_ewma"].fn(spark, sf_dir).collect(),
        key=lambda r: (r["event_type"], r["bucket_start"]),
    )
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, series in by_type.items():
        assert abs(series[0]["ewma"] - series[0]["v"]) < 1e-6, t
        lo = hi = series[0]["v"]
        prev = series[0]["ewma"]
        for r in series[1:]:
            lo, hi = min(lo, r["v"]), max(hi, r["v"])
            assert lo - 1e-6 <= r["ewma"] <= hi + 1e-6, (t, r)
            expect = 0.3 * r["v"] + 0.7 * prev
            assert abs(r["ewma"] - expect) < 1e-5, (t, r, expect)
            prev = r["ewma"]


def test_unigram_logprob_common_tokens_score_lower(spark, sf_dir):
    """LM sanity: a document whose tokens are all corpus-frequent must
    score lower mean-NLL than one dominated by corpus-rare tokens.
    Proxy: the doc with the highest average per-token corpus frequency
    must not be the worst-scoring doc, and scores are positive and
    finite; ppl_proxy = exp(mean_nll) within rounding."""
    import math

    out = REG["text_unigram_logprob"].fn(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r["mean_nll"] > 0
        assert math.isfinite(r["ppl_proxy"]) and r["ppl_proxy"] > 1
        assert abs(r["ppl_proxy"] - round(math.exp(r["mean_nll"]), 4)) < 1e-6
    scores = sorted(out, key=lambda r: r["mean_nll"])
    assert scores[0]["mean_nll"] < scores[-1]["mean_nll"], "no spread"


def test_unigram_logprob_rare_token_doc_scores_worse(spark, sf_dir):
    """Directional check: recompute each doc's mean corpus token
    frequency; Spearman-style agreement — the top-frequency decile's
    mean NLL must be below the bottom decile's."""
    from serverless_datalake_spark.tables import load_table

    out = {r["doc_id"]: r["mean_nll"] for r in
           REG["text_unigram_logprob"].fn(spark, sf_dir).collect()}
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(
        F.filter(F.split("text", " "), lambda x: x != "")).alias("t"))
    cnt = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    freq = (tok.join(cnt, "t").groupBy("doc_id")
            .agg(F.avg("c").alias("avg_freq")).collect())
    ranked = sorted(freq, key=lambda r: r["avg_freq"])
    k = max(1, len(ranked) // 10)
    low_freq = sum(out[r["doc_id"]] for r in ranked[:k]) / k
    high_freq = sum(out[r["doc_id"]] for r in ranked[-k:]) / k
    assert high_freq < low_freq, "frequent-token docs must score lower NLL"


def test_bloom_incremental_no_false_negatives(spark, sf_dir):
    """Bloom guarantee: bloom_dup is a superset of exact_dup (no false
    negatives, ever); with the deliberately tiny m=1024 filter the
    fixture must actually exercise ≥1 false positive; and every doc in
    the batch appears exactly once."""
    rows = REG["dedup_bloom_incremental"].fn(spark, sf_dir).collect()
    assert len(rows) == len({r["doc_id"] for r in rows})
    assert all(r["doc_id"] % 2 == 0 for r in rows)
    fns = [r for r in rows if r["exact_dup"] and not r["bloom_dup"]]
    assert not fns, "bloom false negative — impossible by construction"
    fps = [r for r in rows if r["bloom_dup"] and not r["exact_dup"]]
    assert fps, "tiny filter should produce false positives on fixtures"
    assert any(not r["bloom_dup"] for r in rows), "some docs must be definite-new"


def test_holt_linear_matches_python_recurrence(spark, sf_dir):
    """Replay Holt's recurrence in plain Python from the hourly bucket
    totals and require every level/trend/forecast to agree with the
    query output within the 6-decimal rounding; init must be
    (l1=v1, b1=0), and forecast_next == level + trend."""
    rows = REG["ts_holt_linear"].fn(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert len(by_type) >= 2
    for series in by_type.values():
        series.sort(key=lambda r: r["bucket_start"])
        l = series[0]["v"]
        b = 0.0
        assert abs(series[0]["level"] - round(l, 6)) < 1e-9
        assert series[0]["trend"] == 0.0
        for r in series[1:]:
            l_new = 0.3 * r["v"] + 0.7 * (l + b)
            b = 0.1 * (l_new - l) + 0.9 * b
            l = l_new
            assert abs(r["level"] - round(l, 6)) < 1e-6, r
            assert abs(r["trend"] - round(b, 6)) < 1e-6, r
            assert abs(r["forecast_next"] - round(l + b, 6)) < 2e-6, r


def test_pagerank_mass_and_structure(spark, sf_dir):
    """PageRank invariants: total rank mass ≈ 1 (no dangling leakage);
    every rank ≥ the teleport floor 0.15/N; rank correlates with
    degree (top-decile-by-degree mean rank > bottom-decile mean)."""
    rows = REG["graph_pagerank"].fn(spark, sf_dir).collect()
    n = len(rows)
    assert n > 10
    total = sum(r["pagerank"] for r in rows)
    assert abs(total - 1.0) < 1e-4
    floor = 0.15 / n
    assert all(r["pagerank"] >= floor - 1e-9 for r in rows)
    ranked = sorted(rows, key=lambda r: r["degree"])
    k = max(1, n // 10)
    lo = sum(r["pagerank"] for r in ranked[:k]) / k
    hi = sum(r["pagerank"] for r in ranked[-k:]) / k
    assert hi > lo


def test_cms_never_underestimates(spark, sf_dir):
    """Count-Min guarantee: the estimate is always >= the true count,
    and with w=16 << vocab the fixture must exercise >= 1 collision
    (strict overestimate) among the reported heavy hitters."""
    rows = REG["agg_cms_heavy_hitters"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    assert all(r["cms_est"] >= r["true_cnt"] for r in rows)
    assert any(r["cms_est"] > r["true_cnt"] for r in rows)
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))


def test_temperature_mixture_flattens(spark, sf_dir):
    """α=0.7 sampling must flatten the language distribution: the
    dominant language's boost < 1, every minority language's boost
    > 1, temp shares sum to 1, and the temp distribution's max/min
    ratio is strictly below the raw distribution's."""
    rows = REG["sample_temperature_mixture"].fn(spark, sf_dir).collect()
    assert len(rows) >= 3
    assert abs(sum(r["temp_share"] for r in rows) - 1.0) < 1e-4
    top = max(rows, key=lambda r: r["n_docs"])
    assert top["boost"] < 1.0
    for r in rows:
        if r is not top:
            assert r["boost"] > 1.0, r
    raw_ratio = max(r["raw_share"] for r in rows) / min(r["raw_share"] for r in rows)
    temp_ratio = max(r["temp_share"] for r in rows) / min(r["temp_share"] for r in rows)
    assert temp_ratio < raw_ratio


def test_group_holdout_no_user_leakage(spark, sf_dir):
    """Every event of a user must land in the SAME fold (the property
    that prevents entity-level leakage), and folds must be non-empty
    across several values."""
    rows = REG["split_group_holdout"].fn(spark, sf_dir).collect()
    per_user: dict[int, set] = {}
    for r in rows:
        per_user.setdefault(r["user_id"], set()).add(r["fold"])
    assert all(len(f) == 1 for f in per_user.values())
    folds = {r["fold"] for r in rows}
    assert len(folds) >= 3


def test_histogram_covers_all_rows_and_edges_tile(spark, sf_dir):
    """Bin counts must sum to the table size; bin edges tile [min,max]
    contiguously; every count positive bin index in [0, 15]."""
    from serverless_datalake_spark.tables import load_table

    rows = sorted(
        REG["agg_histogram_equiwidth"].fn(spark, sf_dir).collect(),
        key=lambda r: r["bin"],
    )
    li = load_table(spark, sf_dir, "lineitem")
    assert sum(r["n"] for r in rows) == li.count()
    assert all(0 <= r["bin"] <= 15 for r in rows)
    for a, b in zip(rows, rows[1:]):
        if b["bin"] == a["bin"] + 1:
            assert abs(a["bin_hi"] - b["bin_lo"]) < 1e-6


def test_entropy_bounded_by_log_types(spark, sf_dir):
    """0 <= H <= ln(n_types) for every cohort."""
    import math

    for r in REG["agg_entropy_by_group"].fn(spark, sf_dir).collect():
        assert -1e-9 <= r["entropy_nats"] <= math.log(r["n_types"]) + 1e-6


def test_gini_in_unit_interval_and_ordering(spark, sf_dir):
    """Gini lies in [0, 1); a manually-computed python Gini for one
    group matches within rounding."""
    rows = REG["agg_gini_concentration"].fn(spark, sf_dir).collect()
    assert rows and all(0.0 <= r["gini"] < 1.0 for r in rows)
    from serverless_datalake_spark.tables import load_table

    target = rows[0]["o_orderpriority"]
    xs = sorted(
        x["o_totalprice"]
        for x in load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == target)
        .select("o_totalprice")
        .collect()
    )
    n = len(xs)
    gini = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * sum(xs)) - (n + 1) / n
    got = next(r["gini"] for r in rows if r["o_orderpriority"] == target)
    assert abs(got - gini) < 1e-4


def test_changepoint_segments_partition_series(spark, sf_dir):
    """The reported means must equal plain means of the two segments
    split at change_start, and the shift must be the maximal one
    (spot-verified in python for one series)."""
    rows = REG["ts_changepoint_meanshift"].fn(spark, sf_dir).collect()
    assert rows
    from serverless_datalake_spark.tables import load_table

    r0 = rows[0]
    e = load_table(spark, sf_dir, "events")
    obs = sorted(
        (x["h"], x["v"])
        for x in e.where(F.col("event_type") == r0["event_type"])
        .groupBy(F.expr("CAST(ts AS LONG) DIV 3600").alias("h"))
        .agg(F.round(F.sum("value"), 2).alias("v"))
        .collect()
    )
    vs = [v for _, v in obs]
    split = next(i for i, (h, _) in enumerate(obs) if h * 3600 == r0["change_start"])
    before, after = vs[:split], vs[split:]
    assert abs(sum(before) / len(before) - r0["mean_before"]) < 1e-4
    assert abs(sum(after) / len(after) - r0["mean_after"]) < 1e-4
    best = max(
        abs(sum(vs[:t]) / t - sum(vs[t:]) / (len(vs) - t))
        for t in range(1, len(vs))
    )
    assert abs(abs(r0["mean_before"] - r0["mean_after"]) - best) < 1e-4
