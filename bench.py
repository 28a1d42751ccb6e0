#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full execution,
no driver collect cost). A warmup query amortizes JVM/codegen startup
out of the first measurement.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from serverless_datalake_spark.queries import load_registry
from serverless_datalake_spark.session import get_spark

# Headline set: one per operator family, weighted toward the shapes
# that dominate real workloads (scan+agg, join+agg, windows, dedup,
# similarity, text). Registry keys — see SURVEY.md §2.
HEADLINE = [
    "replay_range",
    "agg_pricing_summary",
    "agg_rollup",
    "join_inner",
    "join_broadcast_dims",
    "join_asof",
    "window_ranking",
    "topk_per_group",
    "stream_tumbling_window",
    "stream_session_window",
    "stream_dedup_exact",
    "dedup_exact",
    "dedup_minhash_lsh",
    # the production ANN path is the LSH-bucketed probe; brute force
    # stays in the registry as the correctness twin only
    "sim_topk_lsh",
    "sim_topk_lsh_multiprobe",
    "sim_topk_lsh_indexed",
    "sim_topk_ivfpq",
    "sim_topk_ivfpq_residual",
    "text_quality",
    "text_tfidf",
    "mm_decode_features",
    "sql_cte_multijoin",
    "reshape_pivot",
    "tpch_q9_product_profit",
    "tpch_q18_large_volume",
    "text_gopher_rules",
    "split_contamination",
    "pack_greedy_bins",
    "pipeline_guarded_curation",
    # data-guard family (round 3): redaction, URL dedup, semantic
    # decontamination, heavy hitters — the compliance/cleanliness scans
    "pii_redact",
    "dedup_url_canonical",
    "decontaminate_semantic",
    "text_heavy_hitters",
    # curation/analytics additions (round 3, late): cluster-based
    # semantic dedup, mergeable quantile sketch, grid resample+gap
    # fill, corpus-drift KL
    "dedup_semdedup",
    "agg_quantile_sketch",
    "ts_resample_interpolate",
    "text_kl_divergence",
    # continued-session additions: LM quality scoring, map-only bloom
    # screening, shortlist re-ranking, single-pass validation, graph
    "text_unigram_logprob",
    "dedup_bloom_incremental",
    "sim_topk_ivfpq_rerank",
    "validate_expectations",
    "graph_pagerank",
    "market_basket_rules",
    "pipeline_llm_curation2",
    # this-session additions: lexical+hybrid retrieval, runtime bloom
    # join pruning, sweep-line concurrency, late-interaction scoring
    "text_bm25_topk",
    "sim_hybrid_rrf",
    "join_bloom_prefilter",
    "ts_concurrency_sweep",
    "sim_maxsim_late_interaction",
    # round-4 additions: binary ANN (popcount), substring-dup audit,
    # DoReMi reweighting, attempt-log eval, preference fitting
    "sim_topk_hamming",
    "dedup_ngram_spans",
    "mixture_doremi_excess",
    "eval_pass_at_k",
    "pref_bradley_terry",
    # continued-session additions: banding-quality eval (candidate
    # join + brute truth on the audit subset), runtime-pruned star
    # join, histogram-split stump training
    "dedup_minhash_pr_eval",
    "join_dpp_runtime_prune",
    "model_decision_stump_fit",
    # final-session additions: ExactSubstr span removal (the dedup
    # ACTION over the inverted gram index), DSIR importance weighting
    "dedup_span_removal",
    "sample_dsir_importance",
    # round-5 additions: distributed global rank (the two-pass
    # range-partitioned primitive), one-pass Gram-matrix ridge fit,
    # Dirichlet query-likelihood retrieval leg
    "window_global_rank_distributed",
    "model_ridge_gram",
    "retrieval_query_likelihood_dirichlet",
    # round-6 addition: the production ANN operating point (nprobe=8,
    # shortlist=150, exact re-rank; mean recall@5 0.94/0.90 — RECALL.md)
    "sim_topk_ivfpq_rerank_np8",
]


def calibration_run(spark) -> float:
    """Box-speed constant: a fixed, deterministic, CPU-bound Spark job
    (no I/O, no fixtures, no Python workers) — in-memory range →
    arithmetic projection → hash agg → fixed-size sort. Its time
    tracks the host's effective throughput, so cross-round per-query
    comparisons divide by it instead of needing a manual host-vs-code
    adjudication (round 8's 1.46x "regression" was proven to be a ~40%
    box slowdown by a same-box commit A/B — see SCALE.md, round-9
    protocol). Min of three, same as the query protocol.

    SPARK_GRAFT_SKIP_CALIBRATION=1 short-circuits to 0.0 (key still
    emitted, shape stable) — the contract test runs main() only to
    assert the JSON-line shape and shouldn't pay three 100M-row jobs
    for it (round-9 review finding)."""
    if os.environ.get("SPARK_GRAFT_SKIP_CALIBRATION") == "1":
        return 0.0
    from pyspark.sql import functions as F

    def once() -> float:
        t0 = time.time()
        (
            spark.range(0, 100_000_000, 1, 32)
            .select(
                (F.col("id") % 9973).alias("k"),
                (F.col("id") * 2654435761 % 2**31).alias("h"),
            )
            .groupBy("k")
            .agg(
                F.sum("h").alias("s"),
                F.count("*").alias("c"),
                F.avg(F.col("h") * F.col("h")).alias("m2"),
            )
            .orderBy("k")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.time() - t0

    return min(once() for _ in range(3))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="bench")
    reg = load_registry()

    def run_once(name: str) -> float:
        t0 = time.time()
        reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    def run(name: str) -> tuple[float, float]:
        # min of three executions: the first pays per-query codegen /
        # Python-worker spawn and any transient host-load spike; the
        # min is the reproducible steady-state cost of the plan. The
        # spread (max−min over the min) is reported per query so host
        # noise (±30% observed on this box) is visible instead of
        # masquerading as a plan regression.
        samples = [run_once(name) for _ in range(3)]
        lo = min(samples)
        return lo, (max(samples) - lo) / lo if lo else 0.0

    run_once("scan_project")  # warmup: JVM + codegen + parquet footer cache
    calibration = round(calibration_run(spark), 3)
    measured = {name: run(name) for name in HEADLINE}
    times = {name: round(lo, 3) for name, (lo, _) in measured.items()}
    spread = {name: round(sp, 2) for name, (_, sp) in measured.items()}
    total = round(sum(times.values()), 3)
    # Per-query spread (host-noise visibility) goes to a detail file;
    # the driver's capture keeps only the LAST ~2000 chars of stdout,
    # and round 3's inline spread dict pushed the JSON line past that
    # budget (BENCH_r03.json parsed:null). The line printed below is
    # compact-separated, carries spread as one scalar, and is the
    # final thing written to stdout.
    detail = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "spread": spread,
        "calibration_sec": calibration,
        "sf": sf,
    }
    # Detail path is env-overridable so harness runs (the contract
    # test executes main() at sf0.001) can't clobber the round's
    # sf0.1 artifact at the repo root.
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
    )
    # compact line carries 2-decimal times (the 3-decimal precision
    # lives in BENCH_DETAIL.json) — at 62 queries the line sits ~100 B
    # under the ~1.9 kB tail-capture budget; 2 decimals buys ~60 B of
    # headroom per future headline growth.
    line = json.dumps(
        {
            "metric": "headline_queries_total_time",
            "value": total,
            "unit": "sec",
            "queries": {n: round(t, 2) for n, t in times.items()},
            "spread_max": max(spread.values()) if spread else 0.0,
            "calibration_sec": round(calibration, 2),
            "sf": sf,
        },
        separators=(",", ":"),
    )
    # Print FIRST, write the detail file after: a detail-write failure
    # (bad SPARK_GRAFT_BENCH_DETAIL dir, full disk) must not discard
    # the whole multi-minute measured run (round-7 review finding) —
    # same reason the oversize warning comes after the line.
    print(line, flush=True)
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    if len(line) >= 1900:
        print(
            f"WARNING: bench JSON line {len(line)}B risks driver tail-capture truncation",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
    sys.exit(0)
