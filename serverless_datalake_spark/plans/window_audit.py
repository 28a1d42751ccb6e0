"""Registry-wide unpartitioned-window audit (SCALE.md's rule, made
checkable and importable): for every registry query, build the
physical plan (no execution) and report each WindowExec whose
partitionSpec is EMPTY, plus whether the plan carries a boundedness
marker (WindowGroupLimit / TakeOrderedAndProject / a LIMIT) that caps
the rows reaching it.

`WindowExec: No Partition Defined` warnings alone can't gate the rule:
they fire equally for a value-grain 25-row relation (allowed) and a
fact-grain global sort (forbidden). This audit attributes every
unpartitioned window to its query so the allowlist below — each entry
annotated with WHY its grain is bounded — is the reviewable artifact.
A query with an unpartitioned window that is NOT in the allowlist is
a rule violation; fix it with operators/ranking.py's two-pass
primitives (the round-6 eviction pattern) or add it here with a grain
justification.

Consumed by scripts/window_audit.py (writes WINDOW_AUDIT.json, exit 1
on violation — the round-artifact pass) AND tests/test_window_audit.py
(`-m audit`, so `pytest tests/` fails when a future query reintroduces
an entity-grain global window — the round-6 verdict's "script, not a
test" gap).
"""

from __future__ import annotations

import json
import os
import time

# Queries ALLOWED to keep an unpartitioned WindowExec, each with the
# bounded-grain justification (audited by hand, round 6). Categories:
#   top-k      — rank filter r <= k; WindowGroupLimit / TakeOrdered
#                bounds per-partition state to k rows before the node
#   value-grain— the window input is a relation bounded by a constant
#                of the DOMAIN (25 nations, 8 buckets, 2^planes cells,
#                hour grid, rounded-score values), not by corpus size
#   shortlist  — the window reranks a previously-cut constant-size
#                shortlist (ANN depth, fusion candidates)
ALLOWLIST: dict[str, str] = {
    # --- top-k rank-filter windows: per-partition state is bounded
    #     to k rows by WindowGroupLimit / TakeOrderedAndProject (the
    #     bounded_markers field confirms the marker is in the plan) ---
    "market_basket_rules": "top-k: pair rank <= 20, TakeOrdered below",
    "graph_jaccard_links": "top-k: rank <= 20 over wedge pairs",
    "graph_jaccard_links_truncated": "top-k: rank <= 20, capped wedges",
    "graph_adamic_adar": "top-k: rank <= 20, capped wedges",
    "graph_label_propagation": "top-k: community rank <= 20",
    "text_burstiness": "top-k: token rank <= 20",
    "tokenizer_bpe_train": "top-1 pair per merge round (rank == 1), "
                           "pair relation also vocab-bounded",
    "tokenizer_bpe_encode": "top-1 pair per merge round (rank == 1)",
    "dedup_boilerplate_grams": "top-k gram rank, TakeOrdered below",
    "agg_cms_heavy_hitters": "top-k: rank <= 20 over probed tokens",
    "text_bm25_topk": "top-k: rank <= 20, TakeOrdered below",
    "retrieval_query_likelihood_dirichlet": "top-k: rank <= 20",
    "sim_hybrid_rrf": "shortlist: <=100-row legs + fused rank",
    "feature_onehot_topn": "top-3 categories (rank <= 3)",
    "embedding_quality_screen": "top-10 outlier rank, TakeOrdered",
    "text_vocab_coverage": "top-24 prefix via TakeOrdered(limit=24); "
                           "24-row cumsum window",
    # --- value/cell-grain windows: the relation is bounded by a
    #     DOMAIN constant, not by corpus size ---
    "agg_median_of_means": "8 fixed buckets",
    "agg_histogram_log2": "<=64 log2 buckets",
    "agg_share_of_parent": "25 (region, nation) rows",
    "stats_ks_two_sample": "distinct rounded price values (domain)",
    "stats_kruskal_wallis": "distinct quantity values (domain, <=50)",
    "stats_dunn_posthoc": "distinct quantity values (domain, <=50)",
    "stats_mann_whitney_u": "distinct rounded values (domain)",
    "stats_survival_km": "duration-day grid (time-bounded)",
    "stats_fdr_bh": "25 nations",
    "stats_eb_shrinkage": "25 nation rows (moment windows)",
    "eval_auc_roc": "<=10001 rounded score values",
    "eval_cost_threshold": "<=10001 rounded score values",
    "ts_rolling_ols_slope": "hour grid (time-bounded)",
    "ts_backtest_snaive": "hour grid (time-bounded)",
    "mixture_caps_floors": "language domain rows",
    "stream_lateness_audit": "with_global_cummax carry: exclusive "
                             "prefix max over the num_partitions-row "
                             "per-pid maxima (constant grain)",
    "model_naive_bayes_langid": "language-prior rows (domain)",
    "pipeline_dedup_impact": "language domain rows",
    "split_leakage_free": "3 split rows",
    "model_isotonic_pava": "<=100 centile-bin rows (domain); the "
                           "pair-relation min window is partitioned",
    "model_kmeans_lloyd": "k=4 seed rows (GlobalLimit below the "
                          "row_number)",
    "skyline_frontier_2d": "50 size-domain rows (reverse running min)",
    "eval_kendall_w": "25 nation rows (three rank windows)",
    "stats_page_trend": "<=5 treatment-domain rows (name-order index)",
}

_MARKER_NODES = (
    "WindowGroupLimitExec",
    "TakeOrderedAndProjectExec",
    "GlobalLimitExec",
    "LocalLimitExec",
)


def audit_registry(spark, sf_dir: str, reg: dict | None = None) -> dict:
    """Build every registry query's physical plan and classify its
    unpartitioned WindowExec nodes against ALLOWLIST. Returns the
    WINDOW_AUDIT.json payload: an unauditable query (plan build raises)
    is a FAILED audit, not a skipped one — a query that starts raising
    would otherwise silently pass the gate.

    Plans are built with SPARK_GRAFT_NO_PIN=1 so every lazy
    branch-point pin (operators.pin) becomes a no-op: a localCheckpoint
    truncates the visible plan to a LogicalRDD scan, and a global
    window parked behind one passed this gate VACUOUSLY (round-8
    review finding — stats_dunn_posthoc's value-grain window was
    invisible while its structurally identical sibling
    stats_kruskal_wallis, pinned below the window, was audited). With
    pins disabled the full lineage is visible, so evasion-by-pinning
    is impossible. This is plan BUILD, so registry queries' own
    DataFrames never execute under NO_PIN — but a few builders DO run
    small jobs while constructing their plan (graph queries count /
    eagerly checkpoint their iterative state), so "nothing executes"
    is not literally true; those eager iteration-boundary cuts are
    pin-exempt by design (see operators.pin) and unaffected by the
    flag.

    CONCURRENCY CONTRACT: SPARK_GRAFT_NO_PIN is process-global, so any
    query built on another thread of this driver while the audit runs
    (a bench loop, a streaming micro-batch planner) would silently
    lose its branch-point pins and re-derive the pinned relation per
    consumer. Run the audit single-threaded, with nothing else
    planning queries in the same process — the pytest gate and
    scripts/regenerate_artifacts both satisfy this. The env var (vs a
    module flag) is deliberate: it lets out-of-process tooling rebuild
    pin-free plans too, and carries the same process-global caveat
    either way."""
    if reg is None:
        from serverless_datalake_spark.queries import load_registry

        reg = load_registry()
    report: dict[str, dict] = {}
    violations: list[str] = []
    t0 = time.time()
    prev_no_pin = os.environ.get("SPARK_GRAFT_NO_PIN")
    os.environ["SPARK_GRAFT_NO_PIN"] = "1"
    try:
        for name, q in reg.items():
            try:
                df = q.fn(spark, sf_dir)
                nodes = json.loads(df._jdf.queryExecution().sparkPlan().toJSON())
            except Exception as exc:  # noqa: BLE001
                report[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
                violations.append(name)
                continue
            unp = [
                n
                for n in nodes
                if n["class"].rsplit(".", 1)[-1] == "WindowExec"
                and not n.get("partitionSpec")
            ]
            if not unp:
                continue
            markers = sorted(
                {
                    n["class"].rsplit(".", 1)[-1]
                    for n in nodes
                    if n["class"].rsplit(".", 1)[-1] in _MARKER_NODES
                }
            )
            ok = name in ALLOWLIST
            report[name] = {
                "n_unpartitioned": len(unp),
                "bounded_markers": markers,
                "allowlisted": ok,
                "why": ALLOWLIST.get(name, "NOT ALLOWLISTED"),
            }
            if not ok:
                violations.append(name)
    finally:
        if prev_no_pin is None:
            os.environ.pop("SPARK_GRAFT_NO_PIN", None)
        else:
            os.environ["SPARK_GRAFT_NO_PIN"] = prev_no_pin
    return {
        "sf_dir": sf_dir,
        "n_queries": len(reg),
        "n_with_unpartitioned_windows": sum(
            1 for v in report.values() if "n_unpartitioned" in v
        ),
        "n_errors": sum(1 for v in report.values() if "error" in v),
        "violations": violations,
        "queries": report,
        "sec": round(time.time() - t0, 1),
    }
