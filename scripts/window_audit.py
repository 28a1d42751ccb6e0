#!/usr/bin/env python
"""Registry-wide unpartitioned-window audit (SCALE.md's rule, made
checkable): for every registry query, build the physical plan (no
execution) and report each WindowExec whose partitionSpec is EMPTY,
plus whether the plan carries a boundedness marker (WindowGroupLimit /
TakeOrderedAndProject / a LIMIT) that caps the rows reaching it.

`WindowExec: No Partition Defined` warnings alone can't gate the rule:
they fire equally for a value-grain 25-row relation (allowed) and a
fact-grain global sort (forbidden). This audit attributes every
unpartitioned window to its query so the allowlist below — each entry
annotated with WHY its grain is bounded — is the reviewable artifact.
A query with an unpartitioned window that is NOT in the allowlist is
a rule violation; fix it with operators/ranking.py's two-pass
primitives (the round-6 eviction pattern) or add it with a grain
justification.

Writes WINDOW_AUDIT.json: {query: {"n_unpartitioned": n,
"bounded_markers": [...], "allowlisted": bool}} for every query with
n > 0, plus a summary. Exit code 1 if any non-allowlisted query has
an unpartitioned window (usable as a round gate).

Usage: python scripts/window_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from serverless_datalake_spark.queries import load_registry  # noqa: E402
from serverless_datalake_spark.session import get_spark  # noqa: E402

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
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="window-audit", shuffle_partitions=16)
    reg = load_registry()
    report: dict[str, dict] = {}
    violations: list[str] = []
    t0 = time.time()
    for i, (name, q) in enumerate(reg.items()):
        try:
            df = q.fn(spark, sf_dir)
            nodes = json.loads(df._jdf.queryExecution().sparkPlan().toJSON())
        except Exception as exc:  # noqa: BLE001
            # an unauditable query is a FAILED audit, not a skipped one
            # (the round-6 reviewer: a query that starts raising would
            # otherwise silently pass the gate)
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
                if n["class"].rsplit(".", 1)[-1]
                in ("WindowGroupLimitExec", "TakeOrderedAndProjectExec",
                    "GlobalLimitExec", "LocalLimitExec")
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
        if (i + 1) % 100 == 0:
            print(f"... {i + 1}/{len(reg)} ({time.time() - t0:.0f}s)", flush=True)

    out = {
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
    with open(os.path.join(REPO, "WINDOW_AUDIT.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(
        f"{len(report)} queries with unpartitioned windows, "
        f"{len(violations)} violations, {out['sec']}s -> WINDOW_AUDIT.json"
    )
    if violations:
        print("VIOLATIONS:", ", ".join(violations))
        sys.exit(1)


if __name__ == "__main__":
    main()
