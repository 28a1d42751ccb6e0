"""Plan-TEXT-size gate for iterative queries (round-9 lesson).

Round 9 found `minhash_dedup_components` consumers paying seconds of
Catalyst/py4j per action on fully-cached execution because the
returned plan had grown to ~2 MB of text / ~7.5k FileScan nodes: a
`cache()` does not truncate the logical plan, and iterative
algorithms nest one join level per round — the tree compounds
multiplicatively through self-joins. Execution metrics (shuffle
count, scan count) never showed it; only plan text size did.

This gate builds the PINNED (production) plan of every known
iterative/loop-built registry query at the smallest fixture (plan
size is scale-independent) and fails if any exceeds the threshold —
comfortably above today's largest legitimate plan (graph_pagerank,
~190k chars) and far below the measured pathology (2 MB).
"""

from __future__ import annotations

import pytest

from serverless_datalake_spark.queries import load_registry

# every query whose plan is built by a driver-side loop (fixpoints,
# power iteration, peeling) or that consumes one — the shapes whose
# plan text can compound per iteration
ITERATIVE = [
    "dedup_minhash_components",
    "dedup_cluster_report",
    "dedup_semdedup",
    "split_leakage_free",
    "pipeline_dedup_impact",
    "graph_pagerank",
    "graph_label_propagation",
    "graph_k_core",
    "graph_bfs_levels",
    "graph_hits_bipartite",
    "embedding_pca_power",
    "sample_coreset_kcenter",
    "tokenizer_bpe_train",
]

MAX_PLAN_CHARS = 500_000


@pytest.mark.parametrize("name", ITERATIVE)
def test_iterative_plan_text_stays_bounded(spark, sf_dir, name):
    reg = load_registry()
    if name not in reg:
        pytest.skip(f"{name} not in registry")
    df = reg[name].fn(spark, sf_dir)
    text = df._jdf.queryExecution().executedPlan().toString()
    assert len(text) < MAX_PLAN_CHARS, (
        f"{name}: plan text {len(text)} chars (>{MAX_PLAN_CHARS}) — an "
        "iteration is compounding lineage; cut it with an eager "
        "localCheckpoint at the loop boundary (see SCALE.md round-9, "
        "components fixpoint)"
    )
