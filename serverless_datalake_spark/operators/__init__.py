"""Composed operators the PySpark API lacks as single built-ins.

Each is expressed as a composition of DataFrame operations (so Catalyst
still optimizes the whole plan) — Pandas UDFs only where vectorized
Python is genuinely needed (similarity, minhash).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def pin(df: DataFrame) -> DataFrame:
    """Lazy localCheckpoint — the branch-point pin (materialize once,
    serve every downstream consumer; see ranking.py's module docstring
    for why lazy-checkpoint beats persist() here).

    ALL lazy pins must go through this helper, because a checkpoint
    truncates the visible plan to a LogicalRDD scan and therefore
    HIDES everything upstream of it from the registry-wide
    unpartitioned-window audit — a query could park a global window
    behind a pin and pass the gate vacuously (round-8 review finding:
    stats_dunn_posthoc's value-grain window was invisible while its
    structurally identical sibling stats_kruskal_wallis, pinned BELOW
    the window, was audited and allowlisted). The audit sets
    SPARK_GRAFT_NO_PIN=1 while building plans, making every pin a
    no-op so the full lineage stays auditable; execution paths never
    set it.

    Sanctioned exceptions — EAGER iteration-boundary lineage cuts,
    which are a different mechanism from the lazy branch pin and stay
    outside the NO_PIN contract on purpose: operators/dedup.py's
    components fixpoint (``new_labels.localCheckpoint(eager=True)``
    every few pointer-jump rounds) and queries/graph.py's iterative
    frontiers (BFS levels, k-core peeling). These cut an O(iterations)
    lineage chain INSIDE a driver-side loop whose intermediate plans
    are never registry-auditable (the audit sees only the final
    returned DataFrame, whose own lineage starts at the last cut — by
    then the loop has already executed), so they cannot hide a window
    from the gate the way a lazy pin could; disabling them under
    NO_PIN would make plan BUILD itself exponentially slow or
    stack-overflow. tests/test_window_audit.py::test_no_raw_lazy_pins
    enforces the split mechanically: the ONLY ``eager=False``
    checkpoint in the package is this helper, and every other
    ``localCheckpoint`` call site is eager and enumerated there."""
    if os.environ.get("SPARK_GRAFT_NO_PIN") == "1":
        return df
    return df.localCheckpoint(eager=False)


def spread_for_compute(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the input is under-partitioned for
    a CPU-heavy map stage (a single-row-group parquet file scans as
    ONE task, serializing signature computation / Pandas decode on one
    core of N). No-op when the scan already has ≥ target partitions —
    a real multi-file 100 TB input pays nothing; when it does fire it
    should be handed the narrowest projection possible, and it evens
    per-row cost skew across tasks as a side effect."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
