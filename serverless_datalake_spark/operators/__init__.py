"""Composed operators the PySpark API lacks as single built-ins.

Each is expressed as a composition of DataFrame operations (so Catalyst
still optimizes the whole plan) — Pandas UDFs only where vectorized
Python is genuinely needed (similarity, minhash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


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
