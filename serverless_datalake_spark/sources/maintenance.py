"""Lake maintenance: small-file compaction.

Streaming ingest writes one file set per micro-batch per partition;
after a day a hot source partition holds thousands of small files and
every scan pays per-file open/footer costs (the #1 operational killer
of file-based lakes at scale). Compaction rewrites one partition's
files into ~target-sized files, atomically per partition (dynamic
partition overwrite), preserving the time-sorted layout that makes
range scans skip row groups.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 128 * 1024 * 1024


def partition_file_stats(lake_path: str, source: str) -> tuple[int, int]:
    """(n_files, total_bytes) of one source partition on local disk,
    counting nested sub-partitions (e.g. the streaming sink's
    source=/batch_id= layout) too."""
    files = [
        f
        for f in glob.glob(
            os.path.join(lake_path, f"source={source}", "**", "*.parquet"),
            recursive=True,
        )
        if os.path.isfile(f)
    ]
    return len(files), sum(os.path.getsize(f) for f in files)


def _sub_partition_keys(lake_path: str, source: str) -> list[str]:
    """Partition-column chain BELOW source= (empty for a flat layout),
    read off the directory names: source=clicks/batch_id=b0/... →
    ['batch_id']. The rewrite must partition by the same chain or the
    overwrite would mix two physical layouts in one table."""
    keys: list[str] = []
    d = os.path.join(lake_path, f"source={source}")
    while True:
        subdirs = [
            n
            for n in (os.listdir(d) if os.path.isdir(d) else [])
            if "=" in n and os.path.isdir(os.path.join(d, n))
        ]
        if not subdirs:
            return keys
        key = subdirs[0].split("=", 1)[0]
        if any(n.split("=", 1)[0] != key for n in subdirs):
            raise ValueError(f"inconsistent partition keys under {d}: {subdirs}")
        keys.append(key)
        d = os.path.join(d, subdirs[0])


def compact_partition(
    spark: SparkSession,
    lake_path: str,
    source: str,
    order_col: str = "ts",
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> dict[str, int]:
    """Rewrite one source partition into ceil(bytes/target) files,
    sorted by ``order_col`` so parquet min/max stats stay tight.

    Uses dynamic partition overwrite: only the rewritten partition is
    replaced; concurrent readers of other partitions are unaffected.
    """
    n_before, total_bytes = partition_file_stats(lake_path, source)
    n_files = max(1, -(-total_bytes // max(target_file_bytes, 1)))
    sub_keys = _sub_partition_keys(lake_path, source)

    df = spark.read.parquet(lake_path).where(F.col("source") == source)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        shuffled = (
            # co-locate rows of each sub-partition so the rewrite emits
            # ~one file per (task, sub-partition) instead of one per
            # task × partition cross product
            df.repartition(n_files, *sub_keys)
            if sub_keys
            else df.repartition(n_files)
        )
        (
            shuffled.sortWithinPartitions(order_col)
            .write.mode("overwrite")
            .partitionBy("source", *sub_keys)
            .parquet(lake_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    n_after, _ = partition_file_stats(lake_path, source)
    return {"files_before": n_before, "files_after": n_after, "bytes": total_bytes}
