"""Lake maintenance: small-file compaction.

Streaming ingest writes one file set per micro-batch per partition;
after a day a hot source partition holds thousands of small files and
every scan pays per-file open/footer costs (the #1 operational killer
of file-based lakes at scale). Compaction rewrites one partition's
CAPTURED files into ~target-sized files (append, then manifest-backed
delete of exactly the inputs — concurrent appends survive), preserving
the time-sorted layout that makes range scans skip row groups. For
atomic reader semantics use txlog_optimize; a bare parquet directory
cannot provide them.
"""

from __future__ import annotations

import glob
import json
import os
import uuid

from pyspark.sql import SparkSession

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


def _partition_files(lake_path: str, source: str) -> list[str]:
    return sorted(
        f
        for f in glob.glob(
            os.path.join(lake_path, f"source={source}", "**", "*.parquet"),
            recursive=True,
        )
        if os.path.isfile(f)
    )


def _replay_doomed_manifests(lake_path: str, source: str) -> None:
    """Finish any compaction that crashed between its append and its
    deletes: each manifest lists input files whose compacted copy is
    already fully committed, so deleting the survivors loses nothing."""
    pdir = os.path.join(lake_path, f"source={source}")
    for m in glob.glob(os.path.join(pdir, "_compact-*.doomed.json")):
        with open(m) as f:
            for doomed in json.load(f):
                if os.path.exists(doomed):
                    os.unlink(doomed)
        os.unlink(m)


def compact_partition(
    spark: SparkSession,
    lake_path: str,
    source: str,
    order_col: str = "ts",
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> dict[str, int]:
    """Rewrite one source partition into ceil(bytes/target) files,
    sorted by ``order_col`` so parquet min/max stats stay tight.

    Concurrent-writer safety: the input file set is CAPTURED up front,
    the compacted files are APPENDED, and then exactly the captured
    inputs are deleted — a micro-batch file appended to the partition
    mid-compaction survives untouched. The previous dynamic-partition
    OVERWRITE replaced the whole partition with the captured snapshot,
    silently deleting any concurrent append (round-7 review finding) —
    on the streaming-sink workload this module exists for, that is the
    common case, not a corner. The delete rides a manifest written
    AFTER the append commits, so a crash between append and delete is
    finished (replayed) by the next compaction of the partition; a
    crash before the manifest leaves the originals plus the compacted
    copies — detectable duplication, never loss. Readers see a
    transient duplicate window between append and delete; for atomic
    reader semantics use the transaction-log path (txlog_optimize),
    which this non-transactional directory layout cannot provide.
    """
    _replay_doomed_manifests(lake_path, source)
    doomed = _partition_files(lake_path, source)
    if not doomed:
        return {"files_before": 0, "files_after": 0, "bytes": 0}
    n_before = len(doomed)
    total_bytes = sum(os.path.getsize(f) for f in doomed)
    n_files = max(1, -(-total_bytes // max(target_file_bytes, 1)))
    sub_keys = _sub_partition_keys(lake_path, source)

    # read EXACTLY the captured files (basePath keeps the partition
    # columns that explicit leaf paths would otherwise lose)
    df = spark.read.option("basePath", lake_path).parquet(*doomed)
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
        .write.mode("append")
        .partitionBy("source", *sub_keys)
        .parquet(lake_path)
    )
    # append committed: publish the doomed list atomically, then delete
    pdir = os.path.join(lake_path, f"source={source}")
    manifest = os.path.join(pdir, f"_compact-{uuid.uuid4().hex[:8]}.doomed.json")
    tmp = manifest + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doomed, f)
    os.replace(tmp, manifest)
    for f in doomed:
        if os.path.exists(f):
            os.unlink(f)
    os.unlink(manifest)
    n_after, _ = partition_file_stats(lake_path, source)
    return {"files_before": n_before, "files_after": n_after, "bytes": total_bytes}
