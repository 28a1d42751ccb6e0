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
import shutil
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
    already fully committed, so deleting the survivors loses nothing.
    (Legacy marker of the pre-round-8 append-then-manifest protocol —
    kept so an upgraded compactor still heals an old crash.)"""
    pdir = os.path.join(lake_path, f"source={source}")
    for m in glob.glob(os.path.join(pdir, "_compact-*.doomed.json")):
        with open(m) as f:
            for doomed in json.load(f):
                if os.path.exists(doomed):
                    os.unlink(doomed)
        os.unlink(m)


def _replay_intent_markers(lake_path: str, source: str) -> None:
    """Heal a compaction that crashed mid-flight, in EITHER direction.

    The round-8 protocol stages the compacted files and uses the
    staging directory's removal as the commit point, so recovery is
    decidable from on-disk state alone:

    * intent marker + staging dir present → crash BEFORE commit: roll
      BACK — delete any compacted copies already moved into place
      (their ``compact-<id>-`` name prefix identifies them), the
      staging dir, and the marker. Originals were never touched.
    * intent marker present, staging dir gone → crash AFTER commit:
      roll FORWARD — every compacted copy is in place, so delete the
      captured originals and the marker.

    The previous protocol (append, then manifest, then delete) had an
    UNHEALABLE window: a crash between append and manifest left
    originals plus compacted copies with no marker, and the next
    compaction compacted both together — permanent silent duplication
    (round-7 ADVICE finding). Assumes one compactor per partition at a
    time, as the capture/delete sequence always has.
    """
    pdir = os.path.join(lake_path, f"source={source}")
    intents = glob.glob(os.path.join(pdir, "_compact-*.intent.json"))
    for m in intents:
        with open(m) as f:
            intent = json.load(f)
        staging, prefix = intent["staging"], intent["prefix"]
        if os.path.isdir(staging):
            for moved in glob.glob(
                os.path.join(pdir, "**", prefix + "*"), recursive=True
            ):
                if os.path.isfile(moved):
                    os.unlink(moved)
            shutil.rmtree(staging)
        else:
            for doomed in intent["doomed"]:
                if os.path.exists(doomed):
                    os.unlink(doomed)
        os.unlink(m)
    # any staging dir left now has no marker (all markers were consumed
    # above) = crash between mkdir and the marker write; it holds
    # nothing readers see (leading '_') and nothing was moved yet —
    # plain garbage
    for orphan in glob.glob(os.path.join(pdir, "_compact-*.staging")):
        if os.path.isdir(orphan):
            shutil.rmtree(orphan)


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
    the compacted files land via a STAGED two-phase move, and then
    exactly the captured inputs are deleted — a micro-batch file
    appended to the partition mid-compaction survives untouched. (The
    pre-round-7 dynamic-partition OVERWRITE replaced the whole
    partition with the captured snapshot, silently deleting any
    concurrent append — on the streaming-sink workload this module
    exists for, that is the common case, not a corner.)

    Crash safety (round-8 protocol): Spark writes the compacted output
    into a hidden staging dir inside the partition, an intent marker
    (written AFTER the staging dir exists, BEFORE any visible change)
    records the captured inputs, staged files move into place under a
    ``compact-<id>-`` name prefix, and REMOVING the staging dir is the
    commit point — only then are the originals deleted. A crash at any
    instant leaves a state `_replay_intent_markers` can decide from
    disk alone: staging still present → roll back (delete the prefixed
    copies; originals were never touched), staging gone → roll forward
    (delete the captured originals). The previous append-then-manifest
    sequence had an unhealable window — a crash between the append and
    the manifest left originals plus compacted copies with no marker,
    and the NEXT compaction compacted both together, making the
    doubled rows permanent and silent (round-7 ADVICE finding).
    Readers see a transient duplicate window between the move and the
    deletes; for atomic reader semantics use the transaction-log path
    (txlog_optimize), which this non-transactional directory layout
    cannot provide. Assumes one compactor per partition at a time.
    """
    _replay_doomed_manifests(lake_path, source)
    _replay_intent_markers(lake_path, source)
    doomed = _partition_files(lake_path, source)
    if not doomed:
        return {"files_before": 0, "files_after": 0, "bytes": 0}
    n_before = len(doomed)
    total_bytes = sum(os.path.getsize(f) for f in doomed)
    n_files = max(1, -(-total_bytes // max(target_file_bytes, 1)))
    sub_keys = _sub_partition_keys(lake_path, source)
    pdir = os.path.join(lake_path, f"source={source}")

    cid = uuid.uuid4().hex[:8]
    staging = os.path.join(pdir, f"_compact-{cid}.staging")
    prefix = f"compact-{cid}-"
    os.makedirs(staging)
    # staging exists → now publish the intent (this order matters: an
    # orphan marker whose staging never existed would roll FORWARD and
    # delete originals that have no compacted copy)
    marker = os.path.join(pdir, f"_compact-{cid}.intent.json")
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"doomed": doomed, "staging": staging, "prefix": prefix}, f)
    os.replace(tmp, marker)

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
        .parquet(staging)
    )
    # move staged parquet into place (prefixed so a rollback can find
    # exactly these copies); same filesystem → os.replace is atomic
    for staged in glob.glob(
        os.path.join(staging, "**", "*.parquet"), recursive=True
    ):
        rel = os.path.relpath(staged, staging)
        dest_dir = os.path.join(lake_path, os.path.dirname(rel))
        os.makedirs(dest_dir, exist_ok=True)
        os.replace(
            staged, os.path.join(dest_dir, prefix + os.path.basename(staged))
        )
    shutil.rmtree(staging)  # COMMIT POINT
    for f in doomed:
        if os.path.exists(f):
            os.unlink(f)
    os.unlink(marker)
    n_after, _ = partition_file_stats(lake_path, source)
    return {"files_before": n_before, "files_after": n_after, "bytes": total_bytes}
