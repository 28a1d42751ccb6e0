"""Transaction-log table format: atomic multi-file visibility,
version time travel, atomic overwrite, reader-invisible compaction,
and invisibility of uncommitted data files."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from serverless_datalake_spark.sources import txlog


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 2).alias("v"))


def test_append_overwrite_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "t")
    v0 = txlog.txlog_write(_df(spark, 0, 10).repartition(3), path)  # multi-file batch
    v1 = txlog.txlog_write(_df(spark, 10, 15), path)
    assert (v0, v1) == (0, 1)
    assert txlog.txlog_read(spark, path).count() == 15
    assert txlog.txlog_read(spark, path, version=0).count() == 10

    v2 = txlog.txlog_write(_df(spark, 100, 103), path, mode="overwrite")
    assert v2 == 2
    head = txlog.txlog_read(spark, path)
    assert head.count() == 3
    assert {r["id"] for r in head.collect()} == {100, 101, 102}
    # prior versions still fully resolvable after the overwrite
    assert txlog.txlog_read(spark, path, version=1).count() == 15


def test_compaction_is_invisible_to_readers(spark, tmp_path):
    path = str(tmp_path / "t")
    for lo in range(0, 40, 10):
        txlog.txlog_write(_df(spark, lo, lo + 10).repartition(2), path)
    before = txlog.live_files(path)
    assert len(before) >= 8  # 4 batches x 2 files
    rows_before = sorted(r["id"] for r in txlog.txlog_read(spark, path).collect())

    v = txlog.txlog_compact(spark, path, target_files=1)
    after = txlog.live_files(path)
    assert len(after) == 1
    assert sorted(r["id"] for r in txlog.txlog_read(spark, path).collect()) == rows_before
    # old snapshot still readable at its version (no physical deletes)
    assert sorted(r["id"] for r in txlog.txlog_read(spark, path, version=v - 1).collect()) == rows_before


def test_uncommitted_files_are_invisible(spark, tmp_path):
    path = str(tmp_path / "t")
    txlog.txlog_write(_df(spark, 0, 5), path)
    # orphan: a data file written without a log entry (a torn write)
    orphan_dir = os.path.join(path, "data", "orphan")
    _df(spark, 1000, 1010).write.parquet(orphan_dir)
    assert txlog.txlog_read(spark, path).count() == 5  # orphan ignored


def test_concurrent_commit_loser_gets_retryable_error(spark, tmp_path):
    path = str(tmp_path / "t")
    txlog.txlog_write(_df(spark, 0, 5), path)
    # simulate a racing committer that claimed version 1 first
    txlog._commit(path, 1, adds=[], removes=[])
    with pytest.raises(RuntimeError, match="concurrent commit"):
        txlog._commit(path, 1, adds=[], removes=[])


def test_streaming_ingest_through_txlog_is_atomic_and_replay_safe(spark, tmp_path):
    import gzip
    import json as _json

    from serverless_datalake_spark.sources import txlog as _tx
    from serverless_datalake_spark.streaming import pipeline as sp

    staging = str(tmp_path / "staging")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(staging)
    with gzip.open(os.path.join(staging, "a.json.gz"), "wt") as f:
        for i in range(25):
            f.write(_json.dumps({
                "event_id": i, "ts": f"2024-01-01T0{i % 6}:00:00.000",
                "user_id": i % 4, "event_type": "clicks", "value": 1.0, "props": "{}",
            }) + "\n")

    stream = sp.read_event_stream(spark, staging, dedup=False)
    q = sp.start_txlog_ingest_query(stream, table, ckpt)
    q.awaitTermination()
    assert txlog.txlog_read(spark, table).count() == 25

    # replaying the same drained source against the same checkpoint
    # commits nothing new (exactly-once end to end)
    head = len(_tx._entries(table))
    q2 = sp.start_txlog_ingest_query(
        sp.read_event_stream(spark, staging, dedup=False), table, ckpt
    )
    q2.awaitTermination()
    assert len(_tx._entries(table)) == head
    assert txlog.txlog_read(spark, table).count() == 25


def test_inflight_and_phantom_tmp_entries_are_invisible(spark, tmp_path):
    import json as _json

    path = str(tmp_path / "t")
    txlog.txlog_write(_df(spark, 0, 5), path)
    # a racing committer's in-flight temp (or a crash's leftover): a
    # syntactically valid entry under a temp name must NOT be read as
    # committed state — and must not shadow version ordering either
    phantom = {"version": 99, "adds": ["/nonexistent.parquet"], "removes": []}
    with open(os.path.join(path, "_txlog", ".tmp-deadbeef.json"), "w") as f:
        _json.dump(phantom, f)
    assert [e["version"] for e in txlog._entries(path)] == [0]
    assert txlog.txlog_read(spark, path).count() == 5
    # next commit is unaffected by the phantom's claimed version
    assert txlog.txlog_write(_df(spark, 5, 8), path) == 1


def test_vacuum_checkpoint_is_replay_equivalent_mid_window(spark, tmp_path):
    import json as _json
    import shutil

    path = str(tmp_path / "t")
    txlog.txlog_write(_df(spark, 0, 10), path)                 # v0
    txlog.txlog_write(_df(spark, 100, 103), path, mode="overwrite")  # v1
    txlog.txlog_write(_df(spark, 10, 15), path)                # v2
    head_ids = {r["id"] for r in txlog.txlog_read(spark, path).collect()}
    pre = {
        e["version"]: _json.dumps(e) for e in txlog._entries(path)
    }
    backup = str(tmp_path / "logbackup")
    shutil.copytree(os.path.join(path, "_txlog"), backup)

    txlog.txlog_vacuum(path, keep_versions=1)
    # simulate the mid-vacuum reader window: checkpoint written, old
    # entries not yet deleted — replaying BOTH must give the same set
    for v, blob in pre.items():
        p = os.path.join(path, "_txlog", f"{v:08d}.json")
        if not os.path.exists(p):
            with open(p, "w") as f:
                f.write(blob)
    entries = txlog._entries(path)
    assert any(e.get("checkpoint") for e in entries)
    assert {r["id"] for r in txlog.txlog_read(spark, path).collect()} == head_ids


def test_vacuum_preserves_streaming_batch_markers(spark, tmp_path):
    path = str(tmp_path / "t")
    txlog.txlog_write(_df(spark, 0, 5), path, extra={"batch_id": 0})
    txlog.txlog_write(_df(spark, 5, 9), path, extra={"batch_id": 1})
    txlog.txlog_write(_df(spark, 9, 12), path, extra={"batch_id": 2})
    assert txlog.committed_batch_ids(path) == {0, 1, 2}
    txlog.txlog_vacuum(path, keep_versions=1)
    # squashed history still witnesses every committed batch id
    assert txlog.committed_batch_ids(path) == {0, 1, 2}


def test_committed_batch_ids_sees_app_scoped_markers_after_vacuum(spark, tmp_path):
    """A vacuum moves app-scoped markers into the checkpoint's
    txn_markers list; the legacy unscoped guard must fold those in, or
    an external caller would treat the batches as uncommitted and
    re-commit them (the round-6 advisor's finding)."""
    path = str(tmp_path / "t")
    txlog.txlog_write(_df(spark, 0, 5), path, extra={"batch_id": 0, "txn_app": "p1"})
    txlog.txlog_write(_df(spark, 5, 9), path, extra={"batch_id": 1, "txn_app": "p1"})
    txlog.txlog_write(_df(spark, 9, 12), path, extra={"batch_id": 2})  # legacy
    assert txlog.committed_batch_ids(path) == {0, 1, 2}
    txlog.txlog_vacuum(path, keep_versions=1)
    assert txlog.committed_batch_ids(path) == {0, 1, 2}
    # and the scoped view still distinguishes apps
    assert ("p1", 0) in txlog.committed_txn_markers(path)


def test_replay_guard_recognizes_legacy_markers_after_txn_app_upgrade(spark, tmp_path):
    """A pipeline that committed batches in the legacy single-writer
    form (txn_app=None) and restarts with txn_app set must still skip
    those batches — a checkpoint replay straddling the upgrade used to
    re-commit them (duplicate rows). The fallback is OPT-IN
    (honor_legacy_markers=True): if two pipelines both ran unscoped
    before being given distinct txn_apps, an unconditional fallback
    would make each silently skip (drop) batches whose ids collide
    with the other's legacy markers (round-7 ADVICE finding). Neither
    direction is decidable from the log, so when the ambiguous state
    is present the None default RAISES (round-8 advisor: the previous
    warn-and-proceed could still duplicate silently in logs nobody
    reads) and the operator must pass True or False explicitly."""
    from serverless_datalake_spark.streaming.pipeline import _replay_guard

    path = str(tmp_path / "t")
    txlog.txlog_write(_df(spark, 0, 5), path, extra={"batch_id": 0})  # pre-upgrade
    already, commit = _replay_guard(path, txn_app="p1", honor_legacy_markers=True)
    assert already(0) is True  # legacy marker honored under the new app id
    assert already(1) is False
    # scoping still isolates OTHER apps' scoped markers
    txlog.txlog_write(_df(spark, 5, 9), path, extra={"batch_id": 7, "txn_app": "other"})
    already2, _ = _replay_guard(path, txn_app="p1", honor_legacy_markers=True)
    assert already2(7) is False
    # explicit False: legacy markers are another (possibly different)
    # pipeline's history — the scoped guard must not skip on them
    already3, _ = _replay_guard(path, txn_app="p1", honor_legacy_markers=False)
    assert already3(0) is False
    assert already3(7) is False
    # DEFAULT (None): the ambiguous state is present, so starting the
    # guard without an explicit decision must raise, not warn-and-pick
    already4, _ = _replay_guard(path, txn_app="p1")
    with pytest.raises(ValueError, match="legacy unscoped"):
        already4(0)
    # ... and the raise re-fires on EVERY call — a supervisory wrapper
    # that swallowed the first error must not fall through to
    # ignore-legacy semantics on retry (round-9 review finding)
    with pytest.raises(ValueError, match="legacy unscoped"):
        already4(0)
    # ... but with NO legacy markers in the log, None is fine (the
    # common case: a table that was always app-scoped)
    clean = str(tmp_path / "clean")
    txlog.txlog_write(_df(spark, 0, 5), clean, extra={"batch_id": 0, "txn_app": "p1"})
    already5, _ = _replay_guard(clean, txn_app="p1")
    assert already5(0) is True
    assert already5(1) is False


def test_txlog_ingest_survives_checkpoint_loss_and_vacuum(spark, tmp_path):
    """Exactly-once even when BOTH the streaming checkpoint is lost
    (batch ids renumber from 0) and vacuum has squashed the log: the
    batch_id markers carried by the checkpoint entry dedup the replay."""
    import gzip
    import json as _json

    from serverless_datalake_spark.streaming import pipeline as sp

    staging = str(tmp_path / "staging")
    table = str(tmp_path / "table")
    os.makedirs(staging)

    def _write_file(name: str, lo: int):
        with gzip.open(os.path.join(staging, name), "wt") as f:
            for i in range(lo, lo + 10):
                f.write(_json.dumps({
                    "event_id": i, "ts": f"2024-01-01T0{i % 6}:00:00.000",
                    "user_id": i % 4, "event_type": "clicks", "value": 1.0,
                    "props": "{}",
                }) + "\n")

    _write_file("a.json.gz", 0)
    q = sp.start_txlog_ingest_query(
        sp.read_event_stream(spark, staging, dedup=False), table, str(tmp_path / "ck1")
    )
    q.awaitTermination()
    _write_file("b.json.gz", 10)
    q = sp.start_txlog_ingest_query(
        sp.read_event_stream(spark, staging, dedup=False), table, str(tmp_path / "ck1")
    )
    q.awaitTermination()
    assert txlog.txlog_read(spark, table).count() == 20
    assert len(txlog._entries(table)) == 2

    txlog.txlog_vacuum(table, keep_versions=1)
    # fresh checkpoint: the source replays everything as new batch ids
    # starting at 0; the preserved markers must dedup them all
    q = sp.start_txlog_ingest_query(
        sp.read_event_stream(spark, staging, dedup=False), table, str(tmp_path / "ck2")
    )
    q.awaitTermination()
    assert txlog.txlog_read(spark, table).count() == 20


def test_upsert_and_change_feed(spark, tmp_path):
    path = str(tmp_path / "t")
    txlog.txlog_write(_df(spark, 0, 10), path)  # v0: ids 0..9, v = 2*id
    updates = spark.createDataFrame(
        [(3, 999), (4, 888), (100, 777)], "id long, v long"
    )
    v = txlog.txlog_upsert(spark, path, updates, key="id")
    head = {(r["id"], r["v"]) for r in txlog.txlog_read(spark, path).collect()}
    assert (3, 999) in head and (4, 888) in head and (100, 777) in head
    assert (3, 6) not in head          # replaced, not duplicated
    assert len(head) == 11             # 10 originals - 2 replaced + 2 new + 1... ids 0..9 plus 100
    # pre-merge snapshot intact
    assert {(r["id"], r["v"]) for r in txlog.txlog_read(spark, path, v - 1).collect()} == {
        (i, 2 * i) for i in range(10)
    }

    feed = txlog.txlog_changes(spark, path, from_version=v - 1)
    ops = {(r["id"], r["v"], r["op"]) for r in feed.collect()}
    assert (3, 999, "insert") in ops and (3, 6, "delete") in ops
    assert (100, 777, "insert") in ops
    assert (5, 10, "insert") not in ops and (5, 10, "delete") not in ops  # untouched row absent


def test_delete_by_key_and_vacuum(spark, tmp_path):
    path = str(tmp_path / "t")
    txlog.txlog_write(_df(spark, 0, 10), path)                     # v0
    txlog.txlog_write(_df(spark, 10, 20), path)                    # v1
    v2 = txlog.txlog_delete(
        spark, path, spark.createDataFrame([(3,), (15,)], "id long"), key="id"
    )
    ids = {r["id"] for r in txlog.txlog_read(spark, path).collect()}
    assert 3 not in ids and 15 not in ids and len(ids) == 18
    # deleted rows still physically reachable via time travel pre-vacuum
    assert 3 in {r["id"] for r in txlog.txlog_read(spark, path, v2 - 1).collect()}

    doomed = txlog.txlog_vacuum(path, keep_versions=1)
    assert doomed                                            # something was GC'd
    for f in doomed:
        assert not os.path.exists(f)
    # head snapshot intact after vacuum; pre-horizon versions are gone
    assert {r["id"] for r in txlog.txlog_read(spark, path).collect()} == ids
    with pytest.raises(Exception):
        txlog.txlog_read(spark, path, version=0).collect()
    # and the surviving log never references a deleted file
    for f in txlog.live_files(path):
        assert os.path.exists(f)


def test_optimize_zorder_clusters_snapshot(spark, tmp_path):
    from tests.test_zorder import _avg_file_coverage

    path = str(tmp_path / "t")
    # several unclustered append batches
    for lo in range(0, 4000, 1000):
        batch = spark.range(lo, lo + 1000).select(
            (F.col("id") % 97).alias("a"), (F.col("id") * 37 % 101).alias("b")
        )
        txlog.txlog_write(batch.repartition(2), path)
    # 16 = 2^4 files → the range partitioner splits on the z-key's top
    # 4 bits, TWO per dimension; with 8 files one dimension gets a
    # single split level and its coverage sits at ~0.59, a hair under
    # the 0.6 assertion (flaked under approx-quantile jitter)
    v = txlog.txlog_optimize(spark, path, "a", "b", files=16)

    data_dirs = {os.path.dirname(f) for f in txlog.live_files(path)}
    assert len(data_dirs) == 1 and "optimize" in data_dirs.pop()
    # same rows, now clustered in BOTH dimensions
    assert txlog.txlog_read(spark, path).count() == 4000
    zdir = os.path.dirname(txlog.live_files(path)[0])
    assert _avg_file_coverage(zdir, "a") < 0.6
    assert _avg_file_coverage(zdir, "b") < 0.6
    # pre-optimize version still resolves its own (unclustered) files
    assert txlog.txlog_read(spark, path, v - 1).count() == 4000


def test_history_describes_commits(spark, tmp_path):
    path = str(tmp_path / "t")
    txlog.txlog_write(_df(spark, 0, 10).repartition(2), path)
    txlog.txlog_write(_df(spark, 10, 15), path, extra={"batch_id": 7})
    live_before = len(txlog.live_files(path))
    txlog.txlog_write(_df(spark, 100, 103), path, mode="overwrite")
    h = {r["version"]: r for r in txlog.txlog_history(spark, path).collect()}
    assert set(h) == {0, 1, 2}
    assert h[0]["n_adds"] == 2 and h[0]["n_removes"] == 0
    assert h[1]["batch_id"] == 7
    # overwrite retires every previously-live file
    assert h[2]["n_removes"] == live_before
    assert not any(r["is_checkpoint"] for r in h.values())
    txlog.txlog_vacuum(path, keep_versions=1)
    h2 = txlog.txlog_history(spark, path).collect()
    assert len(h2) == 1 and h2[0]["is_checkpoint"]


def test_streaming_upsert_latest_wins_and_replay_safe(spark, tmp_path):
    """Two micro-batches carry overlapping keys with newer values; the
    table must end with ONE row per key holding the latest value,
    every commit must be atomic (one log entry per batch), and a
    checkpointed replay must commit nothing new."""
    import gzip
    import json as _json

    from serverless_datalake_spark.streaming import pipeline as sp

    staging = str(tmp_path / "staging")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(staging)

    def write_file(name, rows):
        with gzip.open(os.path.join(staging, name), "wt") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    def evt(i, hour, value):
        return {
            "event_id": i, "ts": f"2024-01-01T{hour:02d}:00:00.000",
            "user_id": i % 4, "event_type": "clicks", "value": value,
            "props": "{}",
        }

    # batch 1: keys 0..9 at v=1.0; includes an intra-batch older dup of
    # key 3 that latest-wins must drop
    write_file("a.json.gz", [evt(i, 1, 1.0) for i in range(10)] + [evt(3, 0, -1.0)])
    stream = sp.read_event_stream(spark, staging, dedup=False)
    sp.start_txlog_upsert_query(stream, table, ckpt).awaitTermination()
    t1 = txlog.txlog_read(spark, table)
    assert t1.count() == 10
    assert t1.where("event_id = 3").collect()[0]["value"] == 1.0

    # batch 2: keys 5..14 at v=2.0 (5..9 are updates, 10..14 inserts)
    write_file("b.json.gz", [evt(i, 2, 2.0) for i in range(5, 15)])
    sp.start_txlog_upsert_query(
        sp.read_event_stream(spark, staging, dedup=False), table, ckpt
    ).awaitTermination()
    t2 = txlog.txlog_read(spark, table)
    assert t2.count() == 15
    got = {r["event_id"]: r["value"] for r in t2.collect()}
    assert all(got[i] == 1.0 for i in range(5))
    assert all(got[i] == 2.0 for i in range(5, 15))

    # replay the drained source: no new commits
    head = len(txlog._entries(table))
    sp.start_txlog_upsert_query(
        sp.read_event_stream(spark, staging, dedup=False), table, ckpt
    ).awaitTermination()
    assert len(txlog._entries(table)) == head
    assert txlog.txlog_read(spark, table).count() == 15


def test_additive_schema_evolution_reads_old_files_as_null(spark, tmp_path):
    """ADD COLUMN evolution: a later commit carries an extra column;
    merge_schema unions footers and back-fills NULL for old files,
    while the default read keeps the fast single-schema path."""
    from serverless_datalake_spark.sources.txlog import txlog_read, txlog_write

    path = str(tmp_path / "tbl")
    txlog_write(spark.createDataFrame([(1, "a")], "id long, grp string"), path)
    txlog_write(
        spark.createDataFrame(
            [(2, "b", 99)], "id long, grp string, score long"
        ),
        path,
    )
    evolved = txlog_read(spark, path, merge_schema=True)
    assert set(evolved.columns) == {"id", "grp", "score"}
    rows = {r["id"]: r["score"] for r in evolved.collect()}
    assert rows == {1: None, 2: 99}


def test_partition_stats_prune_file_list(spark, sf_dir, tmp_path):
    """The pruned read must open strictly fewer files than the live
    set, never lose rows, and keep legacy (unstatted) files visible."""
    from pyspark.sql import functions as F

    from serverless_datalake_spark.sources.txlog import (
        live_files_pruned,
        txlog_read,
        txlog_read_pruned,
        txlog_write,
        txlog_write_partitioned,
    )
    from serverless_datalake_spark.tables import load_table

    path = str(tmp_path / "pp")
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    txlog_write(ev.where(F.col("event_id") % 2 == 1), path)          # legacy, no stats
    txlog_write_partitioned(ev.where(F.col("event_id") % 2 == 0), path, "event_type")

    files, total = live_files_pruned(path, "event_type", ["purchase"])
    assert len(files) < total, (len(files), total)        # skipping happened
    legacy_rows = txlog_read(spark, path).where(F.col("event_id") % 2 == 1).count()
    pruned = txlog_read_pruned(spark, path, "event_type", ["purchase"])
    # every legacy row survives the prune (unstatted files unprunable)
    assert pruned.where(F.col("event_id") % 2 == 1).count() == legacy_rows
    # exactness after residual filter
    expect = ev.where(
        (F.col("event_type") == "purchase") & (F.col("event_id") % 2 == 0)
    ).count()
    got = pruned.where(
        (F.col("event_type") == "purchase") & (F.col("event_id") % 2 == 0)
    ).count()
    assert got == expect


def test_partition_stats_survive_removes(spark, sf_dir, tmp_path):
    """Overwrite removes prior files AND their stats; the new
    generation's stats drive pruning alone."""
    from pyspark.sql import functions as F

    from serverless_datalake_spark.sources.txlog import (
        live_files_pruned,
        txlog_write_partitioned,
    )
    from serverless_datalake_spark.tables import load_table

    path = str(tmp_path / "pp2")
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    txlog_write_partitioned(ev, path, "event_type")
    txlog_write_partitioned(
        ev.where(F.col("event_type").isin("click", "view")), path, "event_type",
        mode="overwrite",
    )
    files, total = live_files_pruned(path, "event_type", ["click"])
    assert 0 < len(files) < total
    files_gone, _ = live_files_pruned(path, "event_type", ["purchase"])
    assert files_gone == []  # purchase generation fully overwritten


def test_partition_stats_null_and_nonjson_values(spark, tmp_path):
    """NULL partition values must be committed (not silently dropped
    by null-unsafe equality) with an explicit null stat, and non-JSON
    partition types (date) must serialize in the log entry without
    raising after data files are already written."""
    import datetime

    from pyspark.sql import functions as F

    from serverless_datalake_spark.sources.txlog import (
        txlog_read,
        txlog_read_pruned,
        txlog_write_partitioned,
    )

    path = str(tmp_path / "ppnull")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None)], "id int, k string"
    )
    txlog_write_partitioned(df, path, "k")
    # no data loss: NULL-keyed rows are committed
    assert txlog_read(spark, path).count() == 4
    # the NULL partition prunes like any other value
    nulls = txlog_read_pruned(spark, path, "k", [None])
    assert sorted(r.id for r in nulls.where(F.col("k").isNull()).collect()) == [2, 4]

    path2 = str(tmp_path / "ppdate")
    dd = spark.createDataFrame(
        [(1, datetime.date(2024, 1, 1)), (2, datetime.date(2024, 1, 2))],
        "id int, d date",
    )
    txlog_write_partitioned(dd, path2, "d")  # json.dump must not raise
    got = txlog_read_pruned(spark, path2, "d", [datetime.date(2024, 1, 2)])
    assert [r.id for r in got.where(F.col("d") == "2024-01-02").collect()] == [2]


def test_zonemap_prune_skips_files_and_keeps_rows(spark, sf_dir, tmp_path):
    """Range-clustered commit -> tight zone maps -> the range read
    opens strictly fewer files; unclustered commit still answers
    correctly (skip is a superset guarantee, never a filter)."""
    from pyspark.sql import functions as F

    from serverless_datalake_spark.sources.txlog import (
        live_files_zonemap_pruned,
        txlog_read_zonemap,
        txlog_write_zonemapped,
    )
    from serverless_datalake_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    expect = ev.where(F.col("value").between(50.0, 120.0)).count()

    clustered = str(tmp_path / "zm_clustered")
    txlog_write_zonemapped(ev.repartitionByRange(8, F.col("value")), clustered, ["value"])
    files, total = live_files_zonemap_pruned(clustered, "value", 50.0, 120.0)
    assert len(files) < total, (len(files), total)  # skipping happened
    got = (
        txlog_read_zonemap(spark, clustered, "value", 50.0, 120.0)
        .where(F.col("value").between(50.0, 120.0))
        .count()
    )
    assert got == expect

    # unclustered: zone maps are wide, skipping degrades, rows survive
    unclustered = str(tmp_path / "zm_unclustered")
    txlog_write_zonemapped(ev.repartition(8), unclustered, ["value"])
    f2, t2 = live_files_zonemap_pruned(unclustered, "value", 50.0, 120.0)
    # round-robin layout spreads the value range over every file, so
    # wide zone maps must keep them ALL (pruning any would be unsound)
    assert len(f2) == t2 and t2 > 1, (len(f2), t2)
    got2 = (
        txlog_read_zonemap(spark, unclustered, "value", 50.0, 120.0)
        .where(F.col("value").between(50.0, 120.0))
        .count()
    )
    assert got2 == expect

    # a column with no zone map never prunes (every file kept)
    f3, t3 = live_files_zonemap_pruned(clustered, "event_id", 0, 10)
    assert len(f3) == t3


def test_zonemap_and_membership_ordering_is_type_aware():
    """Pure-Python contract of the pruning keys (the round-5 advisor
    finding): Decimal stats survive the JSON round-trip as canonical
    numeric STRINGS, so ordered zone-map checks must compare them in
    the Decimal domain ('150' < '99' lexicographically would prune a
    file whose rows sit inside the query range), equality membership
    must not miss on trailing-zero flavors (1.0 vs 1.00), and any
    ambiguous pairing must KEEP the file (prune is an optimization,
    never a correctness filter)."""
    import json
    from decimal import Decimal

    from serverless_datalake_spark.sources.txlog import (
        _ord_pair,
        _stat_matches,
        _stat_repr,
    )

    def roundtrip(v):
        return json.loads(json.dumps(_stat_repr(v)))

    # Decimal zone map [100, 150] vs probe range [99, 200]: overlaps
    zlo, zhi = roundtrip(Decimal("100")), roundtrip(Decimal("150"))
    assert zlo == "100" and zhi == "150"  # canonical plain strings
    below = _ord_pair(zhi, Decimal("99"))   # file_max vs lo
    above = _ord_pair(zlo, Decimal("200"))  # file_min vs hi
    assert below is not None and not (below[0] < below[1])
    assert above is not None and not (above[0] > above[1])
    # genuinely disjoint: probe [200, 300] is above the file
    b2 = _ord_pair(zhi, Decimal("200"))
    assert b2 is not None and b2[0] < b2[1]
    # int/float probes against Decimal-string stats also order numerically
    b3 = _ord_pair(zhi, 200)
    assert b3 is not None and b3[0] < b3[1]
    assert _ord_pair(zhi, 99.5) is not None

    # VARCHAR stats stay lexicographic ('100' is a STRING here)
    s = _ord_pair("banana", "apple")
    assert s == ("banana", "apple")
    # ambiguous pairings (non-numeric stat vs numeric probe) → None → keep
    assert _ord_pair("banana", Decimal("5")) is None

    # membership: trailing-zero Decimal flavors are the same partition
    stored = roundtrip(Decimal("1.0"))
    assert _stat_matches(stored, Decimal("1.00"))
    assert _stat_matches(stored, Decimal("1"))
    assert not _stat_matches(stored, Decimal("1.01"))
    # int-stored stat probed with a Decimal (and vice versa)
    assert _stat_matches(7, Decimal("7"))
    assert _stat_matches(roundtrip(Decimal("7")), 7)
    # strings never numerically match a numeric probe's repr... but a
    # numeric-looking VARCHAR value colliding with a number only KEEPS
    # a file (conservative), which is the safe direction
    assert not _stat_matches("abc", Decimal("5"))


def test_ord_pair_temporal_format_normalization():
    """The round-6 advisor's zone-map bug: a timestamp stat
    '2024-01-02 00:00:00' probed with a DATE value '2024-01-02'
    compared lexicographically ('... 00:00:00' > '2024-01-02'), so a
    file whose midnight rows satisfy the predicate was marked disjoint
    and silently pruned. Temporal-shaped strings must normalize to one
    canonical datetime format (equal here, not '>'), and a
    temporal/plain-string mix must be ambiguous (file kept)."""
    import datetime as dt

    from serverless_datalake_spark.sources.txlog import _ord_pair, _stat_repr

    # timestamp file_min vs date probe hi: midnight == midnight
    p = _ord_pair("2024-01-02 00:00:00", _stat_repr(dt.date(2024, 1, 2)))
    assert p is not None and not (p[0] > p[1]), p  # NOT disjoint
    # date stat vs datetime probe, other direction
    p2 = _ord_pair("2024-01-02", _stat_repr(dt.datetime(2024, 1, 2, 0, 0, 1)))
    assert p2 is not None and p2[0] < p2[1]
    # fractional seconds order as a suffix within the shared format
    p3 = _ord_pair("2024-01-02 00:00:00.500000", "2024-01-02 00:00:01")
    assert p3 is not None and p3[0] < p3[1]
    # 'T'-separated ISO normalizes to the space form
    p4 = _ord_pair("2024-01-02T12:00:00", "2024-01-02 11:59:59")
    assert p4 is not None and p4[0] > p4[1]
    # temporal vs plain string → ambiguous → keep the file
    assert _ord_pair("2024-01-02", "banana") is None
    assert _ord_pair("banana", "2024-01-02") is None
    # zone-aware repr does not match the naive pattern → plain-string
    # pair (both aware: consistent), mixed aware/naive → ambiguous
    assert _ord_pair("2024-01-02 00:00:00+00:00", "2024-01-02") is None


def test_zonemap_prune_decimal_column(spark, tmp_path):
    """End-to-end: DECIMAL zone maps prune correctly — a probe range
    overlapping a file's [min, max] keeps it (string comparison would
    have skipped it and silently dropped committed rows)."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from serverless_datalake_spark.sources.txlog import (
        live_files_zonemap_pruned,
        txlog_read_zonemap,
        txlog_write_zonemapped,
    )

    path = str(tmp_path / "zm_dec")
    df = spark.range(0, 400).select(
        F.col("id"),
        (F.col("id") * F.lit("0.5").cast("decimal(10,2)"))
        .cast("decimal(10,2)")
        .alias("amt"),
    )
    # two range files: amt in [0, 99.5] and [100, 199.5]
    txlog_write_zonemapped(df.repartitionByRange(2, "amt"), path, ["amt"])

    # probe [99, 200]: overlaps BOTH files ('150' < '99' lexicographic
    # would have dropped the upper file)
    files, total = live_files_zonemap_pruned(
        path, "amt", Decimal("99"), Decimal("200")
    )
    assert len(files) == total
    got = (
        txlog_read_zonemap(spark, path, "amt", Decimal("99"), Decimal("200"))
        .where(F.col("amt").between(99, 200))
        .count()
    )
    assert got == df.where(F.col("amt").between(99, 200)).count()

    # probe strictly above the data: everything prunes
    f2, _ = live_files_zonemap_pruned(path, "amt", Decimal("500"), Decimal("900"))
    assert f2 == []


def test_zonemap_prune_timestamp_column_date_probe(spark, tmp_path):
    """End-to-end twin of the round-6 advisor's finding: a TIMESTAMP
    column's zone maps probed with DATE values must keep every file
    whose midnight rows satisfy the range (mixed-format lexicographic
    comparison marked '2024-01-02 00:00:00' > probe hi '2024-01-02'
    and silently pruned committed rows), and must still prune files
    genuinely outside the range."""
    import datetime as dt

    from pyspark.sql import functions as F

    from serverless_datalake_spark.sources.txlog import (
        live_files_zonemap_pruned,
        txlog_read_zonemap,
        txlog_write_zonemapped,
    )

    path = str(tmp_path / "zm_ts")
    # 8 hourly rows per day across 4 days, one range file per 2 days
    df = spark.range(0, 32).select(
        F.col("id"),
        F.timestamp_seconds(
            F.lit(int(dt.datetime(2024, 1, 1).timestamp()))
            + (F.col("id") / 8).cast("long") * 86400
            + F.pmod(F.col("id"), F.lit(8)) * 3600
        ).alias("ts"),
    )
    txlog_write_zonemapped(df.repartitionByRange(2, "ts"), path, ["ts"])

    # date probe [2024-01-03, 2024-01-04]: day 3 rows START at
    # midnight, which is exactly the second file's min — the mixed-
    # format compare called it disjoint
    lo, hi = dt.date(2024, 1, 3), dt.date(2024, 1, 4)
    files, total = live_files_zonemap_pruned(path, "ts", lo, hi)
    assert files, "date probe must keep the file holding day-3 rows"
    got = (
        txlog_read_zonemap(spark, path, "ts", lo, hi)
        .where(F.col("ts") >= F.lit("2024-01-03").cast("timestamp"))
        .where(F.col("ts") < F.lit("2024-01-05").cast("timestamp"))
        .count()
    )
    assert got == 16  # days 3 and 4, 8 rows each — nothing dropped

    # datetime probes prune on the same-format fast path: a range
    # strictly BELOW all data (the files' min is 2024-01-01 00:00:00)
    # drops every file, so normalization kept ordering exact
    f2, _ = live_files_zonemap_pruned(
        path, "ts", dt.datetime(2023, 12, 1, 0, 0), dt.datetime(2023, 12, 31, 23, 0)
    )
    assert f2 == []
    # genuinely-above DATE probe prunes everything too (date lo
    # normalized to midnight still exceeds every file max)
    f3, _ = live_files_zonemap_pruned(
        path, "ts", dt.date(2025, 1, 1), dt.date(2025, 2, 1)
    )
    assert f3 == []


def test_conditional_commit_blocks_lost_updates(spark, tmp_path):
    """Read-modify-write commits carry expected_head: a commit that
    landed after the snapshot read makes the overwrite RAISE instead
    of silently overwrite-removing the interloper's rows (the lost-
    update hole: upsert/delete used to absorb concurrent appends)."""
    path = str(tmp_path / "t")
    txlog.txlog_write(_df(spark, 0, 5), path)   # v0
    txlog.txlog_write(_df(spark, 5, 8), path)   # v1 — the interloper
    with pytest.raises(RuntimeError, match="concurrent commit"):
        txlog.txlog_write(
            _df(spark, 100, 103), path, mode="overwrite", expected_head=0
        )
    # nothing was lost: both committed versions still read back
    assert txlog.txlog_read(spark, path).count() == 8
    # expecting the TRUE head commits fine
    v = txlog.txlog_write(
        _df(spark, 100, 103), path, mode="overwrite", expected_head=1
    )
    assert v == 2 and txlog.txlog_read(spark, path).count() == 3
    # upsert into an empty table expects emptiness (-1): a racer's v0
    # would make the append raise rather than skip the merge
    p2 = str(tmp_path / "t2")
    txlog.txlog_write(_df(spark, 0, 3), p2)
    with pytest.raises(RuntimeError, match="concurrent commit"):
        txlog.txlog_write(_df(spark, 3, 6), p2, expected_head=-1)


def test_vacuum_rejects_keep_nothing(spark, tmp_path):
    """keep_versions < 1 would delete the live snapshot while writing
    a checkpoint that references it — refuse loudly."""
    path = str(tmp_path / "t")
    txlog.txlog_write(_df(spark, 0, 5), path)
    with pytest.raises(ValueError, match="keep_versions"):
        txlog.txlog_vacuum(path, keep_versions=0)
    assert txlog.txlog_read(spark, path).count() == 5  # untouched


def test_vacuum_checkpoint_preserves_pruning_stats(spark, tmp_path):
    """Squashing history must carry surviving files' stats/zonemaps
    into the checkpoint — otherwise every file that outlives a vacuum
    silently loses membership/zone-map skipping forever."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    df = spark.range(0, 40).select(
        F.col("id"), (F.pmod(F.col("id"), F.lit(2))).cast("string").alias("p")
    )
    txlog.txlog_write_partitioned(df, path, "p")            # v0 (stats)
    txlog.txlog_write(_df(spark, 100, 103), path)           # v1
    txlog.txlog_write(_df(spark, 103, 106), path)           # v2
    pruned_before, total_before = txlog.live_files_pruned(path, "p", ["0"])
    assert len(pruned_before) < total_before  # stats prune something
    txlog.txlog_vacuum(path, keep_versions=1)
    pruned_after, total_after = txlog.live_files_pruned(path, "p", ["0"])
    # same skipping power after the squash: v0's statted files that
    # survive still prune, not "every file unstatted"
    assert len(pruned_after) < total_after
    assert txlog.txlog_read(spark, path).count() == 46


def test_zonemap_leaf_index_with_struct_column(spark, tmp_path):
    """Zone maps must index parquet LEAF paths: a struct column
    preceding the stat column used to shift the index so the WRONG
    column's min/max was logged (then pruned files holding matching
    rows)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.struct(
            (F.col("id") * 1000).alias("a"), (F.col("id") * 2000).alias("b")
        ).alias("s"),
        F.col("id").alias("x"),
    )
    txlog.txlog_write_zonemapped(df.repartitionByRange(2, "x"), path, ["x"])
    # probe x in [60, 80]: only the upper range file may match; the
    # old arrow-index bug logged s.b's range (0..198000) for x and
    # the probe then pruned NOTHING or the wrong file
    files, total = txlog.live_files_zonemap_pruned(path, "x", 60, 80)
    assert total == 2 and len(files) == 1
    got = txlog.txlog_read_zonemap(spark, path, "x", 60, 80).where(
        (F.col("x") >= 60) & (F.col("x") <= 80)
    )
    assert got.count() == 21
    # nested stat columns simply stay unstatted (never pruned)
    f2, t2 = txlog.live_files_zonemap_pruned(path, "s", 0, 1)
    assert len(f2) == t2


def test_temporal_fractional_zeros_canonicalize():
    """'.000000' / trailing-zero fractions are the temporal twin of
    the Decimal trailing-zero rule: numerically equal instants must
    match the membership prune and order equal in the zone map."""
    from serverless_datalake_spark.sources.txlog import (
        _ord_pair,
        _stat_matches,
    )

    assert _stat_matches("2024-01-05 00:00:00", "2024-01-05 00:00:00.000000")
    assert _stat_matches("2024-01-05 00:00:00.500000", "2024-01-05 00:00:00.5")
    p = _ord_pair("2024-01-05 00:00:00", "2024-01-05 00:00:00.000000")
    assert p is not None and p[0] == p[1]
    p2 = _ord_pair("2024-01-05 00:00:00.250000", "2024-01-05 00:00:00.5")
    assert p2 is not None and p2[0] < p2[1]


def test_compact_and_optimize_on_degenerate_tables(spark, tmp_path):
    """Empty log or delete-all snapshot: the maintenance commands must
    raise the same FileNotFoundError txlog_read uses, not IndexError
    or a pathless AnalysisException."""
    empty = str(tmp_path / "missing")
    with pytest.raises(FileNotFoundError):
        txlog.txlog_compact(spark, empty)
    path = str(tmp_path / "t")
    txlog.txlog_write(_df(spark, 0, 5), path)
    # delete-all: overwrite with zero rows leaves a live-empty table
    txlog.txlog_delete(spark, path, _df(spark, 0, 5), "id")
    if not txlog.live_files(path):
        with pytest.raises(FileNotFoundError):
            txlog.txlog_compact(spark, path)
