"""Incremental materialized view: refresh == rebuild after arbitrary
append/upsert/delete interleavings, and append-only refreshes read
only the delta files (file-level change feed, no full-table scan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_datalake_spark.sources.matview import (
    current_version,
    mv_build,
    mv_refresh,
    mv_source_version,
    txlog_file_changes,
)
from serverless_datalake_spark.sources.txlog import (
    txlog_delete,
    txlog_read,
    txlog_upsert,
    txlog_write,
)


def _rows(spark, pairs):
    return spark.createDataFrame(
        [(int(k), str(g), int(c)) for k, g, c in pairs], "id long, grp string, cents long"
    )


def _unit():
    return F.col("cents")


KEYS = ["grp"]


def _rebuild(spark, src):
    return (
        txlog_read(spark, src)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("cents")).alias("sum_units"),
        )
    )


def _assert_view_matches(spark, src, mv):
    got = {
        (r["grp"], r["n_rows"], r["sum_units"])
        for r in txlog_read(spark, mv).collect()
    }
    want = {
        (r["grp"], r["n_rows"], r["sum_units"])
        for r in _rebuild(spark, src).collect()
    }
    assert got == want


def test_refresh_tracks_appends_upserts_deletes(spark, tmp_path):
    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    txlog_write(_rows(spark, [(1, "a", 10), (2, "b", 20)]), src)
    mv_build(spark, src, mv, KEYS, _unit())
    _assert_view_matches(spark, src, mv)

    # append-only commit → delta-only refresh
    txlog_write(_rows(spark, [(3, "a", 5), (4, "c", 7)]), src)
    added, removed = txlog_file_changes(src, mv_source_version(mv))
    assert added and not removed  # appends never remove files
    mv_refresh(spark, src, mv, KEYS, _unit())
    _assert_view_matches(spark, src, mv)

    # upsert rewrites (copy-on-write) → refresh still exact
    txlog_upsert(spark, src, _rows(spark, [(2, "b", 99), (5, "a", 1)]), "id")
    mv_refresh(spark, src, mv, KEYS, _unit())
    _assert_view_matches(spark, src, mv)

    # delete a whole group → emptied group drops out of the view
    txlog_delete(spark, src, spark.createDataFrame([(4,)], "id long"), "id")
    mv_refresh(spark, src, mv, KEYS, _unit())
    _assert_view_matches(spark, src, mv)
    groups = {r["grp"] for r in txlog_read(spark, mv).collect()}
    assert "c" not in groups


def test_refresh_is_idempotent_when_source_unchanged(spark, tmp_path):
    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    txlog_write(_rows(spark, [(1, "a", 10)]), src)
    mv_build(spark, src, mv, KEYS, _unit())
    v1 = current_version(mv)
    v2 = mv_refresh(spark, src, mv, KEYS, _unit())
    assert v1 == v2  # no-op: no new view version committed


def test_append_only_delta_is_exactly_new_files(spark, tmp_path):
    src = str(tmp_path / "src")
    txlog_write(_rows(spark, [(1, "a", 10)]), src)
    v0 = current_version(src)
    txlog_write(_rows(spark, [(2, "b", 20)]), src)
    txlog_write(_rows(spark, [(3, "b", 30)]), src)
    added, removed = txlog_file_changes(src, v0)
    assert not removed
    # delta files contain exactly the appended rows
    got = sorted(r["id"] for r in spark.read.parquet(*added).collect())
    assert got == [2, 3]


def test_refresh_raises_when_source_vacuumed_past_stamp(spark, tmp_path):
    """A source vacuum that squashes history past the view's stamp
    must make refresh RAISE — replaying to the pre-checkpoint version
    yields an empty before-set, which used to read as 'everything was
    added' and silently ~double every count/sum in the view (round-7
    review finding)."""
    import pytest

    from serverless_datalake_spark.sources.txlog import txlog_vacuum

    src, mv = str(tmp_path / "src"), str(tmp_path / "mv")
    txlog_write(_rows(spark, [(1, "a", 10)]), src)
    mv_build(spark, src, mv, KEYS, _unit())
    txlog_write(_rows(spark, [(2, "a", 5)]), src)
    txlog_write(_rows(spark, [(3, "b", 7)]), src)
    txlog_vacuum(src, keep_versions=1)  # horizon > stamped version 0
    with pytest.raises(ValueError, match="vacuum"):
        mv_refresh(spark, src, mv, KEYS, _unit())
    # recovery path: full rebuild, then incremental refresh works again
    mv_build(spark, src, mv, KEYS, _unit())
    txlog_write(_rows(spark, [(4, "b", 2)]), src)
    mv_refresh(spark, src, mv, KEYS, _unit())
    _assert_view_matches(spark, src, mv)


def test_view_stamp_survives_view_vacuum(spark, tmp_path):
    """txlog_vacuum's checkpoint must carry the mv_source_version
    stamp forward — it used to drop every non-structural field, so a
    vacuumed view could never refresh again (round-7 review finding)."""
    from serverless_datalake_spark.sources.txlog import txlog_vacuum

    src, mv = str(tmp_path / "src"), str(tmp_path / "mv")
    txlog_write(_rows(spark, [(1, "a", 10)]), src)
    mv_build(spark, src, mv, KEYS, _unit())
    txlog_write(_rows(spark, [(2, "b", 3)]), src)
    mv_refresh(spark, src, mv, KEYS, _unit())
    stamped = mv_source_version(mv)
    txlog_vacuum(mv, keep_versions=1)
    assert mv_source_version(mv) == stamped
    txlog_write(_rows(spark, [(3, "b", 4)]), src)
    mv_refresh(spark, src, mv, KEYS, _unit())
    _assert_view_matches(spark, src, mv)


def test_restamp_is_metadata_only(spark, tmp_path):
    """A source commit with no file changes advances the stamp via a
    metadata-only entry — no view rows rewritten (the previous restamp
    paid a full read+rewrite of the view, round-7 review finding)."""
    from serverless_datalake_spark.sources.txlog import (
        _entries,
        txlog_commit_metadata,
    )

    src, mv = str(tmp_path / "src"), str(tmp_path / "mv")
    txlog_write(_rows(spark, [(1, "a", 10)]), src)
    mv_build(spark, src, mv, KEYS, _unit())
    txlog_commit_metadata(src, {"note": "schema-tag"})  # no file delta
    v = mv_refresh(spark, src, mv, KEYS, _unit())
    head = [e for e in _entries(mv) if e["version"] == v][0]
    assert head["adds"] == [] and head["removes"] == []
    assert mv_source_version(mv) == current_version(src)
    _assert_view_matches(spark, src, mv)


def test_refresh_conditioned_on_view_head(spark, tmp_path):
    """mv_refresh commits with expected_head: a view head that moved
    after the stamp was read (a concurrent refresh) raises instead of
    silently double-applying the delta (round-7 review finding)."""
    import pytest

    from serverless_datalake_spark.sources.txlog import txlog_commit_metadata

    src, mv = str(tmp_path / "src"), str(tmp_path / "mv")
    txlog_write(_rows(spark, [(1, "a", 10)]), src)
    mv_build(spark, src, mv, KEYS, _unit())
    txlog_write(_rows(spark, [(2, "a", 5)]), src)

    import serverless_datalake_spark.sources.matview as mvmod

    real_changes = mvmod.txlog_file_changes
    state = {"raced": False}

    def racing_changes(path, from_version, to_version=None):
        if not state["raced"]:
            state["raced"] = True
            # a concurrent commit moves the view head between the
            # stamp-read and this refresh's conditioned commit
            txlog_commit_metadata(mv, {"note": "racer"})
        return real_changes(path, from_version, to_version)

    mvmod.txlog_file_changes = racing_changes
    try:
        with pytest.raises(RuntimeError, match="concurrent commit"):
            mv_refresh(spark, src, mv, KEYS, _unit())
    finally:
        mvmod.txlog_file_changes = real_changes
    # the loser re-runs cleanly (the racer already advanced the stamp)
    mv_refresh(spark, src, mv, KEYS, _unit())
    _assert_view_matches(spark, src, mv)
