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
