"""Z-order layout: every output file must cover a narrow slice of
BOTH clustering dimensions, where a 1-D sort covers a narrow slice of
one and ~the full range of the other. Measured from real parquet
footers (min/max stats) — the same stats Spark's scan uses to skip
row groups, so narrow coverage IS skipping ability."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from serverless_datalake_spark.sources.zorder import write_zordered
from serverless_datalake_spark.tables import load_table


def _avg_file_coverage(path: str, col: str) -> float:
    spans = []
    for f in sorted(glob.glob(path + "/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        idx = names.index(col)
        st = [md.row_group(g).column(idx).statistics for g in range(md.num_row_groups)]
        spans.append((min(s.min for s in st), max(s.max for s in st)))
    gmin = min(s[0] for s in spans)
    gmax = max(s[1] for s in spans)
    rng = gmax - gmin or 1
    return sum((hi - lo) / rng for lo, hi in spans) / len(spans)


def test_zorder_files_cluster_both_dimensions(spark, sf_dir, tmp_path):
    e = (
        load_table(spark, sf_dir, "events")
        .select(F.unix_timestamp("ts").alias("ts_s"), "user_id", "value")
    )
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    write_zordered(e, zpath, "ts_s", "user_id", files=8)
    # baseline: classic single-column sort layout
    (
        e.repartitionByRange(8, "ts_s")
        .sortWithinPartitions("ts_s")
        .write.mode("overwrite")
        .parquet(spath)
    )

    # the 1-D layout is perfect on its sort column and useless on the other
    assert _avg_file_coverage(spath, "ts_s") < 0.25
    assert _avg_file_coverage(spath, "user_id") > 0.9
    # the z-order layout is good on BOTH
    assert _avg_file_coverage(zpath, "ts_s") < 0.6
    assert _avg_file_coverage(zpath, "user_id") < 0.6

    # and it is still the same table
    got = spark.read.parquet(zpath)
    assert got.count() == e.count()
    assert sorted(got.columns) == sorted(e.columns)
    # a conjunctive 2-D predicate returns identical rows
    pred = (F.col("user_id") < 5) & (F.col("ts_s") % 7 == 0)
    assert got.where(pred).count() == e.where(pred).count()


def test_zorder_approx_variant_clusters_without_global_sort(spark, sf_dir, tmp_path):
    from serverless_datalake_spark.sources.zorder import zorder_key_approx

    e = (
        load_table(spark, sf_dir, "events")
        .select(F.unix_timestamp("ts").alias("ts_s"), "user_id", "value")
    )
    zpath = str(tmp_path / "za")
    (
        zorder_key_approx(e, "ts_s", "user_id", bits=4)
        .repartitionByRange(8, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(zpath)
    )
    # both dimensions clustered (vs 1.0 for the unsorted dimension of
    # a single-column layout; see the exact-variant test above)
    assert _avg_file_coverage(zpath, "ts_s") < 0.6
    assert _avg_file_coverage(zpath, "user_id") < 0.6
    # no WindowExec in the plan — the sketch replaced the global sort
    plan = (
        zorder_key_approx(e, "ts_s", "user_id", bits=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan


def test_zorder_exact_method_still_available(spark, sf_dir, tmp_path):
    """write_zordered defaults to the approx key (no global sort); the
    exact percent_rank path stays selectable and produces an equally
    clustered layout on small data."""
    e = (
        load_table(spark, sf_dir, "events")
        .select(F.unix_timestamp("ts").alias("ts_s"), "user_id", "value")
    )
    zpath = str(tmp_path / "ze")
    write_zordered(e, zpath, "ts_s", "user_id", files=8, method="exact")
    assert _avg_file_coverage(zpath, "ts_s") < 0.6
    assert _avg_file_coverage(zpath, "user_id") < 0.6
    assert spark.read.parquet(zpath).count() == e.count()
