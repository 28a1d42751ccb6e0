"""Reference-semantics tests (SURVEY.md §5): per-source partitioning
(R4), catalog append (R9), replay range-exactness + no re-catalog
(R12/R13, recorder:94–99), fan-out delivery (R11), concatenated-JSON
ingest format (§1.3), streaming ingest with dedup (§1.4)."""

from __future__ import annotations

import glob
import gzip
import json
import os

import pytest
from pyspark.sql import functions as F

from serverless_datalake_spark.sources import ingest, lake, replay
from serverless_datalake_spark.streaming import pipeline as streaming_pipeline


def _write_staging(tmpdir: str, events: list[dict], fname: str = "part-0.json.gz") -> str:
    os.makedirs(tmpdir, exist_ok=True)
    path = os.path.join(tmpdir, fname)
    with gzip.open(path, "wt") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    return path


def _mk_events(n: int, start_id: int = 0) -> list[dict]:
    sources = ["clicks", "tweets"]
    return [
        {
            "event_id": start_id + i,
            "ts": f"2024-01-01T{(i % 24):02d}:00:00.000",
            "user_id": i % 7,
            "event_type": sources[i % 2],
            "value": float(i),
            "props": json.dumps({"k": i}),
        }
        for i in range(n)
    ]


@pytest.fixture()
def paths(tmp_path):
    return {
        "staging": str(tmp_path / "staging"),
        "lake": str(tmp_path / "lake"),
        "catalog": str(tmp_path / "catalog"),
        "delivery": str(tmp_path / "delivery"),
        "checkpoint": str(tmp_path / "checkpoint"),
    }


def test_batch_ingest_partitions_and_catalogs(spark, paths):
    _write_staging(paths["staging"], _mk_events(100))
    res = ingest.ingest_batch(
        spark, paths["staging"], paths["lake"], paths["catalog"], paths["delivery"], "b0"
    )
    assert res["n_events"] == 100

    # R4: hive-partitioned per-source layout on disk
    parts = sorted(os.path.basename(p) for p in glob.glob(paths["lake"] + "/source=*"))
    assert parts == ["source=clicks", "source=tweets"]

    # R9: one catalog row per source for the batch, counts add up
    cat = ingest.read_catalog(spark, paths["catalog"])
    rows = {r["source"]: r for r in cat.collect()}
    assert set(rows) == {"clicks", "tweets"}
    assert sum(r["n_records"] for r in rows.values()) == 100
    assert all(r["file_key"].startswith(r["source"] + "/") for r in rows.values())

    # R11: every record delivered to its source partition
    delivered = spark.read.parquet(paths["delivery"])
    assert delivered.count() == 100
    by_src = {r["source"]: r["n"] for r in delivered.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by_src == {"clicks": 50, "tweets": 50}

    # partition pruning is actually in the plan (the DynamoDB-pk analog)
    pruned = spark.read.parquet(paths["lake"]).where(F.col("source") == "clicks")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(source" in plan


def test_catalog_range_predicates_reach_parquet(spark, paths):
    """The engine-written catalog has real TIMESTAMP columns, so the
    replay BETWEEN reaches the parquet scan as pushed min/max filters
    AND the source EQ prunes partitions — the DynamoDB pk+sk analog
    (SURVEY.md §4). (The driver fixtures store ns timestamps that need
    a conversion, which blocks pushdown there — the engine's own lake
    layout is what matters at scale.)"""
    _write_staging(paths["staging"], _mk_events(50))
    ingest.ingest_batch(spark, paths["staging"], paths["lake"], paths["catalog"], None, "b0")
    keys = replay.select_replay_keys(
        spark, paths["catalog"], "clicks", "2000-01-01", "2100-01-01"
    )
    # plan metadata defaults to 100-char truncation, which can hide
    # the second pushed filter
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        plan = keys._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert "PartitionFilters: [isnotnull(source" in plan
    assert "GreaterThanOrEqual(ingest_ts" in plan and "LessThanOrEqual(ingest_ts" in plan


def test_csv_roundtrip(spark, tmp_path, sf_dir):
    from serverless_datalake_spark.tables import load_table

    nation = load_table(spark, sf_dir, "nation")
    lake.write_csv(nation, str(tmp_path / "nation_csv"))
    back = lake.read_csv(
        spark, str(tmp_path / "nation_csv"), "n_nationkey INT, n_name STRING, n_regionkey INT"
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_replay_selects_exact_range_and_does_not_recatalog(spark, paths):
    # two batches at different ingest times
    _write_staging(paths["staging"], _mk_events(40), "part-0.json.gz")
    ingest.ingest_batch(spark, paths["staging"], paths["lake"], paths["catalog"], None, "b0")
    cat_after_b0 = ingest.read_catalog(spark, paths["catalog"]).collect()
    t_split = max(r["ingest_ts"] for r in cat_after_b0)

    staging2 = paths["staging"] + "2"
    _write_staging(staging2, _mk_events(60, start_id=1000), "part-1.json.gz")
    ingest.ingest_batch(spark, staging2, paths["lake"], paths["catalog"], None, "b1")

    n_cat_before = ingest.read_catalog(spark, paths["catalog"]).count()

    # R12: BETWEEN selects exactly the first batch's clicks entry
    keys = replay.select_replay_keys(
        spark, paths["catalog"], "clicks", "2000-01-01", t_split
    )
    assert keys.count() == 1
    assert keys.collect()[0]["file_key"] == "clicks/b0.parquet"

    # R13: replay delivers only batch b0's clicks events
    res = replay.replay(
        spark,
        paths["catalog"],
        paths["lake"],
        paths["delivery"],
        "clicks",
        "2000-01-01",
        t_split,
    )
    assert res["n_batches"] == 1
    assert res["n_events"] == 20  # 40 events, half clicks
    delivered = spark.read.parquet(paths["delivery"])
    assert delivered.count() == 20
    assert delivered.where(F.col("event_id") >= 1000).count() == 0

    # recorder:94-99 — replay writes NO new catalog entries
    assert ingest.read_catalog(spark, paths["catalog"]).count() == n_cat_before


def test_concatenated_json_parse_is_sound(spark, tmp_path):
    # the reference's at-rest format: concatenated objects, no delimiter
    # (SURVEY.md §1.3) — including a '}{' inside a string value, which
    # the reference's replace()-rewrite would corrupt and the old regex
    # split silently DROPPED; the raw_decode scanner parses it intact
    evs = _mk_events(3)
    evs[1]["props"] = json.dumps({"k": "}{tricky"})
    blob = "".join(json.dumps(e) for e in evs)
    p = tmp_path / "concat.json.gz"
    with gzip.open(p, "wt") as f:
        f.write(blob)
    parsed = lake.parse_concatenated_json(spark, str(p))
    rows = {r["event_id"]: r for r in parsed.collect()}
    assert sorted(rows) == [0, 1, 2]  # nothing dropped, nothing corrupted
    assert json.loads(rows[1]["props"]) == {"k": "}{tricky"}
    # whitespace-separated objects and a truncated tail: valid prefix
    # records survive, only the undecodable tail is discarded
    blob2 = (
        json.dumps(evs[0]) + "  " + json.dumps(evs[2]) + '{"event_id": 99, "trunc'
    )
    p3 = tmp_path / "concat2.json.gz"
    with gzip.open(p3, "wt") as f:
        f.write(blob2)
    got2 = sorted(
        r["event_id"] for r in lake.parse_concatenated_json(spark, str(p3)).collect()
    )
    assert got2 == [0, 2]
    # JSON-lines path parses everything including the tricky value
    p2 = tmp_path / "lines"
    _write_staging(str(p2), evs)
    assert lake.read_json_events(spark, str(p2)).count() == 3


def test_snapshot_read_as_of(spark, paths):
    """Time-travel: reading as-of an earlier catalog timestamp sees
    only the batches cataloged by then."""
    _write_staging(paths["staging"], _mk_events(30), "part-0.json.gz")
    ingest.ingest_batch(spark, paths["staging"], paths["lake"], paths["catalog"], None, "b0")
    t_after_b0 = max(
        r["ingest_ts"] for r in ingest.read_catalog(spark, paths["catalog"]).collect()
    )
    staging2 = paths["staging"] + "_2"
    _write_staging(staging2, _mk_events(50, start_id=1000), "part-1.json.gz")
    ingest.ingest_batch(spark, staging2, paths["lake"], paths["catalog"], None, "b1")

    snap = replay.read_lake_as_of(spark, paths["catalog"], paths["lake"], t_after_b0)
    assert snap.count() == 30
    assert snap.where(F.col("event_id") >= 1000).count() == 0
    full = spark.read.parquet(paths["lake"])
    assert full.count() == 80
    # selection is a distributed semi-join, not a driver-built literal
    # IN list (which would grow with catalog size)
    plan = snap._jdf.queryExecution().executedPlan().toString()
    assert "Join LeftSemi" in plan or "BroadcastHashJoin" in plan
    assert "batch_id IN (" not in plan


def test_topic_registry_fanout_and_subscribe(spark, tmp_path):
    """E3: late-bound per-source topics — every record reaches exactly
    its source's topic; a subscriber sees only its own topic; a newly
    registered source needs no producer change."""
    from serverless_datalake_spark.sources import distribution

    reg = distribution.TopicRegistry(str(tmp_path / "topics"))
    reg.register("tweets", str(tmp_path / "special-tweets-sink"))  # override

    _write_staging(str(tmp_path / "stg"), _mk_events(80))
    events = (
        lake.read_json_events(spark, str(tmp_path / "stg"))
        .withColumn("source", F.col("event_type"))
    )
    delivered = distribution.deliver(events, reg)
    assert set(delivered) == {"clicks", "tweets"}
    assert delivered["tweets"].endswith("special-tweets-sink")

    clicks = distribution.subscribe(spark, reg, "clicks")
    tweets = distribution.subscribe(spark, reg, "tweets")
    assert clicks.count() == 40 and tweets.count() == 40
    assert clicks.where(F.col("source") != "clicks").count() == 0
    # totals conserved: fan-out delivers every record exactly once
    assert clicks.count() + tweets.count() == events.count()


def test_json_gz_roundtrip_reference_format(spark, tmp_path, sf_dir):
    """R3 fidelity: events written as gzip JSON-lines partitioned by
    source read back losslessly through the schema-first reader."""
    from serverless_datalake_spark.tables import load_table

    e = (
        load_table(spark, sf_dir, "events")
        .limit(200)
        .withColumn("source", F.col("event_type"))
    )
    out = str(tmp_path / "export")
    lake.write_json_gz(e.drop("source"), out, partition_col=None)
    files = glob.glob(out + "/*.json.gz")
    assert files, "must write .json.gz parts"
    back = lake.read_json_events(spark, out)
    assert back.count() == 200
    a = {r["event_id"]: r["value"] for r in back.collect()}
    b = {r["event_id"]: r["value"] for r in e.collect()}
    assert a == b


def test_schema_evolution_merge(spark, tmp_path):
    """A later batch adds a column; mergeSchema read unions schemas
    and nulls the missing column for old rows."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.mode("append").parquet(p)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.mode("append").parquet(p)
    merged = lake.read_with_evolved_schema(spark, p)
    assert set(merged.columns) == {"id", "v", "score"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows == {1: None, 2: 9.5}


def test_corrupt_json_rows_are_isolated_not_fatal(spark, tmp_path):
    """PERMISSIVE parsing: malformed rows become nulls instead of
    failing the job — at 100 TB a single bad record must never kill an
    ingest; the quarantine filter routes them aside."""
    p = tmp_path / "staging"
    os.makedirs(p, exist_ok=True)
    good = _mk_events(5)
    with gzip.open(p / "mixed.json.gz", "wt") as f:
        for e in good[:3]:
            f.write(json.dumps(e) + "\n")
        f.write('{"event_id": "not-a-number", "ts": "garbage"\n')  # malformed
        for e in good[3:]:
            f.write(json.dumps(e) + "\n")
    df = lake.read_json_events(spark, str(p))
    ok = df.where(F.col("event_id").isNotNull())
    bad = df.where(F.col("event_id").isNull())
    assert ok.count() == 5
    assert bad.count() == 1


def test_streaming_ingest_dedup_and_catalog(spark, paths):
    # at-least-once input: 120 events, 20 exact re-deliveries (§1.4)
    evs = _mk_events(100)
    _write_staging(paths["staging"], evs + evs[:20], "part-0.json.gz")
    streaming_pipeline.run_ingest_available_now(
        spark,
        paths["staging"],
        paths["lake"],
        paths["catalog"],
        paths["delivery"],
        paths["checkpoint"],
    )
    landed = spark.read.parquet(paths["lake"])
    assert landed.count() == 100  # duplicates dropped by the state store
    assert landed.select("event_id").distinct().count() == 100

    cat = ingest.read_catalog(spark, paths["catalog"])
    assert {r["source"] for r in cat.collect()} == {"clicks", "tweets"}
    assert cat.agg(F.sum("n_records")).collect()[0][0] == 100

    # restartability: draining again with the same checkpoint is a no-op
    streaming_pipeline.run_ingest_available_now(
        spark,
        paths["staging"],
        paths["lake"],
        paths["catalog"],
        paths["delivery"],
        paths["checkpoint"],
    )
    assert spark.read.parquet(paths["lake"]).count() == 100


def test_null_source_routes_to_quarantine_not_crash(spark, tmp_path):
    """A record missing event_type (null source) must land in an
    explicit __unknown__ partition/topic — not a NULL Hive partition
    followed by a TypeError AFTER the writes committed (a retry would
    then duplicate the whole batch), and not a row no topic equality
    can ever match."""
    from serverless_datalake_spark.sources import distribution, ingest

    evs = _mk_events(6)
    evs[2]["event_type"] = None
    staging = str(tmp_path / "staging")
    _write_staging(staging, evs)
    out = ingest.ingest_batch(
        spark,
        staging,
        str(tmp_path / "lake"),
        str(tmp_path / "cat"),
        str(tmp_path / "deliv"),
        "b0",
    )
    assert out["n_events"] == 6
    lakedf = spark.read.parquet(str(tmp_path / "lake"))
    assert lakedf.where(F.col("source") == "__unknown__").count() == 1
    assert lakedf.count() == 6  # conservation incl. the null-source row

    # streaming-style topic delivery: null source reaches a quarantine
    # topic via a null-safe match, totals conserved
    reg = distribution.TopicRegistry(str(tmp_path / "topics"))
    batch = spark.createDataFrame(
        [(1, "clicks", 1.0), (2, None, 2.0)], "event_id long, source string, value double"
    )
    delivered = distribution.deliver(batch, reg)
    assert "__unknown__" in delivered
    assert spark.read.parquet(delivered["__unknown__"]).count() == 1


def test_deliver_quarantines_unsafe_source_names_atomically(spark, tmp_path):
    """deliver() used to validate topic names INSIDE the write loop: an
    unsafe name raised after earlier topics were appended, so a retried
    batch duplicated them. Now every topic resolves before the first
    write and unsafe names route to the quarantine topic like nulls —
    rows conserved, no exception, nothing half-delivered."""
    from serverless_datalake_spark.sources import distribution

    reg = distribution.TopicRegistry(str(tmp_path / "topics"))
    batch = spark.createDataFrame(
        [(1, "clicks", 1.0), (2, "../../tmp/evil", 2.0), (3, None, 3.0)],
        "event_id long, source string, value double",
    )
    delivered = distribution.deliver(batch, reg)
    assert spark.read.parquet(delivered["clicks"]).count() == 1
    # unsafe + null rows both land in quarantine (2 rows), keyed so the
    # caller can see which raw names were quarantined
    assert delivered["../../tmp/evil"] == delivered["__unknown__"]
    q = spark.read.parquet(delivered["__unknown__"])
    assert q.count() == 2
    assert {r["event_id"] for r in q.collect()} == {2, 3}
    # idempotence of the conservation property: total rows out == in
    total = sum(
        spark.read.parquet(p).count() for p in sorted(set(delivered.values()))
    )
    assert total == 3


def test_concatenated_json_resyncs_after_midline_corruption(spark, tmp_path):
    """A decode error mid-line must not drop the valid objects after
    it: the scanner skips to the next '{' and retries, losing only the
    genuinely undecodable bytes (the round-6 advisor's finding)."""
    evs = _mk_events(3)
    blob = (
        json.dumps(evs[0])
        + '{"event_id": 98, "broken'  # corrupt object, no closing brace
        + json.dumps(evs[1])
        + json.dumps(evs[2])
    )
    p = tmp_path / "corrupt-mid.json.gz"
    with gzip.open(p, "wt") as f:
        f.write(blob)
    got = sorted(
        r["event_id"] for r in lake.parse_concatenated_json(spark, str(p)).collect()
    )
    assert got == [0, 1, 2]


def test_topic_registry_rejects_unsafe_source_names(tmp_path):
    """Topic names come from event DATA: traversal/absolute paths must
    not resolve to a write location outside the topics root."""
    import pytest as _pytest

    from serverless_datalake_spark.sources.distribution import TopicRegistry

    reg = TopicRegistry(str(tmp_path / "topics"))
    for bad in ("../../tmp/evil", "/etc/cron.d/x", "a/../../b", ""):
        with _pytest.raises(ValueError, match="unsafe topic source"):
            reg.resolve(bad)
    # explicit overrides are operator-configured, not data — allowed
    reg.register("weird", "/elsewhere/ok")
    assert reg.resolve("weird") == "/elsewhere/ok"
    assert reg.resolve("clicks").endswith("topics/clicks")


def test_replay_batch_keys_survive_slash_in_source(spark):
    """file_key is '{source}/{batch}.parquet'; the batch id is the
    LAST segment — splitting on the first '/' broke sources containing
    '/' (selected nothing, silently)."""
    from serverless_datalake_spark.sources.replay import _batch_id_keys

    rows = spark.createDataFrame(
        [("ads/click/b0.parquet",), ("tweets/b1.parquet",)], "file_key string"
    )
    got = sorted(r["batch_id"] for r in _batch_id_keys(rows).collect())
    assert got == ["b0", "b1"]


def test_replay_requires_batch_ids(spark, tmp_path):
    """A lake without batch_id cannot honor a replay interval — raise
    instead of silently re-delivering the source's entire history."""
    import datetime as dt

    import pytest as _pytest

    from serverless_datalake_spark.sources import replay as rp

    # a lake written WITHOUT batch ids
    df = spark.createDataFrame(
        [(1, "clicks", "2024-01-01 01:00:00")], "event_id long, source string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.partitionBy("source").parquet(str(tmp_path / "lake"))
    # a catalog selecting one batch
    cat = spark.createDataFrame(
        [("clicks", "2024-01-01 00:30:00", "clicks/b0.parquet", 1)],
        "source string, ingest_ts string, file_key string, n_records long",
    ).withColumn("ingest_ts", F.col("ingest_ts").cast("timestamp"))
    cat.write.partitionBy("source").parquet(str(tmp_path / "cat"))
    with _pytest.raises(ValueError, match="no batch_id"):
        rp.replay(
            spark,
            str(tmp_path / "cat"),
            str(tmp_path / "lake"),
            str(tmp_path / "deliv"),
            "clicks",
            dt.datetime(2024, 1, 1),
            dt.datetime(2024, 1, 2),
        )
