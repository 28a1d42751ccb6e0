"""Spark 4 Python STREAMING DataSource: a custom micro-batch source
with real offset/commit semantics (the streaming twin of the batch
Python DataSource in queries/scaletech.scan_python_datasource).

Reference parity: the reference's ingest endpoint feeds Kinesis
Firehose, which Spark mounts only through built-in connectors; the
Python streaming DataSource API is the Spark-native way to mount ANY
bespoke feed (REST paginator, queue, change stream) as a first-class
streaming table with exactly-once progress tracking
(ref: src/event_receiver/lambda_function.py:12-24 — the HTTP→buffer
hop this source replaces with a pull-based offset contract).

Design notes for the 100 TB / production posture:
* Offsets are the SOURCE OF TRUTH: `read(start)` returns
  (rows, end_offset); Spark persists the offset range in the
  checkpoint WAL before the batch is visible downstream, so a crash
  between batches replays the same range (`readBetweenOffsets`)
  instead of skipping or duplicating — exactly-once given a
  deterministic range read, which is the same contract Kafka/Kinesis
  connectors implement.
* A SimpleDataSourceStreamReader serves reads from the driver —
  right for control-plane-bounded feeds (API pages, admission
  queues). A shard-parallel feed would implement the partitioned
  `DataSourceStreamReader` instead, one InputPartition per shard —
  same offset contract, executor-side pulls.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader


class CounterEventsStreamReader(SimpleDataSourceStreamReader):
    """Deterministic bounded feed: rows (seq, payload) for
    seq ∈ [0, limit), served `batch` rows per micro-batch. The
    generator is a pure function of the offset, so replays after a
    checkpoint restart reproduce byte-identical batches."""

    def __init__(self, options) -> None:
        self.batch = int(options.get("batch", "5"))
        self.limit = int(options.get("limit", "20"))

    def initialOffset(self) -> dict:
        return {"seq": 0}

    @staticmethod
    def _rows(start: int, end: int):
        # iter(list), specifically: the driver-side prefetch cache
        # needs a real iterator (it calls next() when populating the
        # cache) that is ALSO copy.copy-able when a cached range is
        # replayed — a generator fails copy (not picklable) and a bare
        # list fails next(); CPython's list_iterator satisfies both
        return iter([(i, f"evt-{i:06d}") for i in range(start, end)])

    def read(self, start: dict):
        s = int(start["seq"])
        e = min(s + self.batch, self.limit)
        # no progress past the limit: returning an empty range with an
        # unchanged offset is the "no new data" signal AvailableNow
        # terminates on
        return self._rows(s, e), {"seq": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay of a WAL-recorded range (crash recovery)
        return self._rows(int(start["seq"]), int(end["seq"]))


class CounterEventsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "counter_events"

    def schema(self) -> str:
        return "seq BIGINT, payload STRING"

    def simpleStreamReader(self, schema):
        return CounterEventsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(CounterEventsSource)
