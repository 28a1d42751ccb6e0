"""Custom stateful streaming operator via applyInPandasWithState:
a per-user running profile (event count, value sum, last-seen ts)
maintained across micro-batches — the extension point for stateful
logic that watermarked windows/dropDuplicates can't express
(SURVEY.md §2b streaming rows; reference has no state at all).

State is one small tuple per key in the state store; each micro-batch
delivers the key's new rows as Arrow-backed pandas DataFrames. At
scale this shuffles once per batch on user_id and the store is
RocksDB-backed per executor.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts_micros", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts_micros", LongType()),
    ]
)


def _update_profile(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, s, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        if len(pdf):
            last = max(last, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, s, last))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [round(s, 2)],
            "last_ts_micros": [last],
        }
    )


def user_profile_stream(stream: DataFrame) -> DataFrame:
    """Emit the updated per-user profile every micro-batch."""
    return (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_profile_available_now(spark, staging_path: str, out_path: str, checkpoint: str) -> None:
    from serverless_datalake_spark.streaming.pipeline import read_event_stream

    stream = read_event_stream(spark, staging_path, dedup=False, watermark="1 minute")
    def _sink(batch: DataFrame, bid: int) -> None:
        # batch_id-partitioned DYNAMIC overwrite, not a bare append: a
        # checkpoint-replayed batch must REPLACE its own partition, or
        # every profile row it emitted is duplicated with an identical
        # batch_id that no downstream filter can dedup (round-7 review
        # finding — the exact non-idempotence pipeline.py's ingest sink
        # documents and fixes). Per-write option, no session mutation.
        (
            batch.withColumn("batch_id", F.lit(f"b{bid:012d}"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )

    q = (
        user_profile_stream(stream)
        .writeStream.outputMode("update")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
