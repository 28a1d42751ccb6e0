"""Multimodal column plumbing (north star): opaque binary payloads +
typed metadata, with decode/feature-extraction as Arrow-batched
Pandas UDFs over mapInPandas.

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic STUB (`fake_decode_features`) — the
Spark-side contract (schema, batch shape, partitioning) is real and
tested; swap `_decode_one` for a PIL/ffmpeg call in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from serverless_datalake_spark.operators import spread_for_compute
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# payload: opaque bytes; media metadata travels as typed columns next
# to it (never inside the blob) so filters/pruning stay columnar.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha256", StringType(), False),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Fixture adapter: wrap a text column as an opaque binary payload
    with typed metadata — the shape a real image/audio table has."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
    )


def _decode_one(media_type: str, payload: bytes) -> tuple[int | None, int | None, int | None]:
    """STUB decode. A real implementation would be e.g.
    ``PIL.Image.open(io.BytesIO(payload)).size`` — codecs aren't in
    this container, so dimensions are derived deterministically from
    the payload digest (stable across runs/executors for testing)."""
    h = hashlib.md5(payload).digest()
    if media_type == "image":
        return 64 + h[0] % 192, 64 + h[1] % 192, None
    if media_type == "video":
        return 64 + h[0] % 192, 64 + h[1] % 192, 1 + h[2] % 120
    if media_type == "audio":
        return None, None, 1 + h[2] % 120  # frames ≈ chunks
    raise NotImplementedError(f"unknown media_type {media_type!r}")


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_index", IntegerType(), False),
        StructField("frame_payload", BinaryType(), False),
        StructField("frame_sha256", StringType(), False),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 10, max_frames: int = 8) -> DataFrame:
    """1→N frame sampling via mapInPandas: each video row yields up to
    ``max_frames`` rows, one per sampled frame (every ``every_n``-th).
    STUB extraction: a real implementation seeks with ffmpeg; here a
    deterministic byte-slice of the payload stands in for the decoded
    frame so the Spark-side contract (schema, 1→N batch shape,
    payload-early-drop) is real and testable."""
    import hashlib as _hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "frame_index": [], "frame_payload": [], "frame_sha256": []}
            # iterate BY NAME: a positional unpack hard-codes the frame's
            # column count and order, so a reordered projection silently
            # binds media_type to the payload (zero frames out) and any
            # extra upstream column raises mid-stream (round-7 review
            # finding; decode_features already accesses by name)
            for mid, mt, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                if mt != "video":
                    continue
                data = bytes(payload)
                _, _, n_frames = _decode_one(mt, data)
                for fi in range(0, min(n_frames or 0, every_n * max_frames), every_n):
                    # STUB frame bytes: rotate the payload by the frame
                    # index (deterministic, size-preserving)
                    k = fi % max(len(data), 1)
                    frame = data[k:] + data[:k]
                    rows["media_id"].append(mid)
                    rows["frame_index"].append(fi)
                    rows["frame_payload"].append(frame)
                    rows["frame_sha256"].append(_hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(rows)

    return spread_for_compute(media).mapInPandas(batches, schema=FRAME_SCHEMA)


def decode_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow-batched, one Python worker per input
    partition — the pattern for any per-blob media transform (decode,
    resize, frame-sample). Output is columnar metadata only; payloads
    are dropped as early as possible to keep shuffles small."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                _decode_one(mt, bytes(pl)) for mt, pl in zip(pdf["media_type"], pdf["payload"])
            ]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "width": pd.array([d[0] for d in decoded], dtype="Int32"),
                    "height": pd.array([d[1] for d in decoded], dtype="Int32"),
                    "n_frames": pd.array([d[2] for d in decoded], dtype="Int32"),
                }
            )
            yield out

    return spread_for_compute(media).mapInPandas(batches, schema=DECODED_SCHEMA)
