"""Multimodal-column queries (north star): binary payload metadata
(oracle-verified) and the Pandas-UDF decode pipeline (rows-only —
the decode stub is deterministic; tests assert stability)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_spark.operators import multimodal
from serverless_datalake_spark.queries import query
from serverless_datalake_spark.tables import load_table


@query(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha256
    FROM documents
    """,
    tags=("llm", "multimodal"),
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload plumbing: opaque bytes + typed metadata columns
    (size, content hash, media type) — metadata stays columnar so
    filters never touch payloads."""
    d = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_binary_payload(d, "doc_id", "text")
    return media.select("media_id", "media_type", "n_bytes", "sha256")


@query(
    "mm_decode_features",
    oracle=None,  # decode is a deterministic stub (no codecs in the
    # container) → rows-only; tests/test_operators.py pins outputs.
    tags=("llm", "multimodal", "pandas-udf"),
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches), then a
    per-media-type rollup — the real pipeline shape with a stubbed
    codec."""
    d = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_binary_payload(d, "doc_id", "text")
    feats = multimodal.decode_features(media)
    return feats.groupBy("media_type").agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
        F.avg("width").alias("avg_width"),
        F.avg("n_frames").alias("avg_frames"),
    )
