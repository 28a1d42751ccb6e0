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


def _hexpair(h: str, i: int) -> str:
    """DuckDB BIGINT value of md5-hex byte i (0-based): two hex chars."""
    c1 = f"(strpos('0123456789abcdef', substr({h}, {2 * i + 1}, 1)) - 1)"
    c2 = f"(strpos('0123456789abcdef', substr({h}, {2 * i + 2}, 1)) - 1)"
    return f"({c1} * 16 + {c2})"


@query(
    "mm_decode_features",
    # The decode is an (environment-forced) deterministic stub that
    # derives dimensions from md5(payload) bytes — which DuckDB can
    # recompute from the text (payload = UTF-8 bytes). The oracle
    # therefore proves the whole mapInPandas plumbing (Arrow batches,
    # schema, null conventions, rollup) delivers exactly the declared
    # function. Swapping in a real codec would drop this back to
    # rows-only — noted in operators/multimodal.py.
    oracle=f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS media_type,
             octet_length(encode(text)) AS n_bytes,
             md5(text) AS h
      FROM documents
    ), d AS (
      SELECT media_id, media_type, n_bytes,
             CASE WHEN media_type IN ('image', 'video')
                  THEN CAST(64 + {_hexpair('h', 0)} % 192 AS INTEGER) END AS width,
             CASE WHEN media_type IN ('image', 'video')
                  THEN CAST(64 + {_hexpair('h', 1)} % 192 AS INTEGER) END AS height,
             CASE WHEN media_type IN ('audio', 'video')
                  THEN CAST(1 + {_hexpair('h', 2)} % 120 AS INTEGER) END AS n_frames
      FROM m
    )
    SELECT media_type,
           COUNT(*) AS n,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           ROUND(AVG(width), 6) AS avg_width,
           ROUND(AVG(n_frames), 6) AS avg_frames
    FROM d GROUP BY media_type
    """,
    tags=("llm", "multimodal", "pandas-udf"),
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches), then a
    per-media-type rollup — the real pipeline shape with a stubbed
    codec. Integer sums make the averages aggregation-order exact."""
    d = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_binary_payload(d, "doc_id", "text")
    feats = multimodal.decode_features(media)
    return feats.groupBy("media_type").agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("width"), 6).alias("avg_width"),
        F.round(F.avg("n_frames"), 6).alias("avg_frames"),
    )


@query(
    "mm_frame_sample",
    # The stub frame extractor rotates the payload by the frame index
    # and hashes it — all reproducible in SQL on the ASCII fixture
    # (byte rotation == char rotation), so the oracle proves the 1→N
    # mapInPandas fan-out contract: which media yield frames, how many,
    # at which indices, with which content.
    oracle=f"""
    WITH m AS (
      SELECT doc_id AS media_id, text,
             octet_length(encode(text)) AS n,
             1 + {_hexpair('md5(text)', 2)} % 120 AS n_frames
      FROM documents
      WHERE doc_id % 3 = 2
    ), frames AS (
      SELECT media_id, text, n,
             unnest(range(0, least(n_frames, 40), 10)) AS fi
      FROM m
    )
    SELECT media_id,
           CAST(fi AS INTEGER) AS frame_index,
           sha256(substr(text, (fi % n) + 1) || substr(text, 1, fi % n)) AS frame_sha256
    FROM frames
    """,
    tags=("llm", "multimodal", "pandas-udf"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N frame sampling via mapInPandas: every 10th frame, up to 4,
    from each video-typed payload — the row-expanding UDF pattern
    (decode → explode) a video pipeline runs, with the stub extractor
    standing in for ffmpeg."""
    d = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_binary_payload(d, "doc_id", "text")
    frames = multimodal.sample_frames(media, every_n=10, max_frames=4)
    return frames.select("media_id", "frame_index", "frame_sha256")


@query(
    "mm_modality_mix",
    oracle="""
    WITH m AS (
      SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS media_type,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    )
    SELECT media_type,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           ROUND(AVG(CAST(n_bytes AS DOUBLE)), 4) AS avg_bytes,
           CAST(MAX(n_bytes) AS BIGINT) AS max_bytes
    FROM m GROUP BY media_type
    """,
    tags=("llm", "multimodal", "profile"),
)
def mm_modality_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality mix profile — the storage-planning rollup over the
    multimodal lake: items, bytes, and size distribution per media
    type, computed ENTIRELY from the typed metadata columns (the
    payload bytes never enter an aggregate — the whole point of
    keeping metadata columnar next to opaque payloads). The numbers
    that size decode fleets and shard layouts before any decoder
    runs."""
    d = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_binary_payload(d, "doc_id", "text")
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg(F.col("n_bytes").cast("double")), 4).alias("avg_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )


@query(
    "mm_audio_chunk_plan",
    oracle="""
    WITH media AS (
      SELECT doc_id AS media_id,
             octet_length(encode(text)) AS n_bytes,
             -- deterministic synthetic duration: 250 ms per payload
             -- byte (the fixture carries no real audio; the chunker
             -- only consumes the metadata column)
             CAST(octet_length(encode(text)) * 250 AS BIGINT) AS duration_ms
      FROM documents WHERE doc_id % 3 = 1
    )
    SELECT media_id, duration_ms,
           CAST(k AS BIGINT) AS chunk_no,
           CAST(k * 25000 AS BIGINT) AS start_ms,
           CAST(LEAST(k * 25000 + 30000, duration_ms) AS BIGINT) AS end_ms
    FROM media,
         UNNEST(range(0, GREATEST(CAST(CEIL((CAST(duration_ms AS DOUBLE) - 30000.0)
                                             / 25000.0) AS BIGINT) + 1, 1))) AS u(k)
    WHERE duration_ms > 0
    """,
    tags=("llm", "multimodal", "audio", "chunking"),
)
def mm_audio_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASR-style audio chunking PLAN: 30-second windows with 5-second
    overlap (stride 25 s) over each audio asset's duration — the 1→N
    expansion a speech pipeline feeds to the transcription model. The
    last chunk clamps to the asset duration; chunk boundaries are
    derived purely from METADATA (duration), so planning never touches
    payload bytes — the mm_binary_metadata discipline. Duration is a
    deterministic synthetic (250 ms/byte; no codecs in the container —
    a real pipeline reads it from the container header the same way).

    Scale shape: map-only metadata scan + bounded explode (one row per
    chunk); the decode/transcribe stage downstream consumes
    (media_id, start_ms, end_ms) point-reads — chunking at 100 TB of
    audio is exactly this metadata pass, which is why it must not
    deserialize payloads."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 1)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        (F.octet_length(F.encode(F.col("text"), "UTF-8")) * 250)
        .cast("long")
        .alias("duration_ms"),
    ).where(F.col("duration_ms") > 0)
    win, stride = 30000, 25000
    # greatest(·, 1): a duration shorter than one stride would drive
    # the count to 0 and sequence(0, -1) runs DESCENDING (the skill-
    # documented Spark gotcha) — clamp to one clamped chunk instead.
    # (The oracle needs no clamp only because range(0, 0) is empty in
    # DuckDB and fixture durations are ≥ 32 s; the clamp keeps the
    # Spark side safe for arbitrary inputs.)
    n_chunks = F.greatest(
        F.ceil((F.col("duration_ms").cast("double") - float(win)) / float(stride))
        .cast("long")
        + 1,
        F.lit(1).cast("long"),
    )
    chunks = media.select(
        "media_id",
        "duration_ms",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("k"),
    )
    return chunks.select(
        "media_id",
        "duration_ms",
        F.col("k").cast("long").alias("chunk_no"),
        (F.col("k") * stride).cast("long").alias("start_ms"),
        F.least(F.col("k") * stride + win, F.col("duration_ms"))
        .cast("long")
        .alias("end_ms"),
    )


@query(
    "mm_image_tile_plan",
    oracle="""
    WITH media AS (
      SELECT doc_id AS media_id,
             -- deterministic synthetic dimensions from the payload
             -- size (no codecs in the container; a real pipeline
             -- reads them from the image header the same way)
             CAST(512 + (octet_length(encode(text)) % 7) * 256 AS BIGINT) AS width,
             CAST(512 + (octet_length(encode(text)) % 5) * 256 AS BIGINT) AS height
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT media_id, width, height,
           CAST(tx AS BIGINT) AS tile_x, CAST(ty AS BIGINT) AS tile_y,
           CAST(tx * 448 AS BIGINT) AS x0,
           CAST(ty * 448 AS BIGINT) AS y0,
           CAST(LEAST(tx * 448 + 512, width) AS BIGINT) AS x1,
           CAST(LEAST(ty * 448 + 512, height) AS BIGINT) AS y1
    FROM media,
         UNNEST(range(0, GREATEST(CAST(CEIL((CAST(width AS DOUBLE) - 512.0) / 448.0)
                                       AS BIGINT) + 1, 1))) AS ux(tx),
         UNNEST(range(0, GREATEST(CAST(CEIL((CAST(height AS DOUBLE) - 512.0) / 448.0)
                                       AS BIGINT) + 1, 1))) AS uy(ty)
    """,
    tags=("llm", "multimodal", "image", "tiling"),
)
def mm_image_tile_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vision-pipeline TILE PLAN: 512×512 tiles with 64-pixel overlap
    (stride 448) over each image's dimensions — the 2-D sibling of
    mm_audio_chunk_plan (high-resolution ViT/OCR pipelines tile
    before encoding; boundary tiles clamp to the image edge).
    Dimensions are deterministic synthetics from payload size; a real
    reader takes them from the header without decoding pixels, so the
    plan stays a metadata pass.

    Scale shape: map-only metadata scan + a bounded 2-D explode
    (tiles_x × tiles_y rows per image); the decode stage downstream
    point-reads (media_id, x0, y0, x1, y1) crops. Same
    short-asset clamp discipline as the audio chunker (descending-
    sequence hazard)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 0)
    nb = F.octet_length(F.encode(F.col("text"), "UTF-8"))
    media = d.select(
        F.col("doc_id").alias("media_id"),
        (F.lit(512) + (nb % 7) * 256).cast("long").alias("width"),
        (F.lit(512) + (nb % 5) * 256).cast("long").alias("height"),
    )
    tile, stride = 512, 448

    def n_tiles(dim):
        return F.greatest(
            F.ceil((dim.cast("double") - float(tile)) / float(stride)).cast("long") + 1,
            F.lit(1).cast("long"),
        )

    tiles = media.select(
        "media_id",
        "width",
        "height",
        F.explode(F.sequence(F.lit(0).cast("long"), n_tiles(F.col("width")) - 1)).alias("tx"),
    ).select(
        "media_id",
        "width",
        "height",
        "tx",
        F.explode(F.sequence(F.lit(0).cast("long"), n_tiles(F.col("height")) - 1)).alias("ty"),
    )
    return tiles.select(
        "media_id",
        "width",
        "height",
        F.col("tx").cast("long").alias("tile_x"),
        F.col("ty").cast("long").alias("tile_y"),
        (F.col("tx") * stride).cast("long").alias("x0"),
        (F.col("ty") * stride).cast("long").alias("y0"),
        F.least(F.col("tx") * stride + tile, F.col("width")).cast("long").alias("x1"),
        F.least(F.col("ty") * stride + tile, F.col("height")).cast("long").alias("y1"),
    )


@query(
    "mm_av_sync_join",
    # Frames sample every 10th index (0,10,20,30) at 3 s spacing;
    # audio chunks start on the 25 s stride grid. The oracle derives
    # the nearest-earlier chunk ARITHMETICALLY (floor(frame_ms/stride)
    # clamped to the last planned chunk), so parity proves the real
    # as-of JOIN (operators/asof.py) lands on exactly the chunk the
    # closed form predicts — including the clamp and the off-the-end
    # frames that must stay unmatched.
    oracle="""
    WITH vid AS (
      SELECT doc_id AS video_id,
             1 + (
               (strpos('0123456789abcdef', substr(md5(text), 5, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(md5(text), 6, 1)) - 1)
             ) % 120 AS n_frames
      FROM documents WHERE doc_id % 3 = 2
    ), frames AS (
      SELECT video_id, CAST(fi AS BIGINT) AS frame_index,
             CAST(fi * 3000 AS BIGINT) AS frame_ms
      FROM vid, UNNEST(range(0, LEAST(n_frames, 40), 10)) AS u(fi)
    ), aud AS (
      SELECT doc_id AS audio_id,
             CAST(octet_length(encode(text)) * 250 AS BIGINT) AS duration_ms,
             GREATEST(CAST(CEIL((CAST(octet_length(encode(text)) * 250
                                      AS DOUBLE) - 30000.0) / 25000.0)
                           AS BIGINT) + 1, 1) - 1 AS max_k
      FROM documents WHERE doc_id % 3 = 1
    ), paired AS (
      SELECT f.video_id, f.frame_index, f.frame_ms,
             a.audio_id, a.duration_ms, a.max_k
      FROM frames f JOIN aud a ON a.audio_id = f.video_id - 1
    )
    SELECT video_id, frame_index, audio_id,
           CAST(CASE WHEN frame_ms < duration_ms
                THEN LEAST(frame_ms // 25000, max_k) END AS BIGINT)
             AS chunk_no,
           CAST(CASE WHEN frame_ms < duration_ms
                THEN frame_ms - LEAST(frame_ms // 25000, max_k) * 25000 END
                AS BIGINT) AS lag_ms
    FROM paired
    """,
    tags=("llm", "multimodal", "asof", "alignment"),
)
def mm_av_sync_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal A/V alignment: attach each sampled VIDEO frame to
    the audio chunk that was playing at its timestamp — the as-of
    join every captioning / AV-training pipeline runs to pair frame
    features with ASR segments. Videos (doc_id % 3 = 2) pair with
    their adjacent audio asset (doc_id - 1, % 3 = 1); frames carry a
    3 s-spaced timestamp from mm_frame_sample's index grid; chunks
    are mm_audio_chunk_plan's 30 s / 25 s-stride windows. Frames past
    the audio's duration stay unmatched (all-null attach, left-outer
    as-of semantics).

    The Spark side runs the REAL generic as-of join
    (operators/asof.py, backward direction, keyed by the pair id);
    the oracle computes the nearest-earlier chunk in closed form
    (floor(frame_ms/stride) clamped to the plan's last chunk), so
    parity proves the join operator lands on exactly the predicted
    chunk — alignment-by-join and alignment-by-arithmetic agree.

    Scale shape: both inputs are METADATA-grain plans (payload bytes
    never move — the mm_binary_metadata discipline); the as-of join
    is a per-key sort within pair ids. At 100 TB of media the frame
    and chunk relations are O(assets x samples), orders below
    payload bytes."""
    from serverless_datalake_spark.operators.asof import asof_join
    from serverless_datalake_spark.operators import multimodal

    d = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_binary_payload(
        d.where(F.col("doc_id") % 3 == 2), "doc_id", "text"
    )
    frames = multimodal.sample_frames(media, every_n=10, max_frames=4).select(
        F.col("media_id").alias("video_id"),
        F.col("frame_index").cast("long").alias("frame_index"),
        (F.col("frame_index") * 3000).cast("long").alias("frame_ms"),
        (F.col("media_id") - 1).alias("pair_id"),
    )
    aud = d.where(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").alias("audio_id"),
        (F.octet_length(F.encode(F.col("text"), "UTF-8")) * 250)
        .cast("long")
        .alias("duration_ms"),
    )
    win, stride = 30000, 25000
    n_chunks = F.greatest(
        F.ceil((F.col("duration_ms").cast("double") - float(win)) / float(stride))
        .cast("long")
        + 1,
        F.lit(1).cast("long"),
    )
    chunks = aud.select(
        "audio_id",
        "duration_ms",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_no"),
    ).select(
        "audio_id",
        "duration_ms",
        "chunk_no",
        (F.col("chunk_no") * stride).cast("long").alias("start_ms"),
    )
    # Inner pairing BEFORE the as-of attach: a video whose adjacent
    # audio asset is absent yields NO alignment rows (the oracle
    # inner-joins frames to aud) — without this semi-join the
    # left-outer as-of would keep such frames with all-null attaches
    # and diverge on any fixture with non-contiguous doc_ids
    # (round-9 review finding; current fixtures are contiguous, so
    # the asymmetry was latent).
    frames = frames.join(
        aud.select(F.col("audio_id").alias("pair_id")), "pair_id", "left_semi"
    )
    joined = asof_join(
        frames.withColumnRenamed("pair_id", "k"),
        chunks.select(
            F.col("audio_id").alias("k"), "chunk_no", "start_ms", "duration_ms"
        ),
        on="k",
        left_ts="frame_ms",
        right_ts="start_ms",
        right_cols=["chunk_no", "duration_ms"],
        direction="backward",
    )
    matched = F.col("asof_duration_ms").isNotNull() & (
        F.col("frame_ms") < F.col("asof_duration_ms")
    )
    return joined.select(
        "video_id",
        "frame_index",
        (F.col("video_id") - 1).alias("audio_id"),
        F.when(matched, F.col("asof_chunk_no").cast("long")).alias("chunk_no"),
        F.when(matched, F.col("frame_ms") - F.col("asof_chunk_no") * stride)
        .cast("long")
        .alias("lag_ms"),
    )
