"""Multimodal decode pipeline as an oracle-gated query.

Wires functions/multimodal.py's REAL Spark plumbing (BINARY payload +
typed metadata struct → Arrow-batched mapInPandas decode) into the
driver contract. The corpus is derived from the documents fixture
(payload = UTF-8 bytes of the text), so the deterministic md5 decode
stub has an exact DuckDB twin: byte i of md5(payload) ==
int(substr(md5(text), 2i+1, 2) as hex) because the payload IS the utf8
text. A real deployment swaps `_fake_decode_stats` for Pillow and drops
the oracle (codecs aren't SQL); everything else — schema, batching,
filter-before-UDF — is exactly what runs here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duck_server_spark.engine.session import load_table
from duck_server_spark.functions.multimodal import decode_images


def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit(640).alias("width"),
            F.lit(480).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
    return decode_images(media).select(
        "media_id", "width", "height", "mean_r", "mean_g", "mean_b", "sharpness"
    )


MULTIMODAL_DECODE_ORACLE = """
SELECT doc_id AS media_id,
       640 AS width,
       480 AS height,
       CAST(('0x' || substr(md5(text), 1, 2)) AS INT) / 255.0 AS mean_r,
       CAST(('0x' || substr(md5(text), 3, 2)) AS INT) / 255.0 AS mean_g,
       CAST(('0x' || substr(md5(text), 5, 2)) AS INT) / 255.0 AS mean_b,
       CAST(('0x' || substr(md5(text), 7, 2)) AS INT) / 255.0 AS sharpness
FROM documents
"""

QUERIES = {"multimodal_decode_stats": multimodal_decode_stats}
ORACLE = {"multimodal_decode_stats": MULTIMODAL_DECODE_ORACLE}


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling through the REAL mapInPandas plumbing
    (functions/multimodal.py sample_video_frames — the ffmpeg seam):
    one row per sampled frame, frame payload = deterministic sha256
    stub. duration_ms is synthesized per doc (1-5 s) so row explosion
    is exercised; the utf8-payload trick gives the stub an exact
    DuckDB twin. Scale shape: metadata filter BEFORE the UDF, Arrow
    batches, per-row explosion inside the batch — no shuffle at all."""
    from duck_server_spark.functions.multimodal import sample_video_frames

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            (F.lit(1000) + (F.col("doc_id") % 5) * 1000).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
    return sample_video_frames(media, every_ms=1000).select(
        F.col("media_id"),
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        F.col("frame_ts_ms").cast("bigint").alias("frame_ts_ms"),
        F.lower(F.hex(F.col("frame"))).alias("frame_hex"),
    )


MULTIMODAL_FRAME_ORACLE = """
WITH media AS (
  SELECT doc_id AS media_id, text,
         1000 + (doc_id % 5) * 1000 AS duration_ms
  FROM documents
),
frames AS (
  SELECT media_id, text,
         -- clamp to >= 1 frame, matching sample_video_frames'
         -- max(dur // every_ms, 1) for sub-second media
         unnest(generate_series(CAST(0 AS BIGINT), greatest(duration_ms // 1000, 1) - 1)) AS frame_idx
  FROM media
)
SELECT media_id, frame_idx, frame_idx * 1000 AS frame_ts_ms,
       sha256(text || ':' || CAST(frame_idx AS VARCHAR)) AS frame_hex
FROM frames
"""

QUERIES["multimodal_frame_sample"] = multimodal_frame_sample
ORACLE["multimodal_frame_sample"] = MULTIMODAL_FRAME_ORACLE


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize through the REAL mapInPandas plumbing
    (functions/multimodal.py resize_images — the Pillow seam): the
    deterministic stub emits sha256(payload || 'WxH') as the resized
    payload, so the utf8-payload trick gives an exact DuckDB twin.
    Scale shape: pure Arrow-batched map, no shuffle; in production the
    re-encoded payloads stream straight to the output shard writer."""
    from duck_server_spark.functions.multimodal import resize_images

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit(640).alias("width"),
            F.lit(480).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
    return resize_images(media, width=64, height=64).select(
        "media_id",
        F.col("width").cast("bigint").alias("width"),
        F.col("height").cast("bigint").alias("height"),
        F.lower(F.hex(F.col("payload"))).alias("payload_hex"),
    )


MULTIMODAL_RESIZE_ORACLE = """
SELECT doc_id AS media_id,
       CAST(64 AS BIGINT) AS width,
       CAST(64 AS BIGINT) AS height,
       sha256(text || '64x64') AS payload_hex
FROM documents
"""

QUERIES["multimodal_resize"] = multimodal_resize
ORACLE["multimodal_resize"] = MULTIMODAL_RESIZE_ORACLE


def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction through the mapInPandas plumbing
    (functions/multimodal.py audio_features — the soundfile/FFT seam);
    md5-derived deterministic stub features with the exact DuckDB twin.
    No shuffle: metadata filter before the UDF, Arrow batches."""
    from duck_server_spark.functions.multimodal import audio_features

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("audio").alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
    return audio_features(media).select(
        "media_id",
        F.col("sample_rate").cast("bigint").alias("sample_rate"),
        "rms",
        "zero_crossing_rate",
    )


MULTIMODAL_AUDIO_ORACLE = """
SELECT doc_id AS media_id,
       CAST(16000 AS BIGINT) AS sample_rate,
       CAST(('0x' || substr(md5(text), 1, 2)) AS INT) / 255.0 AS rms,
       CAST(('0x' || substr(md5(text), 3, 2)) AS INT) / 255.0 AS zero_crossing_rate
FROM documents
"""

QUERIES["multimodal_audio_features"] = multimodal_audio_features
ORACLE["multimodal_audio_features"] = MULTIMODAL_AUDIO_ORACLE


# ---------------------------------------------------------------------------
# Perceptual-hash media dedup (round 5)
# ---------------------------------------------------------------------------
# The image-corpus counterpart of text MinHash dedup: decode → pHash
# (functions/multimodal.py phash_images — DCT-pHash in production, the
# deterministic md5 stand-in here) → 4×15-bit chunk banding → hamming
# verification within buckets. The banding is the standard pHash-index
# plan (a pair within hamming ≤ 3 of a 60-bit hash must agree on ≥1 of
# 4 chunks — pigeonhole), so candidate generation is an equi-join, never
# image×image. The fixture corpus injects verbatim payload replicas of
# every 25th document (byte-identical media is the dominant real-world
# duplication mode); the md5 stand-in makes only those collide, which
# the DuckDB twin reproduces exactly — swapping in real DCT-pHash keeps
# every plan stage and widens matches to near-identical pixels.

_PHASH_CHUNKS = 4
_PHASH_BITS = 15  # per chunk; 4 × 15 = 60-bit hash


def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_server_spark.functions.multimodal import phash_images

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    dup = docs.where("doc_id % 25 = 0").select(
        (F.col("doc_id") + 1000000).alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    media = base.unionAll(dup).withColumn(
        "meta",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit(640).alias("width"), F.lit(480).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
        ),
    )
    hashed = phash_images(media)
    hashed.createOrReplaceTempView("phash_media")
    chunk_rows = " UNION ALL ".join(
        f"SELECT media_id, phash, {c} AS cid, "
        f"CAST(phash DIV {1 << (c * _PHASH_BITS)} AS BIGINT) % {1 << _PHASH_BITS} AS cval "
        "FROM phash_media"
        for c in range(_PHASH_CHUNKS)
    )
    return spark.sql(f"""
WITH chunks AS ({chunk_rows}),
pairs AS (
  SELECT DISTINCT a.media_id AS id1, b.media_id AS id2, a.phash AS h1, b.phash AS h2
  FROM chunks a JOIN chunks b
    ON a.cid = b.cid AND a.cval = b.cval AND a.media_id < b.media_id
)
SELECT id1, id2, bit_count(h1 ^ h2) AS hamming
FROM pairs
WHERE bit_count(h1 ^ h2) <= 3
ORDER BY id1, id2
""")


MULTIMODAL_PHASH_ORACLE = """
WITH corpus AS (
  SELECT doc_id AS media_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS media_id, text FROM documents WHERE doc_id % 25 = 0
),
hashed AS (
  SELECT media_id, ('0x' || substring(md5(text), 1, 15))::BIGINT AS phash FROM corpus
),
chunks AS (
  SELECT media_id, phash, c.cid,
         (phash // (1::BIGINT << (c.cid * 15))) % (1::BIGINT << 15) AS cval
  FROM hashed CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS cid) c
),
pairs AS (
  SELECT DISTINCT a.media_id AS id1, b.media_id AS id2, a.phash AS h1, b.phash AS h2
  FROM chunks a JOIN chunks b
    ON a.cid = b.cid AND a.cval = b.cval AND a.media_id < b.media_id
)
SELECT id1, id2, bit_count(xor(h1, h2)) AS hamming
FROM pairs
WHERE bit_count(xor(h1, h2)) <= 3
ORDER BY id1, id2
"""

QUERIES["multimodal_phash_dedup"] = multimodal_phash_dedup
ORACLE["multimodal_phash_dedup"] = MULTIMODAL_PHASH_ORACLE
