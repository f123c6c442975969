"""Multimodal column handling: image/audio/video as opaque BINARY columns
with typed metadata, plus decode / feature-extract / resize / frame-sample
operators as Arrow-batched pandas pipelines over mapInPandas.

North-star extension (BASELINE.json). The container has no image/audio
codecs, so the DECODE step is stubbed two ways:
- ``decode_stub="deterministic"`` (default): a seeded, content-derived
  fake decode (md5 of the payload → pixel/sample statistics) so the full
  pipeline is runnable and testable end-to-end;
- ``decode_stub="raise"``: raises NotImplementedError where a real
  codec (Pillow/ffmpeg/soundfile) would be called, making the
  integration point explicit.

The Spark-side plumbing is the real thing and is what matters at scale:
- schema: payload BINARY + metadata STRUCT (media_type, width, height,
  sample_rate, duration_ms) — the layout a 100 TB multimodal corpus
  actually uses (payload often externalized to object storage with only
  a URI here; both work, the operators only touch payload lazily).
- mapInPandas: Arrow-batched iterator of pandas frames — per-batch
  vectorized work, no per-row Python overhead, constant memory per task.
- partitioning: operators are pure maps — NO shuffle; they run at scan
  parallelism and scale linearly with input splits.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id BIGINT, payload BINARY, "
    "meta STRUCT<media_type: STRING, width: INT, height: INT, "
    "sample_rate: INT, duration_ms: INT>"
)

DECODED_IMAGE_SCHEMA = (
    "media_id BIGINT, media_type STRING, width INT, height INT, "
    "mean_r DOUBLE, mean_g DOUBLE, mean_b DOUBLE, sharpness DOUBLE"
)

RESIZED_SCHEMA = "media_id BIGINT, width INT, height INT, payload BINARY"

FRAME_SAMPLE_SCHEMA = "media_id BIGINT, frame_idx INT, frame_ts_ms INT, frame BINARY"


def synthesize_media_table(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media corpus (payload = seeded bytes) — the
    fixture generator for tests; real pipelines read parquet/Lance/tar
    shards with the same schema."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 8  # 256 B
        kind = ("image", "audio", "video")[i % 3]
        rows.append(
            (
                i,
                payload,
                {
                    "media_type": kind,
                    "width": 640 if kind != "audio" else None,
                    "height": 480 if kind != "audio" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                    "duration_ms": 5000 if kind != "image" else None,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode_stats(payload: bytes) -> tuple[float, float, float, float]:
    """Content-derived deterministic pseudo-decode. A real implementation
    calls Pillow here; the md5-derived stats keep the pipeline testable."""
    h = hashlib.md5(payload).digest()
    return (h[0] / 255.0, h[1] / 255.0, h[2] / 255.0, h[3] / 255.0)


def decode_images(df: DataFrame, decode_stub: str = "deterministic") -> DataFrame:
    """Decode image payloads → per-image channel statistics.

    mapInPandas: each Arrow batch is processed vectorized; only image
    rows are decoded (filter pushed into the plan, not the UDF)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real image decode requires Pillow; install and replace "
                    "_fake_decode_stats with PIL.Image.open(io.BytesIO(payload))"
                )
            stats = [_fake_decode_stats(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "mean_r": [s[0] for s in stats],
                    "mean_g": [s[1] for s in stats],
                    "mean_b": [s[2] for s in stats],
                    "sharpness": [s[3] for s in stats],
                }
            )

    flat = df.filter(F.col("meta.media_type") == "image").select(
        "media_id",
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        "payload",
    )
    return flat.mapInPandas(run, DECODED_IMAGE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int, decode_stub: str = "deterministic") -> DataFrame:
    """Resize stub: real impl decodes, resizes, re-encodes per batch. The
    deterministic stub re-hashes payloads to a size-tagged payload so
    downstream schema/partitioning is exercised."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError("real resize requires Pillow")
            out_payload = [
                hashlib.sha256(p + f"{width}x{height}".encode()).digest() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": out_payload,
                }
            )

    flat = df.filter(F.col("meta.media_type") == "image").select("media_id", "payload")
    return flat.mapInPandas(run, RESIZED_SCHEMA)


def sample_video_frames(df: DataFrame, every_ms: int = 1000, decode_stub: str = "deterministic") -> DataFrame:
    """Frame sampling: one output row per sampled frame (row explosion
    inside the Arrow batch — the real impl seeks with ffmpeg)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError("real frame sampling requires ffmpeg")
            ids, idxs, tss, frames = [], [], [], []
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                n_frames = max(int(dur) // every_ms, 1)
                for k in range(n_frames):
                    ids.append(mid)
                    idxs.append(k)
                    tss.append(k * every_ms)
                    # stub frame = sha256(payload ':' k) — string-safe
                    # framing so the SQL oracle twin (sha256(VARCHAR))
                    # can compute the identical digest from utf8 payloads
                    frames.append(hashlib.sha256(payload + b":" + str(k).encode()).digest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_ts_ms": tss, "frame": frames}
            )

    flat = df.filter(F.col("meta.media_type") == "video").select(
        "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
    )
    return flat.mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def audio_features(df: DataFrame, decode_stub: str = "deterministic") -> DataFrame:
    """Audio feature extraction stub (real impl: soundfile + numpy FFT)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError("real audio decode requires soundfile")
            stats = [_fake_decode_stats(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": pdf["sample_rate"],
                    "rms": [s[0] for s in stats],
                    "zero_crossing_rate": [s[1] for s in stats],
                }
            )

    flat = df.filter(F.col("meta.media_type") == "audio").select(
        "media_id", "payload", F.col("meta.sample_rate").alias("sample_rate")
    )
    return flat.mapInPandas(
        run, "media_id BIGINT, sample_rate INT, rms DOUBLE, zero_crossing_rate DOUBLE"
    )


def phash_images(df: DataFrame) -> DataFrame:
    """Perceptual-hash encoder: image payload → 60-bit pHash (BIGINT).

    mapInPandas, Arrow-batched. The production hash is DCT-based pHash
    over decoded pixels (imagehash.phash after PIL decode — see the
    decode seam in decode_images); the deterministic stand-in hashes the
    payload bytes (md5 → first 15 hex digits), which preserves the ONE
    property the downstream dedup plan exercises end-to-end: identical
    media collide, different media land uniformly. 60 bits keeps the
    value positive in an int64 on every engine."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": [
                        int(hashlib.md5(bytes(p)).hexdigest()[:15], 16)
                        for p in pdf["payload"]
                    ],
                }
            )

    flat = df.filter(F.col("meta.media_type") == "image").select("media_id", "payload")
    return flat.mapInPandas(run, "media_id BIGINT, phash BIGINT")
