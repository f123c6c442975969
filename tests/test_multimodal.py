"""Multimodal column pipeline tests: schema, batch shape, determinism,
row explosion, and the explicit NotImplementedError integration points."""

import pytest

from duck_server_spark.functions import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthesize_media_table(spark, n=30).cache()


def test_media_schema(media):
    assert set(media.columns) == {"media_id", "payload", "meta"}
    assert media.count() == 30


def test_decode_images_deterministic(media, spark):
    out1 = mm.decode_images(media).orderBy("media_id").collect()
    out2 = mm.decode_images(media).orderBy("media_id").collect()
    assert out1 == out2  # content-derived, stable across runs
    assert len(out1) == 10  # every 3rd row is an image
    for r in out1:
        assert 0.0 <= r["mean_r"] <= 1.0 and r["width"] == 640


def test_resize_changes_payload(media):
    out = mm.resize_images(media, 64, 64).collect()
    assert all(r["width"] == 64 and len(r["payload"]) == 32 for r in out)


def test_video_frame_sampling_explodes_rows(media):
    out = mm.sample_video_frames(media, every_ms=1000).collect()
    vids = {r["media_id"] for r in out}
    assert len(out) == len(vids) * 5  # 5000 ms / 1000 ms per frame
    assert {r["frame_idx"] for r in out} == {0, 1, 2, 3, 4}


def test_audio_features(media):
    out = mm.audio_features(media).collect()
    assert len(out) == 10
    assert all(r["sample_rate"] == 16000 for r in out)


def test_raise_stub_is_explicit(media):
    with pytest.raises(Exception, match="Pillow"):
        mm.decode_images(media, decode_stub="raise").collect()


# ---------------------------------------------------------------------------
# Real-codec seam (round 9): decode_stub="real" runs ACTUAL decoders
# through the SAME mapInPandas pipelines. Audio uses the stdlib wave
# module (PCM WAV — no third-party codec needed), images use Pillow when
# importable or the stdlib 24-bit BMP parser, so both real paths run
# end-to-end in this codec-less container. The deterministic stubs stay
# the oracle-gated default.
# ---------------------------------------------------------------------------


def _wav_bytes(freq=440.0, sr=16000, seconds=0.5, amp=0.5):
    import io
    import math
    import struct
    import wave

    n = int(sr * seconds)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        frames = b"".join(
            struct.pack(
                "<h", int(amp * 32767 * math.sin(2 * math.pi * freq * i / sr))
            )
            for i in range(n)
        )
        w.writeframes(frames)
    return buf.getvalue()


def _bmp_bytes(w=8, h=4):
    """Left half pure red, right half pure white — analytically exact
    channel means, and the halves differ in LUMINANCE so the gradient
    sharpness proxy is provably nonzero (red/blue halves would not be:
    equal luminance → constant gray plane)."""
    import numpy as np

    a = np.zeros((h, w, 3), dtype=np.uint8)
    a[:, :, 0] = 255
    a[:, w // 2 :, 1] = 255
    a[:, w // 2 :, 2] = 255
    return mm._encode_bmp24(a)


def _media_df(spark, rows):
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_real_audio_decode_end_to_end(spark):
    """A genuine 440 Hz sine WAV decodes through the mapInPandas
    pipeline: RMS ≈ amp/√2 and zero-crossing rate ≈ 2·f/sr — physics,
    not fixture echoes; sample_rate comes from the decoded container."""
    wav = _wav_bytes(freq=440.0, sr=16000, seconds=0.5, amp=0.5)
    df = _media_df(
        spark,
        [
            (
                1,
                wav,
                {
                    "media_type": "audio",
                    "width": None,
                    "height": None,
                    "sample_rate": 16000,
                    "duration_ms": 500,
                },
            )
        ],
    )
    (row,) = mm.audio_features(df, decode_stub="real").collect()
    assert row["sample_rate"] == 16000
    assert abs(row["rms"] - 0.5 / 2**0.5) < 0.02
    assert abs(row["zero_crossing_rate"] - 2 * 440 / 16000) < 0.005


def test_real_image_decode_bmp_end_to_end(spark):
    """A real 24-bit BMP decodes pixel-exactly through the pipeline:
    half-red/half-white → mean_r = 1, mean_g = mean_b = 0.5; width and
    height come from the DECODED image, not the metadata claim."""
    bmp = _bmp_bytes(8, 4)
    df = _media_df(
        spark,
        [
            (
                1,
                bmp,
                {
                    "media_type": "image",
                    "width": 999,  # wrong on purpose — decode must win
                    "height": 999,
                    "sample_rate": None,
                    "duration_ms": None,
                },
            )
        ],
    )
    (row,) = mm.decode_images(df, decode_stub="real").collect()
    assert (row["width"], row["height"]) == (8, 4)
    assert abs(row["mean_r"] - 1.0) < 1e-9
    assert abs(row["mean_g"] - 0.5) < 1e-9
    assert abs(row["mean_b"] - 0.5) < 1e-9
    assert row["sharpness"] > 0  # the red/white edge has gradient energy
    # real resize: decode → sample → re-encode, round-tripped by decode
    (rrow,) = mm.resize_images(df, 4, 2, decode_stub="real").collect()
    assert (rrow["width"], rrow["height"]) == (4, 2)
    redecoded = mm._decode_bmp24(bytes(rrow["payload"]))
    assert redecoded.shape == (2, 4, 3)
    assert abs(redecoded[..., 1].mean() / 255.0 - 0.5) < 1e-9


def test_real_image_decode_pillow_path(spark):
    """Skipif-guarded Pillow route: where PIL is installed the same
    pipeline decodes PNG/JPEG; absent here, the BMP fallback is the
    tested real path."""
    pytest.importorskip("PIL")
    import io

    import numpy as np
    from PIL import Image

    a = np.zeros((4, 8, 3), dtype=np.uint8)
    a[:, :4, 0] = 255
    buf = io.BytesIO()
    Image.fromarray(a).save(buf, format="PNG")
    df = _media_df(
        spark,
        [
            (
                1,
                buf.getvalue(),
                {
                    "media_type": "image",
                    "width": 8,
                    "height": 4,
                    "sample_rate": None,
                    "duration_ms": None,
                },
            )
        ],
    )
    (row,) = mm.decode_images(df, decode_stub="real").collect()
    assert (row["width"], row["height"]) == (8, 4)
    assert abs(row["mean_r"] - 0.5) < 1e-9
