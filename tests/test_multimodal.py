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
