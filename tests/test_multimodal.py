"""Multimodal plumbing tests: binary columns + Arrow-batched decode stubs."""

from __future__ import annotations

import pytest

from cosmo_spark.sources.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    frame_sample_plan,
)


@pytest.fixture()
def media(spark):
    rows = [
        ("m1", "image", "image/png", b"\x89PNG fake bytes", 64, 64, 15),
        ("m2", "image", "image/png", None, None, None, 0),
        ("m3", "video", "video/mp4", b"\x00mp4", 0, 0, 30 * 1024),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_stub_raises_without_optin(media):
    with pytest.raises(NotImplementedError):
        decode_media(media)


def test_decode_fake_is_deterministic(media):
    a = {r.media_id: (r.feat_dim, r.feat_hash, r.decode_status)
         for r in decode_media(media, deterministic_fake=True).collect()}
    b = {r.media_id: (r.feat_dim, r.feat_hash, r.decode_status)
         for r in decode_media(media, deterministic_fake=True).collect()}
    assert a == b
    assert a["m1"][0] == 64 and a["m1"][2] == "ok"
    assert a["m2"] == (0, "", "empty")   # null blob handled in-batch


def test_frame_sample_plan(media):
    plan = frame_sample_plan(media, every_n=10)
    rows = plan.collect()
    assert {r.media_id for r in rows} == {"m3"}
    assert [r.frame_idx for r in rows] == [0, 10, 20]  # 30 frames, every 10th
