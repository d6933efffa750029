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
    """Without PIL importable, real decode must refuse loudly."""
    from cosmo_spark.sources import multimodal

    if multimodal._pil_available():
        pytest.skip("Pillow installed; the real path runs instead")
    with pytest.raises(NotImplementedError):
        decode_media(media)


def test_decode_real_with_pil(spark):
    """Real path when Pillow is importable: a genuine PNG decodes to the
    8x8 luminance feature; garbage bytes report corrupt, not a task kill."""
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (32, 16), (200, 10, 10)).save(buf, format="PNG")
    rows = [
        ("ok1", "image", "image/png", buf.getvalue(), 32, 16, buf.getbuffer().nbytes),
        ("bad", "image", "image/png", b"not an image", None, None, 12),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: (r.feat_dim, r.decode_status)
           for r in decode_media(media).collect()}
    assert got["ok1"] == (64, "ok")
    assert got["bad"] == (0, "corrupt")


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
