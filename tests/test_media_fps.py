"""At-rest media fingerprint store (round-9 #4): warm runs over an
unchanged corpus perform ZERO decode work (counter evidence), incremental
batches decode only new content, and the single decode pass keeps blobs
out of every exchange (plan evidence)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import cosmo_spark.sources.multimodal as mm
from cosmo_spark.queries import all_queries
from cosmo_spark.sources.media_fps import (
    _miss_fp_plan,
    fingerprint_media_cached,
    read_fp_store,
)
from cosmo_spark.sources.multimodal import encode_pgm_gray8x8

SF = "/root/testdata/sf0.001"


@pytest.fixture
def counter(spark):
    acc = spark.sparkContext.accumulator(0)
    mm._DECODE_COUNTER = acc
    yield acc
    mm._DECODE_COUNTER = None


def _media(spark, lo, hi):
    e = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter(F.col("embedding").isNotNull() & (F.size("embedding") == 64))
        .filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
    )
    return encode_pgm_gray8x8(e, "embedding", "vec_id")


def test_warm_run_decodes_nothing(spark, tmp_path, counter):
    store = str(tmp_path / "fps")
    media = _media(spark, 0, 40)
    n = media.count()
    assert n > 0

    first = sorted(tuple(r) for r in
                   fingerprint_media_cached(media, "ppm", store).collect())
    assert counter.value == n, "cold run must decode the whole corpus"
    assert len(first) == n

    second = sorted(tuple(r) for r in
                    fingerprint_media_cached(media, "ppm", store).collect())
    assert counter.value == n, "warm run must perform ZERO decode work"
    assert second == first, "store round-trip must be value-identical"


def test_incremental_batch_decodes_only_new_content(spark, tmp_path, counter):
    store = str(tmp_path / "fps")
    fingerprint_media_cached(_media(spark, 0, 30), "ppm", store).count()
    base = counter.value
    batch = _media(spark, 20, 45)     # 10 known + the new tail
    n_new = batch.count() - _media(spark, 20, 30).count()
    fingerprint_media_cached(batch, "ppm", store).count()
    assert counter.value - base == n_new, (
        "only content absent from the store may reach the decoder"
    )
    n_store = read_fp_store(spark, store).count()
    assert n_store == _media(spark, 0, 45).count()


def test_q140_second_run_is_decode_free(spark, tmp_path, counter, monkeypatch):
    """THE round-9 #4 gate, on the catalog query itself: q140's second
    run over an unchanged corpus performs zero decode work."""
    import cosmo_spark.sources.media_fps as mfps

    monkeypatch.setattr(
        mfps, "media_fp_store_dir",
        lambda spark_, sf_dir_, codec_: str(tmp_path / f"store-{codec_}"),
    )
    q = all_queries()["q140_image_ahash_dedup"]
    r1 = sorted(tuple(r) for r in q.spark_fn(spark, SF).collect())
    cold = counter.value
    assert cold > 0
    r2 = sorted(tuple(r) for r in q.spark_fn(spark, SF).collect())
    assert counter.value == cold, "q140 warm run must not decode"
    assert r2 == r1


def test_miss_plan_single_python_stage_no_blob_exchange(spark, tmp_path):
    """Plan evidence for the decode pass itself: exactly one MapInPandas,
    and no exchange line carries blob/features."""
    media = _media(spark, 0, 20)
    keyed = media.select(
        "media_id", "blob", F.xxhash64("blob").alias("content_hash")
    )
    store_path = str(tmp_path / "fps")
    fingerprint_media_cached(media, "ppm", store_path).count()  # warm store
    store = read_fp_store(spark, store_path)
    for st in (None, store):
        plan = _miss_fp_plan(keyed, st, "ppm")._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("MapInPandas") == 1, "exactly one Python stage"
        for line in plan.splitlines():
            if "Exchange" in line:
                assert "blob" not in line and "features" not in line, line


def test_corrupt_content_is_retried_not_stored(spark, tmp_path, counter):
    """Undecodable blobs never enter the store (re-decode next run is the
    retry policy), and they never surface a fingerprint."""
    good = _media(spark, 0, 10)
    bad = spark.createDataFrame(
        [("bad-1", bytearray(b"not a pgm at all"))],
        "media_id STRING, blob BINARY",
    )
    media = good.unionByName(bad)
    store = str(tmp_path / "fps")
    out1 = fingerprint_media_cached(media, "ppm", store).count()
    n_good = good.count()
    assert out1 == n_good
    assert read_fp_store(spark, store).count() == n_good
    c1 = counter.value
    fingerprint_media_cached(media, "ppm", store).count()
    assert counter.value == c1 + 1, "only the corrupt blob re-decodes"


def test_ensure_media_fps_builds_default_store(spark, tmp_path, counter,
                                               monkeypatch):
    """The bench-setup entry point (the one surface the other tests
    bypass) must build the default store and leave it warm."""
    import cosmo_spark.sources.media_fps as mfps
    from cosmo_spark.sources.media_fps import ensure_media_fps

    monkeypatch.setattr(
        mfps, "media_fp_store_dir",
        lambda spark_, sf_dir_, codec_: str(tmp_path / f"s-{codec_}"),
    )
    store = ensure_media_fps(spark, SF, "ppm", encode_pgm_gray8x8, "vec_id")
    n = read_fp_store(spark, store).count()
    assert n > 0
    cold = counter.value
    assert cold >= n
    ensure_media_fps(spark, SF, "ppm", encode_pgm_gray8x8, "vec_id")
    assert counter.value == cold, "second ensure must be decode-free"
