"""Streaming media near-dedup (round-10 #5): the keeper consumes banded
fingerprints resolved from the AT-REST store — zero decode on the stream
(counter evidence), unknown content routes to the unfingerprinted channel,
near-dups flag within TTL, and evicted state stops matching.  Completes the
media family's batch (q140–q142) / incremental (q145) / streaming triple.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import cosmo_spark.sources.multimodal as mm
from cosmo_spark.streaming.neardup import stream_media_near_dup

#: handcrafted fingerprints — same leading 16 bits (one bucket) for A/B/E,
#: B within Hamming 3 of A, E far from both; C lives in another bucket
FP_A = (0x1234_5678_9ABC_DEF0, 0x0F0F_0F0F_0F0F_0F0F)
FP_B = (0x1234_5678_9ABC_DEF0, 0x0F0F_0F0F_0F0F_0F00 | 0x13)   # 3 bits off
FP_E = (0x1234_5678_9ABC_DEF0, 0x70F0_F0F0_F0F0_F0F0)
FP_C = (-0x7234_5678_9ABC_DEF0, 0x0F0F_0F0F_0F0F_0F0F)

BLOBS = {
    "A": b"media-blob-A", "B": b"media-blob-B",
    "C": b"media-blob-C", "D": b"media-blob-D-unknown",
    "E": b"media-blob-E", "A2": b"media-blob-A",   # A2 = byte-identical to A
}
FPS = {"A": FP_A, "B": FP_B, "C": FP_C, "E": FP_E}   # D never fingerprinted


def _signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


@pytest.fixture
def counter(spark):
    acc = spark.sparkContext.accumulator(0)
    mm._DECODE_COUNTER = acc
    yield acc
    mm._DECODE_COUNTER = None


@pytest.fixture
def store(spark, tmp_path):
    """Seed the at-rest store with the designed fingerprints, keyed by the
    REAL xxhash64 of each blob (the exact join key the stream computes)."""
    hashes = {
        r.name: r.h
        for r in spark.createDataFrame(
            [(k, v) for k, v in BLOBS.items()], "name STRING, blob BINARY"
        ).select("name", F.xxhash64("blob").alias("h")).collect()
    }
    rows = [
        (hashes[k], _signed(hi), _signed(lo))
        for k, (hi, lo) in FPS.items()
    ]
    path = str(tmp_path / "fps")
    spark.createDataFrame(
        rows, "content_hash LONG, fp_hi LONG, fp_lo LONG"
    ).write.mode("append").parquet(path)
    return path


def _write_parquet_batch(spark, src, name, items, with_ts=False):
    schema = "media_id STRING, blob BINARY" + (
        ", ts TIMESTAMP" if with_ts else ""
    )
    df = spark.createDataFrame(items, schema)
    df.coalesce(1).write.mode("overwrite").parquet(f"{src}/{name}")


def _run(spark, src, ckpt, sink, store_path, **kw):
    stream = spark.readStream.schema(
        "media_id STRING, blob BINARY"
        + (", ts TIMESTAMP" if "ttl" in kw else "")
    ).option("recursiveFileLookup", "true").parquet(str(src))
    out = stream_media_near_dup(stream, store_path, **kw)
    q = (
        out.writeStream.format("parquet")
        .option("path", str(sink))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    return {r.media_id: r for r in spark.read.parquet(str(sink)).collect()}


def test_media_stream_lifecycle_and_zero_decode(
    spark, tmp_path, store, counter
):
    """Accept-first / flag-near-dup / route-unknown, across a restart,
    with the decode counter pinned at ZERO throughout."""
    src, ckpt, sink = tmp_path / "in", tmp_path / "ck", tmp_path / "out"
    src.mkdir()

    _write_parquet_batch(
        spark, src, "b1",
        [("A", BLOBS["A"]), ("C", BLOBS["C"]), ("E", BLOBS["E"])],
    )
    rows = _run(spark, src, ckpt, sink, store)
    assert rows["A"].status == "accepted" and rows["A"].dup_of is None
    assert rows["C"].status == "accepted"      # other bucket
    assert rows["E"].status == "accepted"      # same bucket, far fingerprint
    assert rows["A"].code == rows["E"].code != rows["C"].code

    _write_parquet_batch(
        spark, src, "b2",
        [("B", BLOBS["B"]), ("A2", BLOBS["A2"]), ("D", BLOBS["D"])],
    )
    rows = _run(spark, src, ckpt, sink, store)
    assert rows["B"].status == "near_dup" and rows["B"].dup_of == "A"
    assert rows["B"].hamming == 3              # state survived the restart
    assert rows["A2"].status == "near_dup" and rows["A2"].dup_of == "A"
    assert rows["A2"].hamming == 0             # byte-identical content
    assert rows["D"].status == "unfingerprinted"
    assert rows["D"].dup_of is None and rows["D"].code is None
    assert counter.value == 0, "the streaming path must never decode"


def test_media_stream_ttl_evicts_then_reaccepts(spark, tmp_path, store, counter):
    """The dropDuplicatesWithinWatermark contract on fingerprints: state
    behind the watermark stops matching — the near-copy of evicted
    content is accepted as new — while in-horizon state still flags."""
    src, ckpt, sink = tmp_path / "in", tmp_path / "ck", tmp_path / "out"
    src.mkdir()
    import datetime

    T = datetime.datetime

    _write_parquet_batch(
        spark, src, "b1",
        [("A", BLOBS["A"], T(2026, 1, 1, 10, 0, 0))], with_ts=True,
    )
    rows = _run(spark, src, ckpt, sink, store, ttl="10 minutes", ts_col="ts")
    assert rows["A"].status == "accepted"

    # advances the watermark past A's event time; E is fresh state
    _write_parquet_batch(
        spark, src, "b2",
        [("E", BLOBS["E"], T(2026, 1, 1, 11, 0, 0))], with_ts=True,
    )
    rows = _run(spark, src, ckpt, sink, store, ttl="10 minutes", ts_col="ts")
    assert rows["E"].status == "accepted"

    _write_parquet_batch(
        spark, src, "b3",
        [("B", BLOBS["B"], T(2026, 1, 1, 11, 1, 0)),      # near evicted A
         ("E2", BLOBS["E"], T(2026, 1, 1, 11, 1, 0))],    # copy of live E
        with_ts=True,
    )
    rows = _run(spark, src, ckpt, sink, store, ttl="10 minutes", ts_col="ts")
    assert rows["B"].status == "accepted", "evicted state must not match"
    assert rows["E2"].status == "near_dup" and rows["E2"].dup_of == "E"
    assert counter.value == 0


def test_media_stream_validation():
    with pytest.raises(ValueError):
        stream_media_near_dup(None, "p", ttl="1 hour")        # ts_col missing
    with pytest.raises(ValueError):
        stream_media_near_dup(None, "p", band_bits=0)
