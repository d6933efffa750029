"""Streaming SRP-LSH near-dedup: golden on an availableNow stream, state
across restarts, and candidate-semantics cross-check vs the batch operator
(operators/dedup.py::srp_lsh_near_dups with bands=1 and the same planes)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from cosmo_spark.streaming.neardup import stream_srp_near_dup

DIM = 8
BITS = 16


def _planes():
    """Deterministic ±1 planes: xorshift-free LCG so Spark and the test
    agree with no RNG import."""
    planes, x = [], 1234567
    for _ in range(BITS):
        row = []
        for _ in range(DIM):
            x = (1103515245 * x + 12345) % (1 << 31)
            row.append(1 if x & 1 else -1)
        planes.append(row)
    return planes


def _vectors():
    """d0/d1 near-dups (tiny perturbation), d2/d3 exact copies, d4..d7
    pairwise-far vectors (one dominant axis each)."""
    base = [1.0, 0.2, -0.3, 0.5, -0.1, 0.4, 0.05, -0.2]
    near = [x * 1.01 + (0.001 if i == 1 else 0.0) for i, x in enumerate(base)]
    far = []
    for k in range(4):
        v = [0.05] * DIM
        v[k] = (-1.0) ** k * (2.0 + k)
        far.append(v)
    return {
        "d0": base, "d1": near,
        "d2": [0.3, -0.7, 0.2, 0.9, -0.4, 0.1, 0.6, -0.5],
        "d3": [0.3, -0.7, 0.2, 0.9, -0.4, 0.1, 0.6, -0.5],
        "d4": far[0], "d5": far[1], "d6": far[2], "d7": far[3],
    }


def write_batch(src, name, items):
    with open(src / name, "w") as f:
        for doc_id, vec in items:
            f.write(json.dumps({"doc_id": doc_id, "embedding": vec}) + "\n")


def run_once(spark, src, ckpt, sink):
    stream = spark.readStream.schema(
        "doc_id STRING, embedding ARRAY<DOUBLE>"
    ).json(str(src))
    out = stream_srp_near_dup(
        stream, "embedding", "doc_id", _planes(), threshold=0.95
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", str(sink))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    return {r.id: r for r in spark.read.parquet(str(sink)).collect()}


def test_stream_near_dup_golden_and_state_across_restarts(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    ckpt, sink = tmp_path / "ck", tmp_path / "out"
    vecs = _vectors()

    # batch 1: the d0/d1 near-pair plus two far vectors
    write_batch(src, "b1.json", [(k, vecs[k]) for k in ("d0", "d1", "d4", "d5")])
    rows = run_once(spark, src, ckpt, sink)
    assert rows["d0"].dup_of is None            # first of the pair accepted
    assert rows["d1"].dup_of == "d0"            # second matches it
    assert rows["d1"].cos_sim == pytest.approx(1.0, abs=1e-4)
    assert rows["d4"].dup_of is None and rows["d5"].dup_of is None

    # batch 2 after restart: state persisted — d2 accepted, its exact copy
    # d3 matches it, and a re-sent d0-near vector still matches batch-1 state
    resend = [x * 0.99 for x in vecs["d0"]]
    write_batch(src, "b2.json", [("d2", vecs["d2"]), ("d3", vecs["d3"]),
                                 ("d8", resend), ("d6", vecs["d6"])])
    rows = run_once(spark, src, ckpt, sink)
    assert rows["d2"].dup_of is None
    assert rows["d3"].dup_of == "d2"
    assert rows["d3"].cos_sim == pytest.approx(1.0)
    assert rows["d8"].dup_of == "d0"            # state survived the restart
    assert rows["d6"].dup_of is None


def test_stream_matches_batch_single_band_semantics(spark, tmp_path):
    """Every stream-detected duplicate pair must be a verified batch pair of
    srp_lsh_near_dups(bands=1, same planes, same threshold), and every
    batch pair whose first element was stream-accepted must be detected —
    shared blocking semantics, bit for bit."""
    from cosmo_spark.operators.dedup import srp_lsh_near_dups

    src = tmp_path / "in"
    src.mkdir()
    vecs = _vectors()
    write_batch(src, "b1.json", sorted(vecs.items()))
    rows = run_once(spark, src, tmp_path / "ck", tmp_path / "out")
    stream_pairs = {
        (r.dup_of, rid) for rid, r in rows.items() if r.dup_of is not None
    }

    df = spark.createDataFrame(
        [(k, v) for k, v in vecs.items()], "doc_id STRING, embedding ARRAY<DOUBLE>"
    )
    batch = srp_lsh_near_dups(
        df, "embedding", "doc_id", _planes(),
        bands=1, bits_per_band=BITS, threshold=0.95,
    )
    batch_pairs = {(r.id_a, r.id_b) for r in batch.collect()}
    accepted = {rid for rid, r in rows.items() if r.dup_of is None}
    assert stream_pairs <= batch_pairs
    assert {(a, b) for a, b in batch_pairs if a in accepted} == stream_pairs


def test_stream_near_dup_bucket_guard(spark, tmp_path):
    """max_bucket trips loudly when a bucket's accepted state exceeds it:
    exact copies share a band code deterministically, and an unreachable
    threshold (> 1) forces both to be *accepted* rather than matched, so
    the second accept in the code's bucket must exceed max_bucket=1."""
    vecs = _vectors()
    src = tmp_path / "in"
    src.mkdir()
    write_batch(src, "b1.json", [("d2", vecs["d2"]), ("d3", vecs["d3"])])
    stream = spark.readStream.schema(
        "doc_id STRING, embedding ARRAY<DOUBLE>"
    ).json(str(src))
    out = stream_srp_near_dup(
        stream, "embedding", "doc_id", _planes(), threshold=1.1,
        max_bucket=1,
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    with pytest.raises(Exception, match="max_bucket"):
        q.awaitTermination(120)
