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


# --------------------------------------------------------------------------- #
# numpy keeper vs pure-python reference (property)                            #
# --------------------------------------------------------------------------- #


class _FakeState:
    """Minimal GroupState stand-in for driving the keeper off-stream."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _reference_keeper(rows, state_ids, state_vecs, thr):
    """The pre-vectorization pure-python keeper loop, kept verbatim as the
    semantic reference for the numpy mat-vec implementation."""
    import math

    ids, vecs = list(state_ids), [list(v) for v in state_vecs]
    norms = [math.sqrt(sum(x * x for x in v)) for v in vecs]
    out = []
    for rid, rv in sorted(rows, key=lambda r: r[0]):
        v = [float(x) for x in rv]
        n = math.sqrt(sum(x * x for x in v))
        match, sim = None, None
        for kid, kv, kn in zip(ids, vecs, norms):
            denom = n * kn
            if denom <= 0:
                continue
            c = sum(a * b for a, b in zip(v, kv)) / denom
            if c >= thr:
                match, sim = kid, c
                break
        if match is None:
            ids.append(rid)
            vecs.append(v)
            norms.append(n)
        out.append((rid, match, sim))
    return out, ids, vecs


def test_keeper_matches_python_reference_property():
    """Property: across seeded random micro-batch sequences (with planted
    near-dups, zero vectors, and exact copies), the production numpy keeper
    emits the same accept/match structure as the old pure-python loop, and
    cosines agree to 1e-9 (summation-order ulps only)."""
    import random

    import pandas as pd

    from cosmo_spark.streaming.neardup import make_keeper

    for seed in range(8):
        rng = random.Random(seed)
        dim = rng.choice([4, 8, 16])
        pool = []
        for i in range(rng.randint(5, 30)):
            v = [rng.uniform(-1, 1) for _ in range(dim)]
            pool.append((f"v{i:03d}", v))
            if rng.random() < 0.4:  # planted near-dup / exact copy
                eps = rng.choice([0.0, 1e-4])
                pool.append(
                    (f"v{i:03d}d", [x * (1 + eps) for x in v])
                )
        if rng.random() < 0.5:
            pool.append(("zzero", [0.0] * dim))
        rng.shuffle(pool)
        # split into micro-batches, drive both implementations batch by batch
        keeper = make_keeper(threshold=0.98, max_bucket=10_000)
        state = _FakeState()
        ref_ids, ref_vecs = [], []
        while pool:
            nb = rng.randint(1, max(1, len(pool)))
            batch, pool = pool[:nb], pool[nb:]
            pdf = pd.DataFrame({
                "__id": [r[0] for r in batch],
                "__v": [r[1] for r in batch],
            })
            got = list(keeper((0,), [pdf], state))[0]
            want, ref_ids, ref_vecs = _reference_keeper(
                batch, ref_ids, ref_vecs, 0.98
            )
            assert list(got["id"]) == [w[0] for w in want], f"seed={seed}"
            assert list(got["dup_of"]) == [w[1] for w in want], f"seed={seed}"
            for g, w in zip(got["cos_sim"], want):
                if w[2] is None:
                    assert g is None or pd.isna(g)
                else:
                    assert abs(g - w[2]) < 1e-9, f"seed={seed}"
        # state round-trips identically (order and membership)
        ids, vecs = state.get
        assert list(ids) == ref_ids
        for a, b in zip(vecs, ref_vecs):
            assert a == pytest.approx(b, abs=1e-12)


def test_stream_near_dup_ttl_evicts_out_of_horizon_state(spark, tmp_path):
    """Round-6 verdict #3: with ttl set, accepted vectors behind the
    event-time watermark stop matching — a re-arrival of an evicted
    near-duplicate is ACCEPTED as new — while in-horizon state still
    matches.  This is dropDuplicatesWithinWatermark's horizon contract
    applied to the near-dup keeper."""
    src = tmp_path / "in"
    src.mkdir()
    ckpt, sink = tmp_path / "ck", tmp_path / "out"
    vecs = _vectors()

    def write_ts(name, items):
        with open(src / name, "w") as f:
            for doc_id, vec, ts in items:
                f.write(json.dumps(
                    {"doc_id": doc_id, "embedding": vec, "ts": ts}) + "\n")

    def run():
        stream = spark.readStream.schema(
            "doc_id STRING, embedding ARRAY<DOUBLE>, ts TIMESTAMP"
        ).json(str(src))
        out = stream_srp_near_dup(
            stream, "embedding", "doc_id", _planes(), threshold=0.95,
            ttl="10 minutes", ts_col="ts",
        )
        q = (
            out.writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        return {r.id: r for r in spark.read.parquet(str(sink)).collect()}

    # batch 1 @10:00: d0 and a far vector accepted
    write_ts("b1.json", [("d0", vecs["d0"], "2026-01-01 10:00:00"),
                         ("d4", vecs["d4"], "2026-01-01 10:00:00")])
    rows = run()
    assert rows["d0"].dup_of is None and rows["d4"].dup_of is None

    # batch 2 @11:00: advances the watermark to 10:50 (past d0's 10:00);
    # d2 is fresh in-horizon state
    write_ts("b2.json", [("d2", vecs["d2"], "2026-01-01 11:00:00")])
    rows = run()
    assert rows["d2"].dup_of is None

    # batch 3 @11:01: d0's near-copy must be ACCEPTED (old state evicted),
    # d2's exact copy must still MATCH (in horizon)
    write_ts("b3.json", [("d8", vecs["d1"], "2026-01-01 11:01:00"),
                         ("d3", vecs["d3"], "2026-01-01 11:01:00")])
    rows = run()
    assert rows["d8"].dup_of is None, "evicted state must not match"
    assert rows["d3"].dup_of == "d2", "in-horizon state must still match"


def test_stream_near_dup_ttl_requires_ts_col():
    with pytest.raises(ValueError, match="together"):
        stream_srp_near_dup(
            None, "embedding", "doc_id", _planes(), threshold=0.9,
            ttl="10 minutes",
        )


def test_ttl_ms_parser():
    from cosmo_spark.streaming.neardup import ttl_ms

    assert ttl_ms("10 minutes") == 600_000
    assert ttl_ms("1 hour") == 3_600_000
    assert ttl_ms("250 milliseconds") == 250
    with pytest.raises(ValueError):
        ttl_ms("fortnight")
    with pytest.raises(ValueError):
        ttl_ms("3 fortnights")


def test_stream_near_dup_ttl_null_event_time_dropped_not_fatal(spark, tmp_path):
    """Review r7: a NULL event time reached the keeper as NaT -> int64-min
    and a negative setTimeoutTimestamp killed the whole streaming query.
    Null-ts rows must be dropped by contract while valid rows process."""
    import json as _json

    src = tmp_path / "in"
    src.mkdir()
    vecs = _vectors()
    with open(src / "b1.json", "w") as f:
        f.write(_json.dumps({"doc_id": "bad", "embedding": vecs["d4"],
                             "ts": None}) + "\n")
        f.write(_json.dumps({"doc_id": "d0", "embedding": vecs["d0"],
                             "ts": "2026-01-01 10:00:00"}) + "\n")
    stream = spark.readStream.schema(
        "doc_id STRING, embedding ARRAY<DOUBLE>, ts TIMESTAMP"
    ).json(str(src))
    out = stream_srp_near_dup(
        stream, "embedding", "doc_id", _planes(), threshold=0.95,
        ttl="10 minutes", ts_col="ts",
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = {r.id: r for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert "d0" in rows and rows["d0"].dup_of is None
    assert "bad" not in rows, "null-ts row must be dropped, not processed"
