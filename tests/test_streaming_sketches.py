"""Streaming HLL register maintenance: the incrementally-maintained state
must be BIT-IDENTICAL to a from-scratch batch computation over the same
documents (the q105 stream-twin discipline applied to q107's machinery),
across micro-batches, restarts, retries (idempotent max-merge), and
compaction."""

from __future__ import annotations

import json

import pytest

from cosmo_spark.streaming.sketches import (
    compact_hll_registers,
    hll_distinct_estimates,
    read_hll_registers,
    stream_hll_registers,
)


def _write_batch(src, name, docs):
    with open(src / name, "w") as f:
        for key, text in docs:
            f.write(json.dumps({"source": key, "text": text}) + "\n")


def _run(spark, src, ckpt, regs):
    stream = spark.readStream.schema("source STRING, text STRING").json(
        str(src)
    )
    q = stream_hll_registers(
        stream, "source", "text", str(regs), str(ckpt)
    )
    q.awaitTermination(120)


def test_stream_registers_equal_batch_recompute(spark, tmp_path):
    from pyspark.sql import functions as F

    from cosmo_spark.operators.sketches import hll_estimate, hll_registers

    src = tmp_path / "in"
    src.mkdir()
    ckpt, regs = tmp_path / "ck", tmp_path / "regs"

    b1 = [("web", f"doc {i}") for i in range(40)] + [("wiki", "alpha")]
    b2 = (
        [("web", f"doc {i}") for i in range(20, 60)]  # 20 overlap
        + [("wiki", "beta"), ("wiki", None), ("wiki", "alpha")]
    )
    _write_batch(src, "b1.json", b1)
    _run(spark, src, ckpt, regs)
    # batch 2 lands in a SECOND run against the same checkpoint: the
    # maintainer resumes and only processes the new file
    _write_batch(src, "b2.json", b2)
    _run(spark, src, ckpt, regs)

    all_docs = spark.createDataFrame(
        [d for d in b1 + b2], "source STRING, text STRING"
    ).withColumnRenamed("source", "key")
    expected = {
        (r.key, r.bucket): r.rho
        for r in hll_registers(all_docs, ["key"], "text").collect()
    }
    got = {
        (r.key, r.bucket): r.rho
        for r in read_hll_registers(spark, str(regs)).collect()
    }
    assert got == expected, "incremental merge must equal batch recompute"

    # dashboard estimates: shared estimator, small-range correction live —
    # wiki has 2 distinct texts, so its corrected estimate is ~exact
    ests = {
        r.key: r.est
        for r in hll_distinct_estimates(spark, str(regs)).collect()
    }
    batch_ests = {
        r.key: r.est
        for r in hll_estimate(
            hll_registers(all_docs, ["key"], "text"), ["key"]
        ).collect()
    }
    assert ests == batch_ests
    assert ests["wiki"] == pytest.approx(2.0, rel=0.15)

    # retry idempotence: re-appending a batch's registers (what a crashed
    # foreachBatch retry does) must not change the merged state
    spark.read.parquet(str(regs)).limit(50).write.mode("append").parquet(
        str(regs)
    )
    assert {
        (r.key, r.bucket): r.rho
        for r in read_hll_registers(spark, str(regs)).collect()
    } == expected

    # compaction: same merged state, log shrunk to <= keys x m rows
    n_before = spark.read.parquet(str(regs)).count()
    compact_hll_registers(spark, str(regs))
    assert {
        (r.key, r.bucket): r.rho
        for r in read_hll_registers(spark, str(regs)).collect()
    } == expected
    assert spark.read.parquet(str(regs)).count() <= min(n_before, 2 * 256)
    ests2 = {
        r.key: r.est
        for r in hll_distinct_estimates(spark, str(regs)).collect()
    }
    assert ests2 == batch_ests
