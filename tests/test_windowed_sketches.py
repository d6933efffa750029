"""Windowed sketch registers (review r7 #6): event-time-bucketed HLL/CMS/KMV
state so horizon questions ("distinct over the last 30 days") are answerable
and old buckets AGE OUT of at-rest state — bounded sketches on an unbounded
stream.  Gates: (a) an in-horizon read is bit-identical to a from-scratch
batch sketch over exactly the in-horizon rows; (b) ``expire_windows`` drops
the aged buckets from disk and post-expiry reads equal the in-horizon batch
build; (c) eviction runs through the crash-atomic rotation (manifest debris
never survives)."""

from __future__ import annotations

import json
from datetime import datetime

from pyspark.sql import functions as F

from cosmo_spark.streaming import sketches as sk

JAN = datetime(2024, 1, 1)
FEB = datetime(2024, 2, 1)

B_JAN = [("web", f"jan doc {i}", "2024-01-01T08:00:00") for i in range(30)] + [
    ("wiki", "alpha beta", "2024-01-01T09:30:00")
]
B_FEB = [("web", f"feb doc {i}", "2024-02-01T11:00:00") for i in range(20)] + [
    ("wiki", "gamma", "2024-02-01T12:15:00"),
    ("wiki", None, "2024-02-01T12:16:00"),
]
SCHEMA = "source STRING, text STRING, ts TIMESTAMP"


def _write_batch(src, name, docs):
    with open(src / name, "w") as f:
        for key, text, ts in docs:
            f.write(json.dumps({"source": key, "text": text, "ts": ts}) + "\n")


def _feed(spark, tmp_path, start_fn):
    src = tmp_path / "in"
    src.mkdir()
    _write_batch(src, "b1.json", B_JAN)
    start_fn(spark.readStream.schema(SCHEMA).json(str(src))).awaitTermination(120)
    _write_batch(src, "b2.json", B_FEB)
    start_fn(spark.readStream.schema(SCHEMA).json(str(src))).awaitTermination(120)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(k, t) for k, t, _ in rows], "key STRING, text STRING"
    )


def test_hll_windowed_horizon_and_eviction(spark, tmp_path):
    from cosmo_spark.operators.sketches import hll_estimate, hll_registers

    regs, ckpt = str(tmp_path / "regs"), str(tmp_path / "ck")
    _feed(spark, tmp_path, lambda s: sk.stream_hll_registers_windowed(
        s, "source", "text", "ts", regs, ckpt
    ))

    def ests(since=None, until=None):
        return {
            r.key: r.est
            for r in sk.hll_distinct_estimates_windowed(
                spark, regs, since, until
            ).collect()
        }

    def batch_ests(rows):
        return {
            r.key: r.est
            for r in hll_estimate(
                hll_registers(_docs(spark, rows), ["key"], "text"), ["key"]
            ).collect()
        }

    assert ests() == batch_ests(B_JAN + B_FEB)
    assert ests(since=FEB) == batch_ests(B_FEB)
    assert ests(until=FEB) == batch_ests(B_JAN)

    # eviction: January ages out of at-rest state entirely
    sk.expire_windows(spark, regs, "hll", older_than=FEB)
    log = spark.read.schema(sk.HLLW_SCHEMA).parquet(regs)
    assert log.filter(F.col("win") < F.lit(FEB)).count() == 0
    assert log.count() > 0
    assert ests() == batch_ests(B_FEB), "post-expiry == in-horizon batch"
    assert sk._read_manifest(regs) is None, "rotation must leave no debris"


def test_cms_windowed_horizon_and_eviction(spark, tmp_path):
    from cosmo_spark.functions.text import poly_hash, tokenize
    from cosmo_spark.operators.sketches import cms_counters

    ctr, ckpt = str(tmp_path / "ctr"), str(tmp_path / "ck")
    _feed(spark, tmp_path, lambda s: sk.stream_cms_counters_windowed(
        s, "text", "ts", ctr, ckpt
    ))

    def batch_counters(rows):
        tokh = _docs(spark, rows).filter(F.col("text").isNotNull()).select(
            F.explode(tokenize(F.col("text"))).alias("tok")
        ).select(poly_hash(F.col("tok")).alias("th"))
        return {
            (r.r, r.bucket): r.cnt for r in cms_counters(tokh).collect()
        }

    def got(since=None, until=None):
        return {
            (r.r, r.bucket): r.cnt
            for r in sk.read_cms_counters_windowed(
                spark, ctr, since, until
            ).collect()
        }

    assert got() == batch_counters(B_JAN + B_FEB)
    assert got(since=FEB) == batch_counters(B_FEB)
    assert got(until=FEB) == batch_counters(B_JAN)

    sk.expire_windows(spark, ctr, "cms", older_than=FEB)
    log = spark.read.schema(sk.CMSW_SCHEMA).parquet(ctr)
    assert log.filter(F.col("win") < F.lit(FEB)).count() == 0
    assert got() == batch_counters(B_FEB)
    # compacted generation carries the sentinel batch_id and one row per
    # (win, r, bucket) — additive state stayed exactly-once through expiry
    assert {r.batch_id for r in log.select("batch_id").distinct().collect()} \
        == {-1}


def test_kmv_windowed_horizon_and_eviction(spark, tmp_path):
    from cosmo_spark.functions.text import poly_hash, tokenize
    from cosmo_spark.operators.sketches import kmv_k_smallest

    vals, ckpt = str(tmp_path / "vals"), str(tmp_path / "ck")
    _feed(spark, tmp_path, lambda s: sk.stream_kmv_values_windowed(
        s, "source", "text", "ts", vals, ckpt
    ))

    def batch_sketch(rows):
        hs = (
            _docs(spark, rows).filter(F.col("text").isNotNull())
            .select("key", F.explode(tokenize(F.col("text"))).alias("t"))
            .select("key", poly_hash(F.col("t")).alias("h"))
            .distinct()
        )
        return {(r.key, r.h) for r in kmv_k_smallest(hs, ["key"]).collect()}

    def got(since=None, until=None):
        return {
            (r.key, r.h)
            for r in sk.read_kmv_values_windowed(
                spark, vals, since, until
            ).collect()
        }

    assert got() == batch_sketch(B_JAN + B_FEB)
    assert got(since=FEB) == batch_sketch(B_FEB)

    sk.expire_windows(spark, vals, "kmv", older_than=FEB)
    log = spark.read.schema(sk.KMVW_SCHEMA).parquet(vals)
    assert log.filter(F.col("win") < F.lit(FEB)).count() == 0
    assert got() == batch_sketch(B_FEB)
