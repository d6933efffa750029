"""Stateful streaming operator test: Welford running stats across
micro-batches with persistent state."""

from __future__ import annotations

import json

import pytest

from cosmo_spark.streaming.stateful import running_stats


def write_batch(src, name, rows):
    with open(src / name, "w") as f:
        for mnemonic, v in rows:
            f.write(json.dumps({"mnemonic": mnemonic, "Data": v}) + "\n")


def run_once(spark, src, ckpt, sink):
    # memory sink cannot recover from a checkpoint; a file sink persists the
    # snapshots and lets state carry across separate runs
    stream = spark.readStream.schema("mnemonic STRING, Data DOUBLE").json(str(src))
    out = running_stats(stream)
    q = (
        out.writeStream.format("parquet")
        .option("path", str(sink))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)


def latest_snapshots(spark, sink):
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    df = spark.read.parquet(str(sink))
    w = Window.partitionBy("mnemonic").orderBy(F.col("n").desc())
    return {
        r.mnemonic: r
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1").drop("rn").collect()
    }


def test_running_stats_across_batches(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    ckpt = tmp_path / "ck"
    sink = tmp_path / "snapshots"

    write_batch(src, "b1.json", [("A", 10.0), ("A", 12.0), ("A", 14.0)])
    run_once(spark, src, ckpt, sink)
    a = latest_snapshots(spark, sink)["A"]
    assert a.n == 3 and a.mean == pytest.approx(12.0)
    assert a.std == pytest.approx(2.0)
    assert not a.outlier

    # second batch: state carries over (n continues from 3); a wild value
    # must flag as an outlier against the running distribution
    write_batch(src, "b2.json", [("A", 11.0), ("A", 13.0), ("A", 12.0),
                                 ("A", 12.0), ("A", 120.0), ("B", 1.0)])
    run_once(spark, src, ckpt, sink)
    snaps = latest_snapshots(spark, sink)
    a2 = snaps["A"]
    assert a2.n == 8          # 3 from batch 1 + 5 new A rows: state persisted
    assert a2.last_value == 120.0
    assert a2.outlier         # 120 is far outside the running distribution
    b = snaps["B"]
    assert b.n == 1 and b.std is None and not b.outlier
