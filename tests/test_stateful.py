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


def test_stream_final_state_matches_q56_batch_twin(spark, tmp_path):
    """Cross-validation: the stateful stream's final per-key Welford
    snapshot equals the last row of the q56 batch running-stats window on
    the same data (up to float tolerance — Welford vs sum-of-squares)."""
    import json as _json
    import math

    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rows = [
        ("A", i, 10.0 + (i % 5)) for i in range(20)
    ] + [("B", i, 100.0 - 3 * i) for i in range(7)]
    src = tmp_path / "tl"
    src.mkdir()
    with open(src / "d.json", "w") as f:
        for k, i, v in rows:
            f.write(_json.dumps({"mnemonic": k, "seq": i, "Data": v}) + "\n")

    stream = spark.readStream.schema("mnemonic STRING, seq LONG, Data DOUBLE").json(str(src))
    q = (
        running_stats(stream).writeStream.format("memory").queryName("rs_twin")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    # last snapshot per key
    snap = {r.mnemonic: r for r in spark.sql(
        "SELECT * FROM rs_twin").collect()}

    batch = spark.createDataFrame(rows, "mnemonic STRING, seq LONG, Data DOUBLE")
    w = Window.partitionBy("mnemonic").orderBy("seq").rowsBetween(
        Window.unboundedPreceding, 0)
    n = F.count(F.lit(1)).over(w)
    s = F.sum("Data").over(w)
    ss = F.sum(F.col("Data") * F.col("Data")).over(w)
    # greatest(n-1, 1) avoids the n=1 division (ANSI mode errors on it);
    # only the last row per key is compared, where n > 1
    stats = batch.select(
        "mnemonic", "seq", n.alias("n"),
        (s / n).alias("mean"),
        F.sqrt(F.greatest(
            (ss - s * s / n) / F.greatest(n - F.lit(1), F.lit(1)), F.lit(0.0)
        )).alias("std"),
    )
    last = {
        r.mnemonic: r for r in stats.withColumn(
            "rn", F.row_number().over(
                Window.partitionBy("mnemonic").orderBy(F.col("seq").desc()))
        ).filter("rn = 1").collect()
    }
    for k in ("A", "B"):
        assert snap[k].n == last[k].n
        assert snap[k].mean == pytest.approx(last[k].mean, rel=1e-9)
        assert snap[k].std == pytest.approx(last[k].std, rel=1e-9)


def test_running_stats_ttl_evicts_idle_keys(spark, tmp_path):
    """Round-6 verdict #3: with ttl set, a key idle past the event-time
    horizon drops its state — a later re-appearance restarts at n=1 —
    while keys inside the horizon keep accumulating unchanged."""
    src = tmp_path / "in"
    src.mkdir()
    ckpt, sink = tmp_path / "ck", tmp_path / "snapshots"

    def write_ts(name, rows):
        with open(src / name, "w") as f:
            for mnemonic, v, ts in rows:
                f.write(json.dumps(
                    {"mnemonic": mnemonic, "Data": v, "ts": ts}) + "\n")

    def run(sub):
        stream = spark.readStream.schema(
            "mnemonic STRING, Data DOUBLE, ts TIMESTAMP"
        ).json(str(src))
        out = running_stats(stream, ttl="10 minutes", ts_col="ts")
        q = (
            out.writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    # batch 1: A at 10:00 (2 rows), B at 10:00
    write_ts("b1.json", [("A", 10.0, "2026-01-01 10:00:00"),
                         ("A", 12.0, "2026-01-01 10:00:30"),
                         ("B", 5.0, "2026-01-01 10:00:00")])
    run(1)
    # batch 2: B advances to 11:00 -> watermark moves to 10:50, past A's
    # newest event (10:00:30) + 10 min = 10:10:30 -> A times out
    write_ts("b2.json", [("B", 6.0, "2026-01-01 11:00:00")])
    run(2)
    # batch 3: A re-appears, B continues
    write_ts("b3.json", [("A", 99.0, "2026-01-01 11:01:00"),
                         ("B", 7.0, "2026-01-01 11:01:00")])
    run(3)
    rows = spark.read.parquet(str(sink)).collect()
    # A's batch-3 snapshot (last_value 99.0) must show FRESH state
    a3 = [r for r in rows if r.mnemonic == "A" and r.last_value == 99.0]
    assert a3 and a3[0].n == 1, "idle key A must restart from fresh state"
    assert a3[0].mean == pytest.approx(99.0)
    # in-horizon key B keeps accumulating: batch-3 snapshot continues n=3
    b3 = [r for r in rows if r.mnemonic == "B" and r.last_value == 7.0]
    assert b3 and b3[0].n == 3, "in-horizon key B must keep accumulating"


def test_running_stats_ttl_requires_ts_col():
    with pytest.raises(ValueError, match="together"):
        running_stats(None, ttl="10 minutes")


def test_running_stats_ttl_null_event_time_dropped_not_fatal(spark, tmp_path):
    """Review r7: a NULL event time under ttl= poisoned
    setTimeoutTimestamp (NaT -> int64-min) and terminated the query.
    Null-ts rows are dropped; valid rows keep processing."""
    src = tmp_path / "in"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        f.write(json.dumps({"mnemonic": "A", "Data": 1.0, "ts": None}) + "\n")
        f.write(json.dumps({"mnemonic": "A", "Data": 2.0,
                            "ts": "2026-01-01 10:00:00"}) + "\n")
    stream = spark.readStream.schema(
        "mnemonic STRING, Data DOUBLE, ts TIMESTAMP"
    ).json(str(src))
    out = running_stats(stream, ttl="10 minutes", ts_col="ts")
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "snap"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(str(tmp_path / "snap")).collect()
    assert len(rows) == 1 and rows[0].n == 1 and rows[0].last_value == 2.0


def test_heartbeat_gaps_emit_on_silence_and_reset(spark, tmp_path):
    """The timeout branch as PRODUCT: a key silent past the horizon emits
    one gap record carrying its last_seen and event count; a later
    re-appearance starts a fresh episode that can gap again; keys inside
    the horizon never appear in the sink."""
    from cosmo_spark.streaming.stateful import heartbeat_gaps

    src = tmp_path / "in"
    src.mkdir()
    ckpt, sink = tmp_path / "ck", tmp_path / "gaps"

    def write_ts(name, rows):
        with open(src / name, "w") as f:
            for k, ts in rows:
                f.write(json.dumps({"k": k, "ts": ts}) + "\n")

    def run():
        stream = spark.readStream.schema("k STRING, ts TIMESTAMP").json(
            str(src)
        )
        out = heartbeat_gaps(stream, "k", "ts", "10 minutes")
        q = (
            out.writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    # episode 1: A beats twice, B beats once
    write_ts("b1.json", [("A", "2026-01-01 10:00:00"),
                         ("A", "2026-01-01 10:00:30"),
                         ("B", "2026-01-01 10:00:00")])
    run()
    # B advances to 11:00 -> watermark 10:50 > A's 10:00:30 + 10 min -> A gaps
    write_ts("b2.json", [("B", "2026-01-01 11:00:00")])
    run()
    rows = spark.read.parquet(str(sink)).collect()
    assert len(rows) == 1
    g = rows[0]
    assert g.key == "A" and g.n_events == 2
    assert str(g.last_seen).startswith("2026-01-01 10:00:30")

    # episode 2: A re-appears, then goes silent again -> a SECOND gap with
    # a fresh count (state was cleared at the first gap)
    write_ts("b3.json", [("A", "2026-01-01 11:05:00")])
    run()
    write_ts("b4.json", [("B", "2026-01-01 12:00:00")])
    run()
    rows = sorted(spark.read.parquet(str(sink)).collect(),
                  key=lambda r: str(r.last_seen))
    assert [r.key for r in rows] == ["A", "A"]
    assert rows[1].n_events == 1  # fresh episode, not 3
    # B has always been inside the horizon: no B gap
    assert all(r.key != "B" for r in rows)
