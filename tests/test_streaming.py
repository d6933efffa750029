"""Streaming-layer tests: checkpointed file ingest with version-guarded merge
(ST1/ST3) and tumbling-window rates (ST4)."""

from __future__ import annotations

import datetime
import json
import os

from pyspark.sql.types import StructType, StructField, StringType, LongType

from cosmo_spark.streaming.ingest import stream_ingest_merge
from cosmo_spark.streaming.rates import windowed_rates

SCHEMA = StructType([
    StructField("SMSID", StringType()),
    StructField("VERSION", StringType()),
    StructField("payload", LongType()),
])


def write_json(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_ingest_merge_versions(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    target = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    write_json(src / "b1.json", [
        {"SMSID": "s1", "VERSION": "b4", "payload": 1},
        {"SMSID": "s2", "VERSION": "a1", "payload": 2},
    ])
    q = stream_ingest_merge(spark, str(src), SCHEMA, target, "SMSID", "VERSION", ckpt)
    q.awaitTermination(60)
    state = {r.SMSID: (r.VERSION, r.payload) for r in spark.read.parquet(target).collect()}
    assert state == {"s1": ("b4", 1), "s2": ("a1", 2)}

    # second batch: newer version supersedes, older is a no-op, new key inserts
    write_json(src / "b2.json", [
        {"SMSID": "s1", "VERSION": "c2", "payload": 10},
        {"SMSID": "s2", "VERSION": "a0", "payload": 99},
        {"SMSID": "s3", "VERSION": "a1", "payload": 3},
    ])
    q = stream_ingest_merge(spark, str(src), SCHEMA, target, "SMSID", "VERSION", ckpt)
    q.awaitTermination(60)
    state = {r.SMSID: (r.VERSION, r.payload) for r in spark.read.parquet(target).collect()}
    assert state == {"s1": ("c2", 10), "s2": ("a1", 2), "s3": ("a1", 3)}

    # ST1: re-running with no new files re-processes nothing (checkpoint)
    q = stream_ingest_merge(spark, str(src), SCHEMA, target, "SMSID", "VERSION", ckpt)
    q.awaitTermination(60)
    state2 = {r.SMSID: (r.VERSION, r.payload) for r in spark.read.parquet(target).collect()}
    assert state2 == state


def test_windowed_rates_batch_twin(spark):
    ts = datetime.datetime(2024, 1, 1)
    rows = [
        ("click", ts + datetime.timedelta(seconds=s)) for s in [1, 2, 3, 30, 51]
    ]
    df = spark.createDataFrame(rows, "event_type STRING, ts TIMESTAMP")
    out = {
        (r.event_type, r.window_start.second): (r.n, r.rate_per_sec)
        for r in windowed_rates(df).collect()
    }
    assert out[("click", 0)] == (3, 3 / 25.0)
    assert out[("click", 25)] == (1, 1 / 25.0)
    assert out[("click", 50)] == (1, 1 / 25.0)


def test_windowed_rates_streaming(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    write_json(src / "e1.json", [
        {"event_type": "click", "ts": "2024-01-01T00:00:01.000Z"},
        {"event_type": "click", "ts": "2024-01-01T00:00:02.000Z"},
        {"event_type": "view", "ts": "2024-01-01T00:00:30.000Z"},
    ])
    schema = "event_type STRING, ts TIMESTAMP"
    stream = spark.readStream.schema(schema).json(str(src))
    rates = windowed_rates(stream)
    q = (
        rates.writeStream.format("memory").queryName("rates_test")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT * FROM rates_test").collect()
    got = {(r.event_type, r.window_start.second): r.n for r in rows}
    assert got == {("click", 0): 2, ("view", 25): 1}
