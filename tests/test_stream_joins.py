"""Stream-stream tolerated-lag join (streaming/joins.py): inner matches
equal the batch join, and the leftOuter variant SURFACES unmatched rows
with NULLs after watermark expiry — the strict analog of the reference's
silent inner-join lag drop (SURVEY.md ST5; ref data_models.py:167-182)."""

from __future__ import annotations

import json

from cosmo_spark.streaming.joins import stream_lag_join

SCHEMA_L = "k STRING, lt TIMESTAMP, lval STRING"
SCHEMA_R = "k STRING, rt TIMESTAMP, rval STRING"


def _write(src, name, rows):
    with open(src / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, lsrc, rsrc, ckpt, sink, join_type):
    l = spark.readStream.schema(SCHEMA_L).json(str(lsrc))
    r = spark.readStream.schema(SCHEMA_R).json(str(rsrc))
    out = stream_lag_join(
        l, r, "k", "lt", "rt",
        tolerance="30 seconds", watermark="10 seconds", join_type=join_type,
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", str(sink))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(str(sink)).collect()


def test_inner_matches_within_tolerance(spark, tmp_path):
    lsrc, rsrc = tmp_path / "l", tmp_path / "r"
    lsrc.mkdir(), rsrc.mkdir()
    _write(lsrc, "b1.json", [
        {"k": "a", "lt": "2024-01-01T00:00:20", "lval": "flash1"},
        {"k": "a", "lt": "2024-01-01T00:05:00", "lval": "flash2"},  # no partner
        {"k": "b", "lt": "2024-01-01T00:00:20", "lval": "flash3"},  # wrong key
    ])
    _write(rsrc, "b1.json", [
        {"k": "a", "rt": "2024-01-01T00:00:30", "rval": "sms1"},
    ])
    rows = _run(spark, lsrc, rsrc, tmp_path / "ck", tmp_path / "out", "inner")
    assert [(r.lval, r.rval) for r in rows] == [("flash1", "sms1")]


def test_left_outer_surfaces_unmatched_after_watermark(spark, tmp_path):
    """flash2 has no SMS partner: the reference drops it silently; the
    strict streaming analog emits it with NULL right columns once the
    watermark passes its match window (advanced here by a later batch —
    the restart pattern the other streaming tests use)."""
    lsrc, rsrc = tmp_path / "l", tmp_path / "r"
    lsrc.mkdir(), rsrc.mkdir()
    ck, sink = tmp_path / "ck", tmp_path / "out"
    _write(lsrc, "b1.json", [
        {"k": "a", "lt": "2024-01-01T00:00:20", "lval": "flash1"},
        {"k": "a", "lt": "2024-01-01T00:02:00", "lval": "flash2"},
    ])
    _write(rsrc, "b1.json", [
        {"k": "a", "rt": "2024-01-01T00:00:30", "rval": "sms1"},
    ])
    rows = _run(spark, lsrc, rsrc, ck, sink, "leftOuter")
    got = {r.lval: r.rval for r in rows}
    assert got.get("flash1") == "sms1"  # matched pair emits immediately

    # advance the watermark far past flash2's window on BOTH streams
    _write(lsrc, "b2.json", [
        {"k": "z", "lt": "2024-01-01T01:00:00", "lval": "late_l"},
    ])
    _write(rsrc, "b2.json", [
        {"k": "z", "rt": "2024-01-01T01:00:00", "rval": "late_r"},
    ])
    rows = _run(spark, lsrc, rsrc, ck, sink, "leftOuter")
    got = {r.lval: r.rval for r in rows}
    assert "flash2" in got and got["flash2"] is None  # surfaced, not dropped
    # flash2's matched-time column is NULL too
    f2 = next(r for r in rows if r.lval == "flash2")
    assert f2.rt_matched is None


def test_batch_twin_equals_reference_semantics(spark):
    """On batch frames the same helper reproduces the reference's inner
    join exactly (tolerated lag both directions)."""
    l = spark.createDataFrame(
        [("a", "2024-01-01T00:00:20", "f1"),
         ("a", "2024-01-01T00:05:00", "f2")], SCHEMA_L.replace("TIMESTAMP", "STRING"),
    ).selectExpr("k", "CAST(lt AS TIMESTAMP) lt", "lval")
    r = spark.createDataFrame(
        [("a", "2024-01-01T00:00:10", "s1"),
         ("a", "2024-01-01T00:04:45", "s2")], SCHEMA_R.replace("TIMESTAMP", "STRING"),
    ).selectExpr("k", "CAST(rt AS TIMESTAMP) rt", "rval")
    out = stream_lag_join(l, r, "k", "lt", "rt",
                          tolerance="30 seconds", join_type="inner")
    assert sorted((x.lval, x.rval) for x in out.collect()) == [
        ("f1", "s1"), ("f2", "s2")
    ]


def test_colliding_payload_and_outer_key_survival(spark):
    """Right payload columns sharing a left column's name rename to
    _right (realistic telemetry streams share field names), and fullOuter
    keeps the join key on unmatched RIGHT rows (round-5 review)."""
    l = spark.createDataFrame(
        [("a", "2024-01-01T00:00:20", "L")],
        "k STRING, lt STRING, seg STRING",
    ).selectExpr("k", "CAST(lt AS TIMESTAMP) lt", "seg")
    r = spark.createDataFrame(
        [("a", "2024-01-01T00:00:30", "R1"),
         ("zz", "2024-01-01T00:00:30", "R2")],   # unmatched right key
        "k STRING, rt STRING, seg STRING",
    ).selectExpr("k", "CAST(rt AS TIMESTAMP) rt", "seg")
    out = stream_lag_join(
        l, r, "k", "lt", "rt", tolerance="30 seconds", join_type="fullOuter"
    )
    assert "seg" in out.columns and "seg_right" in out.columns
    rows = {x.k: (x.seg, x.seg_right) for x in out.collect()}
    assert rows["a"] == ("L", "R1")
    assert rows["zz"] == (None, "R2")   # key survives the unmatched right row


def test_double_collision_uniquifies_iteratively(spark):
    """'{c}_right' can itself collide: left carries BOTH 'seg' and
    'seg_right', so the right 'seg' must escalate to 'seg_right_right'
    (ADVICE r5: one-shot rename produced duplicate output columns)."""
    l = spark.createDataFrame(
        [("a", "2024-01-01T00:00:20", "L", "LR")],
        "k STRING, lt STRING, seg STRING, seg_right STRING",
    ).selectExpr("k", "CAST(lt AS TIMESTAMP) lt", "seg", "seg_right")
    r = spark.createDataFrame(
        [("a", "2024-01-01T00:00:30", "R1")],
        "k STRING, rt STRING, seg STRING",
    ).selectExpr("k", "CAST(rt AS TIMESTAMP) rt", "seg")
    out = stream_lag_join(l, r, "k", "lt", "rt", tolerance="30 seconds")
    assert len(out.columns) == len(set(out.columns)), out.columns
    assert "seg_right_right" in out.columns
    row = out.collect()[0]
    assert (row.seg, row.seg_right, row.seg_right_right) == ("L", "LR", "R1")
