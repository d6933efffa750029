"""Unit tests for the expression kits — hand-computed expectations, mirroring
the reference's operator-level tests (ref: tests/test_monitor_helpers.py)."""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F

from cosmo_spark.functions.timekit import (
    decimal_year,
    doy_str_to_ts,
    mjd_to_ts,
    ts_to_doy_str,
    ts_to_mjd,
)
from cosmo_spark.functions.mathkit import fit_line_cols, hypot_distance, rotate_45
from cosmo_spark.functions.arrays import (
    RaggedArrayError,
    array_max,
    array_mean,
    array_std,
    clean_sentinels,
    element_by_match,
    explode_zip,
    rel_to_first,
)
from cosmo_spark.functions.vectors import cosine_sim, dot, l2_norm


def test_mjd_round_trip(spark):
    # MJD 58486.19196402 is the golden EXPSTART from the reference
    # (ref: tests/test_filesystem.py:260)
    df = spark.createDataFrame([(58486.19196402,)], "mjd DOUBLE")
    row = df.select(
        mjd_to_ts("mjd").alias("ts"), ts_to_mjd(mjd_to_ts("mjd")).alias("back")
    ).first()
    assert row.ts.year == 2019 and row.ts.month == 1 and row.ts.day == 3
    assert abs(row.back - 58486.19196402) < 1e-9


def test_mjd_epoch(spark):
    df = spark.createDataFrame([(40587.0,)], "mjd DOUBLE")
    assert df.select(mjd_to_ts("mjd").alias("t")).first().t == datetime.datetime(
        1970, 1, 1
    )


def test_doy_parse(spark):
    # ref: cosmo/monitor_helpers.py:15-25 (yyyy.ddd) and
    # cosmo/sms/ingest_sms.py:28 (yyyy.ddd:hh:mm:ss)
    df = spark.createDataFrame(
        [("2018.016:00:00:11",), ("2018.016",)], "s STRING"
    )
    rows = df.select(doy_str_to_ts("s").alias("t")).collect()
    assert rows[0].t == datetime.datetime(2018, 1, 16, 0, 0, 11)
    assert rows[1].t == datetime.datetime(2018, 1, 16)
    rt = df.limit(1).select(ts_to_doy_str(doy_str_to_ts("s")).alias("d")).first()
    assert rt.d == "2018.016"


def test_decimal_year(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2023, 1, 1, 0, 0, 0),),
         (datetime.datetime(2024, 12, 31, 0, 0, 0),)],
        "t TIMESTAMP",
    )
    rows = df.select(decimal_year("t").alias("y")).collect()
    assert rows[0].y == pytest.approx(2023.0)
    assert rows[1].y == pytest.approx(2024.0 + 365.0 / 366.0)


def test_rotation_and_distance(spark):
    # closed-form expectation mirrors ref tests/test_monitor_helpers.py:135-152
    df = spark.createDataFrame([(1.0, 1.0), (3.0, 1.0)], "x DOUBLE, y DOUBLE")
    v2, v3 = rotate_45("x", "y")
    rows = df.select(
        v2.alias("v2"), v3.alias("v3"), hypot_distance("x", "y").alias("d")
    ).orderBy("x").collect()
    assert rows[0].v2 == pytest.approx(math.sqrt(2.0))
    assert rows[0].v3 == pytest.approx(0.0, abs=1e-12)
    assert rows[0].d == pytest.approx(math.sqrt(2.0))
    # x != y pins the V3 sign: v3 = x cosθ - y sinθ (ref monitor_helpers.py:101-106)
    assert rows[1].v2 == pytest.approx(4.0 / math.sqrt(2.0))
    assert rows[1].v3 == pytest.approx(2.0 / math.sqrt(2.0))


def test_fit_line(spark):
    # y = 2x + 1 exactly (ref: tests/test_monitor_helpers.py:28-43)
    df = spark.createDataFrame(
        [(float(x), 2.0 * x + 1.0) for x in range(10)], "x DOUBLE, y DOUBLE"
    )
    slope, intercept = fit_line_cols("x", "y")
    row = df.agg(slope.alias("m"), intercept.alias("b")).first()
    assert row.m == pytest.approx(2.0)
    assert row.b == pytest.approx(1.0)


def test_explode_zip_counts(spark):
    # row counts mirror ref tests/test_monitor_helpers.py:51-69
    df = spark.createDataFrame(
        [("a", [1.0, 2.0, 3.0], ["x", "y", "z"]), ("b", [4.0], ["w"])],
        "k STRING, v ARRAY<DOUBLE>, s ARRAY<STRING>",
    )
    out = explode_zip(df, ["v", "s"], index_col="idx")
    rows = out.orderBy("k", "idx").collect()
    assert len(rows) == 4
    assert rows[0].k == "a" and rows[0].idx == 0 and rows[0].v == 1.0 and rows[0].s == "x"
    assert rows[3].k == "b" and rows[3].idx == 0 and rows[3].v == 4.0


def test_explode_zip_ragged_raises(spark):
    # ref raises ValueError on ragged arrays (cosmo/monitor_helpers.py:46-47);
    # arrays_zip would silently null-pad without the validation action
    df = spark.createDataFrame(
        [("a", [1.0, 2.0], ["only-one"])], "k STRING, v ARRAY<DOUBLE>, s ARRAY<STRING>"
    )
    with pytest.raises(RaggedArrayError):
        explode_zip(df, ["v", "s"])


def test_array_stats(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0, 4.0],), ([],)], "a ARRAY<DOUBLE>"
    )
    rows = df.select(
        array_mean("a").alias("m"), array_std("a").alias("s"), array_max("a").alias("mx")
    ).collect()
    assert rows[0].m == pytest.approx(2.5)
    assert rows[0].s == pytest.approx(1.2909944487358056)
    assert rows[0].mx == 4.0
    # empty arrays -> NULL (ref: jitter empty->NaN, cosmo/filesystem.py:265-270)
    assert rows[1].m is None and rows[1].s is None


def test_rel_to_first(spark):
    # ref: REL_SHIFT = SHIFT[1:] - SHIFT[0] (osm_drift_monitors.py:21-27)
    df = spark.createDataFrame([([10.0, 12.0, 9.0],)], "a ARRAY<DOUBLE>")
    row = df.select(rel_to_first("a").alias("r")).first()
    assert row.r == [2.0, -1.0]


def test_element_by_match(spark):
    # ref: FP_PIXEL_SHIFT[where(LAMPTAB_SEGMENT == SEGMENT)][0] with
    # length-mismatch fallback (osm_shift_monitors.py:613-623)
    df = spark.createDataFrame(
        [([1.5, 2.5], ["FUVA", "FUVB"], "FUVB"),
         ([1.5], ["FUVA", "FUVB"], "FUVB"),       # ragged -> NULL
         ([1.5, 2.5], ["FUVA", "FUVB"], "NUVA")], # no match -> NULL
        "vals ARRAY<DOUBLE>, keys ARRAY<STRING>, k STRING",
    )
    rows = df.select(element_by_match("vals", "keys", "k").alias("v")).collect()
    assert rows[0].v == 2.5
    assert rows[1].v is None
    assert rows[2].v is None


def test_clean_sentinels(spark):
    # ref: strip >= 1e30 (cosmo/filesystem.py:249-253)
    df = spark.createDataFrame([([1.0, 1e30, 2.0, 1e32],)], "a ARRAY<DOUBLE>")
    assert df.select(clean_sentinels("a").alias("c")).first().c == [1.0, 2.0]


def test_vector_math(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0], [2.0, 4.0]), ([1.0, 0.0], [0.0, 1.0])],
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
    )
    rows = df.select(
        dot("a", "b").alias("d"), l2_norm("a").alias("n"), cosine_sim("a", "b").alias("c")
    ).collect()
    assert rows[0].d == pytest.approx(10.0)
    assert rows[0].n == pytest.approx(math.sqrt(5.0))
    assert rows[0].c == pytest.approx(1.0)
    assert rows[1].c == pytest.approx(0.0, abs=1e-12)
