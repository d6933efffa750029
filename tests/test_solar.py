"""NOAA solar-flux source + Box1DKernel smoothing
(ref: cosmo/monitors/dark_monitors.py:101-129, :265-284)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from cosmo_spark.monitors.dark import dark_rate_monitor
from cosmo_spark.operators.windows import box1d_smooth
from cosmo_spark.sources.solar import read_noaa_solar_json, solar_flux


@pytest.fixture()
def noaa_file(tmp_path):
    # NOAA observed-solar-cycle-indices shape: one JSON array of objects
    # with dashed/dotted keys (ref :108-113)
    rows = [
        {"time-tag": "2023-01", "ssn": 110.0, "f10.7": 180.0},
        {"time-tag": "2023-02", "ssn": 120.0, "f10.7": 200.0},
        {"time-tag": "2023-03", "ssn": 115.0, "f10.7": -1.0},   # sentinel
        {"time-tag": "2023-04", "ssn": 118.0, "f10.7": 220.0},
        {"time-tag": "2023-05", "ssn": 119.0, "f10.7": 240.0},
        {"time-tag": "2023-06", "ssn": 121.0, "f10.7": 260.0},
    ]
    p = tmp_path / "noaa.json"
    p.write_text(json.dumps(rows))
    return str(p)


def test_read_noaa_solar_json(spark, noaa_file):
    df = read_noaa_solar_json(spark, noaa_file)
    rows = sorted(df.collect(), key=lambda r: r.month)
    assert len(rows) == 6
    assert rows[0].month.strftime("%Y-%m") == "2023-01"
    assert rows[0].f107 == 180.0


def test_solar_flux_sentinel_and_trim(spark, noaa_file):
    out = solar_flux(spark, noaa_file, datemin="2023-02-01", datemax="2023-05-31")
    rows = sorted(out.collect(), key=lambda r: r.month)
    months = [r.month.strftime("%Y-%m") for r in rows]
    assert months == ["2023-02", "2023-03", "2023-04", "2023-05"]  # trimmed
    by = {m: r for m, r in zip(months, rows)}
    assert by["2023-03"].f107 is None  # -1 sentinel -> null
    # Box1DKernel(4) taps [.5,1,1,1,.5]; at 2023-04 (trimmed series
    # [200, null, 220, 240]): lag2(200)*.5 + x(220) + lead1(240), lag1 is
    # the null gap (renormalized away, nan_treatment='interpolate'), lead2
    # is past the trimmed edge — zero-filled at full weight .5 (astropy
    # boundary='fill', fill_value=0), so the mass is .5+1+1+.5 = 3.0
    expected = (0.5 * 200.0 + 220.0 + 240.0) / 3.0
    assert by["2023-04"].f107_smooth == pytest.approx(expected)
    # null row still gets a smoothed value (interpolation over the gap):
    # taps at Mar are lag1(Feb)*1 + lead1(Apr)*1 + lead2(May)*.5, plus the
    # zero-filled lag2 edge tap at weight .5 — mass .5+1+1+.5 = 3.0
    assert by["2023-03"].f107_smooth == pytest.approx(
        (200.0 + 220.0 + 0.5 * 240.0) / 3.0
    )


def test_box1d_smooth_odd_width_plain_mean(spark):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5])], "i INT, x DOUBLE"
    )
    out = {r.i: r.s for r in box1d_smooth(df, "i", "x", box=3, out_col="s").collect()}
    assert out[2] == pytest.approx(3.0)          # (2+3+4)/3
    assert out[0] == pytest.approx((0 + 1 + 2) / 3)  # edge zero-filled


def test_dark_monitor_solar_overlay(spark, noaa_file):
    dark = spark.createDataFrame(
        # EXPSTART 59976 = 2023-02-01, 60064 = 2023-04-30 (MJD)
        [("d1", "FUVA", 100.0, 59976.0, [10], [2000.0], [500.0], [1.0]),
         ("d2", "FUVA", 100.0, 60064.0, [10], [2000.0], [500.0], [1.0])],
        "ROOTNAME STRING, SEGMENT STRING, EXPTIME DOUBLE, EXPSTART DOUBLE, "
        "PHA ARRAY<LONG>, XCORR ARRAY<DOUBLE>, YCORR ARRAY<DOUBLE>, TIME ARRAY<DOUBLE>",
    )
    solar = read_noaa_solar_json(spark, noaa_file)
    out = dark_rate_monitor(dark, solar=solar)
    assert "solar" in out
    rows = sorted(out["solar"].collect(), key=lambda r: r.month)
    months = [r.month.strftime("%Y-%m") for r in rows]
    # trimmed to the monitored span (Feb..Apr 2023)
    assert months == ["2023-02", "2023-03", "2023-04"]
    assert rows[0].f107_smooth is not None


def test_dark_monitor_without_solar_has_no_overlay(spark):
    dark = spark.createDataFrame(
        [("d1", "FUVA", 100.0, 58000.0, [10], [2000.0], [500.0], [1.0])],
        "ROOTNAME STRING, SEGMENT STRING, EXPTIME DOUBLE, EXPSTART DOUBLE, "
        "PHA ARRAY<LONG>, XCORR ARRAY<DOUBLE>, YCORR ARRAY<DOUBLE>, TIME ARRAY<DOUBLE>",
    )
    assert "solar" not in dark_rate_monitor(dark)
