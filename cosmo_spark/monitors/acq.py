"""Acquisition monitors (ref: cosmo/monitors/acq_monitors.py).

AcqImage: filter ACQ/IMAGE exposures, derive configuration + slew distance,
describe per configuration, flag outliers (distance >= 2, failures, closed
shutter) — ref :46-77, :207-288.

AcqImageV2V3: quality-filtered slews rotated into spacecraft V2/V3 axes,
per-FGS std + linear trend — ref :214-250, :498-507.

AcqPeak: PEAKD/PEAKXD slews, describe + |slew| >= 1 outliers — ref :355-516.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cosmo_spark.functions.mathkit import fit_line_cols, hypot_distance, rotate_45
from cosmo_spark.operators.describe import describe_by


def _monitor(required):
    def deco(fn):
        fn.__required_inputs__ = required
        return fn
    return deco


@_monitor(["acq"])
def acq_image_monitor(acq: DataFrame) -> dict[str, DataFrame]:
    """ref: cosmo/monitors/acq_monitors.py:46-77 (AcqImageMonitor)."""
    data = (
        acq.filter(F.col("EXPTYPE") == "ACQ/IMAGE")   # pushed to scan (P1)
        .withColumn(
            "configuration", F.concat_ws("-", "APERTURE", "OPT_ELEM")  # :60
        )
        .withColumn("distance", hypot_distance("ACQSLEWX", "ACQSLEWY"))  # :67
    )
    results = describe_by(data, ["configuration"], ["ACQSLEWX", "ACQSLEWY"])
    outliers = data.filter(
        (F.col("distance") >= 2)                        # :71-77
        | (F.col("ACQSTAT") == "Failure")
        | (F.col("SHUTTER") == "Closed")
    )
    return {"data": data, "results": results, "outliers": outliers}


#: FGS breakpoint tables — important catalogue / FGS realignment dates as
#: year.day-of-year (ref: cosmo/monitors/acq_monitors.py:157-178).  The
#: trend fit runs over data since the LAST breakpoint per FGS (:229-235).
BREAK_POINTS = {
    "F1": [2011.172, 2013.205, 2014.055, 2019.352, 2020.150],
    "F2": [2013.205, 2014.055, 2015.327, 2016.123, 2019.352, 2020.150],
    "F3": [2019.352, 2020.150],
}


def _doy_to_mjd(v: float) -> float:
    """year.day-of-year (e.g. 2011.172) -> MJD
    (ref: monitor_helpers.convert_day_of_year)."""
    from datetime import datetime, timedelta

    year = int(v)
    doy = int(round((v - year) * 1000))
    d = datetime(year, 1, 1) + timedelta(days=doy - 1)
    return float((d - datetime(1858, 11, 17)).days)


def _byear(mjd_col: Column) -> Column:
    """MJD -> Besselian epoch year, the reference's fit axis
    (``Time(...).byear``; B = 1900 + (JD − 2415020.31352) / 365.242198781)."""
    return F.lit(1900.0) + (
        mjd_col + F.lit(2400000.5) - F.lit(2415020.31352)
    ) / F.lit(365.242198781)


@_monitor(["acq"])
def acq_image_v2v3_monitor(acq: DataFrame) -> dict[str, DataFrame]:
    """ref: cosmo/monitors/acq_monitors.py:207-250 (AcqImageV2V3Monitor):
    8-way quality conjunction, rotate slews into V2/V3, per-FGS stats;
    trend = line fit of **negated** slews against Besselian-year time over
    the window since each FGS's last breakpoint (:228-250), reporting the
    slope (arcsec/year) and the fitted offsets at the window's first and
    last data points — the numbers the reference's notification carries
    (:252-288)."""
    v2, v3 = rotate_45(F.col("ACQSLEWX"), F.col("ACQSLEWY"))
    data = (
        acq.filter(F.col("EXPTYPE") == "ACQ/IMAGE")
        .filter(
            (F.col("OBSTYPE") == "IMAGING")             # :214-223
            & (F.col("NEVENTS") >= 2000)
            & (hypot_distance("ACQSLEWX", "ACQSLEWY") < 2)
            & (F.col("SHUTTER") == "Open")
            & (F.col("LAMPEVNT") >= 500)
            & (F.col("ACQSTAT") == "Success")
            & (F.col("EXTENDED") == "NO")
            & F.col("LINENUM").endswith("1")
        )
        .withColumn("V2SLEW", v2)
        .withColumn("V3SLEW", v3)
    )
    results = data.groupBy("FGS").agg(
        F.stddev_samp("V2SLEW").alias("V2SLEW_std"),    # :498-503
        F.stddev_samp("V3SLEW").alias("V3SLEW_std"),
        F.count(F.lit(1)).alias("n"),
    )

    # window start = last breakpoint per FGS (tiny literal when-chain)
    last_bp = None
    for fgs, points in BREAK_POINTS.items():
        mjd = _doy_to_mjd(points[-1])
        cond = F.col("FGS") == fgs
        last_bp = F.when(cond, mjd) if last_bp is None else last_bp.when(cond, mjd)
    windowed = (
        data.withColumn("__t", _byear(F.col("EXPSTART")))
        .filter(F.col("EXPSTART") >= last_bp)           # :229-235
    )
    fits = []
    for axis in ("V2", "V3"):
        s, i = fit_line_cols(F.col("__t"), -F.col(f"{axis}SLEW"))  # negated :241-242
        fits += [s.alias(f"__{axis}_slope"), i.alias(f"__{axis}_icept")]
    trends = windowed.groupBy("FGS").agg(
        *fits,
        F.min("__t").alias("__t0"),
        F.max("__t").alias("__t1"),
        F.count(F.lit(1)).alias("n"),
    )
    for axis in ("V2", "V3"):
        s, i = F.col(f"__{axis}_slope"), F.col(f"__{axis}_icept")
        trends = (
            trends.withColumn(f"{axis}_slope", s)
            .withColumn(f"{axis}_fit_start", s * F.col("__t0") + i)
            .withColumn(f"{axis}_fit_end", s * F.col("__t1") + i)
        )
    trends = trends.select(
        "FGS", "n",
        "V2_slope", "V2_fit_start", "V2_fit_end",
        "V3_slope", "V3_fit_start", "V3_fit_end",
    )
    return {"data": data, "results": results, "trends": trends,
            "outliers": data.limit(0)}


@_monitor(["acq"])
def acq_peak_monitor(acq: DataFrame, exptype: str = "ACQ/PEAKD") -> dict[str, DataFrame]:
    """ref: cosmo/monitors/acq_monitors.py:485-507 (SpecAcqBaseMonitor →
    AcqPeakdMonitor / AcqPeakxdMonitor): the offset column is the negated
    slew (:542 plots -slew), the track stat is the slew std per FGS
    (:497-502), and outliers are |slew| >= 1 arcsecond (:504-507)."""
    slew = "ACQSLEWX" if exptype == "ACQ/PEAKD" else "ACQSLEWY"
    data = acq.filter(F.col("EXPTYPE") == exptype).withColumn(
        "slew", -F.col(slew)                            # offset = -slew :542
    )
    results = describe_by(data, ["FGS"], ["slew"])      # per-FGS std :497-502
    outliers = data.filter(F.abs(F.col("slew")) >= 1)   # :504-507
    return {"data": data, "results": results, "outliers": outliers}
