"""Acquisition monitors (ref: cosmo/monitors/acq_monitors.py).

AcqImage: filter ACQ/IMAGE exposures, derive configuration + slew distance,
describe per configuration, flag outliers (distance >= 2, failures, closed
shutter) — ref :46-77, :207-288.

AcqImageV2V3: quality-filtered slews rotated into spacecraft V2/V3 axes,
per-FGS std + linear trend — ref :214-250, :498-507.

AcqPeak: PEAKD/PEAKXD slews, describe + |slew| >= 1 outliers — ref :355-516.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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


@_monitor(["acq"])
def acq_image_v2v3_monitor(acq: DataFrame) -> dict[str, DataFrame]:
    """ref: cosmo/monitors/acq_monitors.py:207-250 (AcqImageV2V3Monitor):
    8-way quality conjunction, rotate slews into V2/V3, per-FGS stats +
    linear trend over time."""
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
    slope, intercept = fit_line_cols(F.col("EXPSTART"), F.col("V2SLEW"))
    results = data.groupBy("FGS").agg(
        F.stddev_samp("V2SLEW").alias("V2SLEW_std"),    # :498-503
        F.stddev_samp("V3SLEW").alias("V3SLEW_std"),
        slope.alias("V2SLEW_trend_slope"),              # fit_line :227-242
        intercept.alias("V2SLEW_trend_intercept"),
        F.count(F.lit(1)).alias("n"),
    )
    return {"data": data, "results": results, "outliers": data.limit(0)}


@_monitor(["acq"])
def acq_peak_monitor(acq: DataFrame, exptype: str = "ACQ/PEAKD") -> dict[str, DataFrame]:
    """ref: cosmo/monitors/acq_monitors.py:355-516 (AcqPeakdMonitor /
    AcqPeakxdMonitor): slew describe per (OPT_ELEM, CENWAVE); outliers at
    |slew| >= 1 pixel."""
    slew = "ACQSLEWX" if exptype == "ACQ/PEAKD" else "ACQSLEWY"
    data = acq.filter(F.col("EXPTYPE") == exptype).withColumn(
        "slew", -F.col(slew)                            # sign flip :382
    )
    results = describe_by(data, ["OPT_ELEM", "CENWAVE"], ["slew"])
    outliers = data.filter(F.abs(F.col("slew")) >= 1)   # :505-507
    return {"data": data, "results": results, "outliers": outliers}
