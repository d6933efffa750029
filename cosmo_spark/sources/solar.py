"""NOAA solar-flux source (ref: cosmo/monitors/dark_monitors.py:101-129,
``get_solar_data``).

The reference fetches the observed-solar-cycle-indices JSON from NOAA at
monitor runtime, month-parses the ``time-tag`` column, trims to a date
range, and Box1DKernel(4)-smooths the 10.7 cm radio flux for the dark
monitor's solar overlay.  Engine-side that becomes: read a NOAA-shaped
JSON file from a path (the URL fetch is a driver-side concern kept out of
the engine, like every other ingest), sentinel-clean, trim, smooth.  NOAA
uses ``-1`` for missing flux values; they become nulls so the smoothing
renormalizes over the gap instead of dragging the mean down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmo_spark.operators.windows import box1d_smooth


def read_noaa_solar_json(spark: SparkSession, path: str) -> DataFrame:
    """Read a NOAA observed-solar-cycle-indices JSON file.

    The file is one JSON array of ``{"time-tag": "YYYY-MM", "ssn": ...,
    "f10.7": ...}`` objects (ref :108-113), so the reader needs multiLine;
    the dotted/dashed field names are quoted with backticks.
    """
    raw = spark.read.option("multiLine", "true").json(path)
    return raw.select(
        F.to_timestamp(F.col("`time-tag`"), "yyyy-MM").alias("month"),
        F.col("`f10.7`").cast("double").alias("f107"),
    )


def solar_flux(
    spark: SparkSession,
    path: str,
    datemin: str | None = None,
    datemax: str | None = None,
    box: int = 4,
) -> DataFrame:
    """The reference's get_solar_data pipeline over a stored JSON file:
    month parse -> -1 sentinel -> null -> date trim -> Box1DKernel(box)
    smoothing (ref :101-129).  Returns (month, f107, f107_smooth).

    Trim happens BEFORE smoothing, as in the reference (``df.loc[datemin:
    datemax]`` precedes the convolve), so the trimmed boundaries are the
    series edges the convolution zero-fills (astropy boundary='fill',
    fill_value=0 — the padding counts in the kernel mass).

    Scale note: the solar series is ~1 row/month — it exists to be
    broadcast-joined under monitors as an overlay dimension, never
    shuffled.
    """
    df = read_noaa_solar_json(spark, path).withColumn(
        "f107", F.when(F.col("f107") < 0, F.lit(None)).otherwise(F.col("f107"))
    )
    if datemin is not None:
        df = df.filter(F.col("month") >= F.lit(datemin))
    if datemax is not None:
        df = df.filter(F.col("month") <= F.lit(datemax))
    return box1d_smooth(
        df, "month", "f107", box=box, out_col="f107_smooth"
    )
