"""Telemetry monitor (ref: cosmo/monitors/telemetry_monitors.py).

Per-mnemonic (MJD, Data) series: quantile bands for y-zoom (:165-170),
as-of lookups against OSM position series (:428-457), text-state mapping via
a broadcast dimension (:278-311), boxcar-smoothed solar flux overlay
(dark_monitors.py:124-127).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cosmo_spark.functions.timekit import mjd_to_ts
from cosmo_spark.operators.asof import asof_join
from cosmo_spark.operators.windows import boxcar


def _monitor(required):
    def deco(fn):
        fn.__required_inputs__ = required
        return fn
    return deco


@_monitor(["telemetry"])
def telemetry_monitor(
    telemetry: DataFrame, last_days: float | None = 365.25
) -> dict[str, DataFrame]:
    """``last_days`` mirrors the reference's default monitor window: begin
    365.25 days before the last datapoint of each telemetry file (ref:
    telemetry_monitors.py:33, per-file default begindate).  The per-mnemonic
    max is a tiny broadcast aggregate, not a window; pass None for the full
    history."""
    data = telemetry.withColumn("ts", mjd_to_ts("MJD"))
    if last_days is not None:
        bounds = data.groupBy("mnemonic").agg(F.max("MJD").alias("__mjd_max"))
        data = (
            data.join(F.broadcast(bounds), "mnemonic")
            .filter(F.col("MJD") >= F.col("__mjd_max") - F.lit(last_days))
            .drop("__mjd_max")
        )
    bands = data.groupBy("mnemonic").agg(
        F.percentile(F.col("Data"), 0.005).alias("band_lo"),   # :165-170
        F.percentile(F.col("Data"), 0.995).alias("band_hi"),
        F.min("Data").alias("min"),
        F.max("Data").alias("max"),
        F.count(F.lit(1)).alias("n"),
    )
    smoothed = boxcar(
        data, "MJD", "Data", width=4, group_cols=["mnemonic"], out_col="smoothed"
    )
    return {"data": data, "results": bands, "smoothed": smoothed,
            "outliers": data.limit(0)}


def map_text_states(telemetry: DataFrame, states: DataFrame) -> DataFrame:
    """Text-state telemetry -> numeric via a broadcast mapping dimension
    (ref: telemetry_monitors.py:278-311 nested-JSON state map)."""
    return telemetry.join(
        F.broadcast(states), ["mnemonic", "state"], "left"
    )


def value_at(telemetry: DataFrame, probes: DataFrame) -> DataFrame:
    """Stepwise series value at arbitrary probe MJDs — the reference's
    ``step_wise`` lookup (ref: telemetry_monitors.py:428-457) as a set-based
    as-of join (cosmo_spark.operators.asof)."""
    return asof_join(
        probes, telemetry.select("mnemonic", "MJD", F.col("Data").alias("value_at")),
        on="mnemonic", time_col="MJD", value_cols=["value_at"],
    )
