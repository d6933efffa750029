"""Dark-rate monitor (ref: cosmo/monitors/dark_monitors.py).

Per-exposure event arrays are exploded once; PHA band + detector-region
predicates filter events; event time is binned into 25 s windows and divided
by (npix × bin width) for a rate; the SAA ground-track flag and the
histogram/CDF cuts ride on the same pass (ref: dark_filter :53-98,
regions :474-575, SAA :195-198, hist/CDF :386-420).

One scan, one shuffle (the groupBy) — the reference's per-file Python loop
and per-region concat disappear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cosmo_spark.functions.arrays import explode_zip
from cosmo_spark.operators.histogram import quantile_cuts

#: (segment, x0, x1, y0, y1) detector regions (ref: dark_monitors.py:474-575)
REGIONS = {
    "FUVA": (1260, 15119, 375, 660),
    "FUVB": (1000, 14990, 405, 740),
    "N/A": (0, 1024, 0, 1024),  # NUV
}

TIME_STEP = 25.0  # seconds (ref: dark_monitors.py:60-63)


def _monitor(required):
    def deco(fn):
        fn.__required_inputs__ = required
        return fn
    return deco


@_monitor(["dark"])
def dark_rate_monitor(dark: DataFrame) -> dict[str, DataFrame]:
    events = explode_zip(
        dark.filter(F.col("EXPSTART") != 0)            # P8 guard :183-184
        .select("ROOTNAME", "SEGMENT", "EXPSTART", "PHA", "XCORR", "YCORR", "TIME"),
        ["PHA", "XCORR", "YCORR", "TIME"],
    )
    region = None
    npix = None
    for seg, (x0, x1, y0, y1) in REGIONS.items():
        cond = (
            (F.col("SEGMENT") == seg)
            & (F.col("XCORR") > x0) & (F.col("XCORR") < x1)   # P4 :74-80
            & (F.col("YCORR") > y0) & (F.col("YCORR") < y1)
        )
        region = F.when(cond, seg) if region is None else region.when(cond, seg)
        pix = float((x1 - x0) * (y1 - y0))
        npix = F.when(F.col("SEGMENT") == seg, pix) if npix is None else npix.when(
            F.col("SEGMENT") == seg, pix
        )
    filtered = (
        events.withColumn("region", region)
        .filter(F.col("region").isNotNull())
        # PHA band applies to FUV only (ref: :59,84-85)
        .filter(
            (~F.col("SEGMENT").startswith("FUV"))
            | ((F.col("PHA") > 2) & (F.col("PHA") < 23))
        )
        .withColumn("npix", npix)
    )
    rates = (
        filtered.groupBy(
            "ROOTNAME", "SEGMENT", "EXPSTART",
            F.floor(F.col("TIME") / TIME_STEP).cast("long").alias("time_bin"),  # A9
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.first("npix").alias("npix"))
        .withColumn("dark_rate", F.col("n_events") / (F.col("npix") * TIME_STEP))
    )
    cuts = quantile_cuts(
        rates, "dark_rate", quantiles=(0.95, 0.99, 0.995),
        sigma_lines=(1.0, 2.0, 3.0), group_cols=("SEGMENT",),
    )
    return {"data": filtered, "results": rates, "quantile_cuts": cuts,
            "outliers": rates.limit(0)}


def saa_flag(track: DataFrame) -> DataFrame:
    """SAA geographic flag: 1 outside the South Atlantic Anomaly
    (ref: dark_monitors.py:195-198 — ``lat > 10 or lon < 260``)."""
    return track.withColumn(
        "no_saa", F.when(F.expr("LATITUDE > 10 OR LONGITUDE < 260"), 1).otherwise(0)
    )
