"""Dark-rate monitor (ref: cosmo/monitors/dark_monitors.py).

Per-exposure event arrays are exploded once; PHA band + detector-region
predicates filter events; event time is binned into 25 s windows and divided
by (npix × bin width) for a rate; the SAA ground-track flag and the
histogram/CDF cuts ride on the same pass (ref: dark_filter :53-98,
regions :474-575, SAA :195-198, hist/CDF :386-420).

The reference declares 13 monitor classes over 11 distinct detector regions
(5 per FUV segment + the NUV full frame); the edge regions overlap at the
corners (e.g. FUVA Bottom ∩ Left), so an event can feed several region
series.  The region catalog is therefore a broadcast literal dimension
joined with range predicates — one scan fans out to all series at once; the
reference's per-class Python loop and per-region concat disappear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmo_spark.functions.arrays import explode_zip
from cosmo_spark.operators.histogram import quantile_cuts

#: segment -> region name -> (x0, x1, y0, y1), transcribed from the
#: reference monitor classes (ref: dark_monitors.py:474-575).  Strict
#: inequalities on both bounds, per dark_filter (ref :76-80).
REGIONS = {
    "FUVA": {
        "Bottom": (1060, 15250, 296, 375),
        "Left": (1060, 1260, 296, 734),
        "Top": (1060, 15250, 660, 734),
        "Right": (15119, 15250, 296, 734),
        "Inner": (1260, 15119, 375, 660),
    },
    "FUVB": {
        "Bottom": (809, 15182, 360, 405),
        "Left": (809, 1000, 360, 785),
        "Top": (809, 15182, 740, 785),
        "Right": (14990, 15182, 360, 785),
        "Inner": (1000, 14990, 405, 740),
    },
    # NUV files carry SEGMENT = 'N/A' (ref: NUVDarkMonitor :571-575)
    "N/A": {"Full": (0, 1024, 0, 1024)},
}

TIME_STEP = 25.0  # seconds (ref: dark_monitors.py:60-63)


def region_values_sql() -> str:
    """The region catalog as a SQL VALUES literal — stays JVM-side and is
    reusable verbatim inside DuckDB oracles."""
    rows = ", ".join(
        f"('{seg}', '{name}', {float(x0)}D, {float(x1)}D, {float(y0)}D, {float(y1)}D)"
        for seg, by_name in REGIONS.items()
        for name, (x0, x1, y0, y1) in by_name.items()
    )
    return (
        f"SELECT SEGMENT, region, x0, x1, y0, y1, (x1 - x0) * (y1 - y0) AS npix "
        f"FROM (VALUES {rows}) AS t(SEGMENT, region, x0, x1, y0, y1)"
    )


def region_dim(spark: SparkSession) -> DataFrame:
    return spark.sql(region_values_sql())


def _monitor(required, optional=()):
    def deco(fn):
        fn.__required_inputs__ = required
        fn.__optional_inputs__ = list(optional)
        return fn
    return deco


@_monitor(["dark"], optional=["solar"])
def dark_rate_monitor(
    dark: DataFrame, solar: DataFrame | None = None
) -> dict[str, DataFrame]:
    spark = dark.sparkSession
    events = explode_zip(
        dark.filter(F.col("EXPSTART") != 0)            # P8 guard :183-184
        .select("ROOTNAME", "SEGMENT", "EXPSTART", "PHA", "XCORR", "YCORR", "TIME"),
        ["PHA", "XCORR", "YCORR", "TIME"],
    )
    regions = F.broadcast(region_dim(spark).withColumnRenamed("SEGMENT", "r_seg"))
    filtered = (
        events.join(
            regions,
            (F.col("SEGMENT") == F.col("r_seg"))
            & (F.col("XCORR") > F.col("x0")) & (F.col("XCORR") < F.col("x1"))  # P4 :74-80
            & (F.col("YCORR") > F.col("y0")) & (F.col("YCORR") < F.col("y1")),
        )
        # PHA band applies to FUV only (ref: :59,84-85)
        .filter(
            (~F.col("SEGMENT").startswith("FUV"))
            | ((F.col("PHA") > 2) & (F.col("PHA") < 23))
        )
        .drop("r_seg", "x0", "x1", "y0", "y1")
    )
    rates = (
        filtered.groupBy(
            "ROOTNAME", "SEGMENT", "region", "EXPSTART",
            F.floor(F.col("TIME") / TIME_STEP).cast("long").alias("time_bin"),  # A9
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.first("npix").alias("npix"))
        .withColumn("dark_rate", F.col("n_events") / (F.col("npix") * TIME_STEP))
    )

    # ground track per bin (ref: dark_filter :61-63 subsamples the 1 Hz
    # LATITUDE/LONGITUDE telemetry at the bin starts): first sample in each
    # 25 s bin, keyed (ROOTNAME, time_bin), with the SAA flag (:195-198)
    orbital = None
    if {"TIME_3", "LATITUDE", "LONGITUDE"} <= set(dark.columns):
        track = explode_zip(
            dark.filter(F.col("EXPSTART") != 0)
            .select("ROOTNAME", "TIME_3", "LATITUDE", "LONGITUDE"),
            ["TIME_3", "LATITUDE", "LONGITUDE"],
        ).withColumn("time_bin", F.floor(F.col("TIME_3") / TIME_STEP).cast("long"))
        # min_by resolves each bin's first sample map-side (latest_per_key
        # discipline) — the shuffle carries one row per (ROOTNAME, bin), not
        # every 1 Hz telemetry sample through a row_number window
        first_sample = F.min_by(
            F.struct(F.col("LATITUDE").alias("LATITUDE"),
                     F.col("LONGITUDE").alias("LONGITUDE")),
            F.col("TIME_3"),
        )
        track = (
            track.groupBy("ROOTNAME", "time_bin")
            .agg(first_sample.alias("__s"))
            .select("ROOTNAME", "time_bin",
                    F.col("__s.LATITUDE").alias("LATITUDE"),
                    F.col("__s.LONGITUDE").alias("LONGITUDE"))
        )
        track = saa_flag(track)
        rates = rates.join(track, ["ROOTNAME", "time_bin"], "left")
        orbital = rates.select(
            "ROOTNAME", "SEGMENT", "region", "time_bin",
            "LONGITUDE", "LATITUDE", "dark_rate",
        )

    # histogram/quantile stats exclude SAA passes, and FUV restricts to the
    # Inner region (ref: calculate_histogram, dark_monitors.py:386-400)
    cuts_input = rates
    if orbital is not None:
        cuts_input = cuts_input.filter(F.coalesce(F.col("no_saa"), F.lit(1)) == 1)
    cuts_input = cuts_input.filter(
        (~F.col("SEGMENT").startswith("FUV")) | (F.col("region") == "Inner")
    )
    cuts = quantile_cuts(
        cuts_input, "dark_rate", quantiles=(0.95, 0.99, 0.995),
        sigma_lines=(1.0, 2.0, 3.0), group_cols=("SEGMENT", "region"),
    )
    out = {"data": filtered, "results": rates, "quantile_cuts": cuts,
           "outliers": rates.limit(0)}
    if orbital is not None:
        out["orbital"] = orbital
    if solar is not None:
        # solar overlay (ref :265-284): the monthly NOAA series trimmed to
        # the monitored date span, Box1DKernel(4)-smoothed.  ~1 row/month —
        # a driver-sized overlay frame, never joined into the event scan.
        from cosmo_spark.functions.timekit import mjd_to_ts
        from cosmo_spark.operators.windows import box1d_smooth

        span = dark.filter(F.col("EXPSTART") != 0).agg(
            F.min("EXPSTART").alias("lo"), F.max("EXPSTART").alias("hi")
        )
        trimmed = (
            solar.crossJoin(F.broadcast(span))
            .filter(
                (F.col("month") >= F.date_trunc("month", mjd_to_ts(F.col("lo"))))
                & (F.col("month") <= mjd_to_ts(F.col("hi")))
            )
            .drop("lo", "hi")
        )
        out["solar"] = box1d_smooth(
            trimmed, "month", "f107", box=4, out_col="f107_smooth"
        )
    return out


def saa_flag(track: DataFrame) -> DataFrame:
    """SAA geographic flag: 1 outside the South Atlantic Anomaly
    (ref: dark_monitors.py:195-198 — ``lat > 10 or lon < 260``)."""
    return track.withColumn(
        "no_saa", F.when(F.expr("LATITUDE > 10 OR LONGITUDE < 260"), 1).otherwise(0)
    )
