"""Aperture-shift monitor (ref: cosmo/monitors/aper_shift_monitors.py).

Key pattern (P14): the expected aperture-block Y position is a static lookup
by (LIFE_ADJ, APERTURE, DETECTOR) — an 11×4×2 constant table in the
reference (:77-110).  Spark-first that's a broadcast join against a literal
dimension, then ``SHIFT_APERY = APERYPOS - expected``; ancillary CSV
enrichment is a dedup + left broadcast join (J2/P16,
ref: cosmo/monitor_helpers.py:147-159).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _monitor(required):
    def deco(fn):
        fn.__required_inputs__ = required
        return fn
    return deco


#: Expected aperture-block Y position by lifetime position — transcribed
#: from the reference's 11×4×2 constant array
#: (ref: aper_shift_monitors.py:77-89).  Rows are LP 1-8, 10-12 (there is
#: no LP9); each cell is (FUV, NUV) steps.
APERTURE_BLOCK_POSITIONS = {
    #     PSA           BOA            FCA            WCA
    1:  {"PSA": (126, 126), "BOA": (-153, -153), "FCA": (-153, -153), "WCA": (126, 126)},
    2:  {"PSA": (53, 126),  "BOA": (-226, -153), "FCA": (-226, -153), "WCA": (53, 126)},
    3:  {"PSA": (181, 126), "BOA": (-98, -153),  "FCA": (-98, -153),  "WCA": (181, 126)},
    4:  {"PSA": (234, 126), "BOA": (-45, -153),  "FCA": (-45, -153),  "WCA": (234, 126)},
    5:  {"PSA": (13, 126),  "BOA": (-226, -153), "FCA": (-226, -153), "WCA": (13, 126)},
    6:  {"PSA": (-11, 126), "BOA": (-98, -153),  "FCA": (-98, -153),  "WCA": (22, 126)},
    7:  {"PSA": (-49, 126), "BOA": (-98, -153),  "FCA": (-98, -153),  "WCA": (32, 126)},
    8:  {"PSA": (206, 126), "BOA": (-73, -153),  "FCA": (-73, -153),  "WCA": (206, 126)},
    10: {"PSA": (206, 126), "BOA": (-73, -153),  "FCA": (-73, -153),  "WCA": (206, 126)},
    11: {"PSA": (270, 126), "BOA": (-9, -153),   "FCA": (-9, -153),   "WCA": (270, 126)},
    12: {"PSA": (90, 126),  "BOA": (-189, -153), "FCA": (-189, -153), "WCA": (90, 126)},
}

#: flattened (LIFE_ADJ, APERTURE, DETECTOR) -> expected Y steps literal dim
EXPECTED_POSITIONS = [
    (lp, aper, det, float(pos[0 if det == "FUV" else 1]))
    for lp, by_aper in APERTURE_BLOCK_POSITIONS.items()
    for aper, pos in by_aper.items()
    for det in ("FUV", "NUV")
]


def expected_dim(spark) -> DataFrame:
    return spark.createDataFrame(
        EXPECTED_POSITIONS, "LIFE_ADJ LONG, APERTURE STRING, DETECTOR STRING, expected DOUBLE"
    )


@_monitor(["science", "ancillary"])
def aperture_shift_monitor(science: DataFrame, ancillary: DataFrame) -> dict[str, DataFrame]:
    spark = science.sparkSession
    enriched = science.join(
        F.broadcast(ancillary.dropDuplicates(["ROOTNAME"])),   # P16 + J2
        "ROOTNAME", "left",
    )
    data = (
        enriched.filter(F.col("LIFE_ADJ") >= 1)  # LP < 1 -> NA -> dropped (:71-74)
        .na.drop(subset=["APERYPOS", "APERTURE", "DETECTOR"])
        # inner: unknown LPs (e.g. the nonexistent LP9) drop out, like the
        # reference's index arrays which are only populated for listed LPs
        .join(F.broadcast(expected_dim(spark)), ["LIFE_ADJ", "APERTURE", "DETECTOR"])
        .withColumn("SHIFT_APERY", F.col("APERYPOS") - F.col("expected"))  # :90-110
    )
    results = data.groupBy("LIFE_ADJ", "APERTURE", "DETECTOR").agg(
        F.avg("SHIFT_APERY").alias("mean_shift"),
        F.stddev_samp("SHIFT_APERY").alias("std_shift"),
        F.count(F.lit(1)).alias("n"),
    )
    outliers = data.filter(F.abs(F.col("SHIFT_APERY")) >= 5)
    return {"data": data, "results": results, "outliers": outliers}
