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


#: (LIFE_ADJ, APERTURE, DETECTOR) -> expected Y steps — static literal dim
#: standing in for the reference's constant array (aper_shift_monitors.py:77-89)
EXPECTED_POSITIONS = [
    (lp, aper, det, 100.0 * lp + (10.0 if aper == "PSA" else 20.0) + (1.0 if det == "FUV" else 2.0))
    for lp in range(1, 6)
    for aper in ("PSA", "BOA")
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
        enriched.join(
            F.broadcast(expected_dim(spark)), ["LIFE_ADJ", "APERTURE", "DETECTOR"], "left"
        )
        .withColumn("SHIFT_APERY", F.col("APERYPOS") - F.col("expected"))  # :90-110
        .filter(F.col("SHIFT_APERY").isNotNull())               # dropna :71-74
    )
    results = data.groupBy("LIFE_ADJ", "APERTURE", "DETECTOR").agg(
        F.avg("SHIFT_APERY").alias("mean_shift"),
        F.stddev_samp("SHIFT_APERY").alias("std_shift"),
        F.count(F.lit(1)).alias("n"),
    )
    outliers = data.filter(F.abs(F.col("SHIFT_APERY")) >= 5)
    return {"data": data, "results": results, "outliers": outliers}
