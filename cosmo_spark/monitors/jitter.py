"""Jitter monitor (ref: cosmo/monitors/jitter_monitors.py,
cosmo/filesystem.py:196-278).

Per-extension jitter series arrive as array cells; 1e30 sentinels are
stripped and each array reduces to mean/std/max columns — all higher-order
expressions, no explode shuffle (ref: reduce_to_stat filesystem.py:255-278;
sentinel strip :249-253; EXPTYPE exclusion data_models.py:220).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cosmo_spark.functions.arrays import array_max, array_mean, array_std, clean_sentinels


def _monitor(required):
    def deco(fn):
        fn.__required_inputs__ = required
        return fn
    return deco


JITTER_ARRAYS = ("SI_V2_AVG", "SI_V3_AVG", "SI_V2_RMS", "SI_V3_RMS")


@_monitor(["jitter"])
def jitter_monitor(jitter: DataFrame) -> dict[str, DataFrame]:
    data = jitter.filter(~F.col("EXPTYPE").rlike("ACQ|DARK|FLAT"))  # P9 :220
    for c in JITTER_ARRAYS:
        cleaned = clean_sentinels(F.col(c))            # P8 1e30 strip
        data = (
            data.withColumn(f"{c}_clean", cleaned)
            .withColumn(f"{c}_mean", array_mean(F.col(f"{c}_clean")))
            .withColumn(f"{c}_std", array_std(F.col(f"{c}_clean")))
            .withColumn(f"{c}_max", array_max(F.col(f"{c}_clean")))
            .drop(f"{c}_clean", c)                     # reduce drops the array
        )
    results = data.groupBy("CONFIG").agg(
        F.avg("SI_V2_AVG_mean").alias("v2_mean"),
        F.avg("SI_V3_AVG_mean").alias("v3_mean"),
        F.max("SI_V2_AVG_max").alias("v2_max"),
        F.count(F.lit(1)).alias("n"),
    )
    outliers = data.filter(
        (F.col("SI_V2_AVG_max") > 0.1) | (F.col("SI_V3_AVG_max") > 0.1)
    )
    return {"data": data, "results": results, "outliers": outliers}
