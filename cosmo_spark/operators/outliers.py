"""Rule-based outlier detection.

ref: cosmo/monitors/acq_monitors.py:71-77,505-507 (threshold rules);
cosmo/monitors/osm_shift_monitors.py:634-638 (|x - mean| >= 2σ over the whole
result set).

The reference computes global statistics in memory and indexes with a boolean
Series.  Spark formulation: compute the (per-group or global) moments as a
tiny aggregate and broadcast-join them back — the fact scan stays fully
parallel; no single-partition window exchange (SURVEY.md §7 hard part b).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def flag_outliers(df: DataFrame, predicate: Column, flag_col: str = "outlier") -> DataFrame:
    """Attach a boolean outlier flag (ref: monitor ``find_outliers``
    predicates, docs/source/api.rst:316-325)."""
    return df.withColumn(flag_col, predicate)


def sigma_outliers(
    df: DataFrame,
    value_col: str,
    k: float = 2.0,
    group_cols: Sequence[str] = (),
    flag_col: str = "outlier",
    centered: bool = True,
) -> DataFrame:
    """Flag rows where |value - mean| >= k * stddev (mean/stddev per group,
    or global when ``group_cols`` is empty).

    ``centered=False`` drops the mean subtraction — |value| >= k * stddev —
    matching the reference's NUV OSM rule, which compares the raw segment
    diff against 2σ without centering (ref:
    cosmo/monitors/osm_shift_monitors.py:634-638, :690-694).
    """
    v = F.col(value_col)
    stats = df.groupBy(*group_cols).agg(
        F.avg(v).alias("__mu"), F.stddev_samp(v).alias("__sigma")
    )
    joined = (
        df.join(F.broadcast(stats), list(group_cols))
        if group_cols
        else df.crossJoin(F.broadcast(stats))
    )
    deviation = F.abs(v - F.col("__mu")) if centered else F.abs(v)
    return joined.withColumn(
        flag_col, deviation >= F.lit(k) * F.col("__sigma")
    ).drop("__mu", "__sigma")
