"""OSM shift / drift monitors (ref: cosmo/monitors/osm_shift_monitors.py,
osm_drift_monitors.py).

The central reshape: per-exposure ragged arrays (one element per lamp flash ×
segment) are zip-exploded with an explicit positional index, then:
- FP_PIXEL_SHIFT lookup by segment match (P12),
- paired-segment diff keyed by (ROOTNAME, flash) — never row order (J7),
- 180-day rolling mean per grating (W1),
- 2σ outliers over the segment-diff distribution (P3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cosmo_spark.functions.arrays import element_by_match, explode_zip, rel_to_first
from cosmo_spark.operators.describe import describe_by
from cosmo_spark.operators.outliers import sigma_outliers
from cosmo_spark.operators.segment_diff import segment_diff
from cosmo_spark.operators.windows import rolling_time_mean
from cosmo_spark.functions.timekit import mjd_to_ts


def _monitor(required):
    def deco(fn):
        fn.__required_inputs__ = required
        return fn
    return deco


#: paired segments per detector (ref: compute_segment_diff callers,
#: cosmo/monitors/osm_shift_monitors.py:55-86 — segment1 FUVA/NUVB/NUVC
#: pairs with segment2 FUVB/NUVC/NUVA)
SEGMENT_PAIRS = {
    "FUV": [("FUVA", "FUVB")],
    "NUV": [("NUVA", "NUVB"), ("NUVB", "NUVC"), ("NUVC", "NUVA")],
}


@_monitor(["osm"])
def osm_shift_monitor(
    osm: DataFrame,
    shift_col: str = "SHIFT_DISP",
    segment_pairs: list[tuple[str, str]] | None = None,
) -> dict[str, DataFrame]:
    """ref: cosmo/monitors/osm_shift_monitors.py:124-133 (get_data),
    :444-452 (rolling mean), :55-86 (segment diff), :634-638 (2σ rule),
    :613-627 (reference-array lookups).

    ``segment_pairs`` defaults to the union of FUV and NUV pairings; the
    detector-specific monitor variants narrow it.
    """
    base = (
        osm.filter(F.size(F.col(shift_col)) > 0)        # P7: drop empty arrays
        .withColumn(
            "FP_PIXEL_SHIFT_MATCHED",
            element_by_match("FP_PIXEL_SHIFT", "LAMPTAB_SEGMENT",
                             F.element_at("SEGMENT", 1)),
        )
        .withColumn("XC_RANGE_0", F.element_at("XC_RANGE", 1))     # P12 :626
        .withColumn("SEARCH_OFFSET_0", F.element_at("SEARCH_OFFSET", 1))
    )
    # dedupe: shift_col may itself be SHIFT_XDISP (the *2 monitor variants)
    array_cols = list(dict.fromkeys(["TIME", shift_col, "SHIFT_XDISP", "SEGMENT"]))
    long = explode_zip(
        base, array_cols, index_col="flash_pos"
    ).withColumn("ts", mjd_to_ts(F.col("EXPSTART") + F.col("TIME") / 86400.0))

    # flash index within (exposure, segment): position among same-segment
    # elements pairs FUVA flash k with FUVB flash k (SURVEY §7 hard part a)
    from pyspark.sql.window import Window

    w = Window.partitionBy("ROOTNAME", "SEGMENT").orderBy("flash_pos")
    long = long.withColumn("flash_idx", F.row_number().over(w) - 1)

    if segment_pairs is None:
        segment_pairs = SEGMENT_PAIRS["FUV"] + SEGMENT_PAIRS["NUV"]
    diffs = None
    for seg1, seg2 in segment_pairs:
        d = segment_diff(
            long, ["ROOTNAME"], "SEGMENT", shift_col, seg1, seg2,
            keep_cols=["OPT_ELEM", "CENWAVE", "EXPSTART"],
        )
        diffs = d if diffs is None else diffs.unionByName(d)
    rolled = rolling_time_mean(
        long, "ts", shift_col, window_seconds=180 * 86400,
        group_cols=["OPT_ELEM"], out_col="rolling_180d",
    )
    outliers = sigma_outliers(diffs, "seg_diff", k=2.0)
    return {
        "data": long,
        "results": rolled,
        "segment_diffs": diffs,
        "outliers": outliers.filter("outlier"),
    }


@_monitor(["osm"])
def osm_drift_monitor(osm: DataFrame) -> dict[str, DataFrame]:
    """ref: cosmo/monitors/osm_drift_monitors.py:21-77: shifts relative to
    the first flash, per-second drift rates, describe by LIFE_ADJ."""
    base = osm.filter(F.size("SHIFT_DISP") > 1).select(
        "ROOTNAME", "LIFE_ADJ", "OPT_ELEM", "EXPSTART", "TSINCEOSM1",
        rel_to_first("SHIFT_DISP").alias("REL_SHIFT"),           # P13 :21-27
        F.slice("TIME", 2, F.greatest(F.size("TIME") - 1, F.lit(0))).alias("T_REST"),
    )
    long = explode_zip(base, ["REL_SHIFT", "T_REST"], index_col="flash_idx")
    long = long.withColumn(
        "SHIFT1_DRIFT",
        F.when(F.col("T_REST") > 0, F.col("REL_SHIFT") / F.col("T_REST")),  # :36-37
    ).withColumn("REL_TSINCE", F.col("T_REST") + F.col("TSINCEOSM1"))       # :40
    results = describe_by(
        long.filter(F.col("SHIFT1_DRIFT").isNotNull()),
        ["LIFE_ADJ"], ["SHIFT1_DRIFT"],
    )
    return {"data": long, "results": results, "outliers": long.limit(0)}
