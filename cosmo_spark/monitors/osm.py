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
from cosmo_spark.operators.outliers import flag_outliers, sigma_outliers
from cosmo_spark.operators.segment_diff import segment_diff
from cosmo_spark.operators.windows import rolling_time_mean
from cosmo_spark.functions.timekit import mjd_to_ts


def _monitor(required):
    def deco(fn):
        fn.__required_inputs__ = required
        return fn
    return deco


#: paired segments per detector (ref: compute_segment_diff callers,
#: cosmo/monitors/osm_shift_monitors.py:137 — FUVA-FUVB — and :388-392 —
#: NUV tracks exactly two pairs, B-C and C-A; there is no A-B pair)
SEGMENT_PAIRS = {
    "FUV": [("FUVA", "FUVB")],
    "NUV": [("NUVB", "NUVC"), ("NUVC", "NUVA")],
}


@_monitor(["osm"])
def osm_shift_monitor(
    osm: DataFrame,
    shift_col: str = "SHIFT_DISP",
    segment_pairs: list[tuple[str, str]] | None = None,
    apply_fp_shift: bool = False,
    outlier_rule: str = "pair_2std",
    outlier_threshold: float | None = None,
) -> dict[str, DataFrame]:
    """ref: cosmo/monitors/osm_shift_monitors.py:124-133 (FUV get_data),
    :607-632 (NUV shift1 get_data + FP_PIXEL_SHIFT subtraction),
    :444-452 (rolling mean), :55-86 (segment diff),
    :354-367 (FUV fixed-pixel outlier rules), :634-638 (NUV 2σ rule).

    ``segment_pairs`` defaults to the union of FUV and NUV pairings; the
    detector-specific monitor variants narrow it.

    ``apply_fp_shift`` — NUV shift1 only (ref :613-623): subtract the
    FP_PIXEL_SHIFT element whose LAMPTAB_SEGMENT matches each exploded
    row's SEGMENT from the shift value; no-op when the two reference
    arrays disagree in length (older lamptabs lack the column).

    ``outlier_rule``:
    - ``"fixed"`` — |seg_diff| > ``outlier_threshold`` px (FUV: 10 for
      shift1, 5 for shift2; ref :354-356, :365-367).
    - ``"pair_2std"`` — |seg_diff| >= 2σ per segment pair, zero-centered
      (NUV; ref :634-638, :690-694).
    """
    base = (
        osm.filter(F.size(F.col(shift_col)) > 0)        # P7: drop empty arrays
        .withColumn("XC_RANGE_0", F.element_at("XC_RANGE", 1))     # P12 :626
        .withColumn("SEARCH_OFFSET_0", F.element_at("SEARCH_OFFSET", 1))
    )
    # dedupe: shift_col may itself be SHIFT_XDISP (the *2 monitor variants)
    array_cols = list(dict.fromkeys(["TIME", shift_col, "SHIFT_XDISP", "SEGMENT"]))
    long = explode_zip(
        base, array_cols, index_col="flash_pos"
    ).withColumn("ts", mjd_to_ts(F.col("EXPSTART") + F.col("TIME") / 86400.0))

    # FP_PIXEL_SHIFT lookup keyed on the *exploded row's* segment (ref
    # :613-623: x.FP_PIXEL_SHIFT[where(x.LAMPTAB_SEGMENT == x.SEGMENT)][0]).
    # The reference arrays replicate through the explode as scalars.
    long = long.withColumn(
        "FP_PIXEL_SHIFT_MATCHED",
        element_by_match("FP_PIXEL_SHIFT", "LAMPTAB_SEGMENT", F.col("SEGMENT")),
    )
    if apply_fp_shift:
        long = long.withColumn(
            shift_col,
            F.col(shift_col) - F.coalesce("FP_PIXEL_SHIFT_MATCHED", F.lit(0.0)),
        )

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
    if outlier_rule == "fixed":
        if outlier_threshold is None:
            raise ValueError("outlier_rule='fixed' requires outlier_threshold")
        outliers = flag_outliers(
            diffs, F.abs(F.col("seg_diff")) > F.lit(outlier_threshold)
        )
    elif outlier_rule == "pair_2std":
        outliers = sigma_outliers(
            diffs, "seg_diff", k=2.0, group_cols=["segment_pair"], centered=False
        )
    else:
        raise ValueError(f"unknown outlier_rule {outlier_rule!r}")
    return {
        "data": long,
        "results": rolled,
        "segment_diffs": diffs,
        "outliers": outliers.filter("outlier"),
    }


@_monitor(["osm"])
def osm_drift_monitor(osm: DataFrame) -> dict[str, DataFrame]:
    """ref: cosmo/monitors/osm_drift_monitors.py:17-46: BOTH shift axes
    relative to the first flash (REL_SHIFT_DISP / REL_SHIFT_XDISP), all
    array columns truncated to [1:], per-second drift rates SHIFT1_DRIFT /
    SHIFT2_DRIFT, time-since-move columns for OSM1 and OSM2, and the track
    stats describe BOTH drifts per LIFE_ADJ (:70-78).

    Division guard: the reference divides by TIME unguarded (a zero would
    produce inf); here a zero interval yields NULL and is excluded from the
    describe — documented deviation."""
    rest = lambda c: F.slice(c, 2, F.greatest(F.size(c) - 1, F.lit(0)))
    base = osm.filter(F.size("SHIFT_DISP") > 1).select(
        "ROOTNAME", "LIFE_ADJ", "OPT_ELEM", "EXPSTART",
        "TSINCEOSM1", "TSINCEOSM2",
        rel_to_first("SHIFT_DISP").alias("REL_SHIFT_DISP"),      # P13 :21-24
        rel_to_first("SHIFT_XDISP").alias("REL_SHIFT_XDISP"),
        rest("TIME").alias("T_REST"),                            # :26-28
        rest("SEGMENT").alias("SEGMENT"),
    )
    long = explode_zip(
        base, ["REL_SHIFT_DISP", "REL_SHIFT_XDISP", "T_REST", "SEGMENT"],
        index_col="flash_idx",
    )
    t = F.col("T_REST")
    long = (
        long.withColumn(
            "SHIFT1_DRIFT", F.when(t > 0, F.col("REL_SHIFT_DISP") / t)   # :36
        )
        .withColumn(
            "SHIFT2_DRIFT", F.when(t > 0, F.col("REL_SHIFT_XDISP") / t)  # :37
        )
        .withColumn("REL_TSINCEOSM1", t + F.col("TSINCEOSM1"))           # :38
        .withColumn("REL_TSINCEOSM2", t + F.col("TSINCEOSM2"))           # :39
    )
    results = describe_by(
        long.filter(F.col("SHIFT1_DRIFT").isNotNull()),
        ["LIFE_ADJ"], ["SHIFT1_DRIFT", "SHIFT2_DRIFT"],
    )
    return {"data": long, "results": results, "outliers": long.limit(0)}
