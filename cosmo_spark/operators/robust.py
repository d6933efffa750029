"""Robust (median/MAD) grouped statistics and outlier detection.

The reference flags outliers with mean±N·sigma rules
(ref: cosmo/monitors/acq_monitors.py:79-90, dark_monitors.py:196); the
robust variant — modified z-score over median and median-absolute-
deviation (Iglewicz & Hoaglin 1993) — survives the heavy-tailed
telemetry those rules exist for, so it belongs in the same operator
family.

Scale shape: medians are computed with per-group ORDERED WINDOWS
(row_number + count, pick the middle one or two rows, average) — one
shuffle-and-sort per pass, never a per-group ``collect_list`` (a
grouped list materializes the whole group in ONE ROW of one task; the
window sort at least streams and spills).  MAD is the same machinery
over ``|x - median|``, so the full detector is two window passes + one
broadcastable (group, median, mad) table joined back to the facts.

Parallelism caveat (measured, docs/SCALE.md): a partitioned window
still sorts each group in a single task, so parallelism equals the
group count.  Right for telemetry shapes — many monitor keys
(mnemonic, segment, aperture), bounded rows each, exactly the
reference's outlier granularity; for FEW huge groups (5 event types x
20 TB) use the histogram-CDF quantile machinery
(operators/histogram.quantile_cuts) whose error-bounded cuts stay
fully partitioned.

Determinism (the catalog's parity discipline): middle-row selection is
exact (integer ranks, (value, id) tiebreak ordering); the only float
arithmetic is the two-row average ``(a+b)/2.0`` and the final threshold
comparison, written multiplication-only (``0.6745*|x-med| > z*MAD``) so
there is no division to diverge in the last ulp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Iglewicz-Hoaglin consistency constant for the modified z-score
MAD_K = 0.6745


def grouped_median(
    df: DataFrame, key: str, val: str, tiebreak: str,
    out_col: str = "median",
) -> DataFrame:
    """(key, median) via per-group ordered windows: rank rows by
    (val, tiebreak), keep the middle one (odd n) or two (even n), and
    average them.  One shuffle on ``key``; group size bounds the sort,
    not a single task's memory."""
    w = Window.partitionBy(key).orderBy(F.col(val), F.col(tiebreak))
    wc = Window.partitionBy(key)
    ranked = df.select(
        key, val,
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(wc).alias("__n"),
    )
    mid = ranked.filter(
        (F.col("__rn") == (F.col("__n") + 1) / 2)           # odd: exact middle
        | (F.col("__rn") == F.col("__n") / 2)               # even: lower middle
        | (F.col("__rn") == F.col("__n") / 2 + 1)           # even: upper middle
    )
    # odd n matches one row; even n matches two -> sum/count == (a+b)/2.0
    return mid.groupBy(key).agg(
        (F.sum(val) / F.count(F.lit(1))).alias(out_col)
    )


def robust_outliers(
    df: DataFrame, key: str, val: str, tiebreak: str, z: float = 3.5
) -> DataFrame:
    """Rows whose modified z-score exceeds ``z``:

        0.6745 * |x - median| > z * MAD

    (multiplication-only form of |modified z| > z).  Returns the input
    rows + the group median and MAD.  The (key, median, mad) table is
    group-cardinality-sized — broadcast into the fact join."""
    med = grouped_median(df, key, val, tiebreak)
    dev = df.join(F.broadcast(med), key).select(
        key, F.col(tiebreak).alias("__tb"),
        F.abs(F.col(val) - F.col("median")).alias("__adev"),
    )
    mad = grouped_median(dev, key, "__adev", "__tb", out_col="mad")
    stats = med.join(mad, key)
    return (
        df.join(F.broadcast(stats), key)
        .filter(
            F.lit(MAD_K) * F.abs(F.col(val) - F.col("median"))
            > F.lit(float(z)) * F.col("mad")
        )
    )
