"""Paired-segment differencing (SURVEY.md §7 hard part a).

ref: cosmo/monitors/osm_shift_monitors.py:55-86 (``compute_segment_diff``):
per ROOTNAME, pair the segment-1 rows (FUVA / NUVB / NUVC) with the
segment-2 rows (FUVB / NUVC / NUVA) positionally by lamp flash and compute
``seg_diff = shift1 - shift2``, keeping segment-1's attributes.

The reference subtracts numpy arrays positionally after a pandas groupby —
order implicit in file layout.  In a distributed engine row order is never
reliable, so the flash index must be explicit: posexplode first, then an
equi-join on (key, flash_idx).  Both sides shuffle once on the same
(key, idx) pair; with same-source inputs AQE typically plans a single
exchange reuse.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cosmo_spark.functions.arrays import explode_zip


def segment_diff(
    df: DataFrame,
    key_cols: Sequence[str],
    segment_col: str,
    value_col: str,
    seg1: str,
    seg2: str,
    array_cols: Sequence[str] | None = None,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Return one row per (key, flash_idx) with ``seg_diff = seg1 - seg2``.

    If ``array_cols`` is given, ``df`` holds array cells (pre-explode form:
    segment/value are array columns zipped per flash) and is exploded with an
    explicit positional index first; otherwise ``df`` is already long-form
    and must contain a ``flash_idx`` column.
    """
    if array_cols is not None:
        df = explode_zip(df, list(array_cols), index_col="flash_idx")

    a = df.filter(F.col(segment_col) == seg1)
    b = df.filter(F.col(segment_col) == seg2).select(
        *key_cols, "flash_idx", F.col(value_col).alias("__v2")
    )
    joined = a.join(b, [*key_cols, "flash_idx"])
    return joined.select(
        *key_cols,
        "flash_idx",
        *keep_cols,
        F.lit(f"{seg1}-{seg2}").alias("segment_pair"),
        (F.col(value_col) - F.col("__v2")).alias("seg_diff"),
    )
