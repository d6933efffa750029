"""Window / time-series operators (SURVEY.md §2.5).

ref: cosmo/monitors/osm_shift_monitors.py:444-452 (180-day rolling mean),
cosmo/monitors/dark_monitors.py:404 (cumsum), :124-127 (boxcar smoothing).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rolling_time_mean(
    df: DataFrame,
    time_col: str,
    value_col: str,
    window_seconds: float,
    group_cols: Sequence[str] = (),
    out_col: str = "rolling_mean",
) -> DataFrame:
    """Trailing time-range rolling mean, e.g. 180 days = 15_552_000 s.

    RANGE window over epoch seconds — partition per group key (the reference
    partitions per grating); a global series costs a single-partition
    exchange, acceptable only on pre-aggregated (small) inputs.
    """
    # cast covers TIMESTAMP_NTZ inputs (parquet timestamps without UTC flag)
    sec = (F.unix_micros(F.col(time_col).cast("timestamp")) / F.lit(1e6)).alias("__sec")
    df = df.withColumn("__sec", sec)
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__sec")
        .rangeBetween(-int(window_seconds), 0)
    )
    return df.withColumn(out_col, F.avg(value_col).over(w)).drop("__sec")


def cumulative(
    df: DataFrame,
    order_col: str,
    value_col: str,
    group_cols: Sequence[str] = (),
    out_col: str = "cum_sum",
) -> DataFrame:
    """Running sum over ordered rows (ref: np.cumsum over histogram bins)."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out_col, F.sum(value_col).over(w))


def boxcar(
    df: DataFrame,
    order_col: str,
    value_col: str,
    width: int = 4,
    group_cols: Sequence[str] = (),
    out_col: str = "smoothed",
) -> DataFrame:
    """Centered boxcar mean of ``width`` rows (ref: astropy Box1DKernel(4)).

    Even widths take one extra row before current, matching Box1DKernel's
    left-leaning center for even kernels.
    """
    before = width // 2
    after = width - before - 1
    w = Window.partitionBy(*group_cols).orderBy(order_col).rowsBetween(-before, after)
    return df.withColumn(out_col, F.avg(value_col).over(w))
