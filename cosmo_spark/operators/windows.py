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


def box1d_smooth(
    df: DataFrame,
    order_col: str,
    value_col: str,
    box: int = 4,
    group_cols: Sequence[str] = (),
    out_col: str = "smoothed",
) -> DataFrame:
    """astropy ``convolve(x, Box1DKernel(box))`` as window expressions
    (ref: cosmo/monitors/dark_monitors.py:124-127, solar-flux smoothing).

    Box1DKernel with even ``box`` is linear-interpolated to ``box+1`` taps
    with half-weight endpoints (Box1DKernel(4).array =
    [.125, .25, .25, .25, .125]); odd widths are ``box`` equal taps.
    astropy's default nan_treatment='interpolate' + normalize_kernel=True
    divides the weighted sum of *valid* neighbors by the weight mass of
    those neighbors — null values (sentinel gaps) drop out of the mass.
    Series edges follow astropy's default boundary='fill' with
    fill_value=0: a tap past the series edge contributes value 0 at FULL
    weight (the zero padding counts in the kernel mass), so the first/last
    box//2 points are pulled toward zero exactly as the reference's
    convolve() output is.
    """
    if box % 2 == 1:
        offsets = [(i - box // 2, 1.0) for i in range(box)]
    else:
        half = box // 2
        offsets = (
            [(-half, 0.5)]
            + [(i, 1.0) for i in range(-half + 1, half)]
            + [(half, 0.5)]
        )
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    v = F.col(value_col)
    one = F.lit(1)
    num, den = F.lit(0.0), F.lit(0.0)
    for off, wt in offsets:
        if off == 0:
            x, exists = v, one
        elif off < 0:
            x = F.lag(v, -off).over(w)
            exists = F.lag(one, -off).over(w)
        else:
            x = F.lead(v, off).over(w)
            exists = F.lead(one, off).over(w)
        num = num + F.lit(wt) * F.coalesce(x, F.lit(0.0))
        # zero-fill boundary: a tap past the series edge keeps its weight
        # (value 0); only an in-series null is renormalized out of the mass
        den = den + F.when(
            exists.isNotNull() & x.isNull(), F.lit(0.0)
        ).otherwise(F.lit(wt))
    return df.withColumn(out_col, F.when(den > 0, num / den))
