"""Streaming event-time rates (SURVEY.md ST4/ST5).

Batch form: ``floor(TIME / 25)`` binning (cosmo dark rate,
ref: cosmo/monitors/dark_monitors.py:60-93).  Streaming form: tumbling
event-time windows with a watermark bounding state for late events — the
strict analog the reference lacks (its lag tolerance is the silent inner-join
drop noted in SURVEY.md ST5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_rates(
    events: DataFrame,
    time_col: str = "ts",
    window: str = "25 seconds",
    watermark: str = "2 minutes",
    group_cols: tuple[str, ...] = ("event_type",),
    rate_divisor: float = 25.0,
) -> DataFrame:
    """Tumbling-window event counts + per-second rates.

    Works on both batch and streaming DataFrames (same code path — the
    batch twin of the q21 catalog query); on a stream the watermark drops
    events later than ``watermark`` and lets Spark evict window state.
    """
    if events.isStreaming:
        events = events.withWatermark(time_col, watermark)
    return (
        events.groupBy(*group_cols, F.window(time_col, window).alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *group_cols,
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n",
            (F.col("n") / F.lit(rate_divisor)).alias("rate_per_sec"),
        )
    )
