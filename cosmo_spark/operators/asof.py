"""As-of join — Spark has no native one (SURVEY.md §4 custom item 2).

ref: cosmo/monitors/telemetry_monitors.py:428-457 (``step_wise``: value of a
series at an arbitrary probe time = y of the greatest x <= probe x) and
:172-176 (``find_closest_date``).

Implementation is the union trick: tag probe and series rows, sort each key
group by (time, tag) and carry the last non-null series value forward with a
running window.  Cost: ONE shuffle on the key — no range-join explosion, no
per-probe sort.  At 100 TB this beats a range join whenever probes and series
share a reasonable key (here: mnemonic/user); skew on a hot key is handled by
AQE.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    probes: DataFrame,
    series: DataFrame,
    on: str | Sequence[str],
    time_col: str,
    value_cols: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """For each probe row, attach the series ``value_cols`` as of its time.

    direction='backward': last series row with series.time <= probe.time
    (ties include the equal-time series row — matches the reference's
    ``step_wise`` and DuckDB ``ASOF JOIN ... ON p.t >= s.t``).
    direction='forward': first series row with series.time >= probe.time.

    ``probes`` and ``series`` must share only ``on`` + ``time_col`` names;
    unmatched probes keep NULLs (left-join semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on_cols = [on] if isinstance(on, str) else list(on)
    probe_payload = [c for c in probes.columns if c not in (*on_cols, time_col)]
    overlap = set(probe_payload) & set(value_cols)
    if overlap:
        raise ValueError(f"probe/series column collision: {sorted(overlap)}")

    # backward: series sorts before an equal-time probe so the probe sees it;
    # forward: mirror by sorting descending and flipping the tag order.
    # Each series value rides the running window inside a single-field
    # STRUCT wrapper: the struct is non-null whenever a series row exists,
    # even when the VALUE inside is null — so `last(ignorenulls)` skips only
    # the probe placeholders, never a legitimately-null series reading (a
    # raw-column carry would silently substitute the previous non-null
    # value; caught by the null-injection parity sweep).
    p = probes.withColumn("__tag", F.lit(1))
    for c in value_cols:
        dt = series.schema[c].dataType.simpleString()
        p = p.withColumn(f"__w_{c}", F.lit(None).cast(f"struct<v:{dt}>"))
    s = series.withColumn("__tag", F.lit(0))
    for c in value_cols:
        s = s.withColumn(f"__w_{c}", F.struct(F.col(c).alias("v"))).drop(c)
    for c in probe_payload:
        s = s.withColumn(c, F.lit(None).cast(probes.schema[c].dataType))
    s = s.select(*p.columns)
    u = p.unionByName(s)

    t = F.col(time_col)
    order = [t.asc(), F.col("__tag").asc()] if direction == "backward" else [
        t.desc(), F.col("__tag").asc()]
    w = (
        Window.partitionBy(*on_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        u = u.withColumn(f"__w_{c}", F.last(f"__w_{c}", ignorenulls=True).over(w))
    out = u.filter(F.col("__tag") == 1).drop("__tag")
    for c in value_cols:
        out = out.withColumn(c, F.col(f"__w_{c}").getField("v")).drop(f"__w_{c}")
    return out
