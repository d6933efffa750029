"""Stream-stream tolerated-lag join (SURVEY.md ST5's strict analog).

ref: cosmo/monitors/data_models.py:167-182 — the reference inner-joins
lampflash rows to SMS rows and rows without a partner within the tolerated
lag are SILENTLY dropped (documented as a join-completeness caveat in
SURVEY.md ST5).  The strict streaming analog is a watermarked
stream-stream join with a time-range predicate: matches within the
tolerance pair up exactly as the batch join would, and with
``join_type='leftOuter'`` a left row whose partner never arrives is
EMITTED with NULL right columns once the watermark passes its match
window — late-data loss becomes an observable row instead of silence.

Mechanics per the Structured Streaming contract: BOTH sides carry event-
time watermarks, and the join condition includes a bounded time range so
Spark can size and evict join state.  State per side is O(rows within
watermark + tolerance), independent of stream length — the property that
makes this runnable forever at ingest scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_lag_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    tolerance: str = "10 minutes",
    watermark: str = "2 minutes",
    join_type: str = "leftOuter",
    right_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Join two event streams on ``on`` where the right row's event time
    falls within ±``tolerance`` of the left row's.

    ``right_cols`` names the right-side payload columns to carry (default:
    everything except the join keys and the right time column, which is
    always included as ``{right_time}_matched``).  Works identically on
    batch DataFrames (no watermark applied) — the batch twin IS the
    reference's join, which the unit test cross-checks.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in (*keys, right_time)
        ]
    l = left.withWatermark(left_time, watermark) if left.isStreaming else left
    r = right.withWatermark(right_time, watermark) if right.isStreaming else right
    # unambiguous output: rename EVERY right column before the join —
    # keys get a reserved prefix, the time column its _matched alias, and
    # any payload column colliding with a left column gets _right (real
    # telemetry streams share field names, e.g. both sides carrying 'seg')
    # uniquify ITERATIVELY: '{c}_right' can itself collide (left already
    # carries 'seg_right', or the right side carries both 'seg' and
    # 'seg_right') — keep appending _right until the name is free against
    # BOTH the left columns and every name already emitted (ADVICE r5)
    taken = set(l.columns) | {f"{right_time}_matched"}
    payload_out = []
    for c in right_cols:
        a = c
        while a in taken:
            a = f"{a}_right"
        taken.add(a)
        payload_out.append(a)
    r = r.select(
        *[F.col(k).alias(f"__rk_{k}") for k in keys],
        F.col(right_time).alias(f"{right_time}_matched"),
        *[F.col(c).alias(a) for c, a in zip(right_cols, payload_out)],
    )
    cond: Column | None = None
    for k in keys:
        c = l[k] == r[f"__rk_{k}"]
        cond = c if cond is None else cond & c
    rng = (
        (r[f"{right_time}_matched"]
         >= l[left_time] - F.expr(f"INTERVAL {tolerance}"))
        & (r[f"{right_time}_matched"]
           <= l[left_time] + F.expr(f"INTERVAL {tolerance}"))
    )
    cond = cond & rng
    out = l.join(r, cond, join_type)
    # outer variants must keep the key for unmatched RIGHT rows too: fold
    # the right key into the (possibly NULL) left key before dropping it
    for k in keys:
        out = out.withColumn(k, F.coalesce(l[k], F.col(f"__rk_{k}")))
    return out.drop(*[f"__rk_{k}" for k in keys])
