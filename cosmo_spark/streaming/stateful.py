"""Custom stateful streaming operator: per-key running telemetry monitor.

The reference's monitors are batch re-computations over full history; the
streaming-native formulation keeps per-mnemonic running statistics (count,
mean, M2 for variance — Welford's algorithm) in state and emits an updated
snapshot plus a k-sigma flag per micro-batch.  This is the
``applyInPandasWithState`` pattern for operators that neither built-in
aggregations nor windows express: unbounded running state with custom
update logic.

Scale: state is O(keys) (three doubles per mnemonic), sharded by the
grouping key across executors; timeouts are not used (telemetry keys are
long-lived).  The closure is self-contained — no module globals — so
executors need no package install (cloudpickle ships it by value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
) -> DataFrame:
    """Attach Welford running statistics per key; emit one snapshot row per
    (key, micro-batch) with an outlier flag for the batch's last value.

    Works only on streaming DataFrames (use the batch monitors otherwise).
    """

    def update(key, pdfs, state: GroupState):
        import math

        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        last = None
        last_outlier = False
        for pdf in pdfs:
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
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
