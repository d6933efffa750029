"""Skew mitigation: salted two-phase aggregation and salted broadcast joins.

AQE's skew-join splitting (on by default, session.py) handles skewed *sort-
merge joins* automatically; what it cannot split is a single hot group in a
hash aggregation or a hot key in a window.  These helpers implement the
standard structural fix — spread a hot key over N salt buckets, partially
aggregate, then combine — for aggregations whose functions decompose
(sum/count/min/max, and mean as sum+count).

Used when a key's row count is pathological (one user with 10⁸ events, one
mnemonic with the whole telemetry stream).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: decomposable aggregate -> (partial fn, combine fn)
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    group_cols: str | Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over salted keys.

    ``aggs`` maps output column -> (input column, fn) with fn in
    sum/count/min/max/mean.  Phase 1 groups by (key, salt) — hot keys spread
    over ``n_salts`` reducers; phase 2 combines the tiny partial table.

    Mean decomposes as (sum, count) internally; non-decomposable aggregates
    (exact percentiles) cannot be salted — use sketches instead.
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    salt = (F.rand(seed=7) * n_salts).cast("int").alias("__salt")

    partial_aggs: list[Column] = []
    combine_aggs: list[Column] = []
    for out, (col, fn) in aggs.items():
        if fn == "mean":
            partial_aggs += [
                F.sum(col).alias(f"__{out}_sum"),
                F.count(col).alias(f"__{out}_cnt"),
            ]
            combine_aggs += [
                (F.sum(f"__{out}_sum") / F.sum(f"__{out}_cnt")).alias(out)
            ]
        elif fn in _DECOMPOSABLE:
            part, comb = _DECOMPOSABLE[fn]
            partial_aggs.append(part(col).alias(f"__{out}_p"))
            combine_aggs.append(comb(f"__{out}_p").alias(out))
        else:
            raise ValueError(f"aggregate {fn!r} is not salt-decomposable")

    partial = df.withColumn("__salt", salt).groupBy(*group_cols, "__salt").agg(
        *partial_aggs
    )
    return partial.groupBy(*group_cols).agg(*combine_aggs)


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join a skewed big side against a small side by replicating the
    small side across salt values — every salt bucket of a hot key finds its
    match locally; no single reducer owns the hot key.

    (With AQE skew-split this is rarely needed for SMJ; it remains the fix
    when the join must stay a broadcast and the *probe* side is built into
    an aggregation keyed by the hot key.)
    """
    salted_big = big.withColumn("__salt", (F.rand(seed=7) * n_salts).cast("int"))
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(
        F.broadcast(replicated), [on, "__salt"]
    ).drop("__salt")
