"""Array expression kit: validated zip-explode and per-cell statistics.

The reference's central reshape is ``explode_df`` (ref:
cosmo/monitor_helpers.py:35-49): expand N same-length array columns into one
row per element, replicating scalars, and *raise* on ragged lengths.  Spark's
``arrays_zip`` silently null-pads ragged arrays, so the validation must be an
explicit action (SURVEY.md §4 custom item 3).

All helpers are higher-order-function expressions — no explode+regroup
shuffle for per-cell stats, no Python UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class RaggedArrayError(ValueError):
    """Array columns disagree in length (ref: cosmo/monitor_helpers.py:46-47)."""


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def assert_equal_lengths(df: DataFrame, cols: Sequence[str]) -> None:
    """Eagerly verify all ``cols`` have equal per-row lengths; raise otherwise.

    This is the Spark analog of the reference's eager ``ValueError`` — a
    deliberate (small) action: a single count over a cheap size() predicate,
    pushed down to the scan.
    """
    first = cols[0]
    ragged = F.lit(False)
    for other in cols[1:]:
        ragged = ragged | (F.size(_c(first)) != F.size(_c(other)))
    n_bad = df.filter(ragged).limit(1).count()
    if n_bad:
        raise RaggedArrayError(
            f"array columns {list(cols)} have mismatched lengths "
            "(ref behavior: cosmo/monitor_helpers.py:46-47)"
        )


def explode_zip(
    df: DataFrame,
    array_cols: Sequence[str],
    *,
    validate: bool = True,
    index_col: str | None = None,
) -> DataFrame:
    """Zip-explode N equal-length array columns; scalars replicate.

    ref: cosmo/monitor_helpers.py:35-49 (``explode_df``). With
    ``index_col`` the element position (0-based) is kept — required whenever
    downstream logic pairs rows positionally (e.g. segment diff, SURVEY.md
    §7 hard part (a)): never rely on row order in a distributed engine.
    """
    if validate:
        assert_equal_lengths(df, array_cols)
    scalars = [c for c in df.columns if c not in array_cols]
    zipped = F.arrays_zip(*[_c(c).alias(c) for c in array_cols])
    exploded = df.select(*scalars, F.posexplode(zipped).alias("__pos", "__z"))
    out_cols = [F.col(c) for c in scalars]
    if index_col:
        out_cols.append(F.col("__pos").alias(index_col))
    out_cols += [F.col(f"__z.{c}").alias(c) for c in array_cols]
    return exploded.select(*out_cols)


def array_mean(arr: Column | str) -> Column:
    """Mean of a double-array cell via ``aggregate`` — NULL for empty arrays.

    ref: cosmo/filesystem.py:255-278 (jitter ``reduce_to_stat``; empty->NaN).
    """
    arr = _c(arr)
    total = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
    return F.when(F.size(arr) > 0, total / F.size(arr))


def array_std(arr: Column | str) -> Column:
    """Sample standard deviation of an array cell (NULL when < 2 elements).

    One-pass sum/sum-of-squares form: the naive two-pass ``(x - mean)²``
    fold inlines the mean aggregate into the per-element lambda, which
    re-evaluates it for every element — O(d²) interpreted work per row.
    Here each fold runs exactly once per row; the variance is clamped at 0
    to absorb cancellation on near-constant arrays.  Oracles must use the
    same formula so float64 results match bit-for-bit.
    """
    arr = _c(arr)
    n = F.size(arr)
    s = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
    ss = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x * x)
    var = (ss - s * s / n) / (n - F.lit(1))
    return F.when(n > 1, F.sqrt(F.greatest(var, F.lit(0.0))))


def array_max(arr: Column | str) -> Column:
    """Max of an array cell; NULL for empty (ref: cosmo/filesystem.py:265-270)."""
    return F.array_max(_c(arr))


def rel_to_first(arr: Column | str) -> Column:
    """``arr[i] - arr[0]`` for i >= 1 — shift relative to first lamp flash.

    ref: cosmo/monitors/osm_drift_monitors.py:21-27 (``SHIFT[1:] - SHIFT[0]``).
    """
    arr = _c(arr)
    rest = F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0)))
    return F.transform(rest, lambda x: x - F.element_at(arr, 1))


def element_by_match(values: Column | str, keys: Column | str, key: Column | str) -> Column:
    """``values[where(keys == key)][0]`` with a length-mismatch guard.

    ref: cosmo/monitors/osm_shift_monitors.py:613-623 (FP_PIXEL_SHIFT lookup by
    LAMPTAB_SEGMENT == SEGMENT; fall back to NULL when lengths disagree).
    """
    values, keys, key = _c(values), _c(keys), _c(key)
    pos = F.array_position(keys, key).cast("int")  # element_at wants INT
    return F.when(
        (F.size(values) == F.size(keys)) & (pos > 0), F.element_at(values, pos)
    )


def clean_sentinels(arr: Column | str, sentinel: float = 1e30) -> Column:
    """Strip values >= sentinel from an array cell.

    ref: cosmo/filesystem.py:249-253 (jitter 1e30 sentinel stripping).
    """
    return F.filter(_c(arr), lambda x: x < F.lit(sentinel))
