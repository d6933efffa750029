"""Top-1-per-group (latest version / newest record per key).

ref: cosmo/sms/ingest_sms.py:274-280 — keep rows where version == max(version)
per sms_id (lexicographic order, docs/source/sms.rst:27-30).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    key_cols: str | Sequence[str],
    order_cols: str | Sequence[str],
) -> DataFrame:
    """Keep the single newest row per key; ``order_cols`` descending with the
    caller expected to include a unique tiebreaker (never rely on row order
    in a distributed engine).

    ``max_by`` over the packed row, not a row_number window: partial
    aggregation resolves the per-key winner map-side, so the exchange
    carries one candidate row per (partition, key) instead of every
    version of every row — at 100 TB the difference between shuffling the
    table and shuffling roughly the distinct key set.  The maximized
    struct orders lexicographically over ``order_cols``, exactly the old
    window's ``ORDER BY ... DESC`` tuple comparison.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    payload = F.struct(*[F.col(c) for c in df.columns])
    order_key = F.struct(*[F.col(c) for c in order_cols])
    return (
        df.groupBy(*key_cols)
        .agg(F.max_by(payload, order_key).alias("__row"))
        .select("__row.*")
    )
