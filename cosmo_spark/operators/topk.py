"""Top-1-per-group (latest version / newest record per key).

ref: cosmo/sms/ingest_sms.py:274-280 — keep rows where version == max(version)
per sms_id (lexicographic order, docs/source/sms.rst:27-30).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_per_key(
    df: DataFrame,
    key_cols: str | Sequence[str],
    order_cols: str | Sequence[str],
) -> DataFrame:
    """Keep the single newest row per key; ``order_cols`` descending with the
    caller expected to include a unique tiebreaker (never rely on row order
    in a distributed engine).

    One shuffle on the key; AQE splits skewed keys.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
