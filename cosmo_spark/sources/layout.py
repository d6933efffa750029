"""Table layout at rest: partitioning and bucketing (docs/SCALE.md).

The reference's layout is one subdirectory per 5-digit program id, scanned
with a subdir glob (ref: cosmo_config.yml:1-3,
cosmo/monitors/data_models.py:28,97; cosmo/filesystem.py:285-286) — a manual
partition-pruning scheme.  Spark-first equivalents:

- ``write_partitioned``: Hive-style partition directories; filters on the
  partition key prune at planning time (no file even listed).
- ``write_bucketed`` / ``read_bucketed``: pre-shuffle both sides of a
  recurring join by the same key into the same bucket count — the join
  becomes a zipped per-bucket merge with NO exchange at query time.  At
  100 TB this converts the dominant repeated shuffle into a one-time cost
  paid at write.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: str | Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Write with Hive-style partition directories (partition pruning)."""
    cols = [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    df.write.mode(mode).partitionBy(*cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | Sequence[str],
    num_buckets: int = 32,
    sort_cols: str | Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Both sides of a recurring equi-join written with the SAME bucket spec
    join without any Exchange (verified in tests/test_layout.py).
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
