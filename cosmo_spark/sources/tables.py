"""Parquet table loaders for the synthetic star schema (TESTDATA.md).

Scans stay declarative (``spark.read.parquet``) so Catalyst gets predicate
pushdown, column pruning, and (on partitioned layouts) partition pruning for
free — the reference achieves the same effects manually via per-column
extraction requests and program-ID subdirectory globs
(ref: cosmo/monitors/data_models.py:28,62-77; cosmo/filesystem.py:281-288).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: Dimension tables small enough to broadcast at any realistic scale factor.
DIMENSIONS = {"region", "nation", "supplier", "part", "customer"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _normalize_ts(df)


def _normalize_ts(df: DataFrame) -> DataFrame:
    """Normalize the ``ts`` event-time column to session-zoned TIMESTAMP.

    The generator has shipped two physical encodings across rounds:

    - TIMESTAMP(NANOS), which the vanilla parquet reader rejects; read as
      long via ``spark.sql.legacy.parquet.nanosAsLong`` and converted here
      with integer ``div`` (ns-since-epoch overflows double; truncation
      matches DuckDB's ns->us conversion).
    - timestamp[us] without timezone, which Spark reads as TIMESTAMP_NTZ;
      converted to TIMESTAMP so time functions (``unix_micros``, ``window``,
      RANGE frames) resolve.  The conversion is timezone-INDEPENDENT:
      ``timestampdiff(MICROSECOND, epoch, ts)`` is pure wall-clock
      arithmetic on the NTZ value (naive-as-UTC, identical to DuckDB's
      epoch math), then ``timestamp_micros`` re-tags the instant.  A plain
      ``cast(ts AS TIMESTAMP)`` would re-interpret the wall-clock in the
      *session* timezone at execution time, silently shifting instants for
      any caller that hasn't pinned the session to UTC.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    for field in df.schema.fields:
        if field.name == "ts":
            if isinstance(field.dataType, LongType):
                df = df.withColumn(
                    field.name, F.timestamp_micros(F.expr(f"{field.name} div 1000"))
                )
            elif isinstance(field.dataType, TimestampNTZType):
                df = df.withColumn(
                    field.name,
                    F.timestamp_micros(F.expr(
                        f"timestampdiff(MICROSECOND, "
                        f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {field.name})"
                    )),
                )
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    if not names:
        names = TABLES
    return {n: load_table(spark, sf_dir, n) for n in names}


def table_file_identity(sf_dir: str, name: str) -> tuple:
    """Stable identity of one table's parquet file(s): (relative name,
    mtime_ns, size) per part — the stat fingerprint shared by every
    at-rest-artifact keyer (vector artifacts, BPE seeds, window logs) so
    the dir-vs-file handling lives once (r9 self-review #6)."""
    import os
    from pathlib import Path as _P

    src = _P(sf_dir) / f"{name}.parquet"
    if src.is_dir():
        parts = sorted(p for p in src.iterdir() if p.suffix == ".parquet")
        return tuple(
            (p.name, p.stat().st_mtime_ns, p.stat().st_size) for p in parts
        )
    st = src.stat()
    return (str(src.resolve()), st.st_mtime_ns, st.st_size)
