"""Structured Streaming formulation of the reference's incremental ingest
(SURVEY.md §2.9 ST1-ST3).

The reference discovers "new" files by diffing a directory listing against an
ingest log on every run (ref: cosmo/monitors/data_models.py:62-77,
cosmo/sms/ingest_sms.py:288-294) and upserts with a version guard
(ref: cosmo/sms/ingest_sms.py:154-198).  Structured Streaming's file source
replaces the listing diff with checkpointed exactly-once file tracking; the
version-guarded MERGE runs per micro-batch in ``foreachBatch``.

At 100 TB the difference is decisive: the batch anti-join re-reads the whole
ingest log per run, while the checkpoint makes discovery O(new files).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from cosmo_spark.operators.merge import merge_into_path


def stream_ingest_merge(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    target_path: str,
    key_cols: str | Sequence[str],
    version_col: str,
    checkpoint_dir: str,
    fmt: str = "json",
    trigger_once: bool = True,
) -> StreamingQuery:
    """File-source stream -> version-guarded MERGE into a parquet table.

    ST1 (new-file discovery): the file source + checkpoint tracks ingested
    files exactly-once — re-running after a crash re-processes nothing.
    ST3 (late/updated data): each micro-batch merges with the version guard,
    so a newer VERSION supersedes and re-delivery is a no-op (idempotent).

    ``trigger_once`` runs one catch-up micro-batch and stops — the cron-style
    cadence of the reference (``cosmo --monthly``); pass False for continuous.
    """
    stream = (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", 1000)
        .load(source_dir)
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_into_path(
            batch_df.sparkSession, target_path, batch_df, key_cols, version_col
        )

    writer = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
