"""Streaming HLL register maintenance — the property sketches exist for,
exercised under Structured Streaming: each micro-batch's registers APPEND
to an at-rest register log, and readers merge by element-wise MAX — an
incremental distinct-count dashboard whose state is O(keys × m) and whose
per-batch cost never rescans history (count(DISTINCT) over the full
corpus re-shuffles the world every refresh; 256 longs per key do not).

Register construction and the corrected estimator are IMPORTED from
operators/sketches.py — the batch query (q107) and this maintainer share
them verbatim, so the streaming state is bit-identical to a from-scratch
batch computation (the q105 stream-twin discipline, proven by
tests/test_streaming_sketches.py).

Merge-on-read over an append log (vs overwrite-in-place): max() is
associative/commutative/idempotent, so appends need no read-modify-write
transaction — a crashed batch retried by the checkpoint simply re-appends
the same rows, and max absorbs the duplicates.  The log grows by at most
(keys × m) rows per batch; ``compact_hll_registers`` rewrites it to the
merged minimum whenever bookkeeping matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REGISTER_SCHEMA = "key STRING, bucket BIGINT, rho INT"


def stream_hll_registers(
    stream: DataFrame,
    key_col: str,
    text_col: str,
    register_path: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Start a query appending each micro-batch's HLL registers for
    ``text_col`` distinct-counting per ``key_col`` to ``register_path``.
    Returns the StreamingQuery."""
    from cosmo_spark.operators.sketches import hll_registers

    def upsert(batch_df, batch_id):
        regs = hll_registers(
            batch_df.select(
                F.col(key_col).cast("string").alias("key"), text_col
            ),
            ["key"], text_col,
        )
        regs.write.mode("append").parquet(register_path)

    writer = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_hll_registers(spark: SparkSession, register_path: str) -> DataFrame:
    """Merged (key, bucket, rho) register state: element-wise MAX over the
    append log — the sketch merge, run at read time."""
    return (
        spark.read.schema(REGISTER_SCHEMA).parquet(register_path)
        .groupBy("key", "bucket").agg(F.max("rho").alias("rho"))
    )


def hll_distinct_estimates(
    spark: SparkSession, register_path: str
) -> DataFrame:
    """(key, est) distinct-count dashboard values from the at-rest log,
    small-range correction included (shared estimator)."""
    from cosmo_spark.operators.sketches import hll_estimate

    return hll_estimate(read_hll_registers(spark, register_path), ["key"])


def compact_hll_registers(spark: SparkSession, register_path: str) -> None:
    """Rewrite the append log to its merged minimum (keys × ≤m rows).
    Safe to skip indefinitely — merge-on-read stays correct — but keeps
    the log bounded when batches are many."""
    import os
    import shutil

    merged = read_hll_registers(spark, register_path)
    tmp = f"{register_path}.compact-{os.getpid()}"
    merged.write.mode("overwrite").parquet(tmp)
    old = f"{register_path}.old-{os.getpid()}"
    os.replace(register_path, old)
    os.replace(tmp, register_path)
    shutil.rmtree(old, ignore_errors=True)
