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
    """Rewrite the append log toward its merged minimum (keys × ≤m rows).
    Safe to skip indefinitely — merge-on-read stays correct — but keeps
    the log bounded when batches are many.

    Crash/concurrency-safe BECAUSE max is idempotent (review r7): the
    merged rows are APPENDED first, then exactly the data files the merge
    read are deleted — a batch appended concurrently is never touched, a
    crash mid-delete leaves redundant rows whose max-merge is unchanged,
    and the log directory never disappears from under a reader (the old
    dir-swap could both drop a concurrent batch's files and leave no live
    log between the two renames)."""
    import glob
    import os

    snapshot = sorted(glob.glob(os.path.join(register_path, "*.parquet")))
    if not snapshot:
        return
    merged = (
        spark.read.schema(REGISTER_SCHEMA).parquet(*snapshot)
        .groupBy("key", "bucket").agg(F.max("rho").alias("rho"))
    )
    merged.write.mode("append").parquet(register_path)
    for f in snapshot:
        try:
            os.remove(f)
        except FileNotFoundError:
            pass


# --------------------------------------------------------------------------- #
# Count-Min counters: the ADDITIVE merge algebra                              #
# --------------------------------------------------------------------------- #

CMS_SCHEMA = "batch_id BIGINT, r INT, bucket BIGINT, cnt BIGINT"


def stream_cms_counters(
    stream: DataFrame,
    text_col: str,
    counter_path: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Maintain q108's Count-Min counters over a token stream.

    Counters merge by ADDITION — unlike HLL's max, addition is NOT
    idempotent, so a checkpoint-retried micro-batch re-appending its rows
    would double-count.  The appended rows therefore carry their
    ``batch_id`` (foreachBatch's exactly-once handle), and the reader
    dedupes per (batch_id, r, bucket) before summing — the standard
    idempotent-sink recipe for non-idempotent state.  Per-batch appended
    state is at most 4 x 1024 counter rows regardless of batch size.

    PRECONDITION (review r7): batch_id is the dedupe key, so exactly ONE
    query with ONE durable checkpoint may ever write a given
    ``counter_path`` — wiping the checkpoint (batch_id restarts at 0) or
    pointing a second stream at the same path makes distinct batches
    collide and max-collapse into undercounts.  Reprocessing a source
    means a fresh counter_path alongside the fresh checkpoint."""
    from cosmo_spark.operators.sketches import cms_counters

    def upsert(batch_df, batch_id):
        from cosmo_spark.functions.text import poly_hash, tokenize

        tokh = batch_df.filter(F.col(text_col).isNotNull()).select(
            F.explode(tokenize(F.col(text_col))).alias("tok")
        ).select(poly_hash(F.col("tok")).alias("th"))
        counters = cms_counters(tokh).select(
            F.lit(int(batch_id)).alias("batch_id"), "r", "bucket", "cnt"
        )
        counters.write.mode("append").parquet(counter_path)

    writer = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cms_counters(spark: SparkSession, counter_path: str) -> DataFrame:
    """Merged (r, bucket, cnt): dedupe retried appends per (batch_id, r,
    bucket) — duplicate rows from a replayed batch are identical, so
    max()==the value — then SUM across batches."""
    log = spark.read.schema(CMS_SCHEMA).parquet(counter_path)
    per_batch = log.groupBy("batch_id", "r", "bucket").agg(
        F.max("cnt").alias("cnt")
    )
    return per_batch.groupBy("r", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_frequency_estimates(
    spark: SparkSession, counter_path: str, tokens: list[str]
) -> DataFrame:
    """(token, cms_est) for the probe tokens: min over the 4 hash rows —
    never an underestimate, overestimate bounded by collisions (q108's
    estimator over the streaming-maintained counters)."""
    from cosmo_spark.functions.text import poly_hash
    from cosmo_spark.operators.sketches import cms_probe_rows

    counters = read_cms_counters(spark, counter_path)
    toks = spark.createDataFrame([(t,) for t in tokens], "token STRING")
    toks = toks.select("token", poly_hash(F.col("token")).alias("th"))
    probes = cms_probe_rows(toks, ["token"])
    # broadcast the BUILD (right) side: a left-outer join cannot broadcast
    # its preserved side, so hinting probes would be silently ignored
    # (review r7); counters is <= 4 x 1024 rows, always broadcastable
    return (
        probes.join(F.broadcast(counters), ["r", "bucket"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


# --------------------------------------------------------------------------- #
# KMV values: the SET-UNION merge algebra                                      #
# --------------------------------------------------------------------------- #

KMV_SCHEMA = "key STRING, h BIGINT"


def stream_kmv_values(
    stream: DataFrame,
    key_col: str,
    text_col: str,
    value_path: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Maintain q110's KMV/theta sketches over a document stream: each
    micro-batch's per-key k smallest distinct token hashes APPEND to an
    at-rest value log.

    Merge algebra is SET UNION + re-select-k-smallest — like HLL's max
    (and unlike CMS's addition) it is associative, commutative and
    IDEMPOTENT: a checkpoint-retried batch re-appends identical (key, h)
    rows, and the reader's distinct absorbs them — no batch_id
    bookkeeping needed.  Appended state is at most keys x k rows per
    batch regardless of batch size, and unlike HLL registers the
    retained VALUES keep supporting q110's union/intersection set
    algebra across streamed sources."""
    from cosmo_spark.operators.sketches import kmv_k_smallest

    def upsert(batch_df, batch_id):
        from cosmo_spark.functions.text import poly_hash, tokenize

        hs = (
            batch_df.filter(
                F.col(key_col).isNotNull() & F.col(text_col).isNotNull()
            )
            .select(
                F.col(key_col).cast("string").alias("key"),
                F.explode(tokenize(F.col(text_col))).alias("tok"),
            )
            .select("key", poly_hash(F.col("tok")).alias("h"))
            .distinct()
        )
        kmv_k_smallest(hs, ["key"]).write.mode("append").parquet(value_path)

    writer = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_kmv_values(spark: SparkSession, value_path: str) -> DataFrame:
    """Merged per-key sketch from the append log: distinct (set union —
    absorbs retried appends) then the shared k-smallest re-selection.
    The log holds at most keys x k x batches rows, so the re-selection
    runs over sketch-sized data, never the corpus."""
    from cosmo_spark.operators.sketches import kmv_k_smallest

    log = spark.read.schema(KMV_SCHEMA).parquet(value_path).distinct()
    return kmv_k_smallest(log, ["key"])


def kmv_distinct_estimates(spark: SparkSession, value_path: str) -> DataFrame:
    """(key, n_sk, est) dashboard values from the at-rest log (shared
    estimator: (k-1)*P/h_k, exact branch below k)."""
    from cosmo_spark.operators.sketches import kmv_estimate

    return kmv_estimate(read_kmv_values(spark, value_path), ["key"])


def compact_kmv_values(spark: SparkSession, value_path: str) -> None:
    """Rewrite the append log toward its merged minimum (keys x <=k rows).
    Same crash/concurrency recipe as compact_hll_registers — append the
    merged rows first, then delete exactly the files the merge read;
    safe BECAUSE the union-merge is idempotent."""
    import glob
    import os

    snapshot = sorted(glob.glob(os.path.join(value_path, "*.parquet")))
    if not snapshot:
        return
    from cosmo_spark.operators.sketches import kmv_k_smallest

    merged = kmv_k_smallest(
        spark.read.schema(KMV_SCHEMA).parquet(*snapshot).distinct(), ["key"]
    )
    merged.write.mode("append").parquet(value_path)
    for f in snapshot:
        try:
            os.remove(f)
        except FileNotFoundError:
            pass
