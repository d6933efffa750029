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

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REGISTER_SCHEMA = "key STRING, bucket BIGINT, rho INT"

# --------------------------------------------------------------------------- #
# Crash-atomic snapshot rotation (shared by HLL / CMS / KMV)                  #
# --------------------------------------------------------------------------- #
#
# Compaction rewrites the append log to its merged minimum.  For HLL and KMV
# the merge algebra is idempotent, so the old append-then-remove rotation
# could only leave redundancy behind a crash; Count-Min counters are
# ADDITIVE, so a crash between the append and the removes would DOUBLE-COUNT
# the consumed snapshots on restart — the one exactly-once hole the round-7
# review flagged.  The fix is the operators/merge.py discipline generalized
# to a two-phase manifest commit:
#
#   1. merged state is written to an underscore-prefixed tmp dir (invisible
#      to every Spark parquet listing),
#   2. a manifest (phase=prepared, fsync'd, atomically renamed into place)
#      records the consumed snapshot files and the final names the merged
#      parts will take,
#   3. the merged parts move into the log directory,
#   4. the manifest flips to phase=committed (again fsync + rename),
#   5. the consumed files are removed and the manifest deleted.
#
# A crash anywhere yields a deterministic outcome: before the prepared
# manifest lands, the rotation simply never happened (stray tmp dir is
# garbage); in the prepared phase it rolls BACK (planned final names are
# deleted; every consumed file is still present because removals only start
# after commit); in the committed phase it rolls FORWARD (all merged parts
# are in place — the move loop completed before the flip — so the remaining
# consumed files are deleted).  ``recover_rotation`` applies that rule and
# runs at the start of every rotation.
#
# Readers never mutate: ``_live_files`` returns a manifest-filtered view —
# prepared ⇒ exclude the half-moved merged parts, committed ⇒ exclude the
# logically-deleted consumed files — re-validated against the manifest until
# stable, so a reader racing an active rotation still sees exactly one
# generation of every counter.  Contract: ONE appending stream and ONE
# compactor per log path (the same single-writer contract the batch merge
# documents); readers are unrestricted.
#
# Reader guarantee is CONSISTENT-OR-LOUD (empirically gated by the racing
# stress test): any result a read returns reflects exactly one generation;
# a read whose task EXECUTION overlaps the post-commit cleanup can fail
# with FAILED_READ_FILE.FILE_NOT_EXIST (its planned file was garbage-
# collected underneath it) and should simply be retried — the standard
# snapshot-retention trade every table format shares.  Deliberately NOT
# papered over with spark.sql.files.ignoreMissingFiles, which would turn
# that loud, retryable failure into a silent partial read.
#
# File ops go through module-level wrappers so the crash-injection tests can
# kill the rotation between any two steps.  The wrappers route through
# streaming/logio (r12 verdict #2): bare local paths keep the fsync'd
# os-level fast path, scheme paths (file:/hdfs:/s3a:/…) take the Hadoop
# FileSystem API with per-scheme-safe commit points — same protocol, same
# manifest, now the storage 100 TB actually lives on.

from cosmo_spark.streaming import logio as _logio

_MANIFEST = "_rotation_manifest.json"
_TMP_DIR = "_rotation_tmp"


def _fs_replace(src: str, dst: str) -> None:
    """Move src onto dst (dst may exist) — crash-injection seam."""
    _logio.replace_file(src, dst)


def _fs_remove(f: str) -> None:
    _logio.remove(f)


def _fsync_dir(d: str) -> None:
    _logio.fsync_dir(d)


def _write_manifest(path: str, doc: dict) -> None:
    tmp = os.path.join(path, _MANIFEST + ".tmp")
    _logio.write_text(tmp, json.dumps(doc))  # staged + fsync'd
    _fs_replace(tmp, os.path.join(path, _MANIFEST))
    _fsync_dir(path)


def _read_manifest(path: str) -> dict | None:
    # a torn manifest is IMPOSSIBLE by protocol (staged + atomic swap), so
    # JSON errors propagate loudly rather than reading as "no rotation"
    text = _logio.read_text(os.path.join(path, _MANIFEST))
    return None if text is None else json.loads(text)


def recover_rotation(path: str) -> None:
    """Resolve an interrupted rotation: roll back a prepared one, roll a
    committed one forward, discard pre-manifest garbage.  Idempotent;
    no-op on a clean log.  Runs at the start of every rotation (it must
    NOT run concurrently with a live rotation — single-compactor
    contract)."""
    if not _logio.is_dir(path):
        return
    doc = _read_manifest(path)
    if doc is None:
        _logio.rmtree(os.path.join(path, _TMP_DIR))
        _fs_remove(os.path.join(path, _MANIFEST + ".tmp"))
        return
    if doc["phase"] == "prepared":
        # removals never start before commit, so every consumed file is
        # still whole — deleting the (possibly partially) moved-in merged
        # parts restores the exact pre-rotation state
        for final in doc["moved"]:
            _fs_remove(os.path.join(path, final))
    else:  # committed: the move loop finished before the flip
        for consumed in doc["consumed"]:
            _fs_remove(os.path.join(path, consumed))
    _logio.rmtree(os.path.join(path, _TMP_DIR))
    _fs_remove(os.path.join(path, _MANIFEST))
    _fsync_dir(path)


def _live_files(path: str) -> list[str]:
    """The log's committed file set: all parquet parts, minus whichever
    side of an in-flight/interrupted rotation is not (yet) logically
    live.  Pure read — safe concurrently with the rotator; the
    list/manifest pair is retried until it observes one manifest state."""
    for _ in range(8):
        doc = _read_manifest(path)
        files = sorted(
            os.path.join(path, n)
            for n in _logio.list_names(path) if n.endswith(".parquet")
        )
        if _read_manifest(path) != doc:
            continue  # rotation advanced mid-listing; re-observe
        if doc is None:
            # None→None is NOT proof of stability: an ENTIRE rotation
            # (prepare → commit → cleanup) can complete between the two
            # reads, leaving this glob with a mid-rotation mixture
            # (review r8 ABA).  The cleanup deletes the consumed files,
            # so a stale mixture always references at least one
            # now-missing file — re-observe until every listed file
            # still exists.
            if all(_logio.exists(f) for f in files):
                return files
            continue
        drop = set(doc["moved"] if doc["phase"] == "prepared"
                   else doc["consumed"])
        return [f for f in files if os.path.basename(f) not in drop]
    raise RuntimeError(f"unstable rotation manifest under {path}")


def _rotate_log(spark: SparkSession, path: str, merge_fn) -> None:
    """Run one crash-atomic rotation: ``merge_fn(files) -> DataFrame``
    produces the merged replacement for the current snapshot."""
    recover_rotation(path)
    snapshot = sorted(
        os.path.join(path, n)
        for n in _logio.list_names(path) if n.endswith(".parquet")
    )
    if not snapshot:
        return
    tmpdir = os.path.join(path, _TMP_DIR)
    merge_fn(snapshot).write.mode("overwrite").parquet(tmpdir)
    parts = sorted(
        os.path.join(tmpdir, n)
        for n in _logio.list_names(tmpdir) if n.endswith(".parquet")
    )
    token = uuid.uuid4().hex[:12]
    finals = [f"rotated-{token}-{i:05d}.parquet" for i in range(len(parts))]
    consumed = [os.path.basename(s) for s in snapshot]
    # fsync the merged part files BEFORE any manifest references them:
    # manifests and the directory were already fsynced, but a power loss
    # (not just a process crash) could otherwise roll a committed
    # manifest forward onto data blocks that never reached disk — silent
    # count loss for the additive algebras (r8 advice)
    for part in parts:
        _logio.fsync_file(part)
    _write_manifest(path, {"phase": "prepared", "consumed": consumed,
                           "moved": finals})
    for src, final in zip(parts, finals):
        _fs_replace(src, os.path.join(path, final))
    _fsync_dir(path)
    _write_manifest(path, {"phase": "committed", "consumed": consumed,
                           "moved": finals})
    for s in snapshot:
        _fs_remove(s)
    _logio.rmtree(tmpdir)
    _fs_remove(os.path.join(path, _MANIFEST))
    _fsync_dir(path)


def _read_log(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Schema'd read over the manifest-filtered live file set."""
    files = _live_files(path) if _logio.is_dir(path) else []
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files)


def _additive_merge_fn(spark: SparkSession, schema: str, keys: list[str],
                       pre_filter=None):
    """Shared compaction body for the ADDITIVE algebras (CMS, HDR, and
    their windowed twins): per-batch max-dedupe, then fold every batch
    EXCEPT the newest into the sentinel ``batch_id = -1`` generation.

    The newest batch keeps its identity (review r8): the checkpoint can
    replay exactly the LAST uncommitted micro-batch after a crash, and a
    replayed batch whose rows were already folded into the sentinel
    would no longer dedupe — the sum would double-count it.  Batches
    before the newest are committed by construction (foreachBatch is
    sequential), so folding them is safe; the newest folds on the NEXT
    compaction, by which time a later batch exists (hence it committed).
    ``pre_filter`` lets expire_windows drop aged windows first."""

    def merge_fn(files):
        log = spark.read.schema(schema).parquet(*files)
        if pre_filter is not None:
            log = pre_filter(log)
        per_batch = log.groupBy("batch_id", *keys).agg(
            F.max("cnt").alias("cnt")
        )
        mx = per_batch.agg(F.max("batch_id").alias("__mx"))
        pb = per_batch.crossJoin(F.broadcast(mx))
        newest = pb.filter(F.col("batch_id") == F.col("__mx")).select(
            "batch_id", *keys, "cnt"
        )
        folded = (
            pb.filter(F.col("batch_id") != F.col("__mx"))
            .groupBy(*keys).agg(F.sum("cnt").alias("cnt"))
            .select(F.lit(-1).cast("bigint").alias("batch_id"), *keys, "cnt")
        )
        return folded.unionByName(newest)

    return merge_fn


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
    append log — the sketch merge, run at read time.  Reads through the
    rotation manifest (``_read_log``) so an interrupted compaction never
    shows a reader two generations of the same register."""
    return (
        _read_log(spark, register_path, REGISTER_SCHEMA)
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
    """Rewrite the append log to its merged minimum (keys × ≤m rows) via
    the crash-atomic rotation.  Safe to skip indefinitely — merge-on-read
    stays correct — but keeps the log bounded when batches are many.

    HLL's max-merge is idempotent, so even the old append-then-remove
    rotation could only leave redundancy behind a crash; the manifest
    protocol (r8) removes even that, and makes all three compactors share
    one audited code path.  A batch appended concurrently is never touched
    (the rotation only consumes its start-of-rotation snapshot)."""

    def merge_fn(files):
        return (
            spark.read.schema(REGISTER_SCHEMA).parquet(*files)
            .groupBy("key", "bucket").agg(F.max("rho").alias("rho"))
        )

    _rotate_log(spark, register_path, merge_fn)


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
    max()==the value — then SUM across batches.  Reads through the
    rotation manifest (``_read_log``): addition is NOT idempotent, so a
    reader racing (or recovering behind) an interrupted compaction MUST
    see exactly one generation of every counter — the manifest filter is
    what guarantees that."""
    log = _read_log(spark, counter_path, CMS_SCHEMA)
    per_batch = log.groupBy("batch_id", "r", "bucket").agg(
        F.max("cnt").alias("cnt")
    )
    return per_batch.groupBy("r", "bucket").agg(F.sum("cnt").alias("cnt"))


def compact_cms_counters(spark: SparkSession, counter_path: str) -> None:
    """Rewrite the counter log to its merged minimum (≤ 4 × 1024 rows)
    via the crash-atomic rotation.  This is THE compactor the manifest
    protocol exists for: counters merge by ADDITION, so the old
    append-then-remove rotation double-counted every consumed snapshot if
    the process died between the two steps.  Under the manifest a crash
    either rolls back (consumed files intact, merged parts deleted) or
    rolls forward (merged parts live, consumed files deleted) — never
    both generations at once.

    The merged rows carry the sentinel ``batch_id = -1`` (real stream
    batch ids are ≥ 0).  Exactly one compacted generation is ever live —
    the rotation consumes the previous one atomically — so the sentinel
    never collides with itself in the reader's per-(batch_id, r, bucket)
    dedupe, and future batches keep appending under their own ids.  The
    NEWEST batch is never folded (see _additive_merge_fn): it is the one
    the checkpoint may replay, and replay dedupe needs its identity."""
    _rotate_log(
        spark, counter_path,
        _additive_merge_fn(spark, CMS_SCHEMA, ["r", "bucket"]),
    )


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

    log = _read_log(spark, value_path, KMV_SCHEMA).distinct()
    return kmv_k_smallest(log, ["key"])


def kmv_distinct_estimates(spark: SparkSession, value_path: str) -> DataFrame:
    """(key, n_sk, est) dashboard values from the at-rest log (shared
    estimator: (k-1)*P/h_k, exact branch below k)."""
    from cosmo_spark.operators.sketches import kmv_estimate

    return kmv_estimate(read_kmv_values(spark, value_path), ["key"])


# --------------------------------------------------------------------------- #
# HDR quantile buckets: the ADDITIVE quantile algebra (q143's streaming twin)  #
# --------------------------------------------------------------------------- #

HDR_SCHEMA = "batch_id BIGINT, key STRING, bucket BIGINT, cnt BIGINT"


def stream_hdr_buckets(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    bucket_path: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Maintain q143's HDR-histogram quantile buckets over a stream:
    each micro-batch appends per-(key, bucket) counts — at most keys ×
    ~4k rows per batch regardless of batch size — giving incremental
    percentiles with bounded state.

    Counts merge by ADDITION, so the maintainer carries the CMS
    discipline verbatim: rows carry their ``batch_id`` and the reader
    dedupes per (batch_id, key, bucket) before summing (retried batches
    re-append identical rows).  Same single-checkpoint PRECONDITION as
    stream_cms_counters."""
    from cosmo_spark.operators.sketches import hdr_bucket_spark_sql

    def upsert(batch_df, batch_id):
        counts = (
            batch_df.filter(
                F.col(value_col).isNotNull() & (F.col(value_col) > 0)
                & F.col(key_col).isNotNull()
            )
            .select(
                F.col(key_col).cast("string").alias("key"),
                F.expr(
                    f"cast(floor({value_col} * 1000000.0) as bigint)"
                ).alias("mic"),
            )
            .select("key", F.expr(hdr_bucket_spark_sql("mic")).alias("bucket"))
            .groupBy("key", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.lit(int(batch_id)).alias("batch_id"),
                    "key", "bucket", "cnt")
        )
        counts.write.mode("append").parquet(bucket_path)

    writer = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_hdr_buckets(spark: SparkSession, bucket_path: str) -> DataFrame:
    """Merged (key, bucket, cnt): dedupe retried appends per (batch_id,
    key, bucket), then SUM across batches — manifest-filtered like every
    additive reader."""
    log = _read_log(spark, bucket_path, HDR_SCHEMA)
    per_batch = log.groupBy("batch_id", "key", "bucket").agg(
        F.max("cnt").alias("cnt")
    )
    return per_batch.groupBy("key", "bucket").agg(F.sum("cnt").alias("cnt"))


def hdr_quantile_estimates(
    spark: SparkSession, bucket_path: str, quantiles=(50, 90, 99)
) -> DataFrame:
    """(key, quantile, est_value, n) percentile dashboard from the
    at-rest bucket log — q143's read path over streamed state (the
    SHARED operators/sketches.hdr_quantiles selection, so
    stream-then-estimate equals the batch sketch exactly)."""
    from cosmo_spark.operators.sketches import hdr_quantiles

    return hdr_quantiles(
        read_hdr_buckets(spark, bucket_path), ["key"], quantiles
    )


def compact_hdr_buckets(spark: SparkSession, bucket_path: str) -> None:
    """Rewrite the bucket log to its merged minimum (keys × ≤~4k rows)
    via the crash-atomic rotation — addition is not idempotent, so this
    goes through the same manifest protocol and newest-batch-preserving
    fold as compact_cms_counters (_additive_merge_fn)."""
    _rotate_log(
        spark, bucket_path,
        _additive_merge_fn(spark, HDR_SCHEMA, ["key", "bucket"]),
    )


# --------------------------------------------------------------------------- #
# Windowed registers: horizon queries + state eviction (review r7 #6)          #
# --------------------------------------------------------------------------- #
#
# The plain maintainers accumulate registers FOREVER by design (an
# all-time distinct count).  The windowed mode buckets the at-rest state
# by event-time (``win`` = date_trunc of the row's timestamp), so
# "distinct users over the last 30 days" is a merge over the in-horizon
# buckets at read time, and buckets older than the horizon are DROPPED
# from at-rest state by ``expire_windows`` — bounded state on an
# unbounded stream, the same algebra per bucket:
#
#   HLL:  max  per (key, win, bucket)   — horizon read = max over wins
#   CMS:  sum  per (win, r, bucket)     — horizon read = sum over wins
#   KMV:  k-smallest per (key, win)     — horizon read = union ∪ re-select
#
# All three merges are closed under per-window partials (the standard
# sketch mergeability property), so a horizon estimate over windowed
# state is bit-identical to a batch sketch over exactly the in-horizon
# rows (gated by tests/test_windowed_sketches.py).  Eviction runs through
# the same crash-atomic rotation as compaction — an expire that dies
# mid-flight can never double-count or half-drop a bucket.

HLLW_SCHEMA = "key STRING, win TIMESTAMP, bucket BIGINT, rho INT"
CMSW_SCHEMA = "batch_id BIGINT, win TIMESTAMP, r INT, bucket BIGINT, cnt BIGINT"
KMVW_SCHEMA = "key STRING, win TIMESTAMP, h BIGINT"
HDRW_SCHEMA = (
    "batch_id BIGINT, key STRING, win TIMESTAMP, bucket BIGINT, cnt BIGINT"
)


def stream_hll_registers_windowed(
    stream: DataFrame,
    key_col: str,
    text_col: str,
    ts_col: str,
    register_path: str,
    checkpoint_dir: str,
    bucket: str = "day",
    trigger_once: bool = True,
):
    """Windowed twin of ``stream_hll_registers``: each micro-batch's
    registers land under their event-time bucket (``date_trunc(bucket,
    ts_col)``), so horizon reads and eviction are possible.  Per-batch
    appended state is at most (keys × wins-present × m) rows."""
    from cosmo_spark.operators.sketches import hll_registers

    def upsert(batch_df, batch_id):
        regs = hll_registers(
            batch_df.filter(F.col(ts_col).isNotNull()).select(
                F.col(key_col).cast("string").alias("key"),
                F.date_trunc(bucket, F.col(ts_col)).alias("win"),
                text_col,
            ),
            ["key", "win"], text_col,
        )
        _divert_late(
            regs.select("key", "win", "bucket", "rho"), register_path
        ).write.mode("append").parquet(register_path)

    writer = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_hll_registers_windowed(
    spark: SparkSession,
    register_path: str,
    since=None,
    until=None,
) -> DataFrame:
    """Merged (key, bucket, rho) over the in-horizon windows only:
    ``since <= win < until`` (either side open when None).  max-merge
    across windows == the sketch of exactly those windows' rows."""
    log = _read_log(spark, register_path, HLLW_SCHEMA)
    if since is not None:
        log = log.filter(F.col("win") >= F.lit(since))
    if until is not None:
        log = log.filter(F.col("win") < F.lit(until))
    return log.groupBy("key", "bucket").agg(F.max("rho").alias("rho"))


def hll_distinct_estimates_windowed(
    spark: SparkSession, register_path: str, since=None, until=None
) -> DataFrame:
    from cosmo_spark.operators.sketches import hll_estimate

    return hll_estimate(
        read_hll_registers_windowed(spark, register_path, since, until),
        ["key"],
    )


def stream_cms_counters_windowed(
    stream: DataFrame,
    text_col: str,
    ts_col: str,
    counter_path: str,
    checkpoint_dir: str,
    bucket: str = "day",
    trigger_once: bool = True,
):
    """Windowed twin of ``stream_cms_counters`` (same batch_id dedupe
    contract, one counter generation per (batch, window))."""
    from cosmo_spark.operators.sketches import cms_counters

    def upsert(batch_df, batch_id):
        from cosmo_spark.functions.text import poly_hash, tokenize

        tokh = (
            batch_df.filter(
                F.col(text_col).isNotNull() & F.col(ts_col).isNotNull()
            )
            .select(
                F.date_trunc(bucket, F.col(ts_col)).alias("win"),
                F.explode(tokenize(F.col(text_col))).alias("tok"),
            )
            .select("win", poly_hash(F.col("tok")).alias("th"))
        )
        counters = cms_counters(tokh, carry=["win"]).select(
            F.lit(int(batch_id)).alias("batch_id"), "win", "r", "bucket", "cnt"
        )
        _divert_late(counters, counter_path) \
            .write.mode("append").parquet(counter_path)

    writer = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cms_counters_windowed(
    spark: SparkSession, counter_path: str, since=None, until=None
) -> DataFrame:
    """Merged (r, bucket, cnt) over the in-horizon windows: dedupe retried
    appends per (batch_id, win, r, bucket), filter the horizon, then SUM."""
    log = _read_log(spark, counter_path, CMSW_SCHEMA)
    if since is not None:
        log = log.filter(F.col("win") >= F.lit(since))
    if until is not None:
        log = log.filter(F.col("win") < F.lit(until))
    per_batch = log.groupBy("batch_id", "win", "r", "bucket").agg(
        F.max("cnt").alias("cnt")
    )
    return per_batch.groupBy("r", "bucket").agg(F.sum("cnt").alias("cnt"))


def stream_kmv_values_windowed(
    stream: DataFrame,
    key_col: str,
    text_col: str,
    ts_col: str,
    value_path: str,
    checkpoint_dir: str,
    bucket: str = "day",
    trigger_once: bool = True,
    tokenize_values: bool = True,
):
    """Windowed twin of ``stream_kmv_values``: per-(key, window) k-smallest
    hashes; horizon reads union the in-horizon windows and re-select.

    ``tokenize_values=False`` hashes the value column WHOLE (the HLL
    maintainer's convention) — required when the counted value is an
    identifier, not text: tokenize would split/normalize an id whose
    string form is not one lowercase-alphanumeric run (a negative id, a
    UUID), silently diverging from any consumer that hashes the raw
    string (q154's oracle does)."""
    from cosmo_spark.operators.sketches import kmv_k_smallest

    def upsert(batch_df, batch_id):
        from cosmo_spark.functions.text import poly_hash, tokenize

        base = batch_df.filter(
            F.col(key_col).isNotNull() & F.col(text_col).isNotNull()
            & F.col(ts_col).isNotNull()
        ).select(
            F.col(key_col).cast("string").alias("key"),
            F.date_trunc(bucket, F.col(ts_col)).alias("win"),
            F.col(text_col).cast("string").alias("val"),
        )
        if tokenize_values:
            base = base.select(
                "key", "win", F.explode(tokenize(F.col("val"))).alias("val")
            )
        hs = base.select(
            "key", "win", poly_hash(F.col("val")).alias("h")
        ).distinct()
        _divert_late(
            kmv_k_smallest(hs, ["key", "win"]).select("key", "win", "h"),
            value_path,
        ).write.mode("append").parquet(value_path)

    writer = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_kmv_values_windowed(
    spark: SparkSession, value_path: str, since=None, until=None
) -> DataFrame:
    """Merged per-key sketch over the in-horizon windows: union-distinct
    the per-window value sets, then one shared k-smallest re-selection —
    k-smallest(∪ per-window k-smallest) == k-smallest(∪ full sets)."""
    from cosmo_spark.operators.sketches import kmv_k_smallest

    log = _read_log(spark, value_path, KMVW_SCHEMA)
    if since is not None:
        log = log.filter(F.col("win") >= F.lit(since))
    if until is not None:
        log = log.filter(F.col("win") < F.lit(until))
    return kmv_k_smallest(log.select("key", "h").distinct(), ["key"])


def stream_hdr_buckets_windowed(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    bucket_path: str,
    checkpoint_dir: str,
    bucket: str = "day",
    trigger_once: bool = True,
):
    """Windowed twin of ``stream_hdr_buckets`` — per-(key, window) HDR
    bucket counts, so 'p99 latency over the last 30 days' reads only the
    in-horizon windows and aged windows evict (the classic HDR-histogram
    deployment shape).  Same batch_id dedupe contract as CMS."""
    from cosmo_spark.operators.sketches import hdr_bucket_spark_sql

    def upsert(batch_df, batch_id):
        counts = (
            batch_df.filter(
                F.col(value_col).isNotNull() & (F.col(value_col) > 0)
                & F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()
            )
            .select(
                F.col(key_col).cast("string").alias("key"),
                F.date_trunc(bucket, F.col(ts_col)).alias("win"),
                F.expr(
                    f"cast(floor({value_col} * 1000000.0) as bigint)"
                ).alias("mic"),
            )
            .select("key", "win",
                    F.expr(hdr_bucket_spark_sql("mic")).alias("bucket"))
            .groupBy("key", "win", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.lit(int(batch_id)).alias("batch_id"),
                    "key", "win", "bucket", "cnt")
        )
        _divert_late(counts, bucket_path) \
            .write.mode("append").parquet(bucket_path)

    writer = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_hdr_buckets_windowed(
    spark: SparkSession, bucket_path: str, since=None, until=None
) -> DataFrame:
    """Merged (key, bucket, cnt) over the in-horizon windows: dedupe per
    (batch_id, key, win, bucket), filter the horizon, SUM."""
    log = _read_log(spark, bucket_path, HDRW_SCHEMA)
    if since is not None:
        log = log.filter(F.col("win") >= F.lit(since))
    if until is not None:
        log = log.filter(F.col("win") < F.lit(until))
    per_batch = log.groupBy("batch_id", "key", "win", "bucket").agg(
        F.max("cnt").alias("cnt")
    )
    return per_batch.groupBy("key", "bucket").agg(F.sum("cnt").alias("cnt"))


def hdr_quantile_estimates_windowed(
    spark: SparkSession, bucket_path: str, since=None, until=None,
    quantiles=(50, 90, 99),
) -> DataFrame:
    """(key, quantile, est_value, n) percentiles over exactly the
    in-horizon windows — the shared hdr_quantiles selection again."""
    from cosmo_spark.operators.sketches import hdr_quantiles

    return hdr_quantiles(
        read_hdr_buckets_windowed(spark, bucket_path, since, until),
        ["key"], quantiles,
    )


# --------------------------------------------------------------------------- #
# Late-data policy (round-9 verdict #4): QUARANTINE, never recreate            #
# --------------------------------------------------------------------------- #
#
# ``expire_windows`` physically drops pre-horizon windows; without a
# policy, an event arriving LATER for an already-evicted window would
# silently recreate it — a partial window (the evicted mass is gone, only
# the stragglers remain) that poisons any read whose ``since`` reaches
# past the eviction horizon, while state quietly grows back.  The policy
# mirrors the ST5 tolerated-lag contract (streaming/joins.py: lateness
# beyond the watermark is bounded and EXPLICIT, never silent):
#
# - ``expire_windows`` persists its horizon FIRST (``_eviction_horizon``,
#   fsync + atomic rename, monotone — it never moves backward), then
#   rotates.  The marker is the durable statement "windows before T are
#   gone and must stay gone".
# - every windowed maintainer checks the marker per micro-batch: register
#   rows whose window predates it are diverted to ``<log>/_late/`` —
#   underscore-prefixed, so every log reader's parquet listing is blind
#   to it — with the SAME schema, so the drop is observable
#   (``read_late_quarantine``), auditable, and manually replayable into a
#   widened horizon if the operator chooses.  Nothing pre-horizon ever
#   reaches the live log, so horizon reads stay bit-identical
#   (tests/test_windowed_sketches.py late-data units, all four algebras).


def _horizon_file(path: str) -> str:
    return os.path.join(path, "_eviction_horizon")


def read_eviction_horizon(path: str):
    """The persisted eviction horizon (datetime) or None — windows
    strictly before it have been physically expired and late arrivals
    for them quarantine instead of appending."""
    import datetime as _dt

    doc = _logio.read_json(_horizon_file(path))
    if doc is None:
        return None
    try:
        return _dt.datetime.fromisoformat(doc["older_than"])
    except (KeyError, ValueError):
        return None


def _write_horizon(path: str, older_than) -> None:
    import datetime as _dt

    if isinstance(older_than, str):
        older_than = _dt.datetime.fromisoformat(older_than)
    prev = read_eviction_horizon(path)
    if prev is not None and prev >= older_than:
        return   # monotone: expiry never un-evicts
    tmp = _horizon_file(path) + ".tmp"
    _logio.write_text(tmp, json.dumps({"older_than": older_than.isoformat()}))
    _fs_replace(tmp, _horizon_file(path))
    _fsync_dir(path)


def _late_dir(path: str) -> str:
    return os.path.join(path, "_late")


def _divert_late(regs: DataFrame, path: str) -> DataFrame:
    """Split a maintainer batch against the persisted horizon: quarantine
    pre-horizon rows under ``_late/`` (observable, replayable), return
    the in-horizon remainder for the live append.  No horizon on disk ->
    pass-through (the unwindowed maintainers never call this)."""
    h = read_eviction_horizon(path)
    if h is None:
        return regs
    late = regs.filter(F.col("win") < F.lit(h))
    if not late.isEmpty():   # bounded probe — most batches have no laggards
        late.write.mode("append").parquet(_late_dir(path))
    return regs.filter(F.col("win") >= F.lit(h))


def read_late_quarantine(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """Quarantined pre-horizon register rows (same schema as the live
    log; empty frame when nothing was ever late)."""
    d = _late_dir(path)
    if not _logio.is_dir(d):
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(d)


def rebuild_window(
    spark: SparkSession, path: str, kind: str, win
) -> DataFrame:
    """Offline rebuild of ONE window's sketch from live + quarantined
    registers — the recovery half of the late-data policy (round-10
    verdict #3: pre-horizon rows were observable but nothing consumed
    them).

    Merges the live log's rows for ``win`` with every quarantined
    (``_late/``) partial for ``win`` under the algebra's own merge (HLL
    max / CMS sum / KMV re-select / HDR sum), so when the horizon was
    established BEFORE a window's events arrived (early eviction decree:
    all of its register mass is in quarantine) the rebuild equals a
    batch sketch over ALL of that window's events; for an in-horizon
    window it degrades to the ordinary windowed read.  NEVER re-admits
    into the live log: the horizon is monotone by design, and appending
    quarantined partials back would recreate exactly the silent partial
    window the policy exists to forbid — recovery is this one-off read
    (or a brand-new log built from it), not a mutation.

    Exactly-once across the union: additive partials (CMS/HDR) dedupe
    per (batch_id, keys) with MAX before summing, so a batch whose first
    attempt appended live and whose crash-retry quarantined (the horizon
    moved between attempts) counts once.  A live copy folded into the
    compaction sentinel can never coexist with a quarantined twin: only
    committed batches fold (the newest-keeps-identity rule), and a
    committed batch is never retried.

    Output schema matches the corresponding ``read_*_windowed`` reader:
    hll (key, bucket, rho) / cms (r, bucket, cnt) / kmv (key, h) /
    hdr (key, bucket, cnt).
    """
    schema = {"hll": HLLW_SCHEMA, "cms": CMSW_SCHEMA,
              "kmv": KMVW_SCHEMA, "hdr": HDRW_SCHEMA}[kind]
    log = (
        _read_log(spark, path, schema)
        .unionByName(read_late_quarantine(spark, path, schema))
        .filter(F.col("win") == F.lit(win))
    )
    if kind == "hll":
        return log.groupBy("key", "bucket").agg(F.max("rho").alias("rho"))
    if kind == "cms":
        per_batch = log.groupBy("batch_id", "win", "r", "bucket").agg(
            F.max("cnt").alias("cnt")
        )
        return per_batch.groupBy("r", "bucket").agg(F.sum("cnt").alias("cnt"))
    if kind == "kmv":
        from cosmo_spark.operators.sketches import kmv_k_smallest

        return kmv_k_smallest(log.select("key", "h").distinct(), ["key"])
    # hdr
    per_batch = log.groupBy("batch_id", "key", "win", "bucket").agg(
        F.max("cnt").alias("cnt")
    )
    return per_batch.groupBy("key", "bucket").agg(F.sum("cnt").alias("cnt"))


def rebuild_log(
    spark: SparkSession, src_path: str, dest_path: str, kind: str, older_than
) -> None:
    """Materialize a BRAND-NEW windowed sketch log at ``dest_path`` from a
    source log's live + quarantined registers, for a legitimately WIDENED
    horizon — the operational complement to :func:`rebuild_window`'s
    one-off read (round-11 verdict #5: the docstring promised "or a
    brand-new log built from it" with no operator behind it).

    Monotonicity is preserved where it matters: the SOURCE log, its
    horizon marker, and its ``_late/`` quarantine are never touched (a
    widened horizon is a new log's birthright, not an un-eviction of the
    old one), and the new log starts life with its horizon persisted at
    the widened ``older_than`` — so from its first read, its own
    maintainers divert pre-horizon laggards exactly like any other log.

    Merge semantics per algebra match :func:`rebuild_window`, applied
    across every surviving window: HLL max-rho per (key, win, bucket);
    CMS/HDR dedupe per (batch_id, keys) with MAX before summing
    (exactly-once when a batch's first attempt appended live and its
    crash-retry quarantined), then fold to the ``batch_id = -1`` sentinel
    — safe in a FRESH log because only a new query (new checkpoint,
    batch ids from 0) may maintain it, so no future replay can collide
    with folded history; KMV re-selects the k smallest per (key, win).

    Publish: registers and the horizon marker are staged in a tmp
    sibling and published via :func:`logio.publish_dir` — one atomic
    rename on rename-atomic schemes (the directory appears whole or not
    at all); on object stores the copy is bracketed by a
    ``<dest>.publishing`` intent marker, so a crashed publish is
    recognized as OURS and cleared on the next attempt (a pure
    re-derivation; nothing was consumed from the source), while a real
    pre-existing log at ``dest_path`` — no marker — still raises.
    ``dest_path`` must not already exist: the source stays the log of
    record until the caller switches readers."""
    import datetime as _dt
    import uuid

    from cosmo_spark.operators.sketches import kmv_k_smallest

    if isinstance(older_than, str):
        older_than = _dt.datetime.fromisoformat(older_than)
    # a crashed non-atomic publish (object stores) leaves an intent
    # marker + partial dest: provably ours, clear and re-derive
    _logio.clear_crashed_publish(dest_path)
    if _logio.exists(dest_path):
        raise ValueError(
            f"rebuild_log: {dest_path} already exists — a rebuilt log must "
            f"be a fresh location (the source stays the log of record "
            f"until readers switch)"
        )
    src_h = read_eviction_horizon(src_path)
    if src_h is not None and older_than > src_h:
        raise ValueError(
            f"rebuild_log is for WIDENING the horizon: older_than="
            f"{older_than.isoformat()} is later than the source horizon "
            f"{src_h.isoformat()} — to narrow a live log, use "
            f"expire_windows on it instead"
        )
    schemas = {"hll": HLLW_SCHEMA, "cms": CMSW_SCHEMA,
               "kmv": KMVW_SCHEMA, "hdr": HDRW_SCHEMA}
    if kind not in schemas:
        raise ValueError(f"rebuild_log: unknown kind {kind!r}")
    schema = schemas[kind]
    log = (
        _read_log(spark, src_path, schema)
        .unionByName(read_late_quarantine(spark, src_path, schema))
        .filter(F.col("win") >= F.lit(older_than))
    )
    if kind == "hll":
        merged = log.groupBy("key", "win", "bucket").agg(
            F.max("rho").alias("rho")
        ).select("key", "win", "bucket", "rho")
    elif kind == "cms":
        per_batch = log.groupBy("batch_id", "win", "r", "bucket").agg(
            F.max("cnt").alias("cnt")
        )
        merged = per_batch.groupBy("win", "r", "bucket").agg(
            F.sum("cnt").alias("cnt")
        ).select(
            F.lit(-1).cast("bigint").alias("batch_id"),
            "win", "r", "bucket", "cnt",
        )
    elif kind == "kmv":
        merged = kmv_k_smallest(
            log.select("key", "win", "h").distinct(), ["key", "win"]
        ).select("key", "win", "h")
    elif kind == "hdr":
        per_batch = log.groupBy("batch_id", "key", "win", "bucket").agg(
            F.max("cnt").alias("cnt")
        )
        merged = per_batch.groupBy("key", "win", "bucket").agg(
            F.sum("cnt").alias("cnt")
        ).select(
            F.lit(-1).cast("bigint").alias("batch_id"),
            "key", "win", "bucket", "cnt",
        )
    tmp = dest_path.rstrip("/") + f".tmp-{uuid.uuid4().hex[:8]}"
    try:
        merged.write.mode("overwrite").parquet(tmp)
        _write_horizon(tmp, older_than)   # inside tmp: publish is atomic
        # fsync the staged part files (and the tmp dir) BEFORE the
        # publish rename becomes durable: a power loss shortly after
        # publish could otherwise leave dest_path present with torn data
        # blocks, and the fresh-dest-only guard then blocks a clean
        # re-derivation (r12 advice; the _rotate_log r8 rule)
        for n in sorted(_logio.list_names(tmp)):
            _logio.fsync_file(os.path.join(tmp, n))
        _fsync_dir(tmp)
        _logio.publish_dir(tmp, dest_path)
    finally:
        _logio.rmtree(tmp)


def expire_windows(
    spark: SparkSession, path: str, kind: str, older_than
) -> None:
    """Drop windows strictly older than ``older_than`` from a windowed
    sketch log AND compact what remains — through the crash-atomic
    rotation, so an expiry that dies mid-flight can never double-count
    (CMS/HDR) or serve half a generation.  ``kind`` ∈ {'hll', 'cms',
    'kmv', 'hdr'}.

    Persists the horizon BEFORE rotating (see the late-data policy block
    above): once this returns — and even if it crashes after the marker
    lands but before the rotation completes — maintainers divert
    pre-horizon arrivals to the quarantine instead of recreating evicted
    windows; a marker without a completed rotation merely means the next
    expiry re-drops already-doomed rows (idempotent)."""
    from cosmo_spark.operators.sketches import kmv_k_smallest

    def merge_hll(files):
        live = spark.read.schema(HLLW_SCHEMA).parquet(*files) \
            .filter(F.col("win") >= F.lit(older_than))
        return live.groupBy("key", "win", "bucket").agg(
            F.max("rho").alias("rho")
        ).select("key", "win", "bucket", "rho")

    def _horizon(log):
        return log.filter(F.col("win") >= F.lit(older_than))

    merge_cms = _additive_merge_fn(
        spark, CMSW_SCHEMA, ["win", "r", "bucket"], pre_filter=_horizon
    )

    def merge_kmv(files):
        live = spark.read.schema(KMVW_SCHEMA).parquet(*files) \
            .filter(F.col("win") >= F.lit(older_than)) \
            .select("key", "win", "h").distinct()
        return kmv_k_smallest(live, ["key", "win"]).select("key", "win", "h")

    merge_hdr = _additive_merge_fn(
        spark, HDRW_SCHEMA, ["key", "win", "bucket"], pre_filter=_horizon
    )

    _write_horizon(path, older_than)
    merge_fn = {"hll": merge_hll, "cms": merge_cms, "kmv": merge_kmv,
                "hdr": merge_hdr}[kind]
    _rotate_log(spark, path, merge_fn)


def compact_kmv_values(spark: SparkSession, value_path: str) -> None:
    """Rewrite the append log to its merged minimum (keys x <=k rows) via
    the crash-atomic rotation (shared with the HLL and CMS compactors).
    The union-merge is idempotent, so KMV never risked double-counting —
    the manifest buys bounded garbage after a crash and one audited
    rotation path for all three algebras."""
    from cosmo_spark.operators.sketches import kmv_k_smallest

    def merge_fn(files):
        return kmv_k_smallest(
            spark.read.schema(KMV_SCHEMA).parquet(*files).distinct(), ["key"]
        )

    _rotate_log(spark, value_path, merge_fn)
