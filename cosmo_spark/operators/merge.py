"""Version-guarded upsert (MERGE) on parquet storage.

ref: cosmo/sms/ingest_sms.py:154-198 — SQLite
``INSERT ... ON CONFLICT(SMSID) DO UPDATE ... WHERE EXCLUDED.VERSION > VERSION``
(and per-EXPOSURE rows guarded by FILEID).  Semantics to preserve
(docs/source/sms.rst:96-109): newer version supersedes, equal/older version is
a no-op, unmatched keys insert — i.e. the merge is idempotent and monotone.

Without a transactional table format in this environment the merge is
expressed set-based — union + top-1-per-key — and rewritten atomically via a
temp directory swap.  On a Delta/Iceberg deployment ``merge_versioned``
becomes a single ``MERGE INTO`` with the same guard predicate; the semantics
(and tests) carry over unchanged.
"""

from __future__ import annotations
from collections.abc import Sequence
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class MergeContentionError(RuntimeError):
    """Raised when a second writer attempts a version-guarded merge while
    another writer holds the table's merge lock.

    The no-transaction-log merge is a read → merge → swap critical
    section: two concurrent writers that both read the same base would
    each swap in a rewrite missing the other's rows — a SILENT lost
    update.  The lock turns that schedule into one loud failure (this
    exception) instead; the loser retries after the holder finishes.  A
    Delta/Iceberg deployment lifts the restriction (optimistic commit
    protocol); this guard documents and enforces the single-writer
    contract until then.
    """


@contextmanager
def _table_lock(spark: SparkSession, path: str):
    """Exclusive per-table merge lock: atomically create ``<path>.__merge_lock``
    through the Hadoop FileSystem API (atomic create-if-absent on HDFS and
    local FS — the schemes where the rename-based swap is atomic too).
    Contention raises MergeContentionError immediately — merges are
    idempotent and monotone, so the right recovery is retry-after, never
    wait-and-interleave.  A crashed holder leaves the lock behind; the
    error message names the file so an operator (or an orchestration
    layer with liveness knowledge) can remove it.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    lock = jvm.org.apache.hadoop.fs.Path(path + ".__merge_lock")
    fs = lock.getFileSystem(conf)
    if not fs.createNewFile(lock):
        raise MergeContentionError(
            f"merge lock held for {path}: another merge is in flight "
            f"(single-writer contract). Retry after it completes; if its "
            f"writer died, delete {path}.__merge_lock and retry."
        )
    try:
        yield
    finally:
        fs.delete(lock, False)


def merge_versioned(
    current: DataFrame | None,
    updates: DataFrame,
    key_cols: str | Sequence[str],
    version_col: str,
) -> DataFrame:
    """Return the merged state: per key, the row with the greatest version;
    on equal versions the existing row wins (re-ingest is a no-op,
    ref: tests/test_sms_ingest.py:98-105 idempotence golden).
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    updates = updates.withColumn("__is_new", F.lit(1))
    if current is None:
        unioned = updates
    else:
        unioned = current.withColumn("__is_new", F.lit(0)).unionByName(updates)
    # max_by over the packed row (the latest_per_key discipline): the winner
    # per key resolves map-side, so the shuffle carries ~one row per key —
    # maximizing (version, -is_new) == the old window's ORDER BY version
    # DESC, is_new ASC (existing row wins an equal-version re-ingest)
    payload = F.struct(*[F.col(c) for c in unioned.columns])
    order_key = F.struct(
        F.col(version_col).alias("v"), (-F.col("__is_new")).alias("keep")
    )
    return (
        unioned.groupBy(*key_cols)
        .agg(F.max_by(payload, order_key).alias("__row"))
        .select("__row.*")
        .drop("__is_new")
    )


def merge_into_path(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: str | Sequence[str],
    version_col: str,
) -> None:
    """Apply ``merge_versioned`` against a parquet table path, atomically.

    Full-rewrite merge is the no-transaction-log fallback for unpartitioned
    tables; at scale use ``merge_into_partitioned`` (rewrites only affected
    partitions) or a transactional format's MERGE.

    Single-writer: the whole read → merge → swap runs under the table's
    merge lock; a concurrent merge raises MergeContentionError instead of
    silently dropping this writer's rows (r8 review item).
    """
    from cosmo_spark.sources.files import atomic_overwrite, fs_exists

    with _table_lock(spark, path):
        current = spark.read.parquet(path) if fs_exists(spark, path) else None
        merged = merge_versioned(current, updates, key_cols, version_col)
        atomic_overwrite(merged, path)


def merge_into_partitioned(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: str | Sequence[str],
    version_col: str,
    partition_col: str,
) -> None:
    """Version-guarded merge into a Hive-partitioned parquet table, touching
    ONLY partitions that contain updated keys.

    The 100 TB upsert path: a day of updates against a years-deep table
    reads and rewrites a handful of partition directories; everything else
    is untouched bytes.  Mechanics: dynamic partition overwrite
    (``partitionOverwriteMode=dynamic``) replaces exactly the partitions
    present in the written frame.  Requires ``partition_col`` to be part of
    every update row (the merge key's partition cannot change).

    The affected-partition set never materializes on the driver: the
    current-table read is restricted by a broadcast left-semi join on the
    partition column, which dynamic partition pruning (DPP — enabled by
    default via ``spark.sql.optimizer.dynamicPartitionPruning.enabled``;
    without it the semi-join still bounds the merge input but the scan
    lists every directory) turns into an executor-side skip of untouched
    directories — O(1) driver cost at any partition count.

    ``updates`` is persisted for the duration of the merge: it feeds three
    consumers (the isEmpty probe, the affected-partition distinct, and the
    merge itself), and an expensive update lineage must not recompute per
    action.
    """
    updates = updates.persist()
    try:
        if updates.isEmpty():  # bounded probe (limit 1), not an O(rows) action
            return
        from cosmo_spark.sources.files import fs_exists

        # same single-writer lock as merge_into_path: two concurrent
        # partition merges touching overlapping partitions would interleave
        # read-and-overwrite and lose rows; per-table granularity because
        # the affected-partition set is not known before reading updates
        with _table_lock(spark, path):
            if fs_exists(spark, path):
                affected = updates.select(partition_col).distinct()
                current = spark.read.parquet(path).join(
                    F.broadcast(affected), partition_col, "left_semi"
                )
                merged = merge_versioned(current, updates, key_cols, version_col)
            else:
                merged = merge_versioned(None, updates, key_cols, version_col)
            prev = spark.conf.get(
                "spark.sql.sources.partitionOverwriteMode", "static"
            )
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                merged.write.mode("overwrite").partitionBy(partition_col) \
                    .parquet(path)
            finally:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    finally:
        updates.unpersist()


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: str | Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Change-data-capture between two table snapshots: one row per changed
    key with change_type ∈ {insert, update, delete}.

    The comparison is a full outer join on the key plus a single
    xxhash64 equality over the compared columns — the hash computes
    map-side on each branch, so the join carries (key, hash) discipline
    rather than wide rows twice.  Unchanged keys drop out.

    The hashed representation is ``to_json(struct(...))`` with explicit
    nulls, NOT the raw struct: Spark's hash functions skip null fields,
    so hashing the struct directly would report (a=null, b='x') →
    (a='x', b=null) as unchanged whenever the moved value hashes the
    same under both field seeds.  JSON encodes field identity and
    null-ness, closing that class.  Residual risk is the generic 2^-64
    xxhash64 collision — acceptable for CDC triage; feed the emitted
    keys to a value-level verifier if the downstream cannot tolerate it.

    At 100 TB both snapshots are bucketed by key at rest (sources/layout),
    so the full outer join runs zipped per-bucket with no exchange; the
    output is exactly the CDC stream an incremental downstream (merge,
    index refresh, re-dedup of changed docs only) consumes.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]
    fingerprint = F.xxhash64(
        F.to_json(F.struct(*compare_cols), {"ignoreNullFields": "false"})
    )
    o = old.select(*keys, fingerprint.alias("__oh"))
    n = new.select(*keys, fingerprint.alias("__nh"))
    j = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("__oh").isNull(), F.lit("insert"))
        .when(F.col("__nh").isNull(), F.lit("delete"))
        .when(F.col("__oh") != F.col("__nh"), F.lit("update"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*keys, "change_type")
    )
