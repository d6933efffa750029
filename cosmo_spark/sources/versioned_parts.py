"""Snapshot-versioned PARTITIONED tables: partition-granular manifest,
time travel, CDC audit and physical purge — without rewriting untouched
partitions (round-9 verdict, next-round #2).

``operators/merge.merge_into_partitioned`` is partition-surgical but
IN-PLACE: its supersede history is unrecoverable and the q151 purge-audit
pattern cannot run against it.  This module closes that gap the way the
flat store (sources/versioned) did, but at PARTITION granularity: each
version's manifest entry maps partition key -> immutable "generation"
directory, a merge stages ONLY the affected partitions as new generations
and re-points just those keys, and untouched partitions are shared —
byte-identical directories referenced by many versions.  This is exactly
the Delta/Iceberg shape (a log naming live files per version; unchanged
files shared); on such a deployment this module maps onto their
transaction log and the semantics carry over.

Layout::

    table/
      _versions.json                 # {"current": N, "versions": [
                                     #   {"version": N,
                                     #    "parts": {"2024-01": "parts/g-..."},
                                     #    "schema": <struct json>}]}
      parts/g-<pid>-<host>-<uuid8>/  # one immutable generation = one
                                     #   partition's rows, schema-complete
      v.tmp-...                      # crashed stagers, reaped when dead

Design points:

- **Partition keys are strings** — ``CAST(partition_col AS STRING)``
  (NULL -> the Hive default-partition sentinel), computed identically on
  the staging write (``partitionBy`` on the derived ``__part`` column)
  and the affected-set probe, so the two can never disagree.  str/int/
  date partition columns round-trip exactly; the key is only a manifest
  index — the real typed column rides IN the data files (the staging
  column is a duplicate, so ``partitionBy`` dropping it loses nothing),
  which is what lets any version read as ONE multi-path parquet scan
  with no per-partition union or cast-injection.
- **The manifest is partition-granular metadata on the driver** —
  O(partitions) entries, the same scale every table format's log
  carries; the affected-partition set is collected (it is bounded by the
  update batch's partition spread), never the data.
- **Same single-writer lease lock** as the flat store; staging runs
  inside the lock (the merge's read-merge-write must be atomic) with the
  lease heartbeat covering the distributed write, and the manifest swap
  is the only commit point.  Readers are lock-free: they see the old
  manifest or the new one, never a mixture.
- **Vacuum / reap are refcounted**: a generation directory is deleted
  only when NO surviving version references it; unreferenced directories
  from crashed publishers are reaped once provably abandoned (dead owner
  pid on this host, or older than the abandonment window).

ref: cosmo/cosmo/filesystem.py-style per-directory dataset management is
the reference's nearest analog; the versioning/time-travel semantics are
the lakehouse-format standard (Armbrust et al., "Delta Lake", VLDB 2020).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import socket
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmo_spark.sources.versioned import (
    _TMP_MAX_AGE_S,
    _new_tmp,
    _read_manifest,
    _write_manifest,
)

#: manifest key for a NULL partition value — the Hive sentinel, so the
#: staging write's directory name and the probe's key string agree
NULL_PART_KEY = "__HIVE_DEFAULT_PARTITION__"

_STAGE_COL = "__part"


def _unescape_dirname(name: str) -> str:
    """Invert Spark/Hive partition-path escaping (%XX hex sequences).
    Unambiguous on Spark-produced names: any literal '%' in the value is
    itself escaped to %25 by the writer."""
    return re.sub(
        "%([0-9A-Fa-f]{2})", lambda m: chr(int(m.group(1), 16)), name
    )


def _key_expr(partition_col: str):
    return F.coalesce(
        F.col(partition_col).cast("string"), F.lit(NULL_PART_KEY)
    )


def _current_entry(doc: dict) -> dict | None:
    cur = doc.get("current")
    if cur is None:
        return None
    for e in doc["versions"]:
        if e["version"] == cur:
            return e
    return None


def _entry_for(doc: dict, version: int | None, path: str) -> dict:
    if doc.get("current") is None:
        raise KeyError(f"no published versions under {path}")
    v = doc["current"] if version is None else version
    for e in doc["versions"]:
        if e["version"] == v:
            return e
    raise KeyError(
        f"version {v} not available under {path} "
        f"(have {[e['version'] for e in doc['versions']]})"
    )


def _alive(pid: int) -> bool:
    from cosmo_spark.operators.merge import _pid_alive

    return _pid_alive(pid)


def _abandoned(entry: str, full: str) -> bool:
    """True when a generation/tmp dir provably belongs to a dead writer:
    owner pid embedded in the name is dead ON THIS HOST, or the dir went
    untouched past the abandonment window (cross-host case).  The host
    check is a substring test, not a capture group — hostnames may
    themselves contain dashes (the flat store's _tmp_owner_pid
    discipline)."""
    m = re.search(r"^(?:g|v\.tmp)-(\d+)-", entry)
    try:
        age = time.time() - os.path.getmtime(full)
    except OSError:
        return False
    owner_here = m is not None and f"-{socket.gethostname()}-" in entry
    if owner_here and not _alive(int(m.group(1))):
        return True
    return age > _TMP_MAX_AGE_S


def _reap_orphans_locked(path: str, doc: dict, keep: str) -> None:
    """Remove crashed stagers' leftovers.  Caller holds the table lock.
    A generation dir referenced by ANY manifest version is never
    touched; everything else follows the abandoned-writer rules."""
    live = {
        rel for e in doc["versions"] for rel in e.get("parts", {}).values()
    }
    pdir = os.path.join(path, "parts")
    if os.path.isdir(pdir):
        for entry in os.listdir(pdir):
            rel = f"parts/{entry}"
            full = os.path.join(pdir, entry)
            if rel in live or full == keep or not os.path.isdir(full):
                continue
            if _abandoned(entry, full):
                shutil.rmtree(full, ignore_errors=True)
    for entry in os.listdir(path):
        full = os.path.join(path, entry)
        if (
            entry.startswith("v.tmp-")
            and full != keep
            and os.path.isdir(full)
            and _abandoned(entry, full)
        ):
            shutil.rmtree(full, ignore_errors=True)


def _stage(df: DataFrame, path: str, partition_col: str):
    """Distributed write of ``df`` into a staging dir partitioned by the
    derived string key; returns (tmp_dir, {key: escaped_subdir}).  The
    staging column is a DUPLICATE of the partition column, so the data
    files stay schema-complete when partitionBy drops it."""
    if _STAGE_COL in df.columns:
        raise ValueError(
            f"versioned partitioned tables reserve the {_STAGE_COL!r} "
            f"column name for staging"
        )
    tmp = _new_tmp(path)
    (
        df.withColumn(_STAGE_COL, _key_expr(partition_col))
        .write.mode("overwrite")
        .partitionBy(_STAGE_COL)
        .parquet(tmp)
    )
    staged = {}
    prefix = _STAGE_COL + "="
    for entry in os.listdir(tmp):
        if entry.startswith(prefix):
            staged[_unescape_dirname(entry[len(prefix):])] = entry
    return tmp, staged


def _gen_rel() -> str:
    return (
        f"parts/g-{os.getpid()}-{socket.gethostname()}-{uuid.uuid4().hex[:8]}"
    )


def _publish_locked(
    path: str,
    doc: dict,
    tmp: str,
    staged: dict[str, str],
    replaced_keys: set[str],
    schema_json: str,
    guard=None,
) -> int:
    """In-lock commit: adopt each staged partition dir as a new
    generation, carry forward untouched keys, bump the manifest.  A key
    in ``replaced_keys`` with NO staged dir disappears (a fully purged
    partition); fencing re-verifies the lease before the destructive
    reap and at the commit point (the flat store's discipline)."""
    if guard is not None:
        guard.verify()
    version = (doc.get("current") or 0) + 1
    _reap_orphans_locked(path, doc, keep=tmp)
    cur = _current_entry(doc)
    parts = {
        k: rel
        for k, rel in (cur.get("parts", {}) if cur else {}).items()
        if k not in replaced_keys
    }
    os.makedirs(os.path.join(path, "parts"), exist_ok=True)
    for key, escdir in staged.items():
        rel = _gen_rel()
        os.replace(os.path.join(tmp, escdir), os.path.join(path, rel))
        parts[key] = rel
    shutil.rmtree(tmp, ignore_errors=True)  # _SUCCESS and friends
    doc.setdefault("versions", []).append(
        {"version": version, "parts": parts, "schema": schema_json}
    )
    doc["current"] = version
    if guard is not None:
        guard.verify()   # the commit point
    _write_manifest(path, doc)
    return version


def merge_into_partitioned_versioned(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols,
    version_col: str,
    partition_col: str,
    retain_versions: int | None = None,
) -> int:
    """Version-guarded merge into a partition-granular snapshot table:
    reads ONLY the partitions the update batch touches, merges, stages
    new generations for exactly those partitions, and publishes a new
    manifest version sharing every untouched generation with its
    predecessor.  Returns the published version id (the current id for
    an empty batch).

    This is the auditable sibling of
    ``operators/merge.merge_into_partitioned``: same partition-surgical
    write cost, plus time travel (``read_partitioned`` at any retained
    version), CDC (``operators/merge.snapshot_diff`` between versions)
    and the q151-class purge audit (``purge_keys_partitioned``).
    ``retain_versions`` bounds history in the same lock acquisition,
    refcount-safely — shared generations survive until no keeper
    references them.
    """
    from cosmo_spark.operators.merge import _table_lock, merge_versioned

    os.makedirs(path, exist_ok=True)
    updates = updates.persist()
    try:
        with _table_lock(spark, path.rstrip("/")) as guard:
            doc = _read_manifest(path)
            cur = _current_entry(doc)
            if updates.isEmpty():   # bounded probe
                return doc.get("current") or 0
            # affected keys: bounded by the batch's partition spread —
            # manifest-scale metadata, the same collect every table
            # format's commit protocol performs
            affected = {
                r.k
                for r in updates.select(
                    _key_expr(partition_col).alias("k")
                ).distinct().collect()
            }
            current = None
            if cur is not None:
                dirs = [
                    os.path.join(path, rel)
                    for k, rel in cur["parts"].items()
                    if k in affected
                ]
                if dirs:
                    current = spark.read.parquet(*dirs)
            merged = merge_versioned(current, updates, key_cols, version_col)
            tmp, staged = _stage(merged, path, partition_col)
            try:
                version = _publish_locked(
                    path, doc, tmp, staged, affected,
                    merged.schema.json(), guard,
                )
            except BaseException:
                shutil.rmtree(tmp, ignore_errors=True)
                raise
            if retain_versions is not None:
                _vacuum_locked(path, doc, retain_versions, guard)
            return version
    finally:
        updates.unpersist()


def read_partitioned(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    partitions=None,
) -> DataFrame:
    """Read the current (default) or a pinned version as ONE multi-path
    parquet scan.  ``partitions`` (iterable of partition VALUES, or
    ``None`` for all) prunes at the MANIFEST — the file-skipping shape
    table formats use, no directory listing, no union plan.  Raises
    KeyError for an unpublished/vacuumed version."""
    doc = _read_manifest(path)
    entry = _entry_for(doc, version, path)
    parts = entry.get("parts", {})
    if partitions is not None:
        want = {
            NULL_PART_KEY if p is None else str(p) for p in partitions
        }
        parts = {k: rel for k, rel in parts.items() if k in want}
    dirs = [os.path.join(path, rel) for rel in parts.values()]
    if not dirs:
        from pyspark.sql.types import StructType

        return spark.createDataFrame(
            [], StructType.fromJson(json.loads(entry["schema"]))
        )
    return spark.read.parquet(*dirs)


def partitioned_versions(path: str) -> list[int]:
    """Published, readable version ids (ascending)."""
    return [e["version"] for e in _read_manifest(path)["versions"]]


def partition_keys(path: str, version: int | None = None) -> list[str]:
    """The partition keys (string form) live in a version — sorted."""
    doc = _read_manifest(path)
    return sorted(_entry_for(doc, version, path).get("parts", {}))


def purge_keys_partitioned(
    spark: SparkSession,
    path: str,
    key_col: str,
    tombstones: DataFrame,
    partition_col: str,
) -> int:
    """Right-to-be-forgotten delete over the partitioned store: rewrite
    ONLY the partitions that contain tombstoned keys (anti-join), leave
    every other generation shared, publish a new version.  A partition
    whose every row is purged disappears from the manifest.  Returns the
    new version id (current id when no partition is affected).

    The audit shape is identical to the flat store's q151:
    ``snapshot_diff(read_partitioned(pre), read_partitioned(post))`` is
    the per-key deletion record, and ``vacuum_partitioned`` is what makes
    the deletion physical once the retention window closes.
    """
    from cosmo_spark.operators.merge import _table_lock

    keys = tombstones.select(key_col).distinct().persist()
    try:
        with _table_lock(spark, path.rstrip("/")) as guard:
            doc = _read_manifest(path)
            cur = _current_entry(doc)
            if cur is None:
                raise KeyError(f"no published versions under {path}")
            all_dirs = [
                os.path.join(path, rel) for rel in cur["parts"].values()
            ]
            if not all_dirs:
                return doc["current"]
            whole = spark.read.parquet(*all_dirs)
            # column-pruned probe: only (key, partition) leave the scan
            affected = {
                r.k
                for r in whole.join(F.broadcast(keys), key_col, "left_semi")
                .select(_key_expr(partition_col).alias("k"))
                .distinct()
                .collect()
            }
            if not affected:
                return doc["current"]
            aff_dirs = [
                os.path.join(path, rel)
                for k, rel in cur["parts"].items()
                if k in affected
            ]
            kept = spark.read.parquet(*aff_dirs).join(
                F.broadcast(keys), key_col, "left_anti"
            )
            tmp, staged = _stage(kept, path, partition_col)
            try:
                return _publish_locked(
                    path, doc, tmp, staged, affected, cur["schema"], guard
                )
            except BaseException:
                shutil.rmtree(tmp, ignore_errors=True)
                raise
    finally:
        keys.unpersist()


def adopt_partitioned(
    spark: SparkSession,
    path: str,
    source_path: str,
    partition_col: str,
) -> int:
    """One-time migration of an existing HIVE-LAYOUT partitioned table
    (``<col>=<val>`` directories, partition values only in the paths —
    the ``merge_into_partitioned`` shape) into a versioned store at
    ``path``: read with basePath so Spark re-materializes the partition
    column, rewrite through the standard staging path (the files gain
    the in-file partition column every later read relies on), publish as
    v1.  A REWRITE by design — Hive-layout data files lack the partition
    column, so zero-copy adoption would poison every multi-path read;
    the one-time cost buys shared-generation history from then on.
    ``path`` must not already be a versioned table (publishes v1 only).
    """
    from cosmo_spark.operators.merge import _table_lock

    os.makedirs(path, exist_ok=True)
    with _table_lock(spark, path.rstrip("/")) as guard:
        doc = _read_manifest(path)
        if doc.get("current") is not None:
            raise RuntimeError(
                f"{path} already has published versions — adopt only "
                f"into a fresh table"
            )
        src = (
            spark.read.option("basePath", source_path).parquet(source_path)
        )
        if partition_col not in src.columns:
            raise ValueError(
                f"{source_path} has no {partition_col!r} partition "
                f"directories to adopt"
            )
        tmp, staged = _stage(src, path, partition_col)
        try:
            return _publish_locked(
                path, doc, tmp, staged, set(staged), src.schema.json(), guard
            )
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise


def vacuum_partitioned(
    spark: SparkSession, path: str, keep_last: int = 1
) -> list[int]:
    """Drop all but the newest ``keep_last`` versions; returns removed
    ids.  Generation directories are REFCOUNTED: one is deleted only
    when no surviving version references it — the property that makes
    shared-generation time travel safe to vacuum.  Manifest-first
    within the lock (the flat store's ordering), so readers never see a
    listed version lose files."""
    from cosmo_spark.operators.merge import _table_lock

    with _table_lock(spark, path.rstrip("/")) as guard:
        doc = _read_manifest(path)
        return _vacuum_locked(path, doc, keep_last, guard)


def _vacuum_locked(path: str, doc: dict, keep_last: int, guard=None) -> list[int]:
    if len(doc["versions"]) <= keep_last:
        return []
    drop = doc["versions"][:-keep_last]
    doc["versions"] = doc["versions"][-keep_last:]
    if guard is not None:
        guard.verify()
    _write_manifest(path, doc)
    live = {
        rel for e in doc["versions"] for rel in e.get("parts", {}).values()
    }
    removed = []
    for e in drop:
        for rel in e.get("parts", {}).values():
            if rel not in live:
                shutil.rmtree(os.path.join(path, rel), ignore_errors=True)
        removed.append(e["version"])
    return removed
