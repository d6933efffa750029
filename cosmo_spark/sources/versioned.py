"""Versioned snapshot tables: immutable versions, time-travel reads, vacuum.

The no-dependency slice of a lakehouse table format, built from the
repo's existing primitives: each publish writes an immutable ``v=N`` data
directory and then atomically swaps a tiny JSON manifest naming the
current version — readers NEVER list the table directory (half-written
or vacuumed versions are invisible until/after the manifest says so),
and any historical version stays readable until vacuumed (time travel;
``operators/merge.snapshot_diff`` between two versions is CDC).

Concurrency contract: publishing runs under the same single-writer lock
as the version-guarded merge (operators/merge._table_lock) — a second
concurrent publisher fails LOUDLY with MergeContentionError instead of
interleaving version numbers.  Readers are lock-free: the manifest is a
single file swapped with os.replace, so a read sees the old version or
the new one, never a mixture.  On a Delta/Iceberg deployment this module
maps 1:1 onto their transaction log; the semantics (and tests) carry
over unchanged.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_versions.json"


def _manifest_path(table_path: str) -> str:
    return os.path.join(table_path, _MANIFEST)


def _read_manifest(table_path: str) -> dict:
    try:
        with open(_manifest_path(table_path)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {"current": None, "versions": []}


def _write_manifest(table_path: str, doc: dict) -> None:
    tmp = _manifest_path(table_path) + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(doc, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _manifest_path(table_path))


def write_snapshot(df: DataFrame, table_path: str) -> int:
    """Publish ``df`` as the table's next immutable version; returns the
    new version id.  Crash-safe: data lands under a tmp name, renames to
    ``v=N``, and only the final manifest swap makes it current — a crash
    before the swap leaves the previous version serving and at most one
    orphaned directory (removed by the next publisher)."""
    from cosmo_spark.operators.merge import _table_lock

    spark = df.sparkSession
    os.makedirs(table_path, exist_ok=True)
    with _table_lock(spark, table_path.rstrip("/")):
        doc = _read_manifest(table_path)
        version = (doc["current"] or 0) + 1
        final = os.path.join(table_path, f"v={version}")
        tmp = final + f".tmp-{os.getpid()}"
        # reap a crashed predecessor's orphans (dirs above current that
        # never made it into the manifest — invisible to readers)
        known = {v["version"] for v in doc["versions"]}
        for entry in os.listdir(table_path):
            p = os.path.join(table_path, entry)
            if entry.startswith("v=") and ".tmp-" in entry:
                shutil.rmtree(p, ignore_errors=True)
            elif entry.startswith("v=") and os.path.isdir(p):
                try:
                    n = int(entry[2:])
                except ValueError:
                    continue
                if n not in known:
                    shutil.rmtree(p, ignore_errors=True)
        df.write.mode("overwrite").parquet(tmp)
        os.replace(tmp, final)
        doc["versions"].append({"version": version})
        doc["current"] = version
        _write_manifest(table_path, doc)
        return version


def read_snapshot(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Read the current (default) or a pinned historical version.  Raises
    KeyError for a version the manifest does not carry (never published,
    or vacuumed away)."""
    doc = _read_manifest(table_path)
    if doc["current"] is None:
        raise KeyError(f"no published versions under {table_path}")
    v = doc["current"] if version is None else version
    if v not in {e["version"] for e in doc["versions"]}:
        raise KeyError(
            f"version {v} not available under {table_path} "
            f"(have {[e['version'] for e in doc['versions']]})"
        )
    return spark.read.parquet(os.path.join(table_path, f"v={v}"))


def snapshot_versions(table_path: str) -> list[int]:
    """Published, readable version ids (ascending)."""
    return [e["version"] for e in _read_manifest(table_path)["versions"]]


def vacuum_snapshots(
    spark: SparkSession, table_path: str, keep_last: int = 1
) -> list[int]:
    """Drop all but the newest ``keep_last`` versions; returns the ids
    removed.  Runs under the table's writer lock (review r8): vacuum is
    a manifest read-modify-write, and unlocked it could race a publish
    and write back a stale manifest missing the fresh version — whose
    directory the next publisher's orphan reaper would then DELETE.
    Manifest-first within the lock (a version disappears from the
    manifest BEFORE its files go), so a lock-free reader either pinned
    the version while it was still listed — the files are deleted after
    and an in-flight Spark job may fail loudly, the documented
    snapshot-retention trade every table format shares — or it no longer
    sees the version at all.  Never touches the current version."""
    from cosmo_spark.operators.merge import _table_lock

    with _table_lock(spark, table_path.rstrip("/")):
        doc = _read_manifest(table_path)
        if len(doc["versions"]) <= keep_last:
            return []
        drop = doc["versions"][:-keep_last]
        doc["versions"] = doc["versions"][-keep_last:]
        _write_manifest(table_path, doc)
        removed = []
        for e in drop:
            shutil.rmtree(
                os.path.join(table_path, f"v={e['version']}"),
                ignore_errors=True,
            )
            removed.append(e["version"])
        return removed
