"""Versioned snapshot tables (sources/versioned): immutable versions,
time-travel reads, manifest-gated visibility, single-writer publishing,
vacuum retention, and CDC between versions via snapshot_diff."""

from __future__ import annotations

import os
import shutil

import pytest

from cosmo_spark.operators.merge import MergeContentionError, _table_lock
from cosmo_spark.operators.merge import snapshot_diff
from cosmo_spark.sources.versioned import (
    read_snapshot,
    snapshot_versions,
    vacuum_snapshots,
    write_snapshot,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "k STRING, val INT")


def _state(spark, path, version=None):
    return {
        r.k: r.val for r in read_snapshot(spark, path, version).collect()
    }


def test_time_travel_reads_and_version_log(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v1 = write_snapshot(_frame(spark, [("a", 1), ("b", 1)]), path)
    v2 = write_snapshot(_frame(spark, [("a", 2), ("c", 1)]), path)
    assert (v1, v2) == (1, 2)
    assert snapshot_versions(path) == [1, 2]
    assert _state(spark, path) == {"a": 2, "c": 1}          # current
    assert _state(spark, path, 1) == {"a": 1, "b": 1}       # pinned
    with pytest.raises(KeyError):
        read_snapshot(spark, path, 99)

    # CDC between two versions is the existing snapshot_diff composition
    changes = {
        r.k: r.change_type
        for r in snapshot_diff(
            read_snapshot(spark, path, 1), read_snapshot(spark, path, 2), "k"
        ).collect()
    }
    assert changes == {"a": "update", "b": "delete", "c": "insert"}


def test_publish_is_single_writer_and_crash_safe(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_snapshot(_frame(spark, [("a", 1)]), path)

    # concurrent publisher fails loudly under the shared merge lock
    with _table_lock(spark, path):
        with pytest.raises(MergeContentionError):
            write_snapshot(_frame(spark, [("a", 2)]), path)
    assert _state(spark, path) == {"a": 1}

    # a crashed publisher's orphan (data dir present, never in the
    # manifest) is invisible to readers and reaped by the next publish
    orphan = os.path.join(path, "v=2")
    os.makedirs(orphan)
    open(os.path.join(orphan, "garbage.parquet"), "w").close()
    assert snapshot_versions(path) == [1]
    assert _state(spark, path) == {"a": 1}
    v = write_snapshot(_frame(spark, [("a", 3)]), path)
    assert v == 2 and _state(spark, path) == {"a": 3}
    assert _state(spark, path, 2) == {"a": 3}


def test_vacuum_keeps_current_and_forgets_history(spark, tmp_path):
    path = str(tmp_path / "tbl")
    for i in range(1, 5):
        write_snapshot(_frame(spark, [("a", i)]), path)
    assert snapshot_versions(path) == [1, 2, 3, 4]
    removed = vacuum_snapshots(spark, path, keep_last=2)
    assert removed == [1, 2]
    assert snapshot_versions(path) == [3, 4]
    assert _state(spark, path) == {"a": 4}
    assert _state(spark, path, 3) == {"a": 3}
    with pytest.raises(KeyError):
        read_snapshot(spark, path, 1)
    assert not os.path.isdir(os.path.join(path, "v=1"))
    # vacuum below the floor is a no-op
    assert vacuum_snapshots(spark, path, keep_last=5) == []
    # vacuum respects the writer lock: contention is loud
    with _table_lock(spark, path):
        with pytest.raises(MergeContentionError):
            vacuum_snapshots(spark, path, keep_last=1)
