"""Partition-pruned merge: only affected partitions are rewritten."""

from __future__ import annotations

import os

from cosmo_spark.operators.merge import merge_into_partitioned


def part_files(path, part):
    d = os.path.join(path, f"month={part}")
    return {f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d) if f.endswith(".parquet")}


def test_merge_touches_only_affected_partitions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [("k1", 1, "2024-01", "a"), ("k2", 1, "2024-01", "b"),
         ("k3", 1, "2024-02", "c"), ("k4", 1, "2024-02", "d")],
        "k STRING, ver INT, month STRING, payload STRING",
    )
    merge_into_partitioned(spark, path, base, "k", "ver", "month")
    before_jan = part_files(path, "2024-01")
    before_feb = part_files(path, "2024-02")

    updates = spark.createDataFrame(
        [("k1", 2, "2024-01", "a2"),      # supersedes
         ("k9", 1, "2024-01", "new"),     # inserts
         ("k1", 0, "2024-01", "stale")],  # loses to existing ver 2? no — loses to 2 in same batch
        "k STRING, ver INT, month STRING, payload STRING",
    )
    merge_into_partitioned(spark, path, updates, "k", "ver", "month")

    state = {r.k: (r.ver, r.payload, r.month)
             for r in spark.read.parquet(path).collect()}
    assert state == {
        "k1": (2, "a2", "2024-01"),
        "k2": (1, "b", "2024-01"),
        "k3": (1, "c", "2024-02"),
        "k4": (1, "d", "2024-02"),
        "k9": (1, "new", "2024-01"),
    }
    # February partition: identical files, untouched mtimes
    assert part_files(path, "2024-02") == before_feb
    # January partition was rewritten
    assert part_files(path, "2024-01") != before_jan


def test_merge_empty_updates_noop(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [("k1", 1, "2024-01", "a")], "k STRING, ver INT, month STRING, payload STRING"
    )
    merge_into_partitioned(spark, path, base, "k", "ver", "month")
    snapshot = part_files(path, "2024-01")
    empty = base.limit(0)
    merge_into_partitioned(spark, path, empty, "k", "ver", "month")
    assert part_files(path, "2024-01") == snapshot


def test_merge_many_partitions_rewrites_one(spark, tmp_path):
    """Join-based pruning at a higher partition count: 40 monthly partitions,
    one update month — only that directory's files change, and no
    partition-value list is collected to the driver (the semi-join path)."""
    path = str(tmp_path / "tbl40")
    base = spark.createDataFrame(
        [(f"k{i}", 1, f"2020-{(i % 40) + 1:02d}", "x") for i in range(200)],
        "k STRING, ver INT, month STRING, payload STRING",
    )
    merge_into_partitioned(spark, path, base, "k", "ver", "month")
    snapshots = {m: part_files(path, m) for m in sorted({r.month for r in base.collect()})}

    updates = spark.createDataFrame(
        [("k7", 2, "2020-08", "upd")], "k STRING, ver INT, month STRING, payload STRING"
    )
    merge_into_partitioned(spark, path, updates, "k", "ver", "month")

    for m, snap in snapshots.items():
        if m == "2020-08":
            assert part_files(path, m) != snap
        else:
            assert part_files(path, m) == snap
    row = {r.k: r.ver for r in spark.read.parquet(path).filter("month = '2020-08'").collect()}
    assert row["k7"] == 2
