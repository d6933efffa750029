"""Single-writer contract for the no-transaction-log merge (review r7 #4).

Two concurrent merge writers that both read the same base and then both
rewrite-and-swap would each publish a table missing the other's rows — a
SILENT lost update.  The table merge lock must turn that schedule into
exactly one loud MergeContentionError with zero row loss: the loser
retries after the winner's swap and both sides' updates land.
"""

from __future__ import annotations

import os

import pytest

from cosmo_spark.operators.merge import (
    MergeContentionError,
    _table_lock,
    merge_into_partitioned,
    merge_into_path,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "k STRING, ver INT, payload STRING")


def _state(spark, path):
    return {r.k: (r.ver, r.payload) for r in spark.read.parquet(path).collect()}


def test_contending_merge_fails_loud_and_table_unchanged(spark, tmp_path):
    path = str(tmp_path / "tbl")
    merge_into_path(spark, path, _frame(spark, [("k1", 1, "a")]), "k", "ver")
    before = _state(spark, path)

    with _table_lock(spark, path):  # writer A mid-critical-section
        with pytest.raises(MergeContentionError, match="merge lock held"):
            merge_into_path(
                spark, path, _frame(spark, [("k2", 1, "b")]), "k", "ver"
            )
    assert _state(spark, path) == before, "loser must not touch the table"
    assert not os.path.exists(path + ".__merge_lock"), (
        "lock must release when the holder exits"
    )
    # after release the loser's retry succeeds
    merge_into_path(spark, path, _frame(spark, [("k2", 1, "b")]), "k", "ver")
    assert _state(spark, path) == {"k1": (1, "a"), "k2": (1, "b")}


def test_interleaved_swap_schedule_loses_no_rows(spark, tmp_path):
    """Replay the exact lost-update interleaving: writer B arrives while
    writer A is between its read and its swap.  Required outcome: one
    MergeContentionError, then (after B's retry) BOTH updates present."""
    import cosmo_spark.sources.files as files_mod

    path = str(tmp_path / "tbl")
    merge_into_path(spark, path, _frame(spark, [("k1", 1, "base")]), "k", "ver")

    real_overwrite = files_mod.atomic_overwrite
    contention: list[Exception] = []

    def overwrite_with_concurrent_writer(df, p):
        # writer A has read the base and is about to swap; writer B's
        # whole merge attempt happens NOW — the schedule that silently
        # dropped B's rows pre-lock
        try:
            merge_into_path(
                spark, p, _frame(spark, [("kB", 1, "from-B")]), "k", "ver"
            )
        except MergeContentionError as e:
            contention.append(e)
        real_overwrite(df, p)

    files_mod.atomic_overwrite = overwrite_with_concurrent_writer
    try:
        merge_into_path(
            spark, path, _frame(spark, [("kA", 2, "from-A")]), "k", "ver"
        )
    finally:
        files_mod.atomic_overwrite = real_overwrite

    assert len(contention) == 1, "B must fail loudly exactly once"
    # B retries after A completed — nothing lost from either writer
    merge_into_path(
        spark, path, _frame(spark, [("kB", 1, "from-B")]), "k", "ver"
    )
    assert _state(spark, path) == {
        "k1": (1, "base"), "kA": (2, "from-A"), "kB": (1, "from-B")
    }
    assert not os.path.exists(path + ".__merge_lock")


def test_partitioned_merge_honors_the_same_lock(spark, tmp_path):
    path = str(tmp_path / "ptbl")
    base = spark.createDataFrame(
        [("k1", 1, "2024-01", "a")],
        "k STRING, ver INT, month STRING, payload STRING",
    )
    merge_into_partitioned(spark, path, base, "k", "ver", "month")
    upd = spark.createDataFrame(
        [("k2", 1, "2024-01", "b")],
        "k STRING, ver INT, month STRING, payload STRING",
    )
    with _table_lock(spark, path):
        with pytest.raises(MergeContentionError):
            merge_into_partitioned(spark, path, upd, "k", "ver", "month")
    merge_into_partitioned(spark, path, upd, "k", "ver", "month")
    assert {r.k for r in spark.read.parquet(path).collect()} == {"k1", "k2"}


def test_stale_lock_message_names_the_file(spark, tmp_path):
    """A crashed holder leaves the lock behind; the contract is a loud
    failure whose message tells the operator exactly what to remove."""
    path = str(tmp_path / "tbl")
    merge_into_path(spark, path, _frame(spark, [("k1", 1, "a")]), "k", "ver")
    open(path + ".__merge_lock", "w").close()  # orphaned lock
    with pytest.raises(MergeContentionError, match=r"\.__merge_lock"):
        merge_into_path(
            spark, path, _frame(spark, [("k2", 1, "b")]), "k", "ver"
        )
    os.remove(path + ".__merge_lock")  # operator intervention
    merge_into_path(spark, path, _frame(spark, [("k2", 1, "b")]), "k", "ver")
    assert _state(spark, path) == {"k1": (1, "a"), "k2": (1, "b")}
