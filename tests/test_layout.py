"""Layout tests: partition pruning and exchange-free bucketed joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from cosmo_spark.plans.explain import physical_plan
from cosmo_spark.sources.layout import read_bucketed, write_bucketed, write_partitioned

import pytest

# heavyweight Spark suite: deselected by the default `addopts` fast set so
# the driver's verify completes inside its window (r13 verdict #7); run via
# `pytest -m slow` or the full suite via `pytest --override-ini addopts= tests/`
pytestmark = pytest.mark.slow


def test_partition_pruning(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"2024-0{1 + i % 2}", float(i)) for i in range(20)],
        "id INT, month STRING, v DOUBLE",
    )
    path = str(tmp_path / "part")
    write_partitioned(df, path, "month")
    scan = spark.read.parquet(path).filter(F.col("month") == "2024-01")
    plan = physical_plan(scan)
    # partition filter appears as PartitionFilters, not a data filter
    assert "PartitionFilters" in plan and "month" in plan
    assert scan.count() == 10


def test_bucketed_join_no_exchange(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS layout_test")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        a = spark.createDataFrame(
            [(i, float(i)) for i in range(100)], "k INT, va DOUBLE"
        )
        b = spark.createDataFrame(
            [(i, float(i * 2)) for i in range(100)], "k INT, vb DOUBLE"
        )
        write_bucketed(a, "layout_test.ta", "k", num_buckets=4, sort_cols="k")
        write_bucketed(b, "layout_test.tb", "k", num_buckets=4, sort_cols="k")
        joined = read_bucketed(spark, "layout_test.ta").join(
            read_bucketed(spark, "layout_test.tb"), "k"
        )
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing pre-co-located both sides
        assert joined.count() == 100
        # contrast: the same join on unbucketed frames DOES exchange
        plain = a.join(b, "k")
        assert "Exchange" in physical_plan(plain)
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP DATABASE IF EXISTS layout_test CASCADE")


def test_ivf_corpus_bucketed_at_rest_no_corpus_exchange(spark, tmp_path):
    """The IVF 100 TB contract (operators/similarity.py docstring): assign
    the corpus once, write it bucketed-by(bucket), and the per-query probe
    join then runs with NO exchange on the corpus side — the probe set
    broadcasts into co-located buckets."""
    from pyspark.sql import functions as F

    from cosmo_spark.operators.kmeans import kmeans_centroids
    from cosmo_spark.operators.similarity import assign_buckets

    rows = []
    for i in range(60):
        v = [0.05] * 8
        v[i % 4] = 2.0 + (i % 7) * 0.1
        rows.append((i, v))
    e = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    cents = kmeans_centroids(e, "embedding", "vec_id", k=4, iterations=2)
    assigned = assign_buckets(e, cents, "embedding", "vec_id")
    spark.sql("CREATE DATABASE IF NOT EXISTS layout_test")
    try:
        write_bucketed(assigned, "layout_test.ivf_corpus", "bucket",
                       num_buckets=4)
        corpus = read_bucketed(spark, "layout_test.ivf_corpus")
        # materialize the (tiny) probe set so the plan under test is purely
        # the corpus path: bucketed scan -> broadcast join, nothing else
        probe_rows = (
            assigned.filter(F.col("vec_id") < 3)
            .select(F.col("vec_id").alias("query_id"), "bucket").collect()
        )
        probes = spark.createDataFrame(probe_rows)
        joined = corpus.join(F.broadcast(probes), "bucket")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # corpus side: scan -> broadcast hash join, no shuffle exchange
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS layout_test.ivf_corpus")


def test_zorder_value_interleaves():
    from pyspark.sql import functions as F  # noqa: F401

    from cosmo_spark.sources.layout import zorder_value  # construction only

    # expression builds without error for 2 and 3 dims
    assert zorder_value(["a", "b"], bits=4) is not None
    assert zorder_value(["a", "b", "c"], bits=4) is not None


def test_zorder_clusters_both_dimensions(spark, tmp_path):
    """Per-file min/max spans on BOTH dimensions must shrink dramatically
    vs a 1-D sort layout — that span is exactly what parquet footer
    pruning sees, so it's the measurable value of the z-curve."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from cosmo_spark.sources.layout import write_zordered

    n = 1 << 14
    df = spark.range(n).select(
        (F.col("id") % 128).alias("x"),
        (F.col("id") / 128).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    zpath, lpath = str(tmp_path / "zord"), str(tmp_path / "linear")
    write_zordered(df, zpath, ["x", "y"], bits=7, num_files=16)
    # 1-D baseline: range-partition + sort by x only
    (
        df.repartitionByRange(16, "x").sortWithinPartitions("x")
        .write.mode("overwrite").parquet(lpath)
    )

    def mean_span(path, col):
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            stats = [md.row_group(i).column(idx[col]).statistics
                     for i in range(md.num_row_groups)]
            spans.append(max(s.max for s in stats) - min(s.min for s in stats))
        return sum(spans) / len(spans)

    # x-sorted layout: x is tight but y spans nearly the full range per file
    assert mean_span(lpath, "y") > 0.8 * 128
    # z-ordered: BOTH dims are clustered — each file owns a hyper-rectangle
    zx, zy = mean_span(zpath, "x"), mean_span(zpath, "y")
    assert zx < 0.5 * 128, zx
    assert zy < 0.5 * 128, zy


def test_zorder_roundtrip_preserves_rows(spark, tmp_path):
    from pyspark.sql import functions as F

    from cosmo_spark.sources.layout import write_zordered

    df = spark.range(1000).select(
        (F.col("id") * 7919 % 1000).alias("x"),
        (F.col("id") * 104729 % 1000).alias("y"),
        F.col("id").alias("payload"),
    )
    path = str(tmp_path / "z2")
    write_zordered(df, path, ["x", "y"], bits=8, num_files=8)
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert sorted(r.payload for r in back.collect()) == list(range(1000))
    assert set(back.columns) == {"x", "y", "payload"}


def test_zorder_value_matches_python_morton(spark):
    """The shift/or interleave expression must equal a reference Python
    Morton encoding for exhaustive small inputs."""
    from pyspark.sql import functions as F  # noqa: F401

    from cosmo_spark.sources.layout import zorder_value

    def morton2(x, y, bits):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x INT, y INT")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", zorder_value(["x", "y"], bits=4)).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == morton2(x, y, 4), (x, y)


def test_compact_table_collapses_small_files(spark, tmp_path):
    import glob
    import os

    from cosmo_spark.sources.layout import compact_table

    path = str(tmp_path / "t")
    # simulate micro-batch ingest: 20 appends of tiny frames
    for k in range(20):
        spark.range(k * 10, (k + 1) * 10).selectExpr(
            "id", "id * 2 AS v"
        ).coalesce(1).write.mode("append").parquet(path)
    before = len(glob.glob(os.path.join(path, "part-*")))
    assert before >= 20
    n = compact_table(spark, path, target_file_bytes=64 * 1024 * 1024)
    after = len(glob.glob(os.path.join(path, "part-*")))
    assert after == n == 1
    got = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert got == list(range(200))


def test_compact_table_refuses_partitioned_layout(spark, tmp_path):
    import pytest as _pytest

    from cosmo_spark.sources.layout import compact_table

    path = str(tmp_path / "t")
    spark.range(0, 100).selectExpr("id", "id % 3 AS p").write.partitionBy(
        "p"
    ).parquet(path)
    with _pytest.raises(ValueError, match="Hive-partitioned"):
        compact_table(spark, path)


def test_snapshot_diff_bucketed_at_rest_no_exchange(spark, tmp_path):
    """The q82/J1 CDC contract (operators/merge.snapshot_diff docstring):
    with both snapshots bucketed by the diff key at rest, the full-outer
    join zips co-located buckets — zero Exchange nodes in the plan."""
    from cosmo_spark.operators.merge import snapshot_diff

    spark.sql("CREATE DATABASE IF NOT EXISTS layout_cdc")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        old = spark.createDataFrame(
            [(i, f"v{i}") for i in range(100)], "k INT, txt STRING"
        )
        new = spark.createDataFrame(
            [(i, f"v{i + (i % 7 == 0)}") for i in range(1, 101)],
            "k INT, txt STRING",
        )
        write_bucketed(old, "layout_cdc.snap_old", "k", num_buckets=4, sort_cols="k")
        write_bucketed(new, "layout_cdc.snap_new", "k", num_buckets=4, sort_cols="k")
        diff = snapshot_diff(
            read_bucketed(spark, "layout_cdc.snap_old"),
            read_bucketed(spark, "layout_cdc.snap_new"),
            "k",
        )
        plan = physical_plan(diff)
        assert "SortMergeJoin FullOuter" in plan or "SortMergeJoin" in plan
        assert "Exchange" not in plan  # both sides pre-bucketed on k
        rows = {r.k: r.change_type for r in diff.collect()}
        assert rows[0] == "delete" and rows[100] == "insert"
        assert all(
            v == "update" for k, v in rows.items() if k not in (0, 100)
        )
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP DATABASE IF EXISTS layout_cdc CASCADE")
