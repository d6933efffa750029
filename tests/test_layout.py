"""Layout tests: partition pruning and exchange-free bucketed joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from cosmo_spark.plans.explain import physical_plan
from cosmo_spark.sources.layout import read_bucketed, write_bucketed, write_partitioned


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
