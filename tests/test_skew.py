"""Salted aggregation / join correctness: same results as the direct form."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cosmo_spark.operators.skew import salted_agg, salted_broadcast_join


@pytest.fixture()
def skewed(spark):
    # key "hot" holds 90% of rows
    rows = [("hot", float(i % 7)) for i in range(900)] + [
        (f"k{i}", float(i)) for i in range(100)
    ]
    return spark.createDataFrame(rows, "k STRING, v DOUBLE")


def test_salted_agg_matches_direct(spark, skewed):
    direct = {
        r.k: (r.s, r.c, r.mn, r.mx, r.avg)
        for r in skewed.groupBy("k").agg(
            F.sum("v").alias("s"), F.count("v").alias("c"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
            F.avg("v").alias("avg"),
        ).collect()
    }
    salted = {
        r.k: (r.s, r.c, r.mn, r.mx, r.avg)
        for r in salted_agg(
            skewed, "k",
            {"s": ("v", "sum"), "c": ("v", "count"), "mn": ("v", "min"),
             "mx": ("v", "max"), "avg": ("v", "mean")},
        ).collect()
    }
    assert set(direct) == set(salted)
    for k in direct:
        for a, b in zip(direct[k], salted[k]):
            assert a == pytest.approx(b), k


def test_salted_agg_rejects_nondecomposable(skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, "k", {"p": ("v", "percentile")})


def test_salted_broadcast_join_matches_direct(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B")], "k STRING, label STRING"
    )
    direct = skewed.join(dim, "k").groupBy("k", "label").count()
    salted = salted_broadcast_join(skewed, dim, "k").groupBy("k", "label").count()
    assert {tuple(r) for r in direct.collect()} == {tuple(r) for r in salted.collect()}


def test_hot_cold_dict_join_matches_plain_join(spark, skewed):
    """The hot/cold split must return exactly the plain join's rows for any
    hot_k — including hot_k smaller and larger than the key count."""
    from cosmo_spark.operators.skew import hot_cold_dict_join

    dim = skewed.groupBy(F.col("k").alias("k")).agg(
        F.count(F.lit(1)).alias("freq"), F.max("v").alias("attr")
    )
    plain = sorted(
        tuple(r) for r in skewed.join(dim, "k").collect()
    )
    for hot_k in (1, 5, 10_000):
        split = sorted(
            tuple(r)
            for r in hot_cold_dict_join(
                skewed, dim, on="k", freq_col="freq", hot_k=hot_k
            ).select(*skewed.join(dim, "k").columns).collect()
        )
        assert split == plain, hot_k


def test_hot_cold_dict_join_hot_branch_broadcasts(spark, skewed):
    from cosmo_spark.operators.skew import hot_cold_dict_join
    from cosmo_spark.plans.explain import physical_plan

    dim = skewed.groupBy("k").agg(F.count(F.lit(1)).alias("freq"))
    plan = physical_plan(
        hot_cold_dict_join(skewed, dim, on="k", freq_col="freq", hot_k=3)
    )
    assert "BroadcastHashJoin" in plan


def test_hot_cold_dict_join_duplicate_dim_keys(spark, skewed):
    """A dictionary with duplicate keys must not lose rows at the hot_k
    boundary: the hot set is chosen over DISTINCT keys, so one key's rows
    can never be split between the hot and cold branches (a raw row-level
    limit could strand a key's extra rows on the cold side, where the
    anti-join would drop them)."""
    from cosmo_spark.operators.skew import hot_cold_dict_join

    # two rows per key — with row-level hot_k=3 selection, key "hot" (or the
    # boundary key) would contribute rows to both branches and lose one
    dim = spark.createDataFrame(
        [("hot", 900, "H1"), ("hot", 900, "H2"),
         ("k1", 1, "A1"), ("k1", 1, "A2"),
         ("k2", 1, "B1"), ("k2", 1, "B2")],
        "k STRING, freq INT, label STRING",
    )
    direct = skewed.join(dim, "k")
    for hot_k in (1, 2, 3):
        split = hot_cold_dict_join(skewed, dim, on="k", freq_col="freq",
                                   hot_k=hot_k)
        assert sorted(map(tuple, split.collect())) == \
            sorted(map(tuple, direct.collect())), f"hot_k={hot_k}"
