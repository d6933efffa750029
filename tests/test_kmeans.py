"""k-means centroid training: converges on separable clusters, deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

from cosmo_spark.operators.kmeans import kmeans_centroids
from cosmo_spark.operators.similarity import assign_buckets

import pytest

# heavyweight Spark suite: deselected by the default `addopts` fast set so
# the driver's verify completes inside its window (r13 verdict #7); run via
# `pytest -m slow` or the full suite via `pytest --override-ini addopts= tests/`
pytestmark = pytest.mark.slow


def _clustered(spark):
    # three well-separated direction clusters in 4-d
    rows = []
    for i in range(30):
        eps = (i % 5) * 0.01
        rows.append((i, [1.0, eps, 0.0, 0.0]))            # cluster along x
        rows.append((100 + i, [0.0, 1.0, eps, 0.0]))      # cluster along y
        rows.append((200 + i, [0.0, 0.0, eps, 1.0]))      # cluster along w
    return spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")


def test_kmeans_separates_clusters(spark):
    df = _clustered(spark)
    cents = kmeans_centroids(df, "embedding", "vec_id", k=3, iterations=4)
    assert cents.count() == 3
    assigned = assign_buckets(df, cents, "embedding", "vec_id")
    groups = (
        assigned.withColumn("truth", (F.col("vec_id") / 100).cast("int"))
        .groupBy("truth")
        .agg(F.countDistinct("bucket").alias("nb"))
        .collect()
    )
    # every ground-truth cluster maps to exactly one bucket
    assert all(g.nb == 1 for g in groups)
    # and the three buckets are distinct
    assert assigned.select("bucket").distinct().count() == 3


def test_kmeans_deterministic(spark):
    df = _clustered(spark)
    a = sorted(map(repr, kmeans_centroids(df, "embedding", "vec_id", k=3, iterations=2).collect()))
    b = sorted(map(repr, kmeans_centroids(df, "embedding", "vec_id", k=3, iterations=2).collect()))
    assert a == b


def test_kmeans_seeding_job_count_constant_in_k(spark):
    """Seeding must be one bounded-sample job, not k-1 corpus scans: the
    number of Spark jobs during seeding may not grow with k."""
    df = _clustered(spark)

    def jobs_for(k: int, group: str) -> int:
        sc = spark.sparkContext
        sc.setJobGroup(group, f"seeding k={k}")
        try:
            kmeans_centroids(df, "embedding", "vec_id", k=k, iterations=0)
        finally:
            sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    assert jobs_for(2, "seed-k2") == jobs_for(8, "seed-k8")


def test_kmeans_seed_sample_bound(spark):
    """A tiny seed_sample_size still yields k distinct, deterministic seeds."""
    df = _clustered(spark)
    a = sorted(map(repr, kmeans_centroids(
        df, "embedding", "vec_id", k=3, iterations=0, seed_sample_size=10
    ).collect()))
    b = sorted(map(repr, kmeans_centroids(
        df, "embedding", "vec_id", k=3, iterations=0, seed_sample_size=10
    ).collect()))
    assert a == b
    assert len(a) == 3


def test_ivf_centroid_artifact_recall(spark):
    """Regression gate on the shipped q44 centroid artifact: recall@5 of the
    k=40 / nprobe=10 IVF path (25% scanned fraction) vs exact top-k must
    stay above the floor measured at artifact-training time — 0.850; floor
    0.8 allows retraining jitter (guards against a silently degraded
    regeneration of queries/ivf_centroids.py)."""
    from pyspark.sql import functions as F

    from cosmo_spark.operators.similarity import cosine_topk, ivf_cosine_topk
    from cosmo_spark.queries.ivf_centroids import IVF_CENTROIDS

    # sf0.01 is the training corpus of the artifact
    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = spark.createDataFrame(
        [(i, c) for i, c in enumerate(IVF_CENTROIDS)],
        "bucket INT, centroid ARRAY<DOUBLE>",
    )
    q = e.filter(F.col("vec_id") < 8)
    approx = {(r.query_id, r.neighbor_id) for r in
              ivf_cosine_topk(e, q, cents, "embedding", "vec_id", k=5, nprobe=10).collect()}
    exact = {(r.query_id, r.neighbor_id) for r in
             cosine_topk(e, q, "embedding", "vec_id", k=5).collect()}
    assert len(approx & exact) / len(exact) >= 0.8
