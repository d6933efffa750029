"""Deterministic Lloyd k-means over embedding columns — IVF centroid
training as an iterative DataFrame algorithm.

Same discipline as duplicate_clusters: bounded driver loop, one shuffle per
iteration (the per-centroid positional mean), lineage truncated with
localCheckpoint.  Determinism: seeds are the vectors whose content hash is
smallest (no RNG), ties broken by id; assignment ties broken by bucket id.

Centroids are tiny (k × dim doubles) and always broadcast; the corpus never
moves.  At 100 TB you train on a sample and assign the full corpus once,
writing it bucketed-by(bucket) — see operators/similarity.ivf_cosine_topk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cosmo_spark.functions.vectors import as_double
from cosmo_spark.operators.similarity import assign_buckets


def kmeans_centroids(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iterations: int = 3,
) -> DataFrame:
    """Return (bucket, centroid) after ``iterations`` Lloyd steps.

    Seeds: the k vectors with the smallest xxhash64(id) — deterministic and
    spread pseudo-randomly without RNG state.
    """
    from cosmo_spark.functions.vectors import cosine_sim

    base = df.select(
        F.col(id_col).alias("__id"), as_double(F.col(vec_col)).alias("__v")
    )
    spark = df.sparkSession

    # deterministic farthest-point seeding (k-means++ without RNG): first
    # seed = smallest id hash; each next seed = the vector least similar to
    # its nearest chosen seed (naive hash seeding lands multiple seeds in
    # one cluster and Lloyd cannot escape that local minimum)
    first = (
        base.withColumn("__h", F.xxhash64(F.col("__id")))
        .orderBy("__h", "__id").limit(1).collect()[0]
    )
    seeds: list[list[float]] = [list(first["__v"])]
    for _ in range(k - 1):
        seed_df = F.broadcast(spark.createDataFrame(
            [(s,) for s in seeds], "seed ARRAY<DOUBLE>"
        ))
        nearest = (
            base.crossJoin(seed_df)
            .withColumn("__sim", F.coalesce(cosine_sim("__v", "seed"), F.lit(-1.0)))
            .groupBy("__id")
            .agg(F.max("__sim").alias("__near"), F.first("__v").alias("__v"))
            .orderBy(F.col("__near").asc(), F.col("__id").asc())
            .limit(1)
            .collect()[0]
        )
        seeds.append(list(nearest["__v"]))
    centroids = spark.createDataFrame(
        [(i, s) for i, s in enumerate(seeds)],
        "bucket INT, centroid ARRAY<DOUBLE>",
    ).localCheckpoint()

    for _ in range(iterations):
        assigned = assign_buckets(base, centroids, "__v", "__id")
        # positional mean per bucket: explode once, two-level regroup
        pos = assigned.select("bucket", F.posexplode("__v"))
        updated = (
            pos.groupBy("bucket", "pos").agg(F.avg("col").alias("m"))
            .groupBy("bucket")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.m,
                ).alias("new_centroid")
            )
        )
        # empty-cluster guard: a bucket that attracted no vectors keeps its
        # previous centroid instead of silently disappearing
        centroids = (
            centroids.join(updated, "bucket", "left")
            .select(
                "bucket",
                F.coalesce("new_centroid", "centroid").alias("centroid"),
            )
            .localCheckpoint()  # truncate lineage between Lloyd steps
        )
    return centroids
