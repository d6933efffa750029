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


def _farthest_point_seeds(rows, k: int) -> list[list[float]]:
    """Driver-side farthest-point seeding over a small sample.

    ``rows`` are (id, vector) pairs already ordered by (hash, id); the first
    row is the first seed, then each next seed is the sample vector least
    similar (cosine) to its nearest chosen seed — ties broken by id, exactly
    the rule the former per-seed Spark jobs applied corpus-wide.
    """
    import numpy as np

    ids = [r["__id"] for r in rows]
    V = np.asarray([list(r["__v"]) for r in rows], dtype=np.float64)
    norms = np.linalg.norm(V, axis=1)
    order = np.argsort(np.asarray(ids, dtype=object))  # id-asc tiebreak

    def sims_to(seed: "np.ndarray") -> "np.ndarray":
        denom = norms * float(np.linalg.norm(seed))
        with np.errstate(divide="ignore", invalid="ignore"):
            s = (V @ seed) / denom
        return np.where(denom > 0, s, -1.0)  # zero-vector fallback as before

    chosen = [0]
    nearest = sims_to(V[0])
    for _ in range(k - 1):
        # argmin of nearest-sim with id-asc tiebreak
        best = min(order, key=lambda i: (nearest[i], ids[i]))
        chosen.append(int(best))
        nearest = np.maximum(nearest, sims_to(V[best]))
    return [[float(x) for x in V[i]] for i in chosen]


def kmeans_centroids(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iterations: int = 3,
    seed_sample_size: int = 2048,
    seed: int = 0,
) -> DataFrame:
    """Return (bucket, centroid) after ``iterations`` Lloyd steps.

    Seeding is deterministic farthest-point (k-means++ without RNG) over a
    bounded sample: ONE corpus job takes the ``seed_sample_size`` rows with
    the smallest xxhash64(id) (orderBy+limit plans as TakeOrdered — map-side
    partial top-N, no full shuffle), then the k−1 farthest-point picks run
    driver-side on that sample.  Constant driver cost at any corpus size —
    the former per-seed full-corpus jobs serialized k scans through the
    driver.

    ``seed`` rotates the deterministic sample (it salts the hash ordering):
    seed=0 is the historical artifact-regeneration behavior, any other
    value yields a different-but-reproducible quantizer (round-6 verdict
    #5's retrain-at-a-different-seed contract).
    """
    base = df.select(
        F.col(id_col).alias("__id"), as_double(F.col(vec_col)).alias("__v")
    )
    spark = df.sparkSession

    h = (
        F.xxhash64(F.col("__id")) if seed == 0
        else F.xxhash64(F.col("__id"), F.lit(int(seed)))
    )
    sample_rows = (
        base.withColumn("__h", h)
        .orderBy("__h", "__id")
        .limit(max(seed_sample_size, k))
        .collect()
    )
    seeds = _farthest_point_seeds(sample_rows, k)
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
