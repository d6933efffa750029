"""Embedding / similarity-search query catalog (training-data pipeline ops).

All vector math is zip_with/aggregate expressions over array<double> casts so
DuckDB list expressions reproduce it exactly (element-order summation on both
sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmo_spark.queries import register
from cosmo_spark.session import tune_session
from cosmo_spark.sources.tables import load_table
from cosmo_spark.functions.arrays import array_max, array_mean, array_std, rel_to_first
from cosmo_spark.functions.vectors import as_double
from cosmo_spark.operators.similarity import cosine_topk
from cosmo_spark.operators.dedup import embedding_near_dups


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, name)


@register(
    "q30_array_stats",
    operators=("A10",),
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       round(list_sum(CAST(embedding AS DOUBLE[])) / len(embedding), 6) AS vec_mean,
       round(sqrt(greatest(
               (list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))
                - list_sum(CAST(embedding AS DOUBLE[]))
                  * list_sum(CAST(embedding AS DOUBLE[])) / len(embedding))
               / (len(embedding) - 1), 0.0)), 6) AS vec_std,
       round(list_max(CAST(embedding AS DOUBLE[])), 6) AS vec_max
FROM embeddings
""",
)
def q30_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row array statistics via higher-order functions — the jitter
    ``reduce_to_stat`` pattern (ref: cosmo/filesystem.py:255-278) with no
    explode/regroup shuffle and no UDF."""
    e = _t(spark, sf_dir, "embeddings")
    v = as_double(F.col("embedding"))
    return e.select(
        "vec_id",
        F.size(v).cast("long").alias("dim"),
        F.round(array_mean(v), 6).alias("vec_mean"),
        F.round(array_std(v), 6).alias("vec_std"),
        F.round(array_max(v), 6).alias("vec_max"),
    )


@register(
    "q31_array_projections",
    operators=("P12", "P13", "P8"),
    oracle="""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
SELECT vec_id,
       round(e[1], 6)                           AS first_el,
       round(e[len(e)], 6)                      AS last_el,
       round(list_sum(list_transform(e[2:], x -> x - e[1])), 6) AS rel_sum,
       len(list_filter(e, x -> x > 0))          AS n_positive
FROM v
""",
)
def q31_array_projections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-element and relative-array projections (ref: XC_RANGE[0] unpack,
    cosmo/monitors/osm_shift_monitors.py:626-627; REL_SHIFT = SHIFT[1:] -
    SHIFT[0], cosmo/monitors/osm_drift_monitors.py:21-40)."""
    e = _t(spark, sf_dir, "embeddings")
    v = as_double(F.col("embedding"))
    rel = rel_to_first(v)
    return e.select(
        "vec_id",
        F.round(F.element_at(v, 1), 6).alias("first_el"),
        F.round(F.element_at(v, -1), 6).alias("last_el"),
        F.round(F.aggregate(rel, F.lit(0.0), lambda a, x: a + x), 6).alias("rel_sum"),
        F.size(F.filter(v, lambda x: x > 0)).cast("long").alias("n_positive"),
    )


@register(
    "q32_cosine_topk",
    operators=("SIM1",),
    oracle="""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT * FROM v WHERE vec_id < 8),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_sum(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2]))
           / (sqrt(list_sum(list_transform(q.e, x -> x * x)))
              * sqrt(list_sum(list_transform(c.e, x -> x * x)))) AS sim
  FROM q CROSS JOIN v c WHERE q.vec_id <> c.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, round(sim, 6) AS cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5
""",
)
def q32_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-k — the ANN baseline.  Query set is
    broadcast; corpus scan stays shuffle-free until the final tiny top-k
    window.  The bucketed scale path is operators.similarity.ivf_cosine_topk."""
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 8)
    out = cosine_topk(e, queries, "embedding", "vec_id", k=5)
    return out.select(
        "query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("long").alias("rank"),
    )


@register(
    "q33_embedding_near_dup",
    operators=("DD5",),
    oracle="""
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_sum(list_transform(list_zip(a.e, b.e), p -> p[1] * p[2]))
           / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
              * sqrt(list_sum(list_transform(b.e, x -> x * x)))) AS sim
  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, round(sim, 6) AS cos_sim
FROM pairs WHERE sim >= 0.90
""",
)
def q33_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection, blocked by label — the
    blocking key stands in for an LSH bucket: the quadratic join only runs
    within blocks (the 100 TB pattern)."""
    e = _t(spark, sf_dir, "embeddings")
    out = embedding_near_dups(
        e, "embedding", "vec_id", threshold=0.90, block_col="label"
    )
    return out.select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
