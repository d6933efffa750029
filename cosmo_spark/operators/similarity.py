"""Similarity search over embedding columns.

Two strategies:
- ``cosine_topk``     — brute-force exact top-k: broadcast the (small) query
                        set against the corpus, per-row JVM dot products,
                        window top-k.  The baseline; exact.
- ``ivf_cosine_topk`` — IVF-style approximate top-k: corpus is bucketed by
                        nearest centroid (coarse quantizer); queries probe
                        only ``nprobe`` buckets.  The 100 TB path: the
                        corpus-side join key prunes most of the corpus before
                        any dot product runs.

Both keep all arithmetic in zip_with/aggregate expressions — no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cosmo_spark.functions.vectors import as_double


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, cos_sim, rank); deterministic tiebreak on
    neighbor id.  Queries are broadcast — corpus never shuffles.
    """
    from cosmo_spark.functions.vectors import dot, l2_norm

    # norms computed once per vector BEFORE the pair join — per-pair work is
    # a single dot product, not dot + two norm re-walks
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("q_vec")
    ).withColumn("q_norm", l2_norm("q_vec"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("c_vec")
    ).withColumn("c_norm", l2_norm("c_vec"))
    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    denom = F.col("q_norm") * F.col("c_norm")
    scored = pairs.withColumn(
        "cos_sim", F.when(denom > 0, dot("q_vec", "c_vec") / denom)
    )
    return _grouped_topk(scored, k)


def _grouped_topk(scored: DataFrame, k: int) -> DataFrame:
    """Two-phase per-query top-k over (query_id, neighbor_id, cos_sim) rows.

    A single window partitioned by query_id funnels EVERY scored pair into
    one reducer per query — with a handful of queries that is a handful of
    reducers ranking the whole corpus.  Phase 1 ranks within (query_id,
    input partition), spreading the same shuffle volume across
    queries x partitions reducers and keeping at most k rows per group;
    phase 2 ranks the surviving queries x partitions x k rows — driver-
    trivial.  The union of per-partition top-ks contains the global top-k,
    so results are identical, tiebreaks included.
    """
    w_local = Window.partitionBy("query_id", "__pid").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    local = (
        scored.withColumn("__pid", F.spark_partition_id())
        .withColumn("__rn", F.row_number().over(w_local))
        .filter(F.col("__rn") <= k)
    )
    w_global = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w_global))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def assign_buckets(
    df: DataFrame, centroids: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF coarse quantizer).

    ``centroids`` must have (bucket, centroid) columns; it is broadcast.

    The argmax is a ``max_by`` aggregation, not a per-vector Window: after
    the broadcast cross join, all k candidate rows of a vector sit in the
    same partition, so partial aggregation collapses them to ONE row per
    vector map-side — the exchange carries n rows instead of the n·k a
    row_number window would shuffle (with the full vectors riding along,
    that factor is the whole corpus k times over at 100 TB).  Tie semantics
    match the former window exactly: highest similarity, then lowest
    bucket; a zero-norm vector (similarity undefined for every centroid)
    keeps the lowest bucket id rather than dropping.
    """
    from cosmo_spark.functions.vectors import dot, l2_norm

    # norms bound once per vector / per centroid below the join — the
    # per-pair expression is a single dot product
    v = df.select(
        F.col(id_col).alias("__id"), as_double(F.col(vec_col)).alias("__v")
    ).withColumn("__vn", l2_norm("__v"))
    c = centroids.select(
        "bucket", as_double(F.col("centroid")).alias("__c")
    ).withColumn("__cn", l2_norm("__c"))
    denom = F.col("__vn") * F.col("__cn")
    scored = v.crossJoin(F.broadcast(c)).withColumn(
        "__sim", F.when(denom > 0, dot("__v", "__c") / denom)
    )
    # order key (sim desc, bucket asc) as a maximized struct; NULL sims sort
    # below every real similarity via the -2 sentinel (cosine >= -1)
    order_key = F.struct(
        F.coalesce(F.col("__sim"), F.lit(-2.0)).alias("s"),
        (-F.col("bucket")).alias("nb"),
    )
    return (
        scored.groupBy("__id")
        .agg(
            F.max_by(F.col("bucket"), order_key).alias("bucket"),
            F.first("__v").alias(vec_col),
        )
        .select(F.col("__id").alias(id_col), vec_col, "bucket")
    )


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """Approximate top-k: probe only the ``nprobe`` nearest buckets per query.

    Scale: corpus is bucketed once (and would be written bucketed-by(bucket)
    at rest); each query joins to ~nprobe/num_buckets of the corpus.  Recall
    depends on centroid quality — callers supply centroids (e.g. sampled +
    k-means offline).
    """
    bucketed_corpus = assign_buckets(corpus, centroids, vec_col, id_col)
    from cosmo_spark.functions.vectors import l2_norm, dot

    probed = probe_buckets(queries, centroids, vec_col, id_col, nprobe)
    pairs = (
        bucketed_corpus.withColumnRenamed(id_col, "neighbor_id")
        .withColumn("__nn", l2_norm(vec_col))  # once per corpus row, below the join
        .join(F.broadcast(probed), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    s_denom = F.col("__qn") * F.col("__nn")
    scored = pairs.withColumn(
        "cos_sim", F.when(s_denom > 0, dot("q_vec", vec_col) / s_denom)
    )
    # same two-phase re-rank as the exact path: probed candidates rank
    # locally per (query, partition) before the per-query reduction
    return _grouped_topk(scored, k)

def probe_buckets(
    queries: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    id_col: str,
    nprobe: int,
) -> DataFrame:
    """(query_id, q_vec, __qn, bucket): each query's ``nprobe`` nearest
    coarse-quantizer buckets by cosine (sim desc, bucket asc ties) — the
    probe set shared by the float IVF path (ivf_cosine_topk) and the
    IVF-PQ path (operators/pq.ivf_pq_topk).  The rank window partitions by
    query over the tiny queries×k candidate frame."""
    from cosmo_spark.functions.vectors import dot, l2_norm

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("q_vec")
    ).withColumn("__qn", l2_norm("q_vec"))
    c_dim = centroids.select(
        "bucket", as_double(F.col("centroid")).alias("__c")
    ).withColumn("__cn", l2_norm("__c"))
    p_denom = F.col("__qn") * F.col("__cn")
    scored = (
        q.crossJoin(F.broadcast(c_dim))
        .withColumn("__sim", F.when(p_denom > 0, dot("q_vec", "__c") / p_denom))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("bucket").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "q_vec", "__qn", "bucket")
    )
