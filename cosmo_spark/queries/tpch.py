"""Relational query catalog over the synthetic star schema.

Each query re-expresses a cosmo monitor pattern (SURVEY.md §2 operator ids in
``operators=``) on the driver's TPC-H-ish tables, with a DuckDB oracle.
Aggregate doubles are rounded identically on both sides so value hashes match.

Scale notes (100 TB stance) are in each docstring; the common themes:
- dimension joins are broadcast (nation/region/customer/part are dims);
- aggregations rely on Spark's partial (map-side) aggregation;
- global-window constructs (2σ rule) are computed via a scalar aggregate
  broadcast back, not a single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cosmo_spark.queries import register
from cosmo_spark.session import tune_session
from cosmo_spark.sources.tables import load_table
from cosmo_spark.functions.mathkit import hypot_distance


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------- #
# q01 — pricing summary (TPC-H Q1 shape)                                      #
# --------------------------------------------------------------------------- #

@register(
    "q01_pricing_summary",
    operators=("A1", "A4", "P1"),
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS sum_base_price,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
            AS BIGINT) / 10000.0 AS sum_disc_price,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                           * 1000000) AS BIGINT)) AS BIGINT) / 1000000.0
         AS sum_charge,
       round(avg(l_quantity), 6)                                   AS avg_qty,
       round(avg(l_extendedprice), 6)                              AS avg_price,
       round(avg(l_discount), 6)                                   AS avg_disc,
       count(*)                                                    AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aggregate sweep over the fact table (cosmo 'describe'-style
    rollup, ref: cosmo/monitors/acq_monitors.py:64-69).

    Scale: single shuffle on a low-cardinality key after map-side partial
    aggregation; filter is pushed to the parquet scan.
    """
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    # sums as per-row integer units (exact below 2^53 per row, int64 sums
    # order-free), divided once: round(sum(...), k) over billion-scale sums
    # can flip on half-decimal ties between engines (docs/PARITY.md rule 3)
    def exact_sum(col, k):
        return F.sum(F.round(col * 10**k).cast("long")) / float(10**k)

    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(F.col("l_quantity"), 2).alias("sum_qty"),
            exact_sum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            exact_sum(disc_price, 4).alias("sum_disc_price"),
            exact_sum(disc_price * (1 + F.col("l_tax")), 6).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------- #
# q02 — describe-by-group (count/mean/std/quartiles/min/max)                  #
# --------------------------------------------------------------------------- #

@register(
    "q02_group_describe",
    operators=("A1", "A2", "A3", "A7"),
    oracle="""
SELECT l_returnflag,
       count(l_quantity)                              AS n,
       round(avg(l_quantity), 6)                      AS mean_qty,
       round(stddev_samp(l_quantity), 6)              AS std_qty,
       round(min(l_quantity), 4)                      AS min_qty,
       round(quantile_cont(l_quantity, 0.25), 6)      AS p25_qty,
       round(quantile_cont(l_quantity, 0.50), 6)      AS p50_qty,
       round(quantile_cont(l_quantity, 0.75), 6)      AS p75_qty,
       round(max(l_quantity), 4)                      AS max_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def q02_group_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``groupby(...).describe()`` as one aggregation
    (ref: cosmo/monitors/acq_monitors.py:64-69; osm_drift_monitors.py:69-77).

    Uses exact interpolated ``percentile`` (matches DuckDB quantile_cont);
    at 100 TB swap to ``percentile_approx`` — the reference's use is plotting
    bands, where approximate is semantically fine.
    """
    l = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return l.groupBy("l_returnflag").agg(
        F.count(q).alias("n"),
        F.round(F.avg(q), 6).alias("mean_qty"),
        F.round(F.stddev_samp(q), 6).alias("std_qty"),
        F.round(F.min(q), 4).alias("min_qty"),
        F.round(F.percentile(q, 0.25), 6).alias("p25_qty"),
        F.round(F.percentile(q, 0.50), 6).alias("p50_qty"),
        F.round(F.percentile(q, 0.75), 6).alias("p75_qty"),
        F.round(F.max(q), 4).alias("max_qty"),
    )


# --------------------------------------------------------------------------- #
# q03 — compound quality filter + derived projections                         #
# --------------------------------------------------------------------------- #

@register(
    "q03_compound_filter",
    operators=("P2", "P9", "P11", "J1"),
    oracle="""
SELECT l.l_orderkey, l.l_linenumber,
       o.o_orderpriority,
       concat(l.l_returnflag, '-', l.l_linestatus)        AS configuration,
       round(sqrt(l.l_discount * l.l_discount + l.l_tax * l.l_tax), 6) AS distance
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderstatus = 'F'
  AND l.l_quantity >= 30
  AND l.l_discount BETWEEN 0.02 AND 0.08
  AND l.l_extendedprice > 40000
  AND o.o_orderpriority LIKE '%1'
  AND sqrt(l.l_discount * l.l_discount + l.l_tax * l.l_tax) < 0.1
""",
)
def q03_compound_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AcqImage 8-way conjunction filter with derived 'configuration' and
    slew-distance columns (ref: cosmo/monitors/acq_monitors.py:207-223).

    Scale: every conjunct is a pushable predicate; `distance` is evaluated
    post-scan in codegen. Join shuffles on the fact key with AQE sizing.
    """
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    distance = hypot_distance("l_discount", "l_tax")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(
            (F.col("o_orderstatus") == "F")
            & (F.col("l_quantity") >= 30)
            & F.col("l_discount").between(0.02, 0.08)
            & (F.col("l_extendedprice") > 40000)
            & F.col("o_orderpriority").endswith("1")
            & (distance < 0.1)
        )
        .select(
            "l_orderkey", "l_linenumber", "o_orderpriority",
            F.concat_ws("-", "l_returnflag", "l_linestatus").alias("configuration"),
            F.round(distance, 6).alias("distance"),
        )
    )


# --------------------------------------------------------------------------- #
# q04 — 2-sigma outlier rule                                                  #
# --------------------------------------------------------------------------- #

@register(
    "q04_sigma_outliers",
    operators=("P3", "A4"),
    oracle="""
WITH stats AS (
  SELECT avg(value) AS mu, stddev_samp(value) AS sigma FROM events
)
SELECT e.event_id, e.event_type, round(e.value, 6) AS value,
       round((e.value - s.mu) / s.sigma, 6) AS zscore
FROM events e CROSS JOIN stats s
WHERE abs(e.value - s.mu) >= 2 * s.sigma
""",
)
def q04_sigma_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outliers at |x - mean| >= 2σ over the whole series
    (ref: cosmo/monitors/osm_shift_monitors.py:634-638).

    The reference computes the global aggregate in-memory; the naive Spark
    translation is a window-over-empty-partition (single-partition exchange,
    SURVEY.md §7 hard part b). Here the scalar aggregate is computed once and
    cross-joined (Spark broadcasts the 1-row side), keeping the fact scan
    fully parallel.
    """
    e = _t(spark, sf_dir, "events")
    stats = e.agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    return (
        e.crossJoin(F.broadcast(stats))
        .filter(F.abs(F.col("value") - F.col("mu")) >= 2 * F.col("sigma"))
        .select(
            "event_id", "event_type",
            F.round("value", 6).alias("value"),
            F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 6).alias("zscore"),
        )
    )


# --------------------------------------------------------------------------- #
# q05 — broadcast dimension enrichment chain                                  #
# --------------------------------------------------------------------------- #

@register(
    "q05_broadcast_enrich",
    operators=("J2", "J6", "A4"),
    oracle="""
SELECT r.r_name, n.n_name,
       count(*)                      AS n_customers,
       round(avg(c.c_acctbal), 6)    AS avg_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
)
def q05_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-chain enrichment (ref: cosmo ancillary/CRDS lookups,
    cosmo/monitor_helpers.py:147-159, cosmo/filesystem.py:94-154).

    Scale: nation/region are broadcast — zero shuffles before the final
    low-cardinality aggregation.
    """
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_acctbal"),
        )
    )


# --------------------------------------------------------------------------- #
# q06 — fact-to-dim join + segment rollup                                     #
# --------------------------------------------------------------------------- #

@register(
    "q06_orders_by_segment",
    operators=("J1", "A4"),
    oracle="""
SELECT c.c_mktsegment, o.o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment, o.o_orderstatus
""",
)
def q06_orders_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join + rollup (ref: lampflash ⋈ SMS join,
    cosmo/monitors/data_models.py:156-182).

    Scale: customer is 1.5M rows/SF — still broadcastable at warehouse dim
    sizes; falls back to shuffle join under AQE if stats say otherwise.
    """
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # exact-cents sum (docs/PARITY.md rule 3)
            (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0)
             .alias("revenue"),
        )
    )


# --------------------------------------------------------------------------- #
# q07 — semi join                                                             #
# --------------------------------------------------------------------------- #

@register(
    "q07_semi_join",
    operators=("J3", "J4"),
    oracle="""
SELECT l_returnflag, count(*) AS n
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
GROUP BY l_returnflag
""",
)
def q07_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join via IN-list (ref: SMSTable rootname semi-join,
    cosmo/monitors/data_models.py:157-161; match_dfs
    cosmo/monitors/osm_shift_monitors.py:50-52).

    Scale: broadcast left-semi — the filtered dim side is tiny.
    """
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") > 40)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------- #
# q08 — anti join (incremental discovery)                                     #
# --------------------------------------------------------------------------- #

@register(
    "q08_anti_join",
    operators=("J5", "O3"),
    oracle="""
SELECT c.c_mktsegment, count(*) AS n_idle_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_mktsegment
""",
)
def q08_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join — the reference's incremental 'new files only' discovery
    (ref: cosmo/monitors/data_models.py:62-77; cosmo/sms/ingest_sms.py:288-294).

    Scale: this is the batch formulation; the streaming layer
    (cosmo_spark.streaming) replaces it with checkpointed file tracking so
    the ingest log never has to be re-joined at 100 TB.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_idle_customers"))
    )


# --------------------------------------------------------------------------- #
# q09 — paired-series diff (segment-diff analog)                              #
# --------------------------------------------------------------------------- #

@register(
    "q09_paired_diff",
    operators=("J7",),
    oracle="""
SELECT user_id,
       round(avg(CASE WHEN event_type = 'click' THEN value END)
             - avg(CASE WHEN event_type = 'error' THEN value END), 6) AS pair_diff
FROM events
GROUP BY user_id
HAVING count(CASE WHEN event_type = 'click' THEN 1 END) > 0
   AND count(CASE WHEN event_type = 'error' THEN 1 END) > 0
""",
)
def q09_paired_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired-segment differencing (ref: compute_segment_diff,
    cosmo/monitors/osm_shift_monitors.py:55-86): pair two series per key and
    subtract. Formulated as conditional aggregation — one shuffle, no
    self-join. (The positional array form lives in
    cosmo_spark.operators.segment_diff with its own tests.)
    """
    e = _t(spark, sf_dir, "events")
    click = F.when(F.col("event_type") == "click", F.col("value"))
    error = F.when(F.col("event_type") == "error", F.col("value"))
    return (
        e.groupBy("user_id")
        .agg(
            F.round(F.avg(click) - F.avg(error), 6).alias("pair_diff"),
            F.count(click).alias("__nc"),
            F.count(error).alias("__ne"),
        )
        .filter((F.col("__nc") > 0) & (F.col("__ne") > 0))
        .drop("__nc", "__ne")
    )


# --------------------------------------------------------------------------- #
# q10 — latest-version-per-key (top-1 per group)                              #
# --------------------------------------------------------------------------- #

@register(
    "q10_latest_per_key",
    operators=("A8", "O4"),
    oracle="""
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS latest_date
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
""",
)
def q10_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-version-per-group (ref: SMS max-version filter,
    cosmo/sms/ingest_sms.py:274-280) via operators.topk.latest_per_key.

    Deterministic tiebreak on the unique key — never rely on row order.
    Scale: the operator's max_by aggregation resolves each key's winner
    map-side, so the one shuffle carries ~one row per key rather than
    every order of every customer riding through a row_number window.
    """
    from cosmo_spark.operators.topk import latest_per_key

    o = _t(spark, sf_dir, "orders")
    latest = latest_per_key(o, "o_custkey", ["o_orderdate", "o_orderkey"])
    return latest.select(
        "o_custkey", "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("latest_date"),
    )


# --------------------------------------------------------------------------- #
# q11 — fixed-width histogram                                                 #
# --------------------------------------------------------------------------- #

@register(
    "q11_histogram",
    operators=("A5",),
    oracle="""
SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bin,
       count(*) AS n
FROM lineitem
GROUP BY 1
""",
)
def q11_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram as group-by-bin (ref: np.histogram(bins=100),
    cosmo/monitors/dark_monitors.py:386-420).

    Scale: map-side combine makes this one tiny shuffle regardless of input
    size; no driver-side binning.
    """
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy(
            F.floor(F.col("l_extendedprice") / 5000).cast("long").alias("bin")
        ).agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------- #
# q12 — quantile bands + moments per group                                    #
# --------------------------------------------------------------------------- #

@register(
    "q12_quantile_bands",
    operators=("A6", "A7"),
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.005), 6) AS p005,
       round(quantile_cont(value, 0.5), 6)   AS p50,
       round(quantile_cont(value, 0.95), 6)  AS p95,
       round(quantile_cont(value, 0.995), 6) AS p995,
       round(avg(value), 6)                  AS mean_v,
       round(stddev_samp(value), 6)          AS std_v
FROM events
GROUP BY event_type
""",
)
def q12_quantile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile bands + σ lines (ref: telemetry 0.5%/99.5% band,
    cosmo/monitors/telemetry_monitors.py:165-170; dark CDF cuts,
    cosmo/monitors/dark_monitors.py:402-420)."""
    e = _t(spark, sf_dir, "events")
    v = F.col("value")
    return e.groupBy("event_type").agg(
        F.round(F.percentile(v, 0.005), 6).alias("p005"),
        F.round(F.percentile(v, 0.5), 6).alias("p50"),
        F.round(F.percentile(v, 0.95), 6).alias("p95"),
        F.round(F.percentile(v, 0.995), 6).alias("p995"),
        F.round(F.avg(v), 6).alias("mean_v"),
        F.round(F.stddev_samp(v), 6).alias("std_v"),
    )


# --------------------------------------------------------------------------- #
# q26 — version-guarded merge semantics                                       #
# --------------------------------------------------------------------------- #

@register(
    "q26_version_merge",
    operators=("S16", "ST3", "A8"),
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS version FROM orders
), updates AS (
  SELECT o_orderkey, o_orderstatus, round(o_totalprice * 1.1, 4) AS o_totalprice,
         2 AS version
  FROM orders WHERE o_orderkey % 10 = 0
), unioned AS (
  SELECT * FROM base UNION ALL SELECT * FROM updates
), merged AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey
                               ORDER BY version DESC) AS rn
  FROM unioned
)
SELECT o_orderstatus, count(*) AS n,
       CAST(sum(CAST(round(o_totalprice * 10000) AS BIGINT)) AS BIGINT) / 10000.0
         AS total,
       CAST(sum(version) AS BIGINT) AS version_sum
FROM merged WHERE rn = 1
GROUP BY o_orderstatus
""",
)
def q26_version_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version-guarded upsert, expressed set-based (ref: SMS
    ``INSERT ... ON CONFLICT ... WHERE EXCLUDED.VERSION > VERSION``,
    cosmo/sms/ingest_sms.py:154-198).  The storage-side MERGE equivalent
    lives in cosmo_spark.operators.merge; this query verifies the supersede
    semantics end-to-end: newer version wins, unmatched keys insert.
    """
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    base = o.withColumn("version", F.lit(1))
    updates = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.round(F.col("o_totalprice") * 1.1, 4))
        .withColumn("version", F.lit(2))
    )
    unioned = base.unionByName(updates)
    # max_by top-1 (operators/topk discipline): the supersede resolves
    # map-side, one shuffle row per key — versions are distinct, so no tie
    from cosmo_spark.operators.topk import latest_per_key

    merged = latest_per_key(unioned, "o_orderkey", ["version"])
    # per-row integer e4 units summed exactly (order-free), divided once:
    # round(sum(...), 4) on a ~1e10 sum can land on a half-decimal tie and
    # flip between engines (observed at sf0.1)
    e4 = F.round(F.col("o_totalprice") * 10000).cast("long")
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(e4) / 10000.0).alias("total"),
        F.sum("version").alias("version_sum"),
    )


# --------------------------------------------------------------------------- #
# q19 — union with differing column sets                                      #
# --------------------------------------------------------------------------- #

@register(
    "q19_union_by_name",
    operators=("U1", "U2"),
    oracle="""
WITH a AS (
  SELECT c_custkey, c_mktsegment, c_acctbal, NULL::VARCHAR AS c_name
  FROM customer WHERE c_acctbal > 5000
), b AS (
  SELECT c_custkey, c_mktsegment, NULL::DOUBLE AS c_acctbal, c_name
  FROM customer WHERE c_acctbal <= 5000
)
SELECT c_mktsegment,
       count(*) AS n,
       count(c_acctbal) AS n_with_bal,
       count(c_name) AS n_with_name
FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
GROUP BY c_mktsegment
""",
)
def q19_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of frames with differing column sets — pandas
    ``concat(sort=True)`` alignment (ref: cosmo/monitor_helpers.py:111-144,
    stored ∪ new monitor data) → ``unionByName(allowMissingColumns=True)``."""
    c = _t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_mktsegment", "c_acctbal")
    b = c.filter(F.col("c_acctbal") <= 5000).select("c_custkey", "c_mktsegment", "c_name")
    u = a.unionByName(b, allowMissingColumns=True)
    return u.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("c_acctbal").alias("n_with_bal"),
        F.count("c_name").alias("n_with_name"),
    )


# --------------------------------------------------------------------------- #
# q27 — region fan-out (literal ranges, one pass)                             #
# --------------------------------------------------------------------------- #

@register(
    "q27_region_fanout",
    operators=("U4", "P4", "P5"),
    oracle="""
WITH regions AS (
  SELECT * FROM (VALUES (0, 0.0, 20.0), (1, 20.0, 40.0), (2, 40.0, 60.0),
                        (3, 60.0, 80.0), (4, 80.0, 1e9)) t(region, lo, hi)
)
SELECT r.region, e.event_type, count(*) AS n, round(avg(e.value), 6) AS avg_value
FROM events e JOIN regions r ON e.value >= r.lo AND e.value < r.hi
GROUP BY r.region, e.event_type
""",
)
def q27_region_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detector-region fan-out in one pass (ref: 5-region dark aggregation
    loop + concat, cosmo/monitors/dark_monitors.py:159-190): regions become a
    broadcast literal table with a range predicate — the per-region Python
    loop disappears into a single scan."""
    e = _t(spark, sf_dir, "events")
    # literal dim via SQL VALUES: stays JVM-side (createDataFrame would route
    # through Python-RDD serialization and spin up Python workers)
    regions = spark.sql(
        "SELECT * FROM VALUES (0, 0.0D, 20.0D), (1, 20.0D, 40.0D), "
        "(2, 40.0D, 60.0D), (3, 60.0D, 80.0D), (4, 80.0D, 1e9D) AS t(region, lo, hi)"
    )
    return (
        e.join(
            F.broadcast(regions),
            (e.value >= regions.lo) & (e.value < regions.hi),
        )
        .groupBy("region", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


# --------------------------------------------------------------------------- #
# q94 — ROLLUP grouping sets (multi-level OLAP subtotals)                     #
# --------------------------------------------------------------------------- #

@register(
    "q94_revenue_rollup",
    operators=("A4", "J1", "U2"),
    oracle="""
SELECT r_name AS region_name, n_name AS nation_name,
       GROUPING(r_name, n_name) AS lvl,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
         AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
HAVING count(*) > 0
""",
)
def q94_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — the multi-level subtotal shape (nation
    subtotals, region subtotals, grand total) every OLAP surface exposes
    and the catalog previously lacked.  ``grouping_id`` disambiguates a
    rollup NULL from a genuine NULL key, matching DuckDB's GROUPING
    bitmask.

    Scale shape: Catalyst plans rollup as ONE scan with an Expand (one
    replica per grouping set) feeding a single partial-combining hash
    aggregate — subtotals cost one extra exchange-input replica, never a
    second scan.  Revenue sums exact integer cents (PARITY rule 3: float
    sum-order ulps land on rounding ties at scale) and divides once.

    The oracle carries ``HAVING count(*) > 0``: SQL-standard ROLLUP over
    an EMPTY relation still emits the grand-total row (DuckDB does) while
    Spark's rollup returns no rows — and since every grouping-set row
    over non-empty input aggregates >= 1 row, the HAVING only strips that
    empty-input phantom, aligning the engines without touching real data.
    """
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    return (
        j.rollup("region_name", "nation_name")
        .agg(
            F.grouping_id().cast("long").alias("lvl"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("cents") / F.lit(100.0), 2).alias("revenue"),
        )
        .select("region_name", "nation_name", "lvl", "n_orders", "revenue")
    )


# --------------------------------------------------------------------------- #
# q95 — pivot (wide reshape: months x event types)                            #
# --------------------------------------------------------------------------- #

_PIVOT_TYPES = ("view", "click", "purchase", "signup", "error")


@register(
    "q95_event_pivot",
    operators=("A4", "P11"),
    oracle=f"""
SELECT strftime(ts, '%Y-%m') AS month,
       {", ".join(
           f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}"
           for t in _PIVOT_TYPES
       )}
FROM events WHERE ts IS NOT NULL
GROUP BY month
""",
)
def q95_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot — the wide reshape (rows: month, columns: event type) the
    catalog previously lacked.  The pivot values are an EXPLICIT literal
    list: without one Spark runs an extra distinct job over the corpus to
    discover columns and the output schema becomes data-dependent — the
    q55 "bound the geometry" discipline applied to reshaping.

    Scale shape: pivot-with-known-values compiles to one partial-
    combining hash aggregate of conditional counts (identical to the
    oracle's CASE sums) — one exchange of (month × 5) cells, no second
    scan, no wide-row shuffle.
    """
    e = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    out = (
        e.withColumn("month", F.date_format("ts", "yyyy-MM"))
        .groupBy("month")
        .pivot("event_type", list(_PIVOT_TYPES))
        .count()
    )
    return out.select(
        "month",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _PIVOT_TYPES],
    )
