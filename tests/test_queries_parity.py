"""Replica of the driver's correctness gate: every catalog query must match
its DuckDB oracle on the sf0.001 tables (row count, schema, order-insensitive
values)."""

from __future__ import annotations

import pytest

from tools.parity import compare, duck_con

# heavyweight Spark suite: deselected by the default `addopts` fast set so
# the driver's verify completes inside its window (r13 verdict #7); run via
# `pytest -m slow` or the full suite via `pytest --override-ini addopts= tests/`
pytestmark = pytest.mark.slow

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_DIR)


def _query_names():
    from cosmo_spark.queries import all_queries

    return [name for name, q in all_queries().items() if q.oracle]


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, con, name):
    from cosmo_spark.queries import all_queries

    q = all_queries()[name]
    sdf = q.spark_fn(spark, SF_DIR)
    problems = compare(name, sdf, con, q.oracle)
    assert not problems, problems


SPARK2PD = {"bigint": "int64", "int": "int32", "double": "float64",
            "string": "object", "boolean": "bool"}


@pytest.mark.parametrize("name", _query_names())
def test_query_dtype_parity(spark, con, name):
    """Spark column types must map onto the oracle's pandas dtypes — DuckDB
    promotes integer sums to HUGEINT (-> float64), which would silently
    break a type-sensitive value hash even when values match."""
    from cosmo_spark.queries import all_queries

    q = all_queries()[name]
    ddf = con.execute(q.oracle).fetchdf()
    sdf = q.spark_fn(spark, SF_DIR)
    stypes = {
        f.name: SPARK2PD.get(f.dataType.simpleString(), f.dataType.simpleString())
        for f in sdf.schema.fields
    }
    dtypes = dict(ddf.dtypes.astype(str))

    def ok(k: str) -> bool:
        s, d = stypes.get(k), dtypes.get(k)
        if s == d:
            return True
        # pandas has no nullable int64: an outer join's NULL-bearing BIGINT
        # column fetches as float64 on the DuckDB side only (q98's
        # error_id).  The value/hash gate still compares them exactly.
        if s == "int64" and d == "float64" and ddf[k].isna().any():
            return True
        return False

    diffs = {
        k: (stypes.get(k), dtypes.get(k))
        for k in set(stypes) | set(dtypes)
        if not ok(k)
    }
    assert not diffs, diffs


def test_every_query_has_survey_operators():
    from cosmo_spark.queries import all_queries

    for name, q in all_queries().items():
        assert q.operators, f"{name} lacks SURVEY §2 operator ids"


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
    # queries()/oracle_sql() contract: every oracle key exists in queries
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30


def test_q107_small_range_correction_kills_low_cardinality_bias(
    spark, tmp_path
):
    """Round-6 verdict #2: with 10 distinct texts and m=256 registers the
    RAW HLL estimator reads ~19x high (each empty register contributes
    2^0 to the harmonic sum); the linear-counting branch (V empty
    registers -> est = m*ln(m/V)) must bring the estimate within a few
    percent — and the DuckDB oracle must still agree bit-for-bit, since
    ln comes from a shared Python-computed literal table in BOTH
    engines."""
    import duckdb
    import glob
    import os

    src = "/root/testdata/sf0.001"
    con0 = duckdb.connect()
    for p in glob.glob(f"{src}/*.parquet"):
        con0.execute(
            f"COPY (SELECT * FROM '{p}' WHERE 1=0) "
            f"TO '{tmp_path / os.path.basename(p)}' (FORMAT PARQUET)"
        )
    texts = [f"tiny corpus document number {i}" for i in range(10)]
    docs = [(i, texts[i % 10], "en", "web", len(texts[i % 10]))
            for i in range(30)]  # 30 rows, 10 distinct texts
    spark.createDataFrame(
        docs, "doc_id BIGINT, text STRING, lang STRING, source STRING, "
              "n_chars BIGINT"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "docs_tmp"))
    con0.execute(
        f"COPY (SELECT * FROM '{tmp_path}/docs_tmp/*.parquet') "
        f"TO '{tmp_path / 'documents.parquet'}' (FORMAT PARQUET)"
    )

    from cosmo_spark.queries import all_queries

    q = all_queries()["q107_hll_sketch"]
    rows = {r.source: r for r in q.spark_fn(spark, str(tmp_path)).collect()}
    allr = rows["__all__"]
    assert allr.n_exact == 10
    # corrected estimate: 256*ln(256/V); bias must be gone (raw ~ 188)
    assert abs(allr.hll_est - 10) / 10 < 0.10, allr
    assert abs(allr.err_pct) < 10.0
    # and the three-way gate still holds on this corpus
    problems = compare("q107_hll_sketch", q.spark_fn(spark, str(tmp_path)),
                       duck_con(str(tmp_path)), q.oracle)
    assert not problems, problems
