"""Hot-key-skew parity sweep: every catalog query must agree with its
DuckDB oracle when group/join keys are heavily skewed — 80% of documents
collapse onto one source and 80% of events onto one user, the shape that
breaks naive per-key windows and exposes order-dependent aggregation
differences (and, at scale, the shape AQE skew-join handling exists for).

Formerly a one-shot script (round-4 COVERAGE); now a marked pytest sweep
so every future query is auto-covered, like the null/empty sweeps.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

from cosmo_spark.queries import all_queries
from tools.parity import compare, duck_con

pytestmark = pytest.mark.sweeps

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("sfskew")
    con = duckdb.connect()
    for p in glob.glob(f"{SRC}/*.parquet"):
        name = os.path.basename(p)
        if name == "documents.parquet":
            con.execute(f"""
            COPY (SELECT doc_id, text, lang,
                         CASE WHEN doc_id % 5 != 0 THEN 'hot_source'
                              ELSE source END AS source,
                         n_chars
                  FROM '{p}') TO '{out / name}' (FORMAT PARQUET)""")
        elif name == "events.parquet":
            con.execute(f"""
            COPY (SELECT event_id, ts,
                         CASE WHEN event_id % 5 != 0 THEN 1
                              ELSE user_id END AS user_id,
                         event_type, value, props
                  FROM '{p}') TO '{out / name}' (FORMAT PARQUET)""")
        else:
            con.execute(
                f"COPY (SELECT * FROM '{p}') TO '{out / name}' (FORMAT PARQUET)"
            )
    return str(out)


@pytest.fixture(scope="module")
def scon(skew_dir):
    return duck_con(skew_dir)


def _names():
    return [n for n, q in all_queries().items() if q.oracle]


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle_with_skew(spark, skew_dir, scon, name):
    q = all_queries()[name]
    sdf = q.spark_fn(spark, skew_dir)
    problems = compare(name, sdf, scon, q.oracle)
    assert not problems, problems
