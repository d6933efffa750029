"""Null-injection parity sweep: every catalog query must agree with its
DuckDB oracle when nullable columns actually carry NULLs (missing text,
unknown language/source, null telemetry readings, absent props).

Null semantics are exactly where engines silently diverge (NULL-input hash
fragments, last(ignorenulls) carries, CASE-over-NULL split assignment — all
three were real divergences this sweep caught when first run), so the gate
runs the full three-way compare on a null-injected copy of sf0.001, not
just on clean data.
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
def nulls_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("sfnulls")
    con = duckdb.connect()
    for p in glob.glob(f"{SRC}/*.parquet"):
        name = os.path.basename(p)
        if name == "documents.parquet":
            con.execute(f"""
            COPY (SELECT doc_id,
                         CASE WHEN doc_id % 11 = 3 THEN NULL ELSE text END AS text,
                         CASE WHEN doc_id % 13 = 4 THEN NULL ELSE lang END AS lang,
                         CASE WHEN doc_id % 17 = 5 THEN NULL ELSE source END AS source,
                         n_chars
                  FROM '{p}') TO '{out / name}' (FORMAT PARQUET)""")
        elif name == "events.parquet":
            con.execute(f"""
            COPY (SELECT event_id, ts, user_id, event_type,
                         CASE WHEN event_id % 19 = 6 THEN NULL ELSE value END AS value,
                         CASE WHEN event_id % 23 = 7 THEN NULL ELSE props END AS props
                  FROM '{p}') TO '{out / name}' (FORMAT PARQUET)""")
        else:
            con.execute(
                f"COPY (SELECT * FROM '{p}') TO '{out / name}' (FORMAT PARQUET)"
            )
    return str(out)


@pytest.fixture(scope="module")
def ncon(nulls_dir):
    return duck_con(nulls_dir)


def _names():
    return [n for n, q in all_queries().items() if q.oracle]


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle_with_nulls(spark, nulls_dir, ncon, name):
    q = all_queries()[name]
    sdf = q.spark_fn(spark, nulls_dir)
    problems = compare(name, sdf, ncon, q.oracle)
    assert not problems, problems
