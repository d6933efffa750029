"""Empty-input robustness: every catalog query must plan and execute over
zero-row tables (fresh deployment, fully-filtered partition, empty incremental
batch) and AGREE WITH ITS ORACLE on the empty result — never raise.

This is the Spark analog of the reference's new-data-may-be-empty guards
(ref: cosmo/monitors/data_models.py `new_data` can be an empty frame when no
files arrived); at scale an empty partition slice hits every one of these
code paths routinely.

Upgraded in r05 from a no-raise smoke to the full three-way DuckDB compare
(the null/dup/skew sweep discipline): the weaker assert let q94's
empty-ROLLUP divergence through — SQL-standard ROLLUP emits a grand-total
row over an empty relation where Spark's rollup emits none.
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
def empty_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("sfempty")
    con = duckdb.connect()
    for p in glob.glob(f"{SRC}/*.parquet"):
        name = os.path.basename(p)
        con.execute(
            f"COPY (SELECT * FROM '{p}' WHERE 1=0) "
            f"TO '{out / name}' (FORMAT PARQUET)"
        )
    return str(out)


@pytest.fixture(scope="module")
def econ(empty_dir):
    return duck_con(empty_dir)


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_matches_oracle_on_empty_tables(spark, empty_dir, econ, name):
    q = all_queries()[name]
    sdf = q.spark_fn(spark, empty_dir)
    if not q.oracle:
        sdf.collect()  # no-raise smoke only: oracle-less queries may
        return         # legitimately emit summary rows on empty input
    problems = compare(name, sdf, econ, q.oracle)
    assert not problems, problems
