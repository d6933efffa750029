"""Duplicate-injection parity sweep: every catalog query must agree with
its DuckDB oracle when the corpus carries exact duplicate rows — dup PAIRS
and TRIPLES of documents (identical text/lang/source under fresh doc_ids)
and exact-copy embeddings — stressing every tiebreak the catalog relies on
(latest-per-key order keys, neighbor_id tie ordering in ANN ranks, dedup
keep-lowest-id rules, rank windows with unique-tiebreak specs).

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
def dups_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("sfdups")
    con = duckdb.connect()
    for p in glob.glob(f"{SRC}/*.parquet"):
        name = os.path.basename(p)
        if name == "documents.parquet":
            # every 7th doc gets an exact twin, every 21st a third copy —
            # same text/lang/source, fresh ids far above the real range
            con.execute(f"""
            COPY (
              SELECT * FROM '{p}'
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
              FROM '{p}' WHERE doc_id % 7 = 0
              UNION ALL
              SELECT doc_id + 2000000 AS doc_id, text, lang, source, n_chars
              FROM '{p}' WHERE doc_id % 21 = 0
            ) TO '{out / name}' (FORMAT PARQUET)""")
        elif name == "embeddings.parquet":
            con.execute(f"""
            COPY (
              SELECT * FROM '{p}'
              UNION ALL
              SELECT vec_id + 1000000 AS vec_id, embedding, label
              FROM '{p}' WHERE vec_id % 9 = 0
            ) TO '{out / name}' (FORMAT PARQUET)""")
        else:
            con.execute(
                f"COPY (SELECT * FROM '{p}') TO '{out / name}' (FORMAT PARQUET)"
            )
    return str(out)


@pytest.fixture(scope="module")
def dcon(dups_dir):
    return duck_con(dups_dir)


def _names():
    return [n for n, q in all_queries().items() if q.oracle]


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle_with_dups(spark, dups_dir, dcon, name):
    q = all_queries()[name]
    sdf = q.spark_fn(spark, dups_dir)
    problems = compare(name, sdf, dcon, q.oracle)
    assert not problems, problems
