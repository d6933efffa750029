"""Local replica of the driver's correctness gate.

Runs every catalog query on Spark and its DuckDB oracle over the same parquet
tables, then compares row count, column names, and (order-insensitively)
values.  Usage:

    python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from cosmo_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t)}.parquet'"
        )
    return con


def normalize(rows, cols):
    """Sort columns by name and rows by repr — order-insensitive compare."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                elif v == 0.0:
                    v = 0.0  # -0.0 -> 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return [cols[i] for i in idx], out


def compare(name, sdf, con, sql, tol=0.0):
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    problems = []
    if sorted(scols) != sorted(dcols):
        problems.append(f"schema: spark={sorted(scols)} duck={sorted(dcols)}")
    if len(srows) != len(drows):
        problems.append(f"rows: spark={len(srows)} duck={len(drows)}")
    if not problems:
        _, sn = normalize(srows, scols)
        _, dn = normalize(drows, dcols)
        ndiff = 0
        first = None
        for a, b in zip(sn, dn):
            if a != b:
                # allow tiny float tolerance reporting
                close = all(
                    (x == y)
                    or (
                        isinstance(x, float)
                        and isinstance(y, (float, int))
                        and abs(x - float(y)) <= tol * max(1.0, abs(x))
                    )
                    for x, y in zip(a, b)
                )
                if not close:
                    ndiff += 1
                    if first is None:
                        first = (a, b)
        if ndiff:
            problems.append(f"values: {ndiff}/{len(sn)} rows differ; first {first}")
    return problems


def main():
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]

    from cosmo_spark.queries import all_queries

    qs = all_queries()
    if args:
        qs = {k: v for k, v in qs.items() if k in args}

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duck_con(sf_dir)

    n_pass = n_fail = n_nooracle = 0
    for name, q in qs.items():
        t0 = time.time()
        try:
            sdf = q.spark_fn(spark, sf_dir)
            if q.oracle is None:
                nrows = sdf.count()
                print(f"  ~  {name}: no oracle ({nrows} rows) [{time.time()-t0:.1f}s]")
                n_nooracle += 1
                continue
            problems = compare(name, sdf, con, q.oracle)
        except Exception as e:
            problems = [f"EXCEPTION: {type(e).__name__}: {str(e)[:300]}"]
        dt = time.time() - t0
        if problems:
            n_fail += 1
            print(f" FAIL {name} [{dt:.1f}s]")
            for p in problems:
                print(f"      {p}")
        else:
            n_pass += 1
            print(f"  ok  {name} [{dt:.1f}s]")
    print(f"\n{n_pass} ok, {n_fail} fail, {n_nooracle} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
