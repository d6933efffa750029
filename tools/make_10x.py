"""Build the 10x scaling dataset used by docs/SCALE.md's measured table.

Replicates sf0.1 ten times with shifted keys (DuckDB, no Spark needed):
fact-side tables get 10 copies with disjoint key ranges (foreign keys
shifted consistently so join cardinalities scale honestly), dimension
tables stay single-copy.  Text/vector payloads are copied VERBATIM, so
near-dup detectors see every document as part of a 10-duplicate group —
the SCALE.md notes call out which ratios are workload-induced by that
density rather than corpus size.

Usage: python tools/make_10x.py [src_dir] [out_dir]   (defaults:
/root/testdata/sf0.1 -> /tmp/sf10x)
"""

from __future__ import annotations

import os
import sys

import duckdb

#: table -> {column: per-copy shift}; absent tables copy once, unshifted
SHIFTS: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": 10_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "lineitem": {"l_orderkey": 100_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
}

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10x"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        sp = os.path.join(src, f"{t}.parquet")
        op = os.path.join(out, f"{t}.parquet")
        shifts = SHIFTS.get(t)
        if not shifts:
            con.execute(f"COPY (SELECT * FROM '{sp}') TO '{op}' (FORMAT PARQUET)")
            print(f"{t}: copied 1x")
            continue
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{sp}'").fetchall()]
        selects = []
        for i in range(10):
            exprs = ", ".join(
                f"{c} + {i * shifts[c]} AS {c}" if c in shifts else c
                for c in cols
            )
            selects.append(f"SELECT {exprs} FROM '{sp}'")
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{op}' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{op}'").fetchone()[0]
        print(f"{t}: 10x -> {n} rows")


if __name__ == "__main__":
    main()
