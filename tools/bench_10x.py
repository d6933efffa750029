"""Merge bench detail files (sf0.1 and the 10x replication at /tmp/sf1,
each written by bench.py as BENCH_LOCAL.json) into BENCH_10X.json — the
full-catalog 10x scale certification the round-10 verdict asked for:
per-query (sf0.1 s, sf1 s, ratio), setup comparison, and the outlier
list (ratio > THRESHOLD) that SCALE.md must root-cause.

Usage: python tools/bench_10x.py <bench_sf01.json> <bench_sf1.json>
           [<bench_sf1d.json>]

The optional third detail file is the --distinct-dups twin (make_10x.py
--distinct-dups -> /tmp/sf1d: same 10x volume, ORIGINAL duplicate
density); when given, the artifact carries its per-query ratios under
"distinct_dups" so the whole certification regenerates in one
invocation per round (round-11 verdict #4: the cert must roll forward
to the full current catalog at every close)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

THRESHOLD = 5.0


def main() -> None:
    base = json.loads(Path(sys.argv[1]).read_text())
    ten = json.loads(Path(sys.argv[2]).read_text())
    rows = {}
    for name, b in sorted(base["queries"].items()):
        t = ten["queries"].get(name)
        if t is None:
            continue
        ratio = round(t / b, 2) if b > 0 else None
        rows[name] = {"sf0.1_s": b, "sf1_s": t, "ratio": ratio}
    outliers = sorted(
        (
            (name, r["ratio"])
            for name, r in rows.items()
            if r["ratio"] is not None and r["ratio"] > THRESHOLD
        ),
        key=lambda kv: -kv[1],
    )
    doc = {
        "metric": "catalog_10x_ratio",
        "protocol": (
            "tools/make_10x.py /root/testdata/sf0.1 /tmp/sf1 (fact tables "
            "replicated 10x with shifted keys, dimensions 1x, text/vector "
            "payloads verbatim -> near-dup density is also 10x); bench.py "
            "per-query minimums at each scale, local[32]"
        ),
        "repeats": {"sf0.1": base["repeats"], "sf1": ten["repeats"]},
        "sum_of_mins": {
            "sf0.1": base["sum_of_mins"],
            "sf1": ten["sum_of_mins"],
            "ratio": round(ten["sum_of_mins"] / base["sum_of_mins"], 2),
        },
        "setup_sec": {"sf0.1": base["setup_sec"], "sf1": ten["setup_sec"]},
        "threshold": THRESHOLD,
        "outliers": [
            {"query": n, "ratio": r, **rows[n]} for n, r in outliers
        ],
        "queries": rows,
    }
    if len(sys.argv) > 3:
        tend = json.loads(Path(sys.argv[3]).read_text())
        doc["distinct_dups"] = {
            "protocol": (
                "tools/make_10x.py --distinct-dups (bijective per-copy "
                "word rename + embedding rotation: same 10x volume, "
                "ORIGINAL duplicate density) — separates data-volume cost "
                "from true-pair volume for the near-dup family"
            ),
            "repeats": tend["repeats"],
            "sum_of_mins": {
                "sf1d": tend["sum_of_mins"],
                "ratio_vs_sf0.1": round(
                    tend["sum_of_mins"] / base["sum_of_mins"], 2
                ),
            },
            "queries": {
                name: {
                    "sf1d_s": t,
                    "ratio_vs_sf0.1": (
                        round(t / base["queries"][name], 2)
                        if base["queries"].get(name) else None
                    ),
                }
                for name, t in sorted(tend["queries"].items())
                if name in base["queries"]
            },
        }
    out = Path(__file__).resolve().parent.parent / "BENCH_10X.json"
    out.write_text(json.dumps(doc, indent=1) + "\n")
    print(f"wrote {out}: {len(rows)} queries, "
          f"sum ratio {doc['sum_of_mins']['ratio']}, "
          f"{len(outliers)} outliers > {THRESHOLD}x")
    for n, r in outliers:
        print(f"  {n}: {rows[n]['sf0.1_s']} -> {rows[n]['sf1_s']} ({r}x)")


if __name__ == "__main__":
    main()
