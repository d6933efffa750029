"""Interleaved A/B for q104 (r13 verdict #5): weighted (r13 shape) vs
distributed (r12 shape) grouped median, same session, alternating passes.

Usage: python tools/ab_q104.py [--repeats N]
Env mirrors bench.py: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--out", default="/tmp/ab_q104.json")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from cosmo_spark.operators.robust import (
        grouped_median_distributed,
        grouped_median_weighted,
    )
    from cosmo_spark.session import get_spark
    from cosmo_spark.sources.tables import load_table

    spark = get_spark(
        app_name="ab-q104", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    def weighted():
        e = load_table(spark, sf_dir, "events").filter(
            F.col("value").isNotNull()
        )
        vb = e.groupBy("event_type", "value").agg(
            F.count(F.lit(1)).alias("c")
        )
        med = grouped_median_weighted(vb, "event_type", "value", "c")
        n = vb.groupBy("event_type").agg(F.sum("c").alias("n"))
        return med.join(n, "event_type").select("event_type", "n", "median")

    def distributed():
        e = load_table(spark, sf_dir, "events").filter(
            F.col("value").isNotNull()
        )
        med = grouped_median_distributed(e, "event_type", "value", "event_id")
        n = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        return med.join(n, "event_type").select("event_type", "n", "median")

    variants = {"weighted": weighted, "distributed": distributed}
    # warmup both
    ra = sorted(map(tuple, weighted().collect()))
    rb = sorted(map(tuple, distributed().collect()))
    assert ra == rb, "variants disagree — A/B aborted"
    spark.catalog.clearCache()

    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(args.repeats):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"q104 A/B: {name}")
            t0 = time.time()
            fn().collect()
            times[name].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
    out = {
        k: {"min": min(v), "samples": v} for k, v in times.items()
    }
    Path(args.out).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
