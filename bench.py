"""Benchmark harness: runs the full query catalog and prints ONE JSON line.

    {"metric": "catalog_wall_sec", "value": <total>, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "sf": 0.1}

Env:
    SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    local cores (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from cosmo_spark.session import get_spark
    from cosmo_spark.queries import all_queries

    spark = get_spark(
        app_name="cosmo-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = all_queries()

    # warmup (untimed): JIT the session, register codegen paths, prime the
    # filesystem metadata cache — so per-query numbers reflect steady-state
    # execution rather than one-time JVM start-up costs
    from cosmo_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).limit(1).collect()
    qs["q01_pricing_summary"].spark_fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    t_all = time.time()
    for name, q in qs.items():
        t0 = time.time()
        df = q.spark_fn(spark, sf_dir)
        # force full execution + materialization like the driver's collect
        df.collect()
        timings[name] = round(time.time() - t0, 3)
    total = round(time.time() - t_all, 3)

    print(json.dumps({
        "metric": "catalog_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
