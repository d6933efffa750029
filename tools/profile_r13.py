"""Round-13 measurement harness (guide §1): per-query timing split into
plan-construction vs execution, with optional .explain("formatted") capture.

Usage:
    python tools/profile_r13.py [--plans DIR] [--repeats N] [q165 q125 ...]

Differences from bench.py (which stays the round-over-round artifact):
- times `spark_fn` (driver-side plan construction) separately from the
  collect, so Python/py4j plan-building overhead is visible;
- optionally dumps `.explain("formatted")` per query to --plans DIR;
- runs setup artifacts (ensure_*) once, untimed, so store-backed queries
  measure their steady-state path exactly as bench.py does.

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


def ensure_setup(spark, sf_dir: str) -> None:
    from cosmo_spark.queries.artifacts import resolve_vector_artifacts
    from cosmo_spark.queries.trainprep import _ensure_pq_index

    resolve_vector_artifacts(spark, sf_dir)
    for residual in (False, True):
        _ensure_pq_index(spark, sf_dir, residual)
    from cosmo_spark.sources import multimodal as _mm
    from cosmo_spark.sources.media_fps import ensure_media_fps

    for codec, enc in (("ppm", _mm.encode_pgm_gray8x8),
                       ("wav", _mm.encode_wav_pcm8),
                       ("y4m", _mm.encode_y4m_gray8x8)):
        ensure_media_fps(spark, sf_dir, codec, enc, "vec_id")
    from cosmo_spark.queries.timeseries import (
        ensure_cms_window_log,
        ensure_hdr_window_log,
        ensure_hll_quarantine_log,
        ensure_hll_rebuilt_log,
        ensure_hll_window_log,
        ensure_kmv_window_log,
        ensure_partitioned_purge_demo,
        ensure_purged_events,
    )

    for build in (ensure_hdr_window_log, ensure_hll_window_log,
                  ensure_cms_window_log, ensure_kmv_window_log,
                  ensure_hll_quarantine_log, ensure_hll_rebuilt_log,
                  ensure_purged_events, ensure_partitioned_purge_demo):
        build(spark, sf_dir)
    spark.catalog.clearCache()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query name prefixes (q125); empty = all")
    ap.add_argument("--plans", default=None, help="dir for explain(formatted) dumps")
    ap.add_argument("--suffix", default="before", help="plan file suffix")
    def _pos_int(s: str) -> int:
        v = int(s)
        if v < 1:  # ADVICE r13: repeats < 1 leaves df unbound for --plans
            raise argparse.ArgumentTypeError("--repeats must be >= 1")
        return v

    ap.add_argument("--repeats", type=_pos_int, default=3)
    ap.add_argument("--out", default="/tmp/profile_r13.json")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from cosmo_spark.session import get_spark
    from cosmo_spark.queries import all_queries

    spark = get_spark(
        app_name="cosmo-spark-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = all_queries()
    if args.names:
        pfx = tuple(args.names)
        qs = {k: v for k, v in qs.items()
              if k.startswith(pfx) or k.split("_", 1)[0] in pfx}

    # warmup + setup, untimed
    from cosmo_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).limit(1).collect()
    ensure_setup(spark, sf_dir)
    all_queries()["q01_pricing_summary"].spark_fn(spark, sf_dir).collect()
    spark.catalog.clearCache()

    plans_dir = Path(args.plans) if args.plans else None
    if plans_dir:
        plans_dir.mkdir(parents=True, exist_ok=True)

    results: dict[str, dict] = {}
    for name, q in qs.items():
        build_ts, run_ts = [], []
        for rep in range(args.repeats):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            df = q.spark_fn(spark, sf_dir)
            t1 = time.time()
            df.collect()
            t2 = time.time()
            build_ts.append(t1 - t0)
            run_ts.append(t2 - t1)
            spark.catalog.clearCache()
            try:
                jsc = spark.sparkContext._jsc
                for jrdd in jsc.getPersistentRDDs().values():
                    jrdd.unpersist()
            except Exception:
                pass
        if plans_dir:
            df = q.spark_fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (plans_dir / f"{name}_{args.suffix}.txt").write_text(txt)
            spark.catalog.clearCache()
            try:
                jsc = spark.sparkContext._jsc
                for jrdd in jsc.getPersistentRDDs().values():
                    jrdd.unpersist()
            except Exception:
                pass
        results[name] = {
            "build_min": round(min(build_ts), 3),
            "run_min": round(min(run_ts), 3),
            "total_min": round(min(b + r for b, r in zip(build_ts, run_ts)), 3),
            "samples": [round(b + r, 3) for b, r in zip(build_ts, run_ts)],
        }
        print(f"{name}: build {results[name]['build_min']}s "
              f"run {results[name]['run_min']}s", flush=True)

    Path(args.out).write_text(json.dumps(results, indent=1) + "\n")
    tot = sum(r["total_min"] for r in results.values())
    print(f"sum of mins: {tot:.2f}s over {len(results)} queries")


if __name__ == "__main__":
    main()
