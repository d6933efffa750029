"""CLI runner — the ``cosmo --monthly`` analog.

The reference's entry point maps cadence flags to a pytest collection that
instantiates monitors and persists their new data
(ref: cosmo/run_monitors.py:120-146, cosmo/pytest.ini:1-8).  Here the runner
is a plain CLI: load the tables that exist under --data-dir, run every
monitor registered for the cadence, write each result frame to the output
directory as CSV.

    python -m cosmo_spark.runner --cadence monthly \
        --data-dir /data/tables --out /tmp/results
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cosmo-spark", description=__doc__)
    ap.add_argument("--cadence", choices=["monthly", "daily"], required=True)
    ap.add_argument("--data-dir", required=True,
                    help="directory of <table>.parquet inputs (acq, osm, dark, ...)")
    ap.add_argument("--out", required=True, help="output directory for result CSVs")
    ap.add_argument("--master", default=None, help="Spark master override")
    args = ap.parse_args(argv)

    from cosmo_spark.session import get_spark
    from cosmo_spark.monitors import MONITORS, run_monitors
    from cosmo_spark.sources.files import write_results_csv

    spark = get_spark(app_name=f"cosmo-spark-{args.cadence}", master=args.master)

    # load whichever monitor inputs exist under data-dir; monitors whose
    # inputs are absent are skipped (ref behavior: monitors run independently)
    wanted = sorted({k for _, fn in MONITORS.values() for k in fn.__required_inputs__})
    inputs = {}
    for name in wanted:
        path = os.path.join(args.data_dir, f"{name}.parquet")
        inputs[name] = spark.read.parquet(path) if os.path.exists(path) else None

    results = run_monitors(args.cadence, inputs)
    if not results:
        print(f"no {args.cadence} monitors runnable from {args.data_dir} "
              f"(need one of: {', '.join(wanted)})", file=sys.stderr)
        return 1

    os.makedirs(args.out, exist_ok=True)
    for monitor_name, frames in results.items():
        for frame_name, df in frames.items():
            if frame_name == "data":
                continue  # full exploded data stays in the lake, not CSV
            dest = os.path.join(args.out, f"{monitor_name}_{frame_name}")
            write_results_csv(df, dest)
            print(f"wrote {dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
