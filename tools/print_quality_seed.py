"""Regenerate queries/quality_artifacts.QUALITY_SEED: train the logistic
quality classifier on each driver-generated test corpus and print the seed
dict ready to paste.

Usage: python tools/print_quality_seed.py [sf_dir ...]
"""

from __future__ import annotations

import sys
import textwrap
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cosmo_spark.queries.artifacts import corpus_fingerprint
from cosmo_spark.queries.quality_artifacts import _train
from cosmo_spark.session import get_spark


def main() -> None:
    dirs = sys.argv[1:] or [
        f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")
    ]
    spark = get_spark()
    print("QUALITY_SEED: dict[str, tuple[int, tuple[int, ...]]] = {")
    for d in dirs:
        fp = corpus_fingerprint(spark, d)
        dim, w = _train(spark, d)
        body = textwrap.fill(
            ", ".join(str(v) for v in w), width=72,
            initial_indent="        ", subsequent_indent="        ",
        )
        print(f'    "{fp}": ({dim}, (   # {d}')
        print(body + ",")
        print("    )),")
    print("}")


if __name__ == "__main__":
    main()
