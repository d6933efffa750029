"""Regenerate queries/bpe_artifacts.BPE_SEED: train the BPE merge rules on
each driver-generated test corpus and print the seed dict ready to paste.

Usage: python tools/print_bpe_seed.py [sf_dir ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cosmo_spark.queries.bpe_artifacts import _train, documents_fingerprint
from cosmo_spark.session import get_spark


def main() -> None:
    dirs = sys.argv[1:] or [
        f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")
    ]
    spark = get_spark()
    print("BPE_SEED: dict[str, tuple[tuple[str, str, int], ...]] = {")
    for d in dirs:
        fp = documents_fingerprint(spark, d)
        rules = _train(spark, d)
        body = ", ".join(f"({a!r}, {b!r}, {c})" for a, b, c in rules)
        print(f'    "{fp}": ({body}),   # {d}')
    print("}")


if __name__ == "__main__":
    main()
