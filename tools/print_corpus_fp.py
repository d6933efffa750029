"""Print the vector-artifact corpus fingerprints of the test corpora.

Paste the output into queries/artifacts.LITERAL_FPS whenever TESTDATA is
regenerated with different content — the fingerprints are content-based,
so a byte-identical regeneration keeps them stable.

Usage: python tools/print_corpus_fp.py [sf_dir ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    from pyspark.sql import SparkSession

    from cosmo_spark.queries.artifacts import corpus_fingerprint

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        print(f'    "{corpus_fingerprint(spark, d)}",   # {d}')


if __name__ == "__main__":
    main()
