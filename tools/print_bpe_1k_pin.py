"""Regenerate queries/bpe_artifacts.BPE_1K_PIN / BPE_1K_PRICE_PIN: train
the >=1k-merge derived-corpus tokenizer (q159/q160) on each driver test
corpus and print the remainder fingerprints and full-ladder prices ready
to paste.  Each pin row carries the DuckDB-side corpus content hash the
oracles key on, so the pins resolve only for the exact corpus they were
trained on (adversarial sweeps fall back to the live prefix replay).

Usage: python tools/print_bpe_1k_pin.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from cosmo_spark.queries.bpe_artifacts import (
    BPE_1K_ORACLE_N,
    DUCK_CORPUS_HASH,
    derived_words_1k,
    documents_fingerprint_src,
    resolve_bpe_merges_1k,
    tail_fingerprint,
)
from cosmo_spark.session import get_spark


def duck_hash(sf_dir: str) -> int:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'documents.parquet')}'"
    )
    return int(con.execute(DUCK_CORPUS_HASH).fetchone()[0])


def main() -> None:
    from pyspark.sql import functions as F

    from cosmo_spark.functions.bpe import learned_token_costs

    dirs = sys.argv[1:] or [
        f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")
    ]
    spark = get_spark()
    pins, prices = [], []
    for d in dirs:
        fp = documents_fingerprint_src(spark, d)
        dh = duck_hash(d)
        rules = resolve_bpe_merges_1k(spark, d)
        n, sha, csum = tail_fingerprint(rules, BPE_1K_ORACLE_N)
        pins.append(f'    "{fp}": ({dh}, {n}, "{sha}", {csum}),   # {d}')
        words = derived_words_1k(spark, d)
        tok = learned_token_costs(words, rules)
        by_src = {
            r.source: int(r.n)
            for r in words.join(F.broadcast(tok), "word")
            .groupBy("source").agg(F.sum("n_sym").alias("n")).collect()
        }
        prices.append(f'    "{fp}": ({dh}, {by_src!r}),   # {d}')
    print("BPE_1K_PIN: dict[str, tuple[int, int, str, int]] = {")
    print("\n".join(pins))
    print("}")
    print()
    print("BPE_1K_PRICE_PIN: dict[str, tuple[int, dict[str, int]]] = {")
    print("\n".join(prices))
    print("}")


if __name__ == "__main__":
    main()
