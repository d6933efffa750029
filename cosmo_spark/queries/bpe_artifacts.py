"""BPE merge-rule artifact resolution — learned rules as a seeded cache.

Round 8's last hand-written literal artifact was q97's 4-rule
``_BPE_RULES`` tuple: the apply half of tokenizer training existed but
nothing PRODUCED a rule list.  Round 9 closes it the way
queries/artifacts.py closed the PQ-literal debt: the distributed trainer
(operators/train.train_bpe_merges) is the default rule source, and the
committed rules are demoted to a deterministic SEED CACHE keyed by a
bounded content fingerprint of the documents corpus.

Resolution order for ``resolve_bpe_merges(spark, sf_dir)``:

1. corpus fingerprint in ``BPE_SEED`` -> the committed trained rules
   (bit-identical to retraining — gated by tests/test_bpe_train.py);
2. an at-rest JSON cache entry under spark-warehouse/bpe_artifacts/ ->
   load it;
3. train via ``train_bpe_merges`` over the corpus word-frequency table,
   write the cache entry atomically, return it.

Parity never depends on this module resolving "correctly": the DuckDB
oracles of q97/q144 REPLAY the greedy training loop in unrolled SQL
(functions/bpe.duck_bpe_train_ctes), so a wrong seed would show up as a
red parity row, not a silently-consistent pair.

The fingerprint follows queries/artifacts.corpus_fingerprint's bounded
discipline: row count plus the 64 smallest-xxhash64(doc_id) rows' ids and
text hashes — a TakeOrdered over the corpus, O(1) driver cost at any
corpus size, invariant to file mtimes/paths.
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

#: merges every catalog BPE query learns/applies — bounded so the q97/q144
#: oracles can unroll the replay (raised 8 -> 16 in round 10: the
#: MATERIALIZED replay chain made deeper unrolls linear instead of 2^n)
BPE_N_MERGES = 16

#: merge budget of the PRODUCTION tokenizer family (q155/q156): far past
#: the driver corpora's pair exhaustion (~89 merges — the synthetic
#: vocabulary is 31 words), so "train to BPE_PROD_N_MERGES" means "train
#: until no adjacent pair remains"; the hybrid trainer runs such budgets
#: driver-side in milliseconds once the one distributed word count is done
BPE_PROD_N_MERGES = 1024

#: unroll depth of the q155/q156 DuckDB replays: comfortably past the
#: sf0.01 exhaustion point so the oracle's LEFT-JOIN identity passes make
#: ranks beyond exhaustion empty, matching the trainer's early stop
BPE_PROD_ORACLE_N = 112

#: committed trainer output for the driver-generated test corpora
#: (regenerate with tools/print_bpe_seed.py if TESTDATA changes);
#: (left, right, weighted pair count) in learned order
BPE_SEED: dict[str, tuple[tuple[str, str, int], ...]] = {
    "336903eb10fdca0d": (   # sf0.001 documents
        ('e', 'r', 4650), ('o', 'r', 2880), ('i', 'n', 2858),
        ('o', 'w', 2763), ('s', 't', 2721), ('l', 'u', 1928),
        ('a', 'r', 1873), ('p', 'ar', 1873), ('m', 'er', 1824),
        ('a', 't', 1806), ('a', 'n', 984), ('c', 'an', 984),
        ('s', 'can', 984), ('c', 'o', 978), ('co', 'lu', 978),
        ('colu', 'm', 978),
    ),
    "0beb5fb94ab1e645": (   # sf0.01 documents
        ('e', 'r', 4568), ('i', 'n', 2760), ('o', 'w', 2747),
        ('o', 'r', 2696), ('s', 't', 2676), ('m', 'er', 1852),
        ('a', 't', 1845), ('l', 'u', 1831), ('a', 'r', 1758),
        ('p', 'ar', 1758), ('j', 'o', 964), ('jo', 'in', 964),
        ('a', 's', 947), ('as', 'h', 947), ('h', 'ash', 947),
        ('r', 'ow', 943),
    ),
    "bb78c9b4a81f7d25": (   # sf0.1 documents
        ('e', 'r', 45089), ('i', 'n', 27190), ('o', 'r', 27095),
        ('s', 't', 27060), ('o', 'w', 27044), ('t', 'a', 18248),
        ('l', 'u', 18239), ('m', 'er', 18174), ('a', 'r', 18111),
        ('p', 'ar', 18111), ('u', 'p', 9295), ('par', 'k', 9182),
        ('s', 'park', 9182), ('d', 'ow', 9159), ('in', 'dow', 9159),
        ('w', 'indow', 9159),
    ),
}

_FP_MEMO: dict[tuple, str] = {}
_RESOLVED: dict[str, list[tuple[str, str, int]]] = {}


def _stat_key(sf_dir: str) -> tuple:
    from cosmo_spark.sources.tables import table_file_identity

    return table_file_identity(sf_dir, "documents")


def documents_fingerprint(spark: SparkSession, sf_dir: str) -> str:
    """Bounded deterministic content fingerprint of the documents corpus,
    memoized per (path, mtime, size) so repeated query calls cost no
    Spark job."""
    key = _stat_key(sf_dir)
    fp = _FP_MEMO.get(key)
    if fp is not None:
        return fp
    from cosmo_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    n = d.count()
    rows = (
        d.select("doc_id", F.sha2(F.coalesce(F.col("text"), F.lit("")), 256)
                 .alias("th"))
        .withColumn("__h", F.xxhash64(F.col("doc_id")))
        .orderBy("__h", "doc_id")
        .limit(64)
        .collect()
    )
    payload = json.dumps(
        [n] + [[str(r.doc_id), r.th] for r in rows],
        separators=(",", ":"),
    )
    fp = hashlib.sha256(payload.encode()).hexdigest()[:16]
    _FP_MEMO[key] = fp
    return fp


def _cache_dir() -> Path:
    return (
        Path(__file__).resolve().parents[2]
        / "spark-warehouse" / "bpe_artifacts"
    )


def _train(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_N_MERGES
) -> list[tuple[str, str, int]]:
    from cosmo_spark.functions.text import tokenize
    from cosmo_spark.operators.train import train_bpe_merges_hybrid
    from cosmo_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    wf = (
        d.select(F.explode(tokenize(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return train_bpe_merges_hybrid(wf, n_merges=n_merges)


def resolve_bpe_merges(
    spark: SparkSession, sf_dir: str
) -> list[tuple[str, str, int]]:
    """The tokenizer family's rule entry point: q97 (apply) and q144
    (train) call this before building their pipelines.  Seed cache on the
    known test corpora; at-rest cache or fresh training on anything
    else."""
    fp = documents_fingerprint(spark, sf_dir)
    seed = BPE_SEED.get(fp)
    if seed is not None:
        return [tuple(r) for r in seed]
    # the merge budget is part of the cache key: a cached rule list is
    # only valid for the budget it was trained under (a raised
    # BPE_N_MERGES must retrain, not serve last round's shorter ladder)
    key = f"{fp}-n{BPE_N_MERGES}"
    rules = _RESOLVED.get(key)
    if rules is None:
        cache = _cache_dir() / f"{key}.json"
        if cache.exists():
            rules = [tuple(r) for r in json.loads(cache.read_text())]
        else:
            rules = _train(spark, sf_dir)
            cache.parent.mkdir(parents=True, exist_ok=True)
            tmp = cache.with_suffix(f".tmp-{os.getpid()}")
            tmp.write_text(json.dumps([list(r) for r in rules]))
            os.replace(tmp, cache)
        _RESOLVED[key] = rules
    return list(rules)


def resolve_bpe_merges_prod(
    spark: SparkSession, sf_dir: str
) -> list[tuple[str, str, int]]:
    """Rule entry point of the PRODUCTION tokenizer family (q155/q156):
    the full ``BPE_PROD_N_MERGES``-budget rule table, trained to pair
    exhaustion by the hybrid trainer.  No committed seed — the driver
    loop makes live training a one-Spark-job affair, so the only cache
    is the at-rest JSON entry (same atomic-rename discipline as the base
    resolver); parity never depends on it because the q155/q156 oracles
    replay training from the raw corpus."""
    fp = documents_fingerprint(spark, sf_dir)
    key = f"{fp}-prod-n{BPE_PROD_N_MERGES}"
    rules = _RESOLVED.get(key)
    if rules is None:
        cache = _cache_dir() / f"{key}.json"
        if cache.exists():
            rules = [tuple(r) for r in json.loads(cache.read_text())]
        else:
            rules = _train(spark, sf_dir, n_merges=BPE_PROD_N_MERGES)
            cache.parent.mkdir(parents=True, exist_ok=True)
            tmp = cache.with_suffix(f".tmp-{os.getpid()}")
            tmp.write_text(json.dumps([list(r) for r in rules]))
            os.replace(tmp, cache)
        _RESOLVED[key] = rules
    return list(rules)
