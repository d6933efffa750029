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


# --------------------------------------------------------------------------- #
# round-11: the >=1k-rule catalog tokenizer (q159/q160)                        #
# --------------------------------------------------------------------------- #
#
# The driver corpora pair-exhaust at ~89 merges (31 distinct words), so the
# production merge-count capability lived only in a synthetic-vocabulary
# unit.  q159 derives — in-engine, deterministically, and expressible in
# BOTH engines — a corpus rich enough for thousands of real merges: the
# bigram+trigram CONCATENATION expansion of the documents token stream
# (~17k distinct derived words).  Training runs the same hybrid loop under
# a fixed BPE_1K_N_MERGES budget.
#
# Oracle strategy (the round-10 verdict's prescription): a full unrolled
# replay at 4096 levels is out of reach, so the oracle REPLAYS a
# verifiable prefix (BPE_1K_ORACLE_N materialized levels, live on
# whatever corpus it is handed — the adversarial sweeps keep this half
# honest) and pins the REMAINDER as a fingerprint: (rule count, sha256
# of ranks prefix+1..N, their count sum), keyed by a corpus content hash
# computed independently on each side (documents_fingerprint on the
# Spark side, bit_xor(hash(...)) on the DuckDB side).  On an unpinned
# corpus both sides emit the prefix only.  The pins are trained
# in-engine and regenerate via tools/print_bpe_1k_pin.py; the
# pin-deleted retrain gate in tests/test_bpe_train.py keeps them honest.

BPE_1K_N_MERGES = 4096
BPE_1K_ORACLE_N = 24

#: Spark-side derived-word expression over a token-array column
def spark_toks_1k(t: str) -> str:
    big = (
        f"CASE WHEN {t} IS NULL OR size({t}) < 2 "
        f"THEN CAST(array() AS ARRAY<STRING>) "
        f"ELSE transform(sequence(1, size({t}) - 1), "
        f"i -> concat(element_at({t}, i), element_at({t}, i + 1))) END"
    )
    tri = (
        f"CASE WHEN {t} IS NULL OR size({t}) < 3 "
        f"THEN CAST(array() AS ARRAY<STRING>) "
        f"ELSE transform(sequence(1, size({t}) - 2), "
        f"i -> concat(element_at({t}, i), element_at({t}, i + 1), "
        f"element_at({t}, i + 2))) END"
    )
    return f"concat({big}, {tri})"


def duck_toks_1k(tk: str) -> str:
    """DuckDB twin of :func:`spark_toks_1k` over a token-list column."""
    big = (
        f"CASE WHEN {tk} IS NULL OR len({tk}) < 2 "
        f"THEN CAST([] AS VARCHAR[]) "
        f"ELSE list_transform(range(1, len({tk})), "
        f"i -> {tk}[i] || {tk}[i + 1]) END"
    )
    tri = (
        f"CASE WHEN {tk} IS NULL OR len({tk}) < 3 "
        f"THEN CAST([] AS VARCHAR[]) "
        f"ELSE list_transform(range(1, len({tk}) - 1), "
        f"i -> {tk}[i] || {tk}[i + 1] || {tk}[i + 2]) END"
    )
    return f"list_concat({big}, {tri})"


#: DuckDB-side corpus content hash the oracle keys its pins on.  MUST
#: cover every column the pinned values depend on: text (the rules) AND
#: source (q160's per-source prices) — the skew sweep mutates source
#: alone, and a pin keyed only on text would resolve against a corpus
#: whose group keys moved.
DUCK_CORPUS_HASH = (
    "SELECT bit_xor(hash(CAST(doc_id AS VARCHAR) || '#' || "
    "coalesce(text, chr(1)) || '#' || coalesce(source, chr(1)))) AS h "
    "FROM documents"
)


_FP_SRC_MEMO: dict[tuple, str] = {}


def documents_fingerprint_src(spark: SparkSession, sf_dir: str) -> str:
    """Spark-side pin key of the 1k-tokenizer family: the bounded
    documents fingerprint EXTENDED over the source column (same
    TakeOrdered discipline), mirroring what DUCK_CORPUS_HASH covers."""
    key = _stat_key(sf_dir)
    fp = _FP_SRC_MEMO.get(key)
    if fp is not None:
        return fp
    from cosmo_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    n = d.count()
    rows = (
        d.select(
            "doc_id",
            F.sha2(
                F.concat(
                    F.coalesce(F.col("text"), F.lit("")), F.lit("#"),
                    F.coalesce(F.col("source"), F.lit("")),
                ),
                256,
            ).alias("th"),
        )
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
    _FP_SRC_MEMO[key] = fp
    return fp


def derived_words_1k(spark: SparkSession, sf_dir: str):
    """(doc_id, source, word) of the derived bigram+trigram corpus."""
    from cosmo_spark.functions.text import tokenize
    from cosmo_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "source", tokenize(F.col("text")).alias("__t")
    ).select(
        "doc_id", "source",
        F.explode(F.expr(spark_toks_1k("__t"))).alias("word"),
    )


def tail_fingerprint(rules, prefix_n: int) -> tuple[int, str, int]:
    """(n_rules, sha256 of ranks prefix_n+1..N, their cnt sum) — the
    remainder pin both the Spark query and the generator compute."""
    tail = [[a, b, int(c)] for a, b, c in rules[prefix_n:]]
    sha = hashlib.sha256(
        json.dumps(tail, separators=(",", ":")).encode()
    ).hexdigest()
    return len(rules), sha, sum(int(c) for _a, _b, c in rules[prefix_n:])


def resolve_bpe_merges_1k(
    spark: SparkSession, sf_dir: str
) -> list[tuple[str, str, int]]:
    """Rule table of the >=1k-merge tokenizer (q159/q160): the hybrid
    trainer over the derived bigram+trigram vocabulary under the
    BPE_1K_N_MERGES budget.  At-rest cache only (same atomic-rename
    discipline); the q159 oracle replays the prefix live and pins the
    remainder, so a wrong cache is a red parity row."""
    fp = documents_fingerprint(spark, sf_dir)
    key = f"{fp}-1k-n{BPE_1K_N_MERGES}"
    rules = _RESOLVED.get(key)
    if rules is None:
        cache = _cache_dir() / f"{key}.json"
        if cache.exists():
            rules = [tuple(r) for r in json.loads(cache.read_text())]
        else:
            from cosmo_spark.operators.train import train_bpe_merges_hybrid

            wf = (
                derived_words_1k(spark, sf_dir)
                .groupBy("word")
                .agg(F.count(F.lit(1)).alias("freq"))
            )
            rules = train_bpe_merges_hybrid(wf, n_merges=BPE_1K_N_MERGES)
            cache.parent.mkdir(parents=True, exist_ok=True)
            tmp = cache.with_suffix(f".tmp-{os.getpid()}")
            tmp.write_text(json.dumps([list(r) for r in rules]))
            os.replace(tmp, cache)
        _RESOLVED[key] = rules
    return list(rules)


#: committed remainder pins: documents_fingerprint -> (duckdb corpus hash,
#: n_rules, sha256 of the post-prefix rules, their cnt sum).  Regenerate
#: with tools/print_bpe_1k_pin.py when TESTDATA changes; the pin-deleted
#: retrain gate (tests/test_bpe_train.py) proves these are trainer output,
#: not hand-written constants.
BPE_1K_PIN: dict[str, tuple[int, int, str, int]] = {
    "b0a5f68aa3511053": (6889864446495228064, 4096, "4101d726a208645d59c252a5511141be80f4281a7b19d7615fa1aac9c2d59a2a", 346649),   # sf0.001 documents
    "335d99b68d793190": (4820387567883995537, 4096, "983ac195f6cb31db4e3f2781193b1b4ee4848b1e00b0ddd1843ba188751a9a0e", 338040),   # sf0.01 documents
    "cc1b7dbf8b6fbd72": (13344940032274270328, 4096, "f47f3e51d86621d73af97b82866c62f35fd2e785a0a7fe07c4ca4b28f3d075d0", 3332437),   # sf0.1 documents
}

#: committed full-ladder corpus prices for q160: documents_fingerprint ->
#: (duckdb corpus hash, {source: n_tokens_full})
BPE_1K_PRICE_PIN: dict[str, tuple[int, dict[str, int]]] = {
    "b0a5f68aa3511053": (6889864446495228064, {'src7': 3102, 'src9': 3525, 'src17': 3375, 'src12': 3815, 'src13': 3264, 'src5': 3144, 'src4': 3371, 'src10': 3501, 'src8': 4211, 'src0': 3875, 'src16': 3602, 'src14': 4276, 'src2': 3295, 'src1': 3715, 'src6': 3796, 'src11': 3672, 'src15': 3460, 'src18': 3297, 'src19': 3506, 'src3': 4071}),   # sf0.001
    "335d99b68d793190": (4820387567883995537, {'src7': 3825, 'src9': 3550, 'src17': 3537, 'src12': 3248, 'src13': 3944, 'src5': 3296, 'src4': 3364, 'src10': 3290, 'src8': 2911, 'src0': 3675, 'src16': 3514, 'src14': 3395, 'src2': 3682, 'src1': 3948, 'src6': 3258, 'src11': 3972, 'src15': 3351, 'src18': 3440, 'src19': 2984, 'src3': 3585}),   # sf0.01
    "cc1b7dbf8b6fbd72": (13344940032274270328, {'src7': 34346, 'src9': 36345, 'src17': 37083, 'src12': 38964, 'src13': 38833, 'src5': 39308, 'src4': 36681, 'src10': 37136, 'src8': 39358, 'src0': 36252, 'src16': 36991, 'src14': 34952, 'src2': 37463, 'src1': 37189, 'src6': 37130, 'src11': 35970, 'src15': 35725, 'src18': 35880, 'src19': 36776, 'src3': 37068}),   # sf0.1
}
