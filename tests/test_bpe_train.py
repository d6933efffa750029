"""BPE tokenizer training (round-9 #1): the distributed trainer
(operators/train.train_bpe_merges) must be deterministic, bit-equal to the
committed seed on the test corpora, and q97/q144 must stay parity-green
with the seed cache REMOVED (the literal-modules-deleted analog of
tests/test_artifacts.py) — their oracles replay the whole greedy loop in
unrolled SQL, so these gates prove the trainer itself.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cosmo_spark.operators.train import train_bpe_merges
from cosmo_spark.queries import all_queries
from cosmo_spark.queries import bpe_artifacts as B
from tools.parity import compare, duck_con

SF = "/root/testdata/sf0.001"


def _wf(spark, rows):
    return spark.createDataFrame(rows, "word STRING, freq LONG")


def test_trainer_matches_committed_seed(spark):
    """Retraining the sf0.001 corpus reproduces BPE_SEED bit-for-bit —
    the determinism gate (same corpus -> same rules, counts included)."""
    fp = B.documents_fingerprint(spark, SF)
    assert fp in B.BPE_SEED, (
        "sf0.001 documents fingerprint drifted — regenerate with "
        "tools/print_bpe_seed.py"
    )
    rules = B._train(spark, SF)
    assert tuple(tuple(r) for r in rules) == B.BPE_SEED[fp]


def test_trainer_greedy_semantics(spark):
    """Hand-checkable corpus: counts are frequency-weighted, ties break
    lexicographically on (a, b), and a learned symbol feeds later rules
    (genuine BPE chaining)."""
    wf = _wf(spark, [("thethe", 3), ("then", 2), ("tha", 2), ("zz", 1)])
    rules = train_bpe_merges(wf, n_merges=3)
    # pair counts pass 1: (t,h) = 3*2 + 2 + 2 = 10; (h,e) = 8; (e,t) = 3 ...
    assert rules[0][:2] == ("t", "h") and rules[0][2] == 10
    # pass 2 over merged vocab: (th,e) = 3*2 + 2 = 8 beats (th,a) = 2
    assert rules[1][:2] == ("th", "e") and rules[1][2] == 8
    # pass 3: 'thethe' is now [the, the]: (the,the) = 3; (the,n) = 2;
    # (th,a) = 2; (z,z) = 1 -> argmax is the chained pair
    assert rules[2][:2] == ("the", "the") and rules[2][2] == 3


def test_trainer_early_stop_and_empty(spark):
    """All-singleton and empty vocabularies yield zero rules (no raise);
    greedy leftmost self-pair merges count non-overlapping occurrences."""
    assert train_bpe_merges(_wf(spark, [("a", 5), ("b", 3)])) == []
    assert train_bpe_merges(_wf(spark, [])) == []
    # 'aaaa' -> (a,a) candidates at 1,2,3 all count (textbook adjacent
    # count = 3); after merging leftmost-greedily the word is [aa, aa]
    rules = train_bpe_merges(_wf(spark, [("aaaa", 1)]), n_merges=2)
    assert rules[0] == ("a", "a", 3)
    assert rules[1] == ("aa", "aa", 1)


def test_bpe_family_parity_without_seed(spark, tmp_path, monkeypatch):
    """THE round-9 gate: empty the seed dict and redirect the at-rest
    cache; q144 (train) and q97 (apply) must train live and stay green
    against the SQL training replay.  Second resolution must come from
    the at-rest cache, not retraining."""
    monkeypatch.setattr(B, "BPE_SEED", {})
    monkeypatch.setattr(B, "_cache_dir", lambda: tmp_path / "bpe")
    saved = dict(B._RESOLVED)
    B._RESOLVED.clear()
    try:
        con = duck_con(SF)
        qs = all_queries()
        for name in ("q144_bpe_train", "q97_bpe_apply"):
            q = qs[name]
            problems = compare(name, q.spark_fn(spark, SF), con, q.oracle)
            assert not problems, (name, problems)
        fp = B.documents_fingerprint(spark, SF)
        assert (tmp_path / "bpe" / f"{fp}.json").exists()
        # cache round-trip: drop the memo, resolve again, rules identical
        cached_before = B._RESOLVED.pop(fp)
        assert B.resolve_bpe_merges(spark, SF) == cached_before
    finally:
        B._RESOLVED.clear()
        B._RESOLVED.update(saved)


def test_q144_rule_shape(spark):
    """Seed-resolved q144 emits the ordered ladder with merged = lhs+rhs
    and strictly decreasing-or-tied counts never increasing rank order."""
    rows = all_queries()["q144_bpe_train"].spark_fn(spark, SF).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert all(r.merged == r.lhs + r.rhs for r in rows)
    assert len(rows) == B.BPE_N_MERGES
