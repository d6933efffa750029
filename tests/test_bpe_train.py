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
        assert (tmp_path / "bpe" / f"{fp}-n{B.BPE_N_MERGES}.json").exists()
        # cache round-trip: drop the memo, resolve again, rules identical
        cached_before = B._RESOLVED.pop(f"{fp}-n{B.BPE_N_MERGES}")
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


# --------------------------------------------------------------------------- #
# round-10: hybrid trainer (driver-side greedy loop under explicit caps)      #
# --------------------------------------------------------------------------- #

from cosmo_spark.operators.train import bpe_greedy_py, train_bpe_merges_hybrid

# heavyweight Spark suite: deselected by the default `addopts` fast set so
# the driver's verify completes inside its window (r13 verdict #7); run via
# `pytest -m slow` or the full suite via `pytest --override-ini addopts= tests/`
pytestmark = pytest.mark.slow


def _naive_greedy(vocab, n):
    """Independent recount-from-scratch replica of the greedy loop — no
    shared state with bpe_greedy_py's incremental counts/heap, so a bug
    in the delta bookkeeping cannot hide in both."""
    words = [([ch for ch in w], c) for w, c in vocab if c and len(w) >= 2]
    rules = []
    for _ in range(n):
        cnt = {}
        for w, f in words:
            for i in range(len(w) - 1):
                p = (w[i], w[i + 1])
                cnt[p] = cnt.get(p, 0) + f
        if not cnt:
            break
        (a, b), c = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        rules.append((a, b, c))
        ab = a + b
        for idx, (w, f) in enumerate(words):
            out, i = [], 0
            while i < len(w):
                if i < len(w) - 1 and w[i] == a and w[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            words[idx] = (out, f)
    return rules


def test_hybrid_equals_distributed_on_corpus_prefix(spark):
    """THE round-10 gate: the hybrid (driver-loop) trainer and the
    distributed (one-job-per-merge) trainer learn bit-identical rules on
    the real corpus vocabulary — counts included — on a 12-merge shared
    prefix."""
    from cosmo_spark.functions.text import tokenize
    from cosmo_spark.sources.tables import load_table

    wf = (
        load_table(spark, SF, "documents")
        .select(F.explode(tokenize(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint()
    )
    assert train_bpe_merges_hybrid(wf, n_merges=12) == train_bpe_merges(
        wf, n_merges=12
    )


def test_hybrid_over_cap_falls_back_to_distributed(spark):
    """A vocabulary over the explicit driver-memory cap must route to the
    distributed loop — same rules either way, but nothing
    vocabulary-sized is collected."""
    wf = _wf(spark, [("thethe", 3), ("then", 2), ("tha", 2), ("zz", 1)])
    over = train_bpe_merges_hybrid(wf, n_merges=3, vocab_cap_rows=2)
    under = train_bpe_merges_hybrid(wf, n_merges=3)
    assert over == under == train_bpe_merges(wf, n_merges=3)
    over_c = train_bpe_merges_hybrid(wf, n_merges=3, vocab_cap_chars=5)
    assert over_c == under


def test_incremental_greedy_matches_naive_recount_property():
    """Hypothesis sweep: on random small vocabularies the incremental
    (delta-count + lazy-heap) loop is bit-identical to the
    recount-from-scratch loop — ties, overlapping self-pairs, early
    exhaustion and all."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=120, deadline=None)
    @given(
        st.lists(
            st.tuples(st.text("abc", min_size=1, max_size=8),
                      st.integers(1, 5)),
            min_size=0, max_size=10,
        ),
        st.integers(0, 25),
    )
    def inner(vocab, n):
        assert bpe_greedy_py(vocab, n) == _naive_greedy(vocab, n)

    inner()


def test_production_merge_count_bounded_wall_time():
    """The capability the one-job-per-merge loop cannot reach (round-9
    verdict #1): >=1,000 merges over a production-shaped vocabulary in
    bounded wall time, driver-side.  The driver corpora exhaust at ~89
    merges (31-word vocabulary), so the merge-count headroom is
    demonstrated on a deterministic synthetic vocabulary."""
    import random
    import time

    rng = random.Random(1)
    seen, vocab = set(), []
    while len(vocab) < 20000:
        w = "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz")
            for _ in range(rng.randint(2, 12))
        )
        if w not in seen:
            seen.add(w)
            vocab.append((w, rng.randint(1, 1000)))
    t0 = time.time()
    rules = bpe_greedy_py(vocab, 1500)
    elapsed = time.time() - t0
    assert len(rules) == 1500
    assert elapsed < 60, f"1500 merges took {elapsed:.1f}s"


def test_segment_words_matches_expression_chain(spark):
    """bpe_segment_words (one mapInPandas job, the production apply) is
    value-identical to the chained spark_bpe_pass expression form on the
    real corpus vocabulary under the full 16-rule seed — and on a
    self-pair-heavy synthetic vocabulary under adversarial rules."""
    from cosmo_spark.functions.bpe import (
        bpe_segment_words,
        learned_token_costs_passes,
    )
    from cosmo_spark.functions.text import tokenize
    from cosmo_spark.sources.tables import load_table

    rules = B.resolve_bpe_merges(spark, SF)
    words = load_table(spark, SF, "documents").select(
        F.explode(tokenize(F.col("text"))).alias("word")
    )
    got = {
        r.word: r.n_sym
        for r in bpe_segment_words(words, rules).collect()
    }
    want = {
        r.word: r.n_sym
        for r in learned_token_costs_passes(words, rules).collect()
    }
    assert got == want and len(got) > 0

    # "" is deliberately absent from the equivalence set: the expression
    # chain's sequence(1, char_length(word)) DESCENDS for empty words
    # (Spark's sequence(1, 0) = [1, 0]), fabricating two empty symbols —
    # harmless in production because tokenize() cannot emit empty words,
    # and the mapInPandas path gets it right (pinned below)
    synth = spark.createDataFrame(
        [("aaaa",), ("aaab",), ("baaa",), ("abab",), ("a",)],
        "word STRING",
    )
    synth_rules = [("a", "a", 9), ("aa", "aa", 5), ("a", "b", 4),
                   ("aa", "b", 3)]
    got_s = {
        r.word: tuple(r.w)
        for r in bpe_segment_words(synth, synth_rules).collect()
    }
    want_s = {}
    for r in learned_token_costs_passes(synth, synth_rules).collect():
        want_s[r.word] = r.n_sym
    assert {w: len(s) for w, s in got_s.items()} == want_s
    # hand-checked: aaaa -> aa,aa -> aaaa; aaab -> aa,ab? no — rule order:
    # (a,a) pass: aaab -> [aa, a, b]; (aa,aa): no-op; (a,b): [aa, ab];
    # (aa,b): no-op (b consumed)
    assert got_s["aaaa"] == ("aaaa",)
    assert got_s["aaab"] == ("aa", "ab")
    from cosmo_spark.functions.bpe import segment_word_py

    assert segment_word_py("", tuple()) == []


def test_q155_full_table_exhausts_pairs(spark):
    """q155's rule table is the corpus's COMPLETE merge history: ranks
    contiguous, every merge = lhs+rhs, far fewer rules than the 1024
    budget (early stop), and applying the whole ladder leaves every
    vocabulary word a single symbol — the definition of exhaustion."""
    from cosmo_spark.functions.bpe import segment_word_py
    from cosmo_spark.functions.text import tokenize
    from cosmo_spark.sources.tables import load_table

    rows = all_queries()["q155_bpe_train_full"].spark_fn(spark, SF).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert all(r.merged == r.lhs + r.rhs for r in rows)
    assert B.BPE_N_MERGES < len(rows) < B.BPE_PROD_N_MERGES
    assert len(rows) <= B.BPE_PROD_ORACLE_N, (
        "exhaustion beyond the oracle unroll depth — raise "
        "BPE_PROD_ORACLE_N"
    )
    frozen = tuple(
        (r.lhs, r.rhs, r.cnt, frozenset(r.lhs + r.rhs)) for r in rows
    )
    vocab = [
        r.word
        for r in load_table(spark, SF, "documents")
        .select(F.explode(tokenize(F.col("text"))).alias("word"))
        .distinct()
        .collect()
    ]
    assert vocab and all(
        len(segment_word_py(w, frozen)) == 1 for w in vocab
    )


def test_prod_family_parity_without_cache(spark, tmp_path, monkeypatch):
    """q155/q156 train live (no committed seed exists for the prod
    budget) and stay green against the full-exhaustion SQL replay with
    the at-rest cache redirected; second resolution reads the cache."""
    monkeypatch.setattr(B, "_cache_dir", lambda: tmp_path / "bpe")
    saved = dict(B._RESOLVED)
    B._RESOLVED.clear()
    try:
        con = duck_con(SF)
        qs = all_queries()
        for name in ("q155_bpe_train_full", "q156_bpe_tokenize_full"):
            q = qs[name]
            problems = compare(name, q.spark_fn(spark, SF), con, q.oracle)
            assert not problems, (name, problems)
        key = (B.documents_fingerprint(spark, SF)
               + f"-prod-n{B.BPE_PROD_N_MERGES}")
        assert (tmp_path / "bpe" / f"{key}.json").exists()
        cached_before = B._RESOLVED.pop(key)
        assert B.resolve_bpe_merges_prod(spark, SF) == cached_before
    finally:
        B._RESOLVED.clear()
        B._RESOLVED.update(saved)


def test_q158_vocab_export_shape(spark):
    """The exported vocabulary is a loadable artifact: ids contiguous
    from 0, the base block lexicographically ordered single characters,
    the merged block exactly the q155 ladder in learned order, ids
    continuing after the base block."""
    rows = sorted(
        all_queries()["q158_bpe_vocab_export"].spark_fn(spark, SF).collect(),
        key=lambda r: r.id,
    )
    assert [r.id for r in rows] == list(range(len(rows)))
    base = [r for r in rows if r.kind == "base"]
    merged = [r for r in rows if r.kind == "merged"]
    assert all(len(r.token) == 1 and r.rank is None for r in base)
    assert [r.token for r in base] == sorted(r.token for r in base)
    ladder = all_queries()["q155_bpe_train_full"].spark_fn(spark, SF).collect()
    assert [(r.rank, r.token) for r in merged] == [
        (r.rank, r.merged) for r in sorted(ladder, key=lambda r: r.rank)
    ]
    assert merged[0].id == len(base)


def test_rank_kernel_equals_pass_kernel_property():
    """segment_word_rank_py (merge-rank priority heap, O(len·log len)
    independent of ladder size) is bit-identical to segment_word_py
    (sequential full-ladder passes) on ARBITRARY rule ladders — random
    pairs, chained merged symbols, duplicate pairs — not just trained
    ones.  This is the semantic claim that makes the kernel swap safe:
    the monotone rank pointer reproduces 'pass j already ran' exactly."""
    from hypothesis import given, settings, strategies as st

    from cosmo_spark.functions.bpe import (
        build_pair_ranks,
        segment_word_py,
        segment_word_rank_py,
    )

    sym = st.text("ab", min_size=1, max_size=3)

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(st.tuples(sym, sym), min_size=0, max_size=12),
        st.text("ab", min_size=0, max_size=16),
    )
    def inner(pairs, word):
        rules = [(a, b, 1) for a, b in pairs]
        frozen = tuple((a, b, c, frozenset(a + b)) for a, b, c in rules)
        assert segment_word_rank_py(word, build_pair_ranks(rules)) == \
            segment_word_py(word, frozen)

    inner()


def test_rank_kernel_equals_pass_kernel_trained_ladder():
    """Same equality on a genuinely TRAINED ladder (bpe_greedy_py over a
    deterministic synthetic vocabulary, 1500 merges) applied to every
    vocabulary word plus out-of-vocabulary probes."""
    import random

    from cosmo_spark.functions.bpe import (
        build_pair_ranks,
        segment_word_py,
        segment_word_rank_py,
    )
    from cosmo_spark.operators.train import bpe_greedy_py

    rng = random.Random(7)
    seen, vocab = set(), []
    while len(vocab) < 5000:
        w = "".join(rng.choice("abcdefgh") for _ in range(rng.randint(2, 10)))
        if w not in seen:
            seen.add(w)
            vocab.append((w, rng.randint(1, 100)))
    rules = bpe_greedy_py(vocab, 1500)
    assert len(rules) == 1500
    pr = build_pair_ranks(rules)
    frozen = tuple((a, b, c, frozenset(a + b)) for a, b, c in rules)
    probes = [w for w, _ in vocab[:400]] + [
        "".join(rng.choice("abcdefghz") for _ in range(rng.randint(1, 20)))
        for _ in range(400)
    ] + [""]
    for w in probes:
        assert segment_word_rank_py(w, pr) == segment_word_py(w, frozen), w


def test_rank_kernel_30k_rules_bounded_wall_time():
    """The capability gap the swap closes (round-10 verdict #1/#2): a
    30k-rule ladder — production-tokenizer scale, 30× the q155 gate —
    applied over a 20k-word vocabulary in bounded wall time.  The ladder
    is built combinatorially (left-to-right merge chains of 30k+ distinct
    words, prefix rules first), so constructing it costs nothing and the
    timing isolates the APPLY kernel; bit-identity vs the sequential-pass
    kernel is spot-checked on a slice (the full old-kernel sweep at 30k
    rules is exactly the O(rules)/word cost being retired)."""
    import random
    import time

    from cosmo_spark.functions.bpe import (
        build_pair_ranks,
        segment_word_py,
        segment_word_rank_py,
    )

    rng = random.Random(11)
    seen, words = set(), []
    while len(words) < 20000:
        w = "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz")
            for _ in range(rng.randint(4, 12))
        )
        if w not in seen:
            seen.add(w)
            words.append(w)
    ladder, have = [], set()
    for w in words:
        for k in range(2, len(w) + 1):
            if w[:k] not in have:
                have.add(w[:k])
                ladder.append((w[: k - 1], w[k - 1], len(w[:k])))
        if len(ladder) >= 30000:
            break
    # prefix rules must precede the rules that consume their output —
    # sorting by merged-symbol length (then lexicographically, for
    # determinism) is a valid ladder order
    ladder.sort(key=lambda r: (r[2], r[0], r[1]))
    rules = [(a, b, 1) for a, b, _ in ladder]
    assert len(rules) >= 30000
    pr = build_pair_ranks(rules)
    t0 = time.time()
    segs = [segment_word_rank_py(w, pr) for w in words]
    elapsed = time.time() - t0
    assert elapsed < 60, f"30k-rule apply over 20k words took {elapsed:.1f}s"
    # full collapse is NOT expected: chains from different words
    # interleave in the length-sorted ladder, and an earlier-rank rule
    # from another word's chain can consume a character mid-chain (the
    # sequential pass then never revisits) — but the ladder must do real
    # work: total symbols well below total characters
    n_chars = sum(len(w) for w in words)
    n_syms = sum(len(s) for s in segs)
    assert n_syms < 0.8 * n_chars, (n_syms, n_chars)
    frozen = tuple((a, b, c, frozenset(a + b)) for a, b, c in rules)
    for w in words[:50]:
        assert segment_word_rank_py(w, pr) == segment_word_py(w, frozen), w


def test_1k_pin_is_trainer_output_and_parity_without_cache(
    spark, tmp_path, monkeypatch
):
    """Literal-deleted gate for the >=1k-rule tokenizer (round-10 #3):
    with the at-rest cache redirected, retraining the 4096-merge derived-
    corpus ladder from scratch regenerates the committed BPE_1K_PIN
    remainder fingerprint bit-identically, q159/q160 stay green against
    the prefix-replay + pin oracles, and the ladder really carries
    >=1000 learned merges from catalog data."""
    monkeypatch.setattr(B, "_cache_dir", lambda: tmp_path / "bpe")
    saved = dict(B._RESOLVED)
    B._RESOLVED.clear()
    try:
        rules = B.resolve_bpe_merges_1k(spark, SF)
        assert len(rules) >= 1000
        fp = B.documents_fingerprint_src(spark, SF)
        _dh, n, sha, csum = B.BPE_1K_PIN[fp]
        assert B.tail_fingerprint(rules, B.BPE_1K_ORACLE_N) == (n, sha, csum)
        con = duck_con(SF)
        qs = all_queries()
        for name in ("q159_bpe_train_1k", "q160_bpe_tokenize_1k"):
            q = qs[name]
            problems = compare(name, q.spark_fn(spark, SF), con, q.oracle)
            assert not problems, (name, problems)
    finally:
        B._RESOLVED.clear()
        B._RESOLVED.update(saved)
