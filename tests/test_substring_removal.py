"""Hand-computed golden for q149's removal semantics (the oracle gate
proves Spark==DuckDB; this pins what BOTH are supposed to compute)."""

from __future__ import annotations

import pytest

from cosmo_spark.functions.text import HASH_BASE, HASH_MOD


def _fold(hs):
    a = 0
    for h in hs:
        a = (a * HASH_BASE + h) % HASH_MOD
    return a


def _tok_hash(word):
    a = 0
    for ch in word:
        a = (a * 31 + ord(ch)) % 1_000_000_007
    return a


@pytest.fixture()
def removal(spark, tmp_path, monkeypatch):
    """Run q149 over a 3-document micro-corpus with SPAN_N patched to 4:
    doc 2 is an exact copy of doc 1; doc 3 shares doc 1's first 4 words
    then diverges."""
    import cosmo_spark.queries.textops as t

    monkeypatch.setattr(t, "_SPAN_N", 4)
    base = "alpha beta gamma delta epsilon zeta"
    docs = [
        (1, base, "en", "s", len(base)),
        (2, base, "en", "s", len(base)),
        (3, "alpha beta gamma delta other words here", "en", "s", 40),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    # q149 only reads documents; satisfy load_table with the one file
    out = t.q149_substring_removal(spark, str(tmp_path))
    return {r.doc_id: r for r in out.collect()}


def test_exact_copy_is_fully_elided(removal):
    r = removal[2]
    assert (r.n_tokens, r.n_removed, r.rebuilt_hash) == (6, 6, 0)


def test_keeper_document_is_untouched(removal):
    r = removal[1]
    assert (r.n_tokens, r.n_removed) == (6, 0)
    hs = [_tok_hash(w) for w in
          "alpha beta gamma delta epsilon zeta".split()]
    assert r.rebuilt_hash == _fold(hs)


def test_partial_overlap_elides_only_the_shared_span(removal):
    # doc 3's only duplicated 4-gram is (alpha beta gamma delta) — doc 1
    # owns it (keeper), so doc 3 loses exactly positions 1-4
    r = removal[3]
    assert (r.n_tokens, r.n_removed) == (7, 4)
    hs = [_tok_hash(w) for w in "other words here".split()]
    assert r.rebuilt_hash == _fold(hs)
