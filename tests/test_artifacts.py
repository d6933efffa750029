"""Vector-artifact resolution (queries/artifacts.py, review r7 #2): the
committed literal quantizers are a SEED CACHE keyed by corpus fingerprint,
not a dependency — with the literal modules removed the whole ANN family
must train in-engine and stay parity-green, and a NEW corpus must resolve
its own quantizers without hand-running tools/.
"""

from __future__ import annotations

import sys

import duckdb
import pytest

from cosmo_spark.queries import all_queries
from cosmo_spark.queries import artifacts as A
from tools.parity import compare, duck_con

# heavyweight Spark suite: deselected by the default `addopts` fast set so
# the driver's verify completes inside its window (r13 verdict #7); run via
# `pytest -m slow` or the full suite via `pytest --override-ini addopts= tests/`
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.001"

VECTOR_FAMILY = (
    "q44_ivf_ann",
    "q75_semantic_dedup",
    "q86_pq_encode",
    "q87_pq_adc_search",
    "q88_ivf_pq_search",
    "q90_ivf_pq_residual",
    "q105_incremental_index",
)


@pytest.fixture
def clean_state():
    """Isolate the module's process-wide resolution state per test."""
    saved = (A._ACTIVE, dict(A._RESOLVED))
    A._ACTIVE = None
    A._RESOLVED.clear()
    yield
    A._ACTIVE, A._RESOLVED = saved[0], dict(saved[1])


def test_test_corpora_resolve_to_literals(spark, clean_state):
    fp = A.corpus_fingerprint(spark, SF)
    assert fp in A.LITERAL_FPS, (
        "sf0.001 fingerprint drifted — regenerate with "
        "tools/print_corpus_fp.py"
    )
    art = A.resolve_vector_artifacts(spark, SF)
    assert art.source == "literal"
    from cosmo_spark.queries.ivf_centroids import IVF_CENTROIDS

    assert art.centroids is IVF_CENTROIDS
    # fingerprint is memoized on file stats: second call is free and equal
    assert A.corpus_fingerprint(spark, SF) == fp


def test_vector_family_parity_without_literal_modules(
    spark, tmp_path, monkeypatch
):
    """THE r7 #2 gate: remove the literal modules entirely; the family
    must train via operators/train, both the Spark plan and the DuckDB
    oracle must embed the SAME trained quantizers, and every query stays
    parity-green.  Second resolution loads the at-rest cache."""
    saved_active, saved_resolved = A._ACTIVE, dict(A._RESOLVED)
    monkeypatch.setitem(sys.modules, "cosmo_spark.queries.ivf_centroids", None)
    monkeypatch.setitem(sys.modules, "cosmo_spark.queries.pq_codebooks", None)
    monkeypatch.setattr(A, "_cache_dir", lambda: tmp_path / "va")
    A._ACTIVE = None
    A._RESOLVED.clear()
    try:
        assert A._literal_artifacts() is None, "literal modules still import"
        art = A.resolve_vector_artifacts(spark, SF)
        assert art.source == "trained"
        assert len(art.centroids) == 40 and len(art.centroids[0]) == 64
        assert len(art.codebooks) == 16 and len(art.residual_codebooks) == 16

        con = duck_con(SF)
        qs = all_queries()
        for name in VECTOR_FAMILY:
            q = qs[name]
            sdf = q.spark_fn(spark, SF)      # resolves (trained) first
            oracle = q.oracle                # lazy: embeds the SAME set
            markers = (
                repr(art.centroids[0][0]),       # centroid-embedding oracles
                repr(float(art.codebooks[0][0][0])),   # PQ-only oracles
                repr(float(art.residual_codebooks[0][0][0])),
            )
            assert any(m in oracle for m in markers), (
                f"{name}: oracle does not embed the trained artifacts"
            )
            problems = compare(name, sdf, con, oracle)
            assert not problems, f"{name}: {problems}"

        # at-rest cache round-trip: a fresh process (simulated by clearing
        # the in-memory state) must load the SAME artifacts without
        # retraining
        A._ACTIVE = None
        A._RESOLVED.clear()
        art2 = A.resolve_vector_artifacts(spark, SF)
        assert art2.source == "cache"
        assert art2.centroids == art.centroids
        assert art2.codebooks == art.codebooks
        assert art2.residual_codebooks == art.residual_codebooks
    finally:
        A._ACTIVE, A._RESOLVED = saved_active, dict(saved_resolved)


def test_new_corpus_trains_without_touching_tools(
    spark, tmp_path, monkeypatch, clean_state
):
    """A corpus the literals have never seen (unknown fingerprint, literal
    modules PRESENT) must self-train and be parity-green — the 'switch
    corpora without hand-running the trainer' contract."""
    monkeypatch.setattr(A, "_cache_dir", lambda: tmp_path / "va")
    sf_dir = tmp_path / "corpus"
    sf_dir.mkdir()
    rows = [
        (i, [((i * 31 + j * 7) % 97) / 97.0 - 0.5 for j in range(64)], "x")
        for i in range(64)
    ]
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>, label STRING"
    ).coalesce(1).write.parquet(str(sf_dir / "embeddings.parquet"))

    fp = A.corpus_fingerprint(spark, str(sf_dir))
    assert fp not in A.LITERAL_FPS
    art = A.resolve_vector_artifacts(spark, str(sf_dir))
    assert art.source == "trained"

    q = all_queries()["q44_ivf_ann"]
    sdf = q.spark_fn(spark, str(sf_dir))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_dir}/embeddings.parquet/*.parquet'"
    )
    problems = compare("q44_new_corpus", sdf, con, q.oracle)
    assert not problems, problems


def test_degenerate_corpus_falls_back_to_literals(
    spark, tmp_path, monkeypatch, clean_state
):
    """An untrainable slice (here: empty) resolves to the literal seed
    cache instead of crashing — the adversarial-sweep contract."""
    monkeypatch.setattr(A, "_cache_dir", lambda: tmp_path / "va")
    sf_dir = tmp_path / "empty"
    sf_dir.mkdir()
    spark.createDataFrame(
        [], "vec_id BIGINT, embedding ARRAY<DOUBLE>, label STRING"
    ).coalesce(1).write.parquet(str(sf_dir / "embeddings.parquet"))
    art = A.resolve_vector_artifacts(spark, str(sf_dir))
    assert art.source == "literal"
