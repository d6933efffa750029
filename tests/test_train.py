"""In-engine quantizer training (operators/train): determinism, seed
sensitivity, and q44/q88-shaped DuckDB parity on artifacts retrained at a
NON-default seed — proving a new corpus needs no repo-committed literals
(round-6 verdict #5)."""

from __future__ import annotations

import shutil

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def _train(spark, seed):
    from cosmo_spark.operators.train import train_ivf_pq
    from cosmo_spark.sources.tables import load_table

    e = load_table(spark, SF, "embeddings")
    cents_df, books = train_ivf_pq(
        e, "embedding", "vec_id",
        k=12, ivf_iterations=2, n_subspaces=16, codebook_k=16,
        pq_iterations=6, seed=seed, seed_sample_size=256, pq_sample_size=512,
    )
    cents = [
        list(r.centroid)
        for r in sorted(cents_df.collect(), key=lambda r: r.bucket)
    ]
    return cents, books


def test_train_ivf_pq_deterministic_and_seed_sensitive(spark):
    c1, b1 = _train(spark, seed=7)
    c2, b2 = _train(spark, seed=7)
    assert c1 == c2 and b1 == b2, "same (corpus, seed) must be bit-identical"
    c3, _ = _train(spark, seed=8)
    assert c1 != c3, "a different seed must retrain a different quantizer"
    # artifact shapes match what the search operators consume
    assert len(c1) == 12 and all(len(c) == 64 for c in c1)
    assert len(b1) == 16 and all(len(bk) == 16 for bk in b1)
    assert all(len(cell) == 4 for bk in b1 for cell in bk)


def test_q44_shape_parity_on_retrained_centroids(spark, monkeypatch):
    """q44's full assign/probe/re-rank pipeline against centroids trained
    in-engine at seed=7 must still match the DuckDB oracle built from the
    SAME retrained literals — the artifact path is interchangeable."""
    from cosmo_spark.queries import ivf_centroids, misc
    from cosmo_spark.queries import all_queries
    from tools.parity import compare

    cents, _ = _train(spark, seed=7)
    monkeypatch.setattr(ivf_centroids, "IVF_CENTROIDS", cents)
    q = all_queries()["q44_ivf_ann"]
    oracle = misc._Q44_ORACLE.format(cents=misc._ivf_centroids_duckdb())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    problems = compare("q44_retrained", q.spark_fn(spark, SF), con, oracle)
    assert not problems, problems


def test_q88_shape_parity_on_retrained_ivf_pq(spark, monkeypatch, tmp_path):
    """q88's at-rest IVF-PQ index pipeline with BOTH quantizers retrained
    in-engine at seed=7: build index, probe, ADC-rank, re-rank — and the
    oracle rebuilt from the same retrained artifacts agrees.  Runs against
    a COPY of the embeddings table so the fingerprinted at-rest index of
    the committed artifacts is never poisoned."""
    from cosmo_spark.queries import ivf_centroids, pq_codebooks, trainprep
    from cosmo_spark.queries import all_queries
    from tools.parity import compare

    cents, books = _train(spark, seed=7)
    monkeypatch.setattr(ivf_centroids, "IVF_CENTROIDS", cents)
    monkeypatch.setattr(pq_codebooks, "PQ_CODEBOOKS", books)

    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    shutil.copy(f"{SF}/embeddings.parquet", sf_dir / "embeddings.parquet")

    q = all_queries()["q88_ivf_pq_search"]
    oracle = trainprep._q88_oracle()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_dir}/embeddings.parquet'"
    )
    problems = compare(
        "q88_retrained", q.spark_fn(spark, str(sf_dir)), con, oracle
    )
    assert not problems, problems
