"""Gates for the distributed logistic-regression trainer (train_logreg)
and the q150 quality-classifier artifacts.

The catalog corpus carries NO learnable linear signal (q150's docstring
documents the deliberately-flat calibration), so the trainer's ability to
LEARN is pinned here on a planted-signal dataset, and its determinism —
the property the whole oracle story rests on — is pinned under hostile
repartitioning.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from cosmo_spark.operators.train import train_logreg
from tests.conftest import SF_SMOKE

# heavyweight Spark suite: deselected by the default `addopts` fast set so
# the driver's verify completes inside its window (r13 verdict #7); run via
# `pytest -m slow` or the full suite via `pytest --override-ini addopts= tests/`
pytestmark = pytest.mark.slow


def _planted(n=400, d=8, seed=7):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, d)
    w_true = rng.randn(d)
    y = (X @ w_true + 0.3 * rng.randn(n) > 0).astype(int)
    return X, y


def _df(spark, X, y):
    rows = [
        (int(i), [float(v) for v in X[i]], int(y[i]))
        for i in range(len(y))
    ]
    return spark.createDataFrame(
        rows, "id long, embedding array<double>, y int"
    )


def test_deterministic_under_repartitioning(spark):
    X, y = _planted()
    df = _df(spark, X, y)
    w1, d1 = train_logreg(df.repartition(3), label_col="y", n_iter=8)
    w2, d2 = train_logreg(df.repartition(11), label_col="y", n_iter=8)
    w3, d3 = train_logreg(df.coalesce(1), label_col="y", n_iter=8)
    assert (w1, d1) == (w2, d2) == (w3, d3)
    assert d1 == 8 and len(w1) == 9


def test_learns_planted_signal(spark):
    X, y = _planted()
    df = _df(spark, X, y)
    train = df.filter("id % 5 != 0")
    wq, dim = train_logreg(train, label_col="y", n_iter=24)
    w = np.array(wq[:dim]) / 1e6
    b = wq[dim] / 1e6
    s = X @ w + b
    held = np.arange(len(y)) % 5 == 0
    sh, yh = s[held], y[held]
    order = np.argsort(sh)
    ranks = np.empty(len(sh))
    ranks[order] = np.arange(1, len(sh) + 1)
    pos = yh == 1
    auc = (ranks[pos].sum() - pos.sum() * (pos.sum() + 1) / 2) / (
        pos.sum() * (len(yh) - pos.sum())
    )
    assert auc > 0.9, f"held-out AUC {auc:.3f} on planted signal"


def test_loss_decreases(spark):
    X, y = _planted()
    df = _df(spark, X, y)

    def loss(wq, dim):
        w = np.array(wq[:dim]) / 1e6
        b = wq[dim] / 1e6
        m = X @ w + b
        p = 1 / (1 + np.exp(-m))
        eps = 1e-12
        return -np.mean(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))

    w0 = [0] * 9
    w8, dim = train_logreg(df, label_col="y", n_iter=8)
    assert loss(w8, dim) < loss(w0, 8) - 0.05


def test_degenerate_inputs(spark):
    empty = spark.createDataFrame([], "embedding array<double>, y int")
    assert train_logreg(empty, label_col="y") == ([], 0)
    # all rows unusable (null vector / null label): nothing to even probe
    # a dim from — the untrainable signal is ([], 0), not zero weights at
    # a guessed dim
    nulls = spark.createDataFrame(
        [(None, 1), ([0.5, 0.5], None)], "embedding array<double>, y int"
    )
    assert train_logreg(nulls, label_col="y", n_iter=2) == ([], 0)
    # ragged vectors are excluded (dim = the most frequent usable size)
    ragged = spark.createDataFrame(
        [([1.0, 0.0], 1), ([1.0], 0), ([0.0, 1.0], 0)],
        "embedding array<double>, y int",
    )
    w, dim = train_logreg(ragged, label_col="y", n_iter=2)
    assert dim == 2 and len(w) == 3


def test_seed_matches_retraining(spark):
    """The committed QUALITY_SEED entry for sf0.001 is bit-identical to
    retraining on that corpus — the claim the seed-cache design makes."""
    from cosmo_spark.queries.artifacts import corpus_fingerprint
    from cosmo_spark.queries.quality_artifacts import QUALITY_SEED, _train

    fp = corpus_fingerprint(spark, SF_SMOKE)
    assert fp in QUALITY_SEED, "sf0.001 fingerprint missing from seed"
    dim, w = _train(spark, SF_SMOKE)
    assert (dim, tuple(w)) == QUALITY_SEED[fp]


def test_resolve_caches_new_corpus(spark, tmp_path, monkeypatch):
    """A non-seed corpus trains once, writes the at-rest cache entry, and
    the next resolution loads it without training."""
    import cosmo_spark.queries.quality_artifacts as qa

    monkeypatch.setattr(qa, "_cache_dir", lambda: tmp_path / "qa")
    monkeypatch.setattr(qa, "_RESOLVED", {})
    # a fabricated corpus directory: reuse sf0.001 parquet but force an
    # unknown fingerprint by pointing the fingerprint at fresh data
    src = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    corpus = tmp_path / "corpus"
    src.limit(60).write.parquet(str(corpus / "embeddings.parquet"))
    dim, w = qa.resolve_quality_weights(spark, str(corpus))
    assert dim == 64 and len(w) == 65
    files = list((tmp_path / "qa").glob("*.json"))
    assert len(files) == 1
    calls = {"n": 0}
    real_train = qa._train

    def counting(*a, **k):
        calls["n"] += 1
        return real_train(*a, **k)

    monkeypatch.setattr(qa, "_train", counting)
    monkeypatch.setattr(qa, "_RESOLVED", {})
    dim2, w2 = qa.resolve_quality_weights(spark, str(corpus))
    assert (dim2, w2) == (dim, w)
    assert calls["n"] == 0, "second resolution must hit the at-rest cache"


def test_q150_bands_are_fixed_logit_cutoffs():
    """Hand-pinned band edges (logit(k/10) in 1e12 margin units) — NOT
    recomputed from the generator expression, which would be tautological:
    these literals were verified once against scipy.special.logit and pin
    both the formula AND the 1e12 scale."""
    from cosmo_spark.queries.vectorops import _Q150_CUTS

    assert _Q150_CUTS == (
        -2197224577336, -1386294361120, -847297860387, -405465108108,
        0, 405465108108, 847297860387, 1386294361120, 2197224577336,
    )


def test_bounded_sample_training_is_deterministic_and_learns(spark):
    """The 100 TB discipline in the engine, not just the docstring:
    content-hash bounded-sample training (sample_mod) is bit-deterministic
    under repartitioning and still learns the planted signal from the
    subsample."""
    X, y = _planted(n=1200, d=8, seed=11)
    df = _df(spark, X, y)
    w1, d1 = train_logreg(
        df.repartition(3), label_col="y", n_iter=24, sample_mod=3
    )
    w2, d2 = train_logreg(
        df.repartition(13), label_col="y", n_iter=24, sample_mod=3
    )
    assert (w1, d1) == (w2, d2)
    # sampled training differs from full-corpus training (it really did
    # subsample) ...
    wf, _ = train_logreg(df, label_col="y", n_iter=24)
    assert w1 != wf
    # ... and still learns: AUC over ALL rows
    w = np.array(w1[:d1]) / 1e6
    s = X @ w + w1[d1] / 1e6
    order = np.argsort(s)
    ranks = np.empty(len(s))
    ranks[order] = np.arange(1, len(s) + 1)
    pos = y == 1
    auc = (ranks[pos].sum() - pos.sum() * (pos.sum() + 1) / 2) / (
        pos.sum() * (len(y) - pos.sum())
    )
    assert auc > 0.9, f"AUC {auc:.3f} from 1/3 sample"


def test_ragged_corpus_dim_is_partition_invariant(spark):
    """Finding-1 regression: dim comes from a mode aggregate, so a
    mixed-dim corpus picks the majority size and trains identically
    under any partitioning (a limit(1) probe flipped with layout)."""
    X, y = _planted(n=90, d=8)
    rows = [
        (int(i), [float(v) for v in X[i]], int(y[i])) for i in range(90)
    ] + [
        (1000 + j, [0.5, -0.5, 0.25, -0.25], j % 2) for j in range(40)
    ]
    df = spark.createDataFrame(
        rows, "id long, embedding array<double>, y int"
    )
    w1, d1 = train_logreg(df.repartition(3), label_col="y", n_iter=4)
    w2, d2 = train_logreg(df.repartition(17), label_col="y", n_iter=4)
    assert d1 == d2 == 8
    assert w1 == w2
    # NULL/NaN-element vectors are excluded, not silently biased
    bad = spark.createDataFrame(
        [(1, [1.0, None], 1), (2, [float("nan"), 0.0], 0),
         (3, [0.5, 0.5], 1), (4, [-0.5, 0.2], 0)],
        "id long, embedding array<double>, y int",
    )
    w, dim = train_logreg(bad, label_col="y", n_iter=2)
    assert dim == 2 and len(w) == 3


def test_dim_probe_ignores_untrainable_majority(spark):
    """Review regression: a corrupted majority batch (NaN elements, or
    null labels) must not elect the dim — the probe applies the SAME
    usability predicates as training."""
    rows = (
        [(i, [float("nan")] * 4, 1) for i in range(60)]          # corrupt
        + [(100 + j, [0.5 * j, -0.25, 1.0, 0.0, 0.5, -1.0, 0.25, 2.0],
            j % 2) for j in range(30)]                            # usable
    )
    df = spark.createDataFrame(
        rows, "id long, embedding array<double>, y int"
    )
    w, dim = train_logreg(df, label_col="y", n_iter=2)
    assert dim == 8 and len(w) == 9 and any(v != 0 for v in w)
