"""Distributed covariance + driver-side eigh whitening (operators/pca.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cosmo_spark.operators.pca import covariance_cells, pca_whiten

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _np_matrix(emb):
    import pandas as pd

    pdf = emb.toPandas()
    return np.vstack(pdf["embedding"].map(np.asarray).to_numpy())


def test_covariance_matches_numpy(spark, emb):
    x = _np_matrix(emb)
    want = np.cov(x, rowvar=False, bias=True)
    got = np.zeros_like(want)
    for r in covariance_cells(emb, "embedding", 64).collect():
        n = r["n"]
        got[r["i"] - 1, r["j"] - 1] = (
            r["sxy"] / n - (r["sxi"] / n) * (r["sxj"] / n)
        )
    assert np.abs(got - want).max() < 1e-9
    assert np.abs(got - got.T).max() < 1e-12  # symmetric by construction


def test_whitened_components_are_decorrelated_unit_variance(spark, emb):
    k = 8
    out = pca_whiten(emb, "embedding", "vec_id", k=k, dim=64)
    y = np.vstack([np.asarray(r["proj"]) for r in out.collect()])
    assert y.shape[1] == k
    c = np.cov(y, rowvar=False, bias=True)
    assert np.abs(c - np.eye(k)).max() < 1e-6


def test_projection_matches_numpy_reference(spark, emb):
    x = _np_matrix(emb)
    cov = np.cov(x, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:4]
    lam, basis = w[order], v[:, order]
    for c in range(4):
        p = int(np.argmax(np.abs(basis[:, c])))
        if basis[p, c] < 0:
            basis[:, c] = -basis[:, c]
    want = (x - x.mean(axis=0)) @ basis / np.sqrt(lam + 1e-9)
    out = pca_whiten(emb, "embedding", "vec_id", k=4, dim=64)
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    got = {r["vec_id"]: np.asarray(r["proj"]) for r in out.collect()}
    got = np.vstack([got[i] for i in ids])
    assert np.abs(got - want).max() < 1e-6


def test_deterministic_across_runs(spark, emb):
    a = pca_whiten(emb, "embedding", "vec_id", k=3, dim=64).collect()
    b = pca_whiten(emb, "embedding", "vec_id", k=3, dim=64).collect()
    assert sorted(map(repr, a)) == sorted(map(repr, b))


def test_dim_bound_enforced(spark, emb):
    with pytest.raises(ValueError):
        pca_whiten(emb, "embedding", "vec_id", k=2, dim=2048)


def test_gramian_kernel_matches_expression_form(spark, emb):
    """The Arrow dgemm partial (round-11 kernel) and the posexplode
    expression form agree cell-for-cell to float tolerance on the real
    embeddings — the independent-implementation gate for the swap."""
    from cosmo_spark.operators.pca import covariance_cells_expr

    got = {
        (r.i, r.j): (r.n, r.sxy, r.sxi, r.sxj)
        for r in covariance_cells(emb, "embedding", 64).collect()
    }
    want = {
        (r.i, r.j): (r.n, r.sxy, r.sxi, r.sxj)
        for r in covariance_cells_expr(emb, "embedding", 64).collect()
    }
    assert set(got) == set(want) and len(got) == 64 * 64
    for k, (n, sxy, sxi, sxj) in want.items():
        gn, gxy, gxi, gxj = got[k]
        assert gn == n
        assert abs(gxy - sxy) <= 1e-9 * max(1.0, abs(sxy))
        assert abs(gxi - sxi) <= 1e-9 * max(1.0, abs(sxi))
        assert abs(gxj - sxj) <= 1e-9 * max(1.0, abs(sxj))


def test_gramian_kernel_empty_and_wrong_dim(spark):
    """Zero qualifying rows -> zero cells (no raise), mixed dims filter."""
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [1.0] * 64)],
        "id INT, embedding ARRAY<DOUBLE>",
    )
    assert covariance_cells(df.filter("id < 3"), "embedding", 64).count() == 0
    assert covariance_cells(df, "embedding", 64).count() == 64 * 64


def test_gramian_null_element_rows_excluded_both_paths(spark):
    """r11 advice: a vector containing a NULL element is excluded like a
    wrong-length one, in BOTH implementations — previously the dgemm
    path NaN-poisoned its whole partition's partial while the expression
    form skipped null products per-cell (divergent 'same contract')."""
    from cosmo_spark.operators.pca import covariance_cells_expr

    clean = [(i, [float(i + j) for j in range(4)]) for i in range(5)]
    dirty = [(99, [1.0, None, 3.0, 4.0]), (98, [None] * 4)]
    df = spark.createDataFrame(
        clean + dirty, "id INT, embedding ARRAY<DOUBLE>"
    )
    ref = {
        (r.i, r.j): (r.n, r.sxy, r.sxi, r.sxj)
        for r in covariance_cells(
            spark.createDataFrame(clean, "id INT, embedding ARRAY<DOUBLE>"),
            "embedding", 4,
        ).collect()
    }
    for impl in (covariance_cells, covariance_cells_expr):
        got = {
            (r.i, r.j): (r.n, r.sxy, r.sxi, r.sxj)
            for r in impl(df, "embedding", 4).collect()
        }
        assert set(got) == set(ref), impl.__name__
        for k, (n, sxy, sxi, sxj) in ref.items():
            gn, gxy, gxi, gxj = got[k]
            assert gn == n, impl.__name__
            assert abs(gxy - sxy) < 1e-9, impl.__name__
            assert abs(gxi - sxi) < 1e-9 and abs(gxj - sxj) < 1e-9, (
                impl.__name__
            )
