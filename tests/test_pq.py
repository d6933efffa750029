"""Product quantization: encode + ADC search vs numpy reference."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cosmo_spark.operators.pq import pq_adc_topk, pq_encode

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def books():
    from cosmo_spark.queries.pq_codebooks import PQ_CODEBOOKS

    return PQ_CODEBOOKS


def _np_data(emb):
    pdf = emb.orderBy("vec_id").toPandas()
    ids = pdf["vec_id"].to_numpy()
    x = np.vstack(pdf["embedding"].map(np.asarray).to_numpy())
    return ids, x


def test_encode_matches_numpy_argmin(spark, emb, books):
    ids, x = _np_data(emb)
    cb = np.asarray(books)
    n_sub, sd = cb.shape[0], cb.shape[2]
    got = {r["vec_id"]: r for r in pq_encode(emb, "embedding", "vec_id", books).collect()}
    for row_i, vid in enumerate(ids[:50]):
        v = x[row_i]
        codes, se = [], 0.0
        for s in range(n_sub):
            d = ((cb[s] - v[s * sd : (s + 1) * sd]) ** 2).sum(axis=1)
            codes.append(int(d.argmin()) + 1)
            se += d.min()
        assert list(got[vid]["codes"]) == codes
        assert abs(got[vid]["se"] - se) < 1e-9


def test_adc_matches_numpy_lookup_sum(spark, emb, books):
    ids, x = _np_data(emb)
    cb = np.asarray(books)
    out = pq_adc_topk(
        emb, emb.filter(F.col("vec_id") == int(ids[0])),
        "embedding", "vec_id", books, k=3,
    ).collect()
    q = x[0]
    n_sub, sd = cb.shape[0], cb.shape[2]
    # numpy: encode corpus, rank by lookup-table sum
    codes = np.stack([
        ((cb[s][None, :, :] - x[:, None, s * sd : (s + 1) * sd]) ** 2)
        .sum(axis=2).argmin(axis=1)
        for s in range(n_sub)
    ], axis=1)
    dt = np.stack([((cb[s] - q[s * sd : (s + 1) * sd]) ** 2).sum(axis=1)
                   for s in range(n_sub)])
    adc = np.array([dt[s][codes[:, s]] for s in range(n_sub)]).sum(axis=0)
    adc[0] = np.inf  # self excluded
    want_order = np.lexsort((ids, adc))[:3]
    got = sorted(out, key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in got] == [int(ids[i]) for i in want_order]
    for r, i in zip(got, want_order):
        assert abs(r["adc_dist"] - adc[i]) < 1e-9


def test_encode_deterministic(spark, emb, books):
    a = pq_encode(emb, "embedding", "vec_id", books).collect()
    b = pq_encode(emb, "embedding", "vec_id", books).collect()
    assert sorted(map(repr, a)) == sorted(map(repr, b))


def test_rerank_returns_exact_l2_order_on_shortlist(spark, emb, books):
    """With a shortlist as large as the corpus, re-ranked top-k must equal
    the exact L2 top-k (the re-rank stage is lossless given the list)."""
    ids, x = _np_data(emb)
    qid = int(ids[0])
    out = pq_adc_topk(
        emb, emb.filter(F.col("vec_id") == qid),
        "embedding", "vec_id", books, k=5, rerank=len(ids),
    ).collect()
    d = ((x - x[0]) ** 2).sum(axis=1)
    d[0] = np.inf
    want = [int(ids[i]) for i in np.lexsort((ids, d))[:5]]
    got = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert got == want


def test_encode_center_col_matches_numpy_residual(spark, emb):
    """Residual encode (center_col): codes/se must equal numpy quantization
    of (vector - assigned centroid) against the residual codebooks."""
    from cosmo_spark.queries.ivf_centroids import IVF_CENTROIDS
    from cosmo_spark.queries.pq_codebooks import PQ_RESIDUAL_CODEBOOKS
    from cosmo_spark.operators.similarity import assign_buckets

    ids, x = _np_data(emb)
    C = np.asarray(IVF_CENTROIDS)
    cb = np.asarray(PQ_RESIDUAL_CODEBOOKS)
    n_sub, sd = cb.shape[0], cb.shape[2]

    cents = spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(IVF_CENTROIDS)],
        "bucket INT, centroid ARRAY<DOUBLE>",
    )
    assigned = assign_buckets(emb, cents, "embedding", "vec_id").join(
        F.broadcast(cents.select("bucket", F.col("centroid").alias("__ctr"))),
        "bucket",
    )
    got = {
        r["vec_id"]: r
        for r in pq_encode(
            assigned, "embedding", "vec_id", PQ_RESIDUAL_CODEBOOKS,
            keep_cols=["bucket"], center_col="__ctr",
        ).collect()
    }

    # numpy reference: cosine assignment (tie -> lowest bucket), residual
    xn = np.linalg.norm(x, axis=1, keepdims=True)
    cn = np.linalg.norm(C, axis=1, keepdims=True)
    den = xn @ cn.T
    sims = np.where(den > 0, (x @ C.T) / np.where(den > 0, den, 1.0), -2.0)
    asg = sims.argmax(axis=1)
    for row_i, vid in enumerate(ids[:50]):
        r = x[row_i] - C[asg[row_i]]
        codes, se = [], 0.0
        for s in range(n_sub):
            d = ((cb[s] - r[s * sd:(s + 1) * sd]) ** 2).sum(axis=1)
            codes.append(int(d.argmin()) + 1)
            se += d.min()
        assert got[vid]["bucket"] == asg[row_i], vid
        assert list(got[vid]["codes"]) == codes, vid
        assert abs(got[vid]["se"] - se) < 1e-9


def test_ensure_pq_index_repairs_corrupt_publish(spark):
    """ADVICE r6: an index dir that exists WITHOUT _SUCCESS (crash
    mid-publish / tampering) must be repaired by the next build — the old
    publish step rebuilt into tmp, threw the build away, and returned a
    reader over the broken dir forever."""
    import shutil

    from cosmo_spark.queries.trainprep import _ensure_pq_index, _pq_index_dir

    sf = "/root/testdata/sf0.001"
    d = _pq_index_dir(sf, residual=False)
    shutil.rmtree(d, ignore_errors=True)
    n = _ensure_pq_index(spark, sf, residual=False).count()
    assert (d / "_SUCCESS").exists() and n > 0
    # corrupt: drop the marker, leave stale parquet behind
    (d / "_SUCCESS").unlink()
    n2 = _ensure_pq_index(spark, sf, residual=False).count()
    assert (d / "_SUCCESS").exists(), "repair did not republish"
    assert n2 == n
