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
