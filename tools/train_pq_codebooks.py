"""Regenerate cosmo_spark/queries/pq_codebooks.py.

Deterministic offline training of the q86/q87 product-quantization
codebooks: the 64-dim embedding splits into 16 subspaces of 4 dims; each
subspace gets its own k=16 codebook via seeded numpy Lloyd iterations
(k-means++-free farthest-point seeding from a hash-ordered sample, the
operators/kmeans.py discipline, here in-process because each training set
is 8-dim and bounded).  Codebooks are rounded to 6 decimals and shipped
as a literal artifact — the production PQ pattern (train offline on a
sample, version with the code), and what makes encode/ADC-search
expressible in the DuckDB oracles.

Two codebook sets are trained:

- ``PQ_CODEBOOKS`` on the raw vectors (q86/q87, and q88's non-residual
  IVF-PQ).
- ``PQ_RESIDUAL_CODEBOOKS`` on IVF residuals (vector − assigned coarse
  centroid, assignment replicating operators/similarity.assign_buckets's
  cosine + tie rules against the q44 literal centroids) — the production
  IVF-PQ refinement (q90).  On clustered corpora residuals concentrate
  near zero and the same 16 cells per subspace cut quantization error
  sharply; on THIS near-uniform synthetic table the gain is measured and
  modest (mean reconstruction SE/vector 0.3159 residual vs 0.3286 raw —
  the coarse quantizer only removes ~4% of the energy), which the q90
  recall grid in COVERAGE.md reports honestly.

Geometry chosen from a measured grid (numpy reference, 8 queries,
recall@5 of the ADC-shortlist-50 + exact-re-rank pipeline vs exact L2
top-5 at sf0.01, training on sf0.1):

    raw ADC top-5 (no re-rank):    8x16 0.175   16x16 0.275   32x64 0.650
    shortlist-50 + exact re-rank:  8x16 0.700   16x16 0.975   16x64 0.950

16 subspaces x 16 centroids wins at a 1 KB codebook budget: the re-rank
stage (the production shape — rank codes, rehydrate only the shortlist)
is what buys the last 30 recall points, not a fatter codebook.

Usage: python tools/train_pq_codebooks.py [sf_dir]
"""

from __future__ import annotations

import sys

N_SUBSPACES = 16
SUB_DIM = 4
K = 16
ITERATIONS = 12


def _repo_on_path():
    import sys as _sys
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _train_subspace(x, k: int, iterations: int):
    """Deterministic Lloyd — shared with the engine API (r7: the trainer
    moved to operators/train.lloyd_subspace so tool and engine cannot
    drift; this wrapper keeps the tool's historical entry point)."""
    _repo_on_path()
    from cosmo_spark.operators.train import lloyd_subspace

    return lloyd_subspace(x, k, iterations)


def _ivf_assign(x):
    """Replicate assign_buckets (cosine, tie -> lowest bucket, zero-norm ->
    lowest bucket) against the q44 literal centroids — delegated to the
    engine's numpy replica (operators/train._assign_to) so the assignment
    rules live in one place."""
    _repo_on_path()
    from cosmo_spark.operators.train import _assign_to
    from cosmo_spark.queries.ivf_centroids import IVF_CENTROIDS

    return _assign_to(x, IVF_CENTROIDS)


def main(sf_dir: str = "/root/testdata/sf0.1") -> None:
    import duckdb
    import numpy as np

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT CAST(embedding AS DOUBLE[]) FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    x = np.array([r[0] for r in rows])
    books = []
    for s in range(N_SUBSPACES):
        sub = x[:, s * SUB_DIM : (s + 1) * SUB_DIM]
        books.append(_train_subspace(sub, K, ITERATIONS))
    resid = x - _ivf_assign(x)
    rbooks = []
    for s in range(N_SUBSPACES):
        sub = resid[:, s * SUB_DIM : (s + 1) * SUB_DIM]
        rbooks.append(_train_subspace(sub, K, ITERATIONS))

    lines = [
        '"""Offline-trained product-quantization codebooks for q86/q87.',
        "",
        "16 subspaces x 16 centroids x 4 dims, trained by",
        "``tools/train_pq_codebooks.py`` (deterministic seeded Lloyd) on the",
        "sf0.1 embeddings, rounded to 6 decimals.  A literal artifact for the",
        "same reason as the IVF centroids and SRP planes: the quantizer is",
        "versioned with the code and the whole encode / ADC-search pipeline",
        "stays DuckDB-oracle-expressible.",
        '"""',
        "",
        "#: [subspace][centroid][dim]",
        "PQ_CODEBOOKS: list[list[list[float]]] = [",
    ]
    for s, book in enumerate(books):
        lines.append(f"    [  # subspace {s}")
        for c in book:
            lines.append(
                "        [" + ", ".join(repr(round(float(v), 6)) for v in c) + "],"
            )
        lines.append("    ],")
    lines += ["]", ""]
    lines += [
        "#: [subspace][centroid][dim] — trained on IVF residuals (q90)",
        "PQ_RESIDUAL_CODEBOOKS: list[list[list[float]]] = [",
    ]
    for s, book in enumerate(rbooks):
        lines.append(f"    [  # subspace {s}")
        for c in book:
            lines.append(
                "        [" + ", ".join(repr(round(float(v), 6)) for v in c) + "],"
            )
        lines.append("    ],")
    lines += ["]", ""]
    with open("/root/repo/cosmo_spark/queries/pq_codebooks.py", "w") as f:
        f.write("\n".join(lines))
    # report quantization quality
    for label, data, bks in (("raw", x, books), ("residual", resid, rbooks)):
        mse = 0.0
        for s, book in enumerate(bks):
            sub = data[:, s * SUB_DIM : (s + 1) * SUB_DIM]
            d = ((sub[:, None, :] - book[None, :, :]) ** 2).sum(axis=2)
            mse += d.min(axis=1).mean()
        print(f"{label}: {N_SUBSPACES}x{K}x{SUB_DIM} codebooks; "
              f"mean reconstruction SE/vector = {mse:.6f}")


if __name__ == "__main__":
    main(*sys.argv[1:])
