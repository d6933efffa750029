"""Distributed PCA / whitening for embedding columns.

The heavy half of PCA — the d×d covariance (gramian) of an n×d corpus —
is a pure aggregation and runs distributed: each row emits its flattened
outer product (a row-local d² array, the BLAS rank-1 update), hash
aggregation collapses partials map-side, and the exchange carries one row
per (i, j) cell — d² rows total, independent of corpus size.  This is the
same shape as MLlib's RowMatrix.computeGramianMatrix treeAggregate,
expressed declaratively so Catalyst/Tungsten run it in codegen.

The light half — the d×d eigendecomposition — is a driver-side numpy
``eigh`` on the collected cell table (d² doubles, bounded by construction:
``dim`` is validated ≤ 1024 so the collect is ≤ 8 MB).  The resulting
top-k eigenbasis ships back as a LITERAL projection matrix (the q44
centroid / q55 plane discipline), so the projection itself is row-local
codegen arithmetic with no shuffle and no Python on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cosmo_spark.functions.vectors import as_double


def covariance_cells(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """(i, j, n, sxy, sxi, sxj) sufficient-statistic cells of the biased
    covariance: cov[i,j] = sxy/n − (sxi/n)(sxj/n), 1-based indices.

    One corpus scan; the only exchange carries d² partially-aggregated
    cells per map partition.  Since round 11 the map side is the TRUE
    RowMatrix.computeGramianMatrix shape: an Arrow-batched numpy
    ``X.T @ X`` per batch (BLAS dgemm), yielding one d²-cell partial
    frame per partition — the 10× certification caught the declarative
    posexplode form paying ~160 ns per outer-product ELEMENT through the
    hash aggregate (d²·n row-objects: 13.4 s at 82M elements), where the
    dgemm partial is memory-bandwidth-bound and output-invariant.  The
    expression form survives as :func:`covariance_cells_expr` (the
    no-Arrow fallback and the equivalence gate's independent
    implementation).  The division is left to the caller so downstream
    consumers (q81's rounded output, pca_whiten's eigensolver) choose
    their own precision policy on identical sums.
    """
    v = as_double(F.col(vec_col))
    # null-element rows are excluded like wrong-length rows: np.asarray
    # would turn them into NaN and poison the whole partition's Gramian
    # partial, while the expr fallback's F.sum silently skips null
    # products per-cell — the shared filter is what makes the two
    # implementations' "same output contract" true (r11 advice)
    base = df.select(v.alias("__v")).filter(
        (F.size("__v") == dim)
        & ~F.exists("__v", lambda x: x.isNull())
    )
    d = int(dim)

    def gram(batches):
        # defined inside the closure: pickled by value, no repo import on
        # the executors (the mapInPandas discipline)
        import numpy as np
        import pandas as pd

        S = np.zeros((d, d))
        s = np.zeros(d)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(
                [np.asarray(r, dtype=np.float64) for r in pdf["__v"]]
            )
            S += X.T @ X
            s += X.sum(axis=0)
            n += X.shape[0]
        if not n:
            return
        ii, jj = np.divmod(np.arange(d * d), d)
        yield pd.DataFrame({
            "i": pd.Series(ii + 1, dtype="int32"),
            "j": pd.Series(jj + 1, dtype="int32"),
            "n": pd.Series(np.full(d * d, n), dtype="int64"),
            "sxy": S.reshape(-1),
            "sxi": s[ii],
            "sxj": s[jj],
        })

    partials = base.mapInPandas(
        gram, "i INT, j INT, n BIGINT, sxy DOUBLE, sxi DOUBLE, sxj DOUBLE"
    )
    return partials.groupBy("i", "j").agg(
        F.sum("n").alias("n"),
        F.sum("sxy").alias("sxy"),
        F.sum("sxi").alias("sxi"),
        F.sum("sxj").alias("sxj"),
    )


def covariance_cells_expr(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """The pure-expression (posexplode + hash aggregate) form of
    :func:`covariance_cells` — kept as the Arrow-free fallback and as the
    independent implementation the equivalence unit compares the dgemm
    path against.  Same output contract.
    """
    v = as_double(F.col(vec_col))
    # same null-element exclusion as the dgemm path (see covariance_cells)
    base = df.select(v.alias("__v")).filter(
        (F.size("__v") == dim)
        & ~F.exists("__v", lambda x: x.isNull())
    )
    # full d² flat outer product per row: a PRIMITIVE double array through
    # posexplode codegen.  An upper-triangle-only variant (struct{i,j,p}
    # per element, mirrored after the aggregate) was measured SLOWER at
    # sf0.1 and 10× despite halving the multiplies — per-element struct
    # allocation costs more than the saved arithmetic; the flat array is
    # the fast expression shape (and still ~8× the dgemm partial).
    outer = F.flatten(
        F.transform("__v", lambda xi: F.transform("__v", lambda xj: xi * xj))
    )
    cells = (
        base.select(F.posexplode(outer).alias("pos", "p"))
        .groupBy("pos")
        .agg(F.sum("p").alias("sxy"), F.count(F.lit(1)).alias("n"))
        .select(
            (F.expr(f"pos div {dim}") + 1).alias("i"),
            (F.col("pos") % dim + 1).alias("j"),
            "n",
            "sxy",
        )
    )
    sums = (
        base.select(F.posexplode("__v").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.sum("x").alias("s"))
        .select((F.col("pos") + 1).alias("k"), "s")
    )
    return (
        cells.join(F.broadcast(sums.select(F.col("k").alias("i"), F.col("s").alias("sxi"))), "i")
        .join(F.broadcast(sums.select(F.col("k").alias("j"), F.col("s").alias("sxj"))), "j")
        .select("i", "j", "n", "sxy", "sxi", "sxj")
    )


def pca_whiten(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    dim: int,
    eps: float = 1e-9,
) -> DataFrame:
    """Project each vector onto the top-k principal components, scaled to
    unit variance (ZCA-free whitening) — the standard embedding
    pre-conditioning before cosine dedup / ANN (dominant-direction removal
    concentrates similarity scores).

    Returns (id_col, proj: array<double>[k]).  The covariance aggregation
    is the distributed part; eigh runs on the driver over d² collected
    doubles (``dim`` ≤ 1024 enforced), and the eigenbasis returns to the
    plan as one nested-array literal — no UDF, no shuffle in the
    projection.
    """
    if dim > 1024:
        raise ValueError(
            f"dim={dim}: driver-side eigh is bounded to dim <= 1024; "
            "use a sketched/iterative solver beyond that"
        )
    import numpy as np

    rows = covariance_cells(df, vec_col, dim).collect()
    if not rows:
        raise ValueError("pca_whiten: no rows with the expected dimension")
    n = rows[0]["n"]
    cov = np.zeros((dim, dim))
    mu = np.zeros(dim)
    for r in rows:
        i, j = r["i"] - 1, r["j"] - 1
        cov[i, j] = r["sxy"] / n - (r["sxi"] / n) * (r["sxj"] / n)
        mu[i] = r["sxi"] / n
    w, vecs = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    lam = w[order]
    basis = vecs[:, order]  # dim × k
    # deterministic sign: make each component's largest-|.| coordinate positive
    for c in range(k):
        pivot = int(np.argmax(np.abs(basis[:, c])))
        if basis[pivot, c] < 0:
            basis[:, c] = -basis[:, c]

    # single SQL-parsed literals (the pq.py _book_lit lesson): per-float
    # F.lit would cost a py4j round trip each — ~65k at dim=1024, k=64
    mu_lit = F.expr(
        "array(" + ", ".join(f"{float(x)!r}D" for x in mu) + ")"
    )
    comp_lit = F.expr(
        "array(" + ", ".join(
            "array(" + ", ".join(f"{float(basis[d_, c])!r}D" for d_ in range(dim)) + ")"
            for c in range(k)
        ) + ")"
    )
    scale_lit = F.expr(
        "array(" + ", ".join(
            f"{1.0 / float(np.sqrt(max(lam[c], 0.0) + eps))!r}D" for c in range(k)
        ) + ")"
    )
    v = as_double(F.col(vec_col))
    # same dim filter as the covariance: rows that didn't train the basis
    # (wrong dimension / null vector) are excluded, not emitted as
    # all-null projections
    out = (
        df.select(F.col(id_col), v.alias("__raw"))
        .filter(F.size("__raw") == dim)
        .select(
            id_col,
            F.zip_with("__raw", mu_lit, lambda x, m: x - m).alias("__c"),
        )
    )
    proj = F.zip_with(
        comp_lit,
        scale_lit,
        lambda comp, s: F.aggregate(
            F.zip_with(F.col("__c"), comp, lambda x, w_: x * w_),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        * s,
    )
    return out.select(id_col, proj.alias("proj"))
