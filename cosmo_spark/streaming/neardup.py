"""Streaming embedding near-dedup: SRP-LSH bucketing + stateful in-bucket
verification — the streaming twin of ``operators.dedup.srp_lsh_near_dups``
(and the near-dup analog of q50's exact ``dropDuplicates`` stream).

Shape: the signed-random-projection band code is computed JVM-side with the
SAME expressions as the batch operator (one nested-array plane literal, one
``transform`` for the sign bits, one ``aggregate`` fold for the code), so
blocking semantics are shared bit-for-bit.  The stream then groups by the
code and an ``applyInPandasWithState`` keeper holds each bucket's accepted
vectors: a new arrival is emitted with ``dup_of`` = the first accepted
near-duplicate (exact cosine >= threshold) or accepted into state itself.

Single-band geometry: a streaming keeper keyed by (band, code) across
``bands`` bands would need a second stateful "any band matched" reduction
per id — chained stateful operators, much heavier machinery for the same
demo.  One deep band (>= 16 bits) keeps state sharded by one key, at the
cost of band-level recall (a cos-0.95 pair agrees on one 16-bit band with
p ~ 0.44 vs 0.80 for 8 bands); exact copies (cos = 1) always collide.  The
batch operator with ``bands=1`` and the same planes produces the identical
candidate set — the cross-check the unit test runs.

Scale: state is O(accepted vectors per bucket), sharded by code across
executors; ``max_bucket`` fails loudly (the batch operator's guard
discipline) before a degenerate bucket's state or per-arrival compare cost
grows unbounded.  Production corpora additionally age state out with a
watermark-driven TTL (the ``dropDuplicatesWithinWatermark`` contract);
bounded-window semantics are a caller policy, not baked in here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: one row per arrival: accepted (dup_of null) or matched to an earlier id
OUT_SCHEMA = "id STRING, dup_of STRING, cos_sim DOUBLE, code BIGINT"
STATE_SCHEMA = "ids ARRAY<STRING>, vecs ARRAY<ARRAY<DOUBLE>>"


def stream_srp_near_dup(
    stream: DataFrame,
    vec_col: str,
    id_col: str,
    planes: Sequence[Sequence[int]],
    *,
    threshold: float,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Near-dup-annotate a stream of (id, vector) rows.

    ``planes`` is the single band: one ±1 row per signature bit (>= 16 bits
    recommended — few-bit codes are the same scale trap the batch docstring
    documents).  Returns a streaming DataFrame of ``OUT_SCHEMA`` rows in
    append mode.
    """
    from cosmo_spark.functions.vectors import as_double, dot

    bits = len(planes)
    # one SQL-parsed literal, not a py4j call per element (see the batch
    # operator's plane-literal note in operators/dedup.py)
    planes_lit = F.expr(
        "array(" + ", ".join(
            "array(" + ", ".join(f"{float(v)}D" for v in p) + ")"
            for p in planes
        ) + ")"
    )
    sig = F.transform(
        planes_lit, lambda p: F.when(dot(F.col("__v"), p) > 0, 1).otherwise(0)
    )
    coded = stream.select(
        F.col(id_col).cast("string").alias("__id"),
        as_double(F.col(vec_col)).alias("__v"),
    ).select(
        "__id", "__v",
        F.aggregate(sig, F.lit(0).cast("long"), lambda acc, x: acc * 2 + x)
        .alias("__code"),
    )

    return coded.groupBy("__code").applyInPandasWithState(
        make_keeper(threshold, max_bucket),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def make_keeper(threshold: float, max_bucket: int):
    """Build the per-bucket stateful keeper closure.

    Module-level factory so tests can drive the exact production closure
    against a fake ``GroupState`` (the numpy-vs-reference property test);
    the RETURNED function is still a nested closure, which cloudpickle
    ships by value — imports inside, constants bound — so python workers
    need no repo on sys.path.
    """
    thr = float(threshold)
    cap = int(max_bucket)

    def keeper(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        ids, vecs = state.get if state.exists else ([], [])
        ids = list(ids)
        # accepted matrix in a capacity-doubling buffer: one mat-vec per
        # arrival instead of a per-row python loop (≈10× constant factor),
        # and appends stay amortized O(d) — the one former pure-python
        # inner loop in the repo, vectorized per round-4 review
        dim = len(vecs[0]) if vecs else None
        k = len(ids)
        capacity = max(16, 2 * k) if dim is not None else 0
        M = np.zeros((capacity, dim or 0), dtype=np.float64)
        if k:
            M[:k] = np.asarray([list(v) for v in vecs], dtype=np.float64)
        norms = np.zeros(capacity, dtype=np.float64)
        norms[:k] = np.sqrt(np.einsum("ij,ij->i", M[:k], M[:k]))
        out_id, out_dup, out_cos = [], [], []
        rows = []
        for pdf in pdfs:
            rows.extend(zip(pdf["__id"], pdf["__v"]))
        rows.sort(key=lambda r: r[0])  # deterministic within a micro-batch
        for rid, rv in rows:
            v = np.asarray(rv, dtype=np.float64)
            if dim is not None and v.shape != (dim,):
                # loud guard (the max_bucket discipline): the mat-vec needs
                # consistent dims; the old python loop silently zip-truncated
                # mismatched vectors, which is a wrong answer, not a feature
                raise RuntimeError(
                    f"stream_srp_near_dup: vector {rid!r} has "
                    f"{v.shape[0] if v.ndim == 1 else 'malformed'} dims, "
                    f"bucket state holds {dim} — mixed embedding dims in "
                    "one stream; normalize upstream"
                )
            n = float(np.sqrt(v @ v))
            match, sim = None, None
            if k and n > 0:
                denom = norms[:k] * n
                live = denom > 0
                sims = np.full(k, -np.inf)
                np.divide(M[:k] @ v, denom, out=sims, where=live)
                # first accepted match in insertion order (row order == age)
                hit = np.flatnonzero(sims >= thr)
                if hit.size:
                    i = int(hit[0])
                    match, sim = ids[i], float(sims[i])
            if match is None:
                if dim is None:
                    dim = len(v)
                    capacity = 16
                    M = np.zeros((capacity, dim), dtype=np.float64)
                    norms = np.zeros(capacity, dtype=np.float64)
                elif k == capacity:
                    capacity *= 2
                    M = np.vstack([M, np.zeros_like(M)])
                    norms = np.concatenate([norms, np.zeros_like(norms)])
                ids.append(rid)
                M[k] = v
                norms[k] = n
                k += 1
                if k > cap:
                    raise RuntimeError(
                        f"stream_srp_near_dup: bucket code={key[0]} holds "
                        f"{k} accepted vectors > max_bucket={cap} — "
                        "degenerate bucket; deepen the band or shard the key"
                    )
            out_id.append(rid)
            out_dup.append(match)
            out_cos.append(sim)
        state.update((ids, [M[i].tolist() for i in range(k)]))
        yield pd.DataFrame({
            "id": out_id, "dup_of": out_dup, "cos_sim": out_cos,
            "code": [key[0]] * len(out_id),
        })

    return keeper
