"""Vector-quantizer artifact resolution — literals as a seeded cache.

The ANN family (q44, q75, q86–q88, q90, q105) consumes three trained
artifacts: IVF coarse centroids, PQ codebooks, and residual PQ codebooks.
Through round 7 these were ONLY the committed literal modules
(queries/ivf_centroids.py, queries/pq_codebooks.py), so a NEW corpus
required hand-running the tools/ trainers (round-7 verdict #3).  This
module makes the trainer (operators/train.train_ivf_pq) the default
artifact source and demotes the literals to what they really are: a
deterministic SEED CACHE, keyed by corpus fingerprint.

Resolution order for ``resolve_vector_artifacts(spark, sf_dir)``:

1. corpus fingerprint ∈ LITERAL_FPS and the literal modules import →
   the committed literals (bit-identical behavior on the test corpora,
   zero training cost);
2. an at-rest JSON cache entry for the fingerprint under
   spark-warehouse/vector_artifacts/ → load it;
3. train via ``train_ivf_pq`` (+ residual codebooks), write the cache
   entry atomically, return it.

Every resolution records the artifact set as the process-wide ACTIVE set;
``get_vector_artifacts()`` (what the VALUES-literal builders and the lazy
oracle builders read) returns the active set, falling back to the
literals when nothing has been resolved yet.  Both the Spark side and the
DuckDB oracle of every vector query therefore embed ONE artifact source —
which is what keeps parity green even when the literal modules are
removed entirely (gated by tests/test_artifacts.py).

The fingerprint is content-based and bounded: row count plus the 64
smallest-xxhash64(vec_id) rows' ids and rounded leading components — a
TakeOrdered over the corpus, O(1) driver cost at any corpus size, and
invariant to file mtimes/paths so a regenerated-but-identical corpus
keeps its fingerprint.
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path
from typing import NamedTuple

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


class VectorArtifacts(NamedTuple):
    centroids: list[list[float]]            # [bucket][dim]
    codebooks: list[list[list[float]]]      # [subspace][centroid][sub_dim]
    residual_codebooks: list[list[list[float]]]
    source: str                             # "literal" | "trained" | "cache"


#: content fingerprints of the driver-generated test corpora the committed
#: literals serve (sf0.001 / sf0.01 / sf0.1).  Regenerate with
#: tools/print_corpus_fp.py if TESTDATA changes.
LITERAL_FPS = frozenset({
    "95b1a12afba94ff4",   # sf0.001 embeddings
    "68cf142045ceb801",   # sf0.01 embeddings
    "a97356b3b32db019",   # sf0.1 embeddings
})

_FP_MEMO: dict[tuple, str] = {}       # file-stat key -> fingerprint
_RESOLVED: dict[str, VectorArtifacts] = {}
_ACTIVE: VectorArtifacts | None = None


def _literal_artifacts() -> VectorArtifacts | None:
    try:
        from cosmo_spark.queries.ivf_centroids import IVF_CENTROIDS
        from cosmo_spark.queries.pq_codebooks import (
            PQ_CODEBOOKS,
            PQ_RESIDUAL_CODEBOOKS,
        )
    except ImportError:
        return None
    return VectorArtifacts(
        IVF_CENTROIDS, PQ_CODEBOOKS, PQ_RESIDUAL_CODEBOOKS, "literal"
    )


def _stat_key(sf_dir: str) -> tuple:
    from cosmo_spark.sources.tables import table_file_identity

    return table_file_identity(sf_dir, "embeddings")


def corpus_fingerprint(spark: SparkSession, sf_dir: str) -> str:
    """Bounded deterministic content fingerprint of the embeddings corpus,
    memoized per (path, mtime, size) so repeated query calls cost no
    Spark job."""
    key = _stat_key(sf_dir)
    fp = _FP_MEMO.get(key)
    if fp is not None:
        return fp
    from cosmo_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    rows = (
        e.select("vec_id", "embedding")
        .withColumn("__h", F.xxhash64(F.col("vec_id")))
        .orderBy("__h", "vec_id")
        .limit(64)
        .collect()
    )
    payload = json.dumps(
        [n] + [
            [int(r.vec_id), [round(float(x), 6) for x in (r.embedding or [])]]
            for r in rows
        ],
        separators=(",", ":"),
    )
    fp = hashlib.sha256(payload.encode()).hexdigest()[:16]
    _FP_MEMO[key] = fp
    return fp


def artifact_fp(art: VectorArtifacts) -> str:
    """Content hash of an artifact set — folded into at-rest index paths
    (queries/trainprep._pq_index_dir) so an index encoded under one
    quantizer can never be served to queries using another."""
    payload = json.dumps(
        [art.centroids, art.codebooks, art.residual_codebooks],
        separators=(",", ":"),
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:12]


def _cache_dir() -> Path:
    return (
        Path(__file__).resolve().parents[2]
        / "spark-warehouse" / "vector_artifacts"
    )


class UntrainableCorpus(RuntimeError):
    """The corpus has too few usable vectors to train a quantizer."""


def _train(spark: SparkSession, sf_dir: str) -> VectorArtifacts:
    from cosmo_spark.operators.train import train_ivf_pq, train_pq_codebooks
    from cosmo_spark.sources.tables import load_table

    corpus = load_table(spark, sf_dir, "embeddings")
    # training sees only well-formed vectors: probe the first non-null
    # embedding for the corpus dim, then keep rows matching it (a sweep
    # corpus with injected nulls/ragged rows must not crash the trainer)
    head = (
        corpus.filter(F.col("embedding").isNotNull())
        .select(F.size("embedding").alias("d")).limit(1).collect()
    )
    if not head:
        raise UntrainableCorpus(f"{sf_dir}: no non-null embeddings")
    dim = int(head[0].d)
    clean = corpus.filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == dim)
    )
    # bounded probes (limit-k counts, never a full scan) to clamp the
    # quantizer geometry on tiny corpora instead of failing seeding
    n_probe = clean.select("vec_id").limit(40).count()
    if n_probe < 16:   # < codebook_k: PQ training is undefined
        raise UntrainableCorpus(
            f"{sf_dir}: only {n_probe} usable vectors (< 16)"
        )
    cents_df, books = train_ivf_pq(
        clean, "embedding", "vec_id", k=min(40, n_probe), residual=False,
    )
    cent_lists = [
        [round(float(v), 6) for v in r.centroid]
        for r in sorted(cents_df.collect(), key=lambda r: r.bucket)
    ]
    rbooks = train_pq_codebooks(
        clean, "embedding", "vec_id", centroids=cent_lists
    )
    return VectorArtifacts(cent_lists, books, rbooks, "trained")


def resolve_vector_artifacts(
    spark: SparkSession, sf_dir: str
) -> VectorArtifacts:
    """The vector family's artifact entry point: every ANN query calls
    this before building its VALUES literals.  Literal seed cache on the
    known test corpora; at-rest cache or fresh training on anything else.
    Sets the process-wide active set (what oracle builders embed)."""
    global _ACTIVE
    fp = corpus_fingerprint(spark, sf_dir)
    lit = _literal_artifacts()
    if lit is not None and fp in LITERAL_FPS:
        # literal branch is NEVER memoized: re-reading the modules each
        # time keeps monkeypatched/retrained literal attributes live
        # (tests/test_train.py's retrained-artifact parity discipline)
        art = lit
    else:
        art = _RESOLVED.get(fp)
        if art is None:
            cache = _cache_dir() / f"{fp}.json"
            if cache.exists():
                doc = json.loads(cache.read_text())
                art = VectorArtifacts(
                    doc["centroids"], doc["codebooks"],
                    doc["residual_codebooks"], "cache",
                )
            else:
                try:
                    art = _train(spark, sf_dir)
                except UntrainableCorpus:
                    # a degenerate corpus (empty slice, all-null sweep)
                    # cannot train — the literals are the only sane
                    # quantizer; without them the caller must know
                    if lit is None:
                        raise
                    art = lit
            if art.source != "literal":
                if art.source == "trained":
                    cache.parent.mkdir(parents=True, exist_ok=True)
                    tmp = cache.with_suffix(f".tmp-{os.getpid()}")
                    tmp.write_text(json.dumps({
                        "centroids": art.centroids,
                        "codebooks": art.codebooks,
                        "residual_codebooks": art.residual_codebooks,
                    }))
                    os.replace(tmp, cache)
                _RESOLVED[fp] = art
    _ACTIVE = art
    return art


def get_vector_artifacts() -> VectorArtifacts:
    """The active artifact set for VALUES-literal / oracle embedding.

    Precedence: a NON-literal resolved set (trained/cache — a new corpus
    or a literal-free deployment) wins; otherwise the literal modules are
    re-read fresh (so a monkeypatched/regenerated literal is honored, and
    a stale pointer from an earlier resolve can't mask it); a
    literal-sourced active set is the last fallback when the modules have
    since become unimportable.  Raises (rather than guessing) when
    nothing exists — callers must resolve first on a literal-free
    deployment."""
    if _ACTIVE is not None and _ACTIVE.source != "literal":
        return _ACTIVE
    lit = _literal_artifacts()
    if lit is not None:
        return lit
    if _ACTIVE is not None:
        return _ACTIVE
    raise RuntimeError(
        "no vector artifacts available: literal modules are absent and "
        "nothing has been resolved — call "
        "resolve_vector_artifacts(spark, sf_dir) first"
    )
