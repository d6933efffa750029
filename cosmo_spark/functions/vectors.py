"""Vector (embedding) expression kit — pure higher-order-function math.

Used by the similarity-search and near-dup operators over
``embeddings.embedding`` (array<float>).  All JVM-side: ``zip_with`` +
``aggregate`` keep the dot product inside whole-stage codegen; no UDF, no
Python round-trip, which is what keeps brute-force cosine viable as the
per-partition inner loop at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def dot(a: Column | str, b: Column | str) -> Column:
    """Elementwise dot product of two double arrays (element order, stable)."""
    a, b = _c(a), _c(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column | str) -> Column:
    a = _c(a)
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    a, b = _c(a), _c(b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def as_double(a: Column | str) -> Column:
    """Cast array<float> -> array<double> so arithmetic matches float64 oracles."""
    return _c(a).cast("array<double>")
