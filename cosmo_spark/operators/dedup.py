"""Deduplication operators for training-data pipelines.

Beyond the reference's surface (its only dedup is
``drop_duplicates(subset=['ROOTNAME'])``, ref: cosmo/monitor_helpers.py:154),
these are the large-scale document-dedup primitives: exact hash dedup,
MinHash+LSH banding, SimHash, and n-gram Jaccard verification.

Scale design:
- exact dedup: groupBy on a short hash of the normalized text — shuffles the
  hash + doc id only, never the full text;
- MinHash/LSH: signatures are per-row array expressions (no shuffle);
  candidate generation shuffles (band_idx, band_hash) pairs — tiny rows —
  and only candidate pairs are verified;
- all hashes are deterministic arithmetic (poly_hash), so results are
  engine-reproducible (and DuckDB-oracle testable).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cosmo_spark.functions.text import (
    HASH_MOD,
    minhash_signature,
    poly_hash,
    shingle_hashes,
    tokenize,
)

#: deterministic (a, b) parameter pairs for MinHash permutations
def minhash_perms(n: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic LCG-generated permutation parameters (no RNG state)."""
    perms, x = [], seed
    for _ in range(n):
        x = (x * 1103515245 + 12345) % (2**31)
        a = (x % (HASH_MOD - 1)) + 1
        x = (x * 1103515245 + 12345) % (2**31)
        b = x % HASH_MOD
        perms.append((a, b))
    return perms


def normalize_text(col):
    """Lowercase + collapse whitespace — canonical form for exact dedup."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def exact_dedup(
    df: DataFrame, text_col: str, id_col: str, keep: str = "min"
) -> DataFrame:
    """Exact dedup on normalized text: keep one representative id per group.

    Returns (group_hash, rep_id, n_dups).  GroupBy runs on the 64-bit-ish
    polynomial hash of the normalized text, so the shuffle carries ~16 bytes
    per row; hash collisions are disambiguated by a secondary length key.
    """
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    norm = normalize_text(F.col(text_col))
    return (
        df.select(
            poly_hash(norm).alias("text_hash"),
            F.length(norm).alias("text_len"),
            F.col(id_col),
        )
        .groupBy("text_hash", "text_len")
        .agg(agg.alias("rep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def minhash_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash + LSH banding: candidate near-duplicate id pairs.

    Pipeline: tokenize → n-gram shingles → distinct poly-hashes → minhash
    signature (n_hashes) → split into ``bands`` bands → hash each band →
    self-join on (band_idx, band_hash) → distinct pairs (id_a < id_b).

    Docs with empty shingle sets never become candidates.
    """
    if n_hashes % bands:
        raise ValueError("n_hashes must divide evenly into bands")
    rows_per_band = n_hashes // bands
    perms = minhash_perms(n_hashes)

    sig = (
        df.select(
            F.col(id_col).alias("doc"),
            shingle_hashes(tokenize(F.col(text_col)), shingle_n).alias("sh"),
        )
        .filter(F.size("sh") > 0)
        .select("doc", minhash_signature("sh", perms).alias("sig"))
    )
    # band hash = polynomial fold of the band's signature slice
    band = sig.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.aggregate(
                    F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                    F.lit(0).cast("long"),
                    lambda acc, h: (acc * 31 + h) % F.lit(HASH_MOD),
                ),
            )
        ).alias("band_idx", "band_hash"),
    )
    other = band.select(
        F.col("doc").alias("doc_b"), "band_idx", "band_hash"
    )
    pairs = (
        band.join(other, ["band_idx", "band_hash"])
        .filter(F.col("doc") < F.col("doc_b"))
        .select(F.col("doc").alias("id_a"), F.col("doc_b").alias("id_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    candidate_pairs: DataFrame | None = None,
    shingle_n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Jaccard similarity of distinct shingle-hash sets for id pairs.

    With ``candidate_pairs`` (columns id_a, id_b) only those pairs are
    verified — the MinHash-then-verify pattern; otherwise all pairs
    (quadratic — small inputs only).
    """
    sh = df.select(
        F.col(id_col).alias("__id"),
        shingle_hashes(tokenize(F.col(text_col)), shingle_n).alias("sh"),
    ).filter(F.size("sh") > 0)
    a = sh.select(F.col("__id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("__id").alias("id_b"), F.col("sh").alias("sh_b"))
    if candidate_pairs is not None:
        pairs = candidate_pairs.join(a, "id_a").join(b, "id_b")
    else:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 32) -> DataFrame:
    """SimHash document fingerprint: sign-aggregated token-hash bits.

    For each bit position i, sum +1/-1 over token hashes' bit i; the
    fingerprint sets bit i when the sum is positive.  Pure column expressions
    (sequence/transform/aggregate) — per-row, no shuffle.
    """
    toks = tokenize(F.col(text_col))
    hashes = F.transform(toks, lambda t: _tok_hash(t))

    # shiftleft/shiftright need literal shift amounts; the shift index here is
    # a lambda variable, so bits are extracted arithmetically instead —
    # exact because token hashes are < HASH_MOD < 2^30.
    def bit_of(h, i):
        return F.floor(h / F.pow(F.lit(2.0), i)).cast("long") % 2

    bit_votes = F.transform(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda i: F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(bit_of(h, i) == 1, 1).otherwise(-1),
        ),
    )
    fp = F.aggregate(
        F.zip_with(
            bit_votes,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda v, i: F.when(v > 0, F.pow(F.lit(2.0), i).cast("long")).otherwise(0),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(F.col(id_col), fp.alias("simhash"))


def _tok_hash(t):
    return poly_hash(t)


def embedding_near_dups(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    block_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above ``threshold``.

    With ``block_col`` the quadratic join is restricted to same-block pairs
    (e.g. an LSH bucket or coarse cluster id) — the scale path; without it,
    all-pairs (small inputs only).
    """
    from cosmo_spark.functions.vectors import as_double, cosine_sim

    base = df.select(
        F.col(id_col).alias("__id"),
        as_double(F.col(vec_col)).alias("__v"),
        *( [F.col(block_col).alias("__blk")] if block_col else [] ),
    )
    a = base.select(
        F.col("__id").alias("id_a"), F.col("__v").alias("v_a"),
        *( [F.col("__blk").alias("__blk")] if block_col else [] ),
    )
    b = base.select(
        F.col("__id").alias("id_b"), F.col("__v").alias("v_b"),
        *( [F.col("__blk").alias("__blk")] if block_col else [] ),
    )
    pairs = a.join(b, "__blk") if block_col else a.crossJoin(b)
    return (
        pairs.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", cosine_sim("v_a", "v_b"))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
