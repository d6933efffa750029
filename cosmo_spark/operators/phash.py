"""Perceptual-hash (aHash) fingerprinting and banded Hamming profiling.

Shared by the multimodal dedup family (q140 image / q141 audio / q142
video): a 64-byte feature vector (8×8 luma thumbnail, amplitude envelope)
collapses to a 64-bit average-hash — bit i set when byte i exceeds the
integer mean — carried as two 32-bit halves so every engine stays in
signed-BIGINT territory.  Near-dup discovery is the LSH find-then-verify
shape: 4 × 16-bit fingerprint bands equijoin (pigeonhole: any pair at
Hamming ≤ 3 collides in ≥ 1 band), Hamming verify via bit_count(xor) on
candidates only.

Scale: fingerprints are 16 bytes/item — the band join shuffles those,
never features or media blobs; per-band collision volume is ≈ n²/65536.
All arithmetic is integer, so the DuckDB oracles reproduce it exactly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ahash_fingerprints(feats: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """(id, fp_hi, fp_lo) average-hash fingerprints of a 64-byte
    ``features`` BINARY column.  Bytes surface via hex/conv expressions —
    row-local, inside codegen, no Python."""
    hx = F.hex("features")
    pcols = [
        F.conv(F.substring(hx, 2 * i + 1, 2), 16, 10).cast("long")
         .alias(f"p{i}")
        for i in range(64)
    ]
    staged = feats.select(id_col, *pcols)
    s = reduce(lambda a, b: a + b, [F.col(f"p{i}") for i in range(64)])
    staged = staged.withColumn("mean", F.floor(s / F.lit(64.0)).cast("long"))

    def half(offset: int):
        return reduce(lambda a, b: a + b, [
            F.when(F.col(f"p{i + offset}") > F.col("mean"),
                   F.lit(1 << i).cast("long"))
             .otherwise(F.lit(0).cast("long"))
            for i in range(32)
        ])

    return staged.select(
        id_col, half(0).alias("fp_hi"), half(32).alias("fp_lo")
    )


def _band_rows(fp: DataFrame, id_col: str, out_id: str) -> DataFrame:
    """The 4×16-bit band split of a fingerprint frame — ONE definition of
    the pigeonhole geometry shared by the self-profile and the
    batch-vs-corpus profile (a drift between them would silently skew
    candidate recall)."""
    rows = [
        fp.select(F.col(id_col).alias(out_id), F.lit(0).alias("bi"),
                  (F.col("fp_hi") % 65536).alias("bv")),
        fp.select(F.col(id_col).alias(out_id), F.lit(1).alias("bi"),
                  F.expr("fp_hi div 65536").alias("bv")),
        fp.select(F.col(id_col).alias(out_id), F.lit(2).alias("bi"),
                  (F.col("fp_lo") % 65536).alias("bv")),
        fp.select(F.col(id_col).alias(out_id), F.lit(3).alias("bi"),
                  F.expr("fp_lo div 65536").alias("bv")),
    ]
    return reduce(lambda a, b: a.unionByName(b), rows)


def ahash_band_profile(fp: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Per-item near-dup profile over a fingerprint frame: how many other
    items share ≥ 1 of the 4 16-bit bands, and the closest Hamming
    distance among those candidates (null when none).  ``fp`` is consumed
    by five branches — persist it before calling when its lineage is
    expensive."""
    cand = (
        _band_rows(fp, id_col, "id_a")
        .join(_band_rows(fp, id_col, "id_b"), ["bi", "bv"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b").distinct()
    )
    fa = fp.select(F.col(id_col).alias("id_a"),
                   F.col("fp_hi").alias("ha"), F.col("fp_lo").alias("la"))
    fb = fp.select(F.col(id_col).alias("id_b"),
                   F.col("fp_hi").alias("hb"), F.col("fp_lo").alias("lb"))
    ham = cand.join(fa, "id_a").join(fb, "id_b").select(
        "id_a",
        (F.bit_count(F.expr("ha ^ hb")) + F.bit_count(F.expr("la ^ lb")))
        .cast("long").alias("h"),
    )
    agg = ham.groupBy("id_a").agg(
        F.count(F.lit(1)).alias("n_band_partners"),
        F.min("h").alias("min_hamming"),
    )
    return fp.join(agg, fp[id_col] == agg.id_a, "left").select(
        id_col, "fp_hi", "fp_lo",
        F.coalesce(F.col("n_band_partners"), F.lit(0).cast("long"))
         .alias("n_band_partners"),
        "min_hamming",
    )


def ahash_cross_profile(
    fp_batch: DataFrame, fp_corpus: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Batch-vs-corpus near-dup profile (the q79 incremental shape, for
    media): for every BATCH item, how many CORPUS items share ≥ 1 of the
    4 16-bit fingerprint bands, and the closest Hamming distance among
    those candidates (null when none).  Only the batch side is profiled —
    the corpus is history, probed, never rescanned as output.

    Scale: both sides shuffle 16-byte fingerprints on (band, value); at
    rest the corpus band table lives bucketed by band value so only the
    batch side moves."""

    cand = (
        _band_rows(fp_batch, id_col, "id_a")
        .join(_band_rows(fp_corpus, id_col, "id_b"), ["bi", "bv"])
        .select("id_a", "id_b").distinct()
    )
    fa = fp_batch.select(F.col(id_col).alias("id_a"),
                         F.col("fp_hi").alias("ha"),
                         F.col("fp_lo").alias("la"))
    fb = fp_corpus.select(F.col(id_col).alias("id_b"),
                          F.col("fp_hi").alias("hb"),
                          F.col("fp_lo").alias("lb"))
    ham = cand.join(fa, "id_a").join(fb, "id_b").select(
        "id_a",
        (F.bit_count(F.expr("ha ^ hb")) + F.bit_count(F.expr("la ^ lb")))
        .cast("long").alias("h"),
    )
    agg = ham.groupBy("id_a").agg(
        F.count(F.lit(1)).alias("n_corpus_partners"),
        F.min("h").alias("min_hamming"),
    )
    return fp_batch.join(agg, fp_batch[id_col] == agg.id_a, "left").select(
        id_col, "fp_hi", "fp_lo",
        F.coalesce(F.col("n_corpus_partners"), F.lit(0).cast("long"))
         .alias("n_corpus_partners"),
        "min_hamming",
        (F.coalesce(F.col("min_hamming"), F.lit(64).cast("long")) <= 3)
        .alias("is_near_dup"),
    )
