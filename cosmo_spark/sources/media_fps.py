"""At-rest perceptual-fingerprint store for media dedup (round-8 verdict
"What's missing" #4).

The media-dedup family (q140–q142) fingerprints blobs through the one
sanctioned Arrow-batched decode stage; without a store, every run
re-decodes the whole corpus.  This module persists
``(content_hash, fp_hi, fp_lo)`` beside the corpus — keyed by
``xxhash64(blob)``, computed JVM-side with zero decode — so a run only
pays the Python decode for content it has never fingerprinted:

- warm run over an unchanged corpus: ZERO decode work (gated by a
  counter test);
- an incremental batch: decode only the new blobs, probe the store for
  everything else (the q79 batch-vs-corpus shape, for media).

Store layout: an append-only parquet directory.  Appends are idempotent
at read time (``dropDuplicates`` on content_hash), so concurrent
fingerprinting runs can race benignly; corrupt/undecodable blobs are
never stored, which makes re-decode-on-next-run the retry policy.

Scale shape: the store row is 24 bytes; the miss probe is an anti-join
of (blob rows) against (store hashes) — the store side BROADCASTS at
test scale, and at 100 TB both the media table and the store live
bucketed by content_hash at rest (sources/layout) so the probe zips
per-bucket with no blob ever entering an exchange.  The fingerprint
attach join carries only (id, content_hash) × (content_hash, 16 B) —
never blobs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_STORE_SCHEMA = "content_hash LONG, fp_hi LONG, fp_lo LONG"


def media_fp_store_dir(spark: SparkSession, sf_dir: str, codec: str) -> str:
    """Default store location: keyed by the corpus content fingerprint
    (queries/artifacts.corpus_fingerprint — bounded, mtime-invariant) and
    the codec, so different corpora / modalities never share rows."""
    from cosmo_spark.queries.artifacts import corpus_fingerprint

    from pathlib import Path

    root = Path(__file__).resolve().parents[2] / "spark-warehouse" / "media_fps"
    return str(root / f"{corpus_fingerprint(spark, sf_dir)}-{codec}")


def read_fp_store(spark: SparkSession, store_path: str) -> DataFrame | None:
    from cosmo_spark.streaming import logio

    if not logio.is_dir(store_path):
        return None
    return (
        spark.read.schema(_STORE_SCHEMA).parquet(store_path)
        .dropDuplicates(["content_hash"])
    )


def _miss_fp_plan(keyed: DataFrame, store: DataFrame | None, codec: str):
    """The lazy (content_hash, fp_hi, fp_lo) plan for store MISSES — the
    single Python decode stage of the media family.  Factored out so the
    plan gate (tests/test_media_fps.py) can assert blobs never enter an
    exchange: the store-hash anti-join broadcasts, and the fingerprint
    attach joins on (media_id) only after features collapse to 16 bytes."""
    from cosmo_spark.operators.phash import ahash_fingerprints
    from cosmo_spark.sources.multimodal import decode_media

    ids = keyed.select("media_id", "content_hash")
    if store is None:
        miss_media = keyed.select("media_id", "blob")
    else:
        # broadcast the hash set: the blob side must not enter an exchange
        # (plan-gated); at 100 TB this becomes a bucket-zipped anti-join
        miss_media = keyed.join(
            F.broadcast(store.select("content_hash")),
            "content_hash", "left_anti",
        ).select("media_id", "blob")
    feats = (
        decode_media(miss_media, codec=codec, emit_features=True)
        .filter(F.col("decode_status") == "ok")
    )
    return (
        ahash_fingerprints(feats, "media_id")
        .join(ids, "media_id")
        .select("content_hash", "fp_hi", "fp_lo")
        .dropDuplicates(["content_hash"])
    )


def fingerprint_media_cached(
    media: DataFrame,
    codec: str,
    store_path: str,
    id_col: str = "media_id",
) -> DataFrame:
    """(media_id, fp_hi, fp_lo) for every decodable blob in ``media``
    ((media_id, blob)), decoding ONLY content absent from the store and
    appending the newly-learned fingerprints.

    The miss decode runs EAGERLY (localCheckpoint): the returned frame's
    lineage reads the checkpointed 16-byte fingerprints, so downstream
    fan-out (band joins, Hamming verify) can never re-trigger the Python
    stage — the q140 single-Python-stage guarantee, now enforced by
    materialization instead of caching.

    The blob encode/hash pass over ``media`` runs ONCE (r13 guide §1/§2:
    it was the measured dominant cost of every warm call): the 16-byte
    (media_id, content_hash) projection is checkpointed first and both
    the miss probe and the final attach read that checkpoint.  A warm
    store resolves the miss probe to an empty id set driver-side, so the
    decode stage is skipped outright — zero decode jobs, not just zero
    decoded rows."""
    spark = media.sparkSession
    keyed = media.select(
        F.col(id_col).alias("media_id"), "blob",
        F.xxhash64("blob").alias("content_hash"),
    )
    store = read_fp_store(spark, store_path)
    if store is None:
        # the ONE encode+hash pass; 16 B/row at rest, the attach join
        # below reads this instead of re-encoding blobs
        ids = keyed.select("media_id", "content_hash").localCheckpoint()
        new_rows = _miss_fp_plan(keyed, None, codec) \
            .localCheckpoint()   # decode runs HERE, exactly once
    else:
        # the ONE encode+hash pass, with store membership resolved in the
        # SAME job (broadcast left join onto the store's hash set) so the
        # miss probe needs no second pass over the blobs
        ids = keyed.select("media_id", "content_hash").join(
            F.broadcast(
                store.select("content_hash").withColumn("__known", F.lit(True))
            ),
            "content_hash", "left",
        ).select(
            "media_id", "content_hash",
            F.coalesce("__known", F.lit(False)).alias("__known"),
        ).localCheckpoint()
        miss_ids = ids.filter(~F.col("__known")).select("media_id")
        ids = ids.drop("__known")
        if miss_ids.isEmpty():
            # warm store: nothing to decode — no decode job at all
            new_rows = spark.createDataFrame([], _STORE_SCHEMA)
        else:
            # decode ONLY the missing blobs: the miss id set (bounded by
            # new content per batch) broadcasts onto the blob side, so
            # blobs still never enter an exchange (plan-gated)
            miss_keyed = keyed.join(
                F.broadcast(miss_ids), "media_id", "left_semi"
            )
            new_rows = _miss_fp_plan(miss_keyed, None, codec) \
                .localCheckpoint()
    if not new_rows.isEmpty():
        new_rows.write.mode("append").parquet(store_path)
    full = store.unionByName(new_rows) if store is not None else new_rows
    # materialize the ATTACHED frame too (r9 self-review #5): lineage is
    # the checkpointed ids ⋈ (store scan ∪ checkpointed new rows), and
    # ahash_band_profile consumes it from ~7 branches — a 24-byte-per-row
    # checkpoint beats re-running the join per branch
    return ids.join(full, "content_hash").select(
        F.col("media_id").alias(id_col), "fp_hi", "fp_lo"
    ).localCheckpoint()


def compact_fp_store(
    spark: SparkSession,
    store_path: str,
    target_rows_per_file: int = 4_000_000,
    _pre_swap_hook=None,
) -> dict:
    """Locked compaction of the append-only store (round-9 verdict #3):
    collapse duplicate content_hash rows and the small files benign
    racing appends accumulate, leaving READER SEMANTICS UNCHANGED —
    ``read_fp_store`` still sees one row per content_hash before, during
    and after.

    Mechanics, under the same lease lock the versioned stores use (two
    compactors must not double-swap; APPENDERS stay lock-free — racing
    appends are the store's documented write mode):

    1. snapshot the current part-file list (files appended AFTER the
       snapshot are untouched — never lost, never double-read);
    2. read exactly the snapshot, collapse duplicates deterministically
       (min (fp_hi, fp_lo) per hash — duplicates from re-decodes agree
       anyway, the rule just pins the tie), write compacted files to a
       side tmp dir sized by ``target_rows_per_file`` (24 B rows —
       the default keeps files under ~100 MB);
    3. move the compacted files IN first, delete the snapshot files
       second: a lock-free reader in the swap window sees duplicate
       rows (dropDuplicates absorbs them), never missing ones, and a
       crash mid-swap degrades to "some duplicates remain" — the next
       compaction's problem, not data loss.

    Returns {files_before, files_after, rows_before, rows_after}.
    ``_pre_swap_hook`` is a test seam invoked between the tmp write and
    the swap — the racing-appender unit injects an append there.
    """
    import uuid

    from cosmo_spark.operators.merge import _table_lock
    from cosmo_spark.streaming import logio

    with _table_lock(spark, store_path.rstrip("/")) as guard:
        snapshot = sorted(
            os.path.join(store_path, n)
            for n in logio.list_names(store_path) if n.startswith("part-")
        )
        if not snapshot:
            return {"files_before": 0, "files_after": 0,
                    "rows_before": 0, "rows_after": 0}
        src = spark.read.schema(_STORE_SCHEMA).parquet(*snapshot)
        rows_before = src.count()
        compacted = (
            src.groupBy("content_hash")
            .agg(
                F.min(F.struct("fp_hi", "fp_lo")).alias("__fp"),
            )
            .select("content_hash", "__fp.fp_hi", "__fp.fp_lo")
        )
        rows_after = compacted.count()
        n_files = max(1, -(-rows_after // target_rows_per_file))
        tmp = f"{store_path}.compact-tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        try:
            compacted.coalesce(n_files).write.mode("overwrite").parquet(tmp)
            if _pre_swap_hook is not None:
                _pre_swap_hook()
            guard.verify()   # fencing before the destructive swap
            moved = []
            for f in sorted(
                os.path.join(tmp, n)
                for n in logio.list_names(tmp) if n.startswith("part-")
            ):
                # fsync before the move-in: once snapshot files are
                # deleted these are the only copy (the _rotate_log rule)
                logio.fsync_file(f)
                dest = os.path.join(
                    store_path,
                    f"part-compact-{uuid.uuid4().hex[:8]}-"
                    + os.path.basename(f),
                )
                logio.rename(f, dest)
                moved.append(dest)
            logio.fsync_dir(store_path)
            for f in snapshot:
                logio.remove(f)
            logio.fsync_dir(store_path)
            return {
                "files_before": len(snapshot),
                "files_after": len(moved),
                "rows_before": rows_before,
                "rows_after": rows_after,
            }
        finally:
            logio.rmtree(tmp)


def ensure_media_fps(
    spark: SparkSession, sf_dir: str, codec: str, encode_fn, id_col: str
) -> str:
    """Build (or top up) the default store for a corpus+codec; returns the
    store path.  The bench harness charges this to setup — production
    fingerprints media once at ingest and queries the store forever."""
    from cosmo_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == 64)
    )
    store = media_fp_store_dir(spark, sf_dir, codec)
    # id_col names the SOURCE id column fed to the encoder; the encoders
    # always emit (media_id, blob)
    fingerprint_media_cached(
        encode_fn(e, "embedding", id_col), codec, store
    ).count()
    return store
