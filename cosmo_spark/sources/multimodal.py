"""Multimodal (image/audio/video) column handling for training-data pipelines.

Design: media is carried as an opaque ``binary`` column plus typed metadata
(SURVEY-level requirement for the 100 TB pipeline).  Decode / feature
extraction runs as Arrow-batched ``mapInPandas`` — the only sanctioned
Python hot path — so each task decodes a batch of blobs without JVM
round-trips per row.

The actual codec calls are STUBBED in this environment (no image/audio
libraries in the container): ``decode_image_batch`` raises
``NotImplementedError`` unless ``deterministic_fake=True``, which produces a
seeded, content-derived fake decode so the full Spark plumbing — schema,
batching, partitioning, UDF signature — is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

#: canonical media-table schema: blob + typed metadata
MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), False),       # image | audio | video
    StructField("mime", StringType(), True),
    StructField("blob", BinaryType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_bytes", IntegerType(), True),
])

#: decode output: per-media feature record
FEATURE_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("feat_dim", IntegerType(), False),
    StructField("feat_hash", StringType(), False),  # fingerprint of features
    StructField("decode_status", StringType(), False),
])


def _fake_decode(blob: bytes | None) -> tuple[int, str]:
    """Deterministic stand-in for a real image decode: derives a stable
    'feature' fingerprint from the blob bytes.  REPLACE with a real codec
    (PIL/librosa/ffmpeg) on a cluster that has them installed."""
    if not blob:
        return 0, ""
    digest = hashlib.sha256(blob).hexdigest()
    return 64, digest[:16]


def decode_media(
    media: DataFrame, deterministic_fake: bool = False, batch_limit: int = 256
) -> DataFrame:
    """Decode/feature-extract media blobs via Arrow-batched ``mapInPandas``.

    Scale notes: ``mapInPandas`` streams Arrow record batches — blobs never
    materialize on the driver; repartition upstream by size so one task's
    batches fit executor memory (blobs dominate row width).
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "media codecs are not installed in this environment; pass "
            "deterministic_fake=True to exercise the pipeline plumbing, or "
            "swap _fake_decode for a real codec on a full cluster"
        )

    # self-contained closure: no references to cosmo_spark module globals, so
    # cloudpickle ships it by value and workers need no package install
    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            out = {
                "media_id": [], "feat_dim": [], "feat_hash": [], "decode_status": []
            }
            for media_id, blob in zip(pdf["media_id"], pdf["blob"]):
                if blob is None or len(blob) == 0:
                    dim, h = 0, ""
                else:
                    dim, h = 64, _hashlib.sha256(bytes(blob)).hexdigest()[:16]
                out["media_id"].append(media_id)
                out["feat_dim"].append(dim)
                out["feat_hash"].append(h)
                out["decode_status"].append("ok" if dim else "empty")
            yield _pd.DataFrame(out)

    return media.select("media_id", "blob").mapInPandas(
        decode_batches, schema=FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_idx) to
    decode, derived from metadata only — the expensive decode fans out over
    this plan, so sampling never touches blobs it will not keep."""
    n_frames = (F.col("n_bytes") / 1024).cast("int")  # stand-in frame count
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
