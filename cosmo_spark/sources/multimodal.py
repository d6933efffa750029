"""Multimodal (image/audio/video) column handling for training-data pipelines.

Design: media is carried as an opaque ``binary`` column plus typed metadata
(SURVEY-level requirement for the 100 TB pipeline).  Decode / feature
extraction runs as Arrow-batched ``mapInPandas`` — the only sanctioned
Python hot path — so each task decodes a batch of blobs without JVM
round-trips per row.

Codec gating (the figures.py plotly pattern): ``decode_media`` uses PIL
when it is importable — real JPEG/PNG decode to an 8×8 luminance
thumbnail feature — and otherwise requires ``deterministic_fake=True``,
which produces a content-derived fake decode so the full Spark plumbing —
schema, batching, partitioning, UDF signature — is real and tested
end-to-end in environments without image libraries (this container).
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


def _pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_media(
    media: DataFrame, deterministic_fake: bool = False, batch_limit: int = 256
) -> DataFrame:
    """Decode/feature-extract media blobs via Arrow-batched ``mapInPandas``.

    With PIL importable (and ``deterministic_fake`` unset) blobs decode for
    real: image → greyscale 8×8 thumbnail → 64 luminance values, hashed to
    the same fingerprint shape as the fake path; undecodable blobs come
    back ``decode_status='corrupt'`` rather than failing the task (one bad
    jpeg must not kill a 100 TB scan).  Without PIL, the deterministic
    content-derived fake keeps the plumbing testable hermetically.

    Scale notes: ``mapInPandas`` streams Arrow record batches — blobs never
    materialize on the driver; repartition upstream by size so one task's
    batches fit executor memory (blobs dominate row width).
    """
    if not deterministic_fake and not _pil_available():
        raise NotImplementedError(
            "no image codec importable (PIL) on the driver; pass "
            "deterministic_fake=True to exercise the pipeline plumbing, or "
            "install Pillow on the cluster for real decode"
        )
    use_real = not deterministic_fake

    # self-contained closure: no references to cosmo_spark module globals, so
    # cloudpickle ships it by value and workers need no package install
    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        if use_real:
            import io as _io

            import PIL.Image as _Image  # workers need Pillow too

        for pdf in batches:
            out = {
                "media_id": [], "feat_dim": [], "feat_hash": [], "decode_status": []
            }
            for media_id, blob in zip(pdf["media_id"], pdf["blob"]):
                if blob is None or len(blob) == 0:
                    dim, h, status = 0, "", "empty"
                elif use_real:
                    try:
                        img = _Image.open(_io.BytesIO(bytes(blob)))
                        thumb = img.convert("L").resize((8, 8))
                        feats = bytes(thumb.getdata())
                        dim = len(feats)
                        h = _hashlib.sha256(feats).hexdigest()[:16]
                        status = "ok"
                    except Exception:
                        dim, h, status = 0, "", "corrupt"
                else:
                    dim = 64
                    h = _hashlib.sha256(bytes(blob)).hexdigest()[:16]
                    status = "ok"
                out["media_id"].append(media_id)
                out["feat_dim"].append(dim)
                out["feat_hash"].append(h)
                out["decode_status"].append(status)
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
