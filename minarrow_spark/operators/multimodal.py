"""Multimodal (image/audio/video) column handling for training-data pipelines.

Convention: media travels as an opaque ``binary`` column plus typed metadata
columns (mime, width/height/duration, codec). The Spark-side plumbing —
schemas, partition sizing, Arrow batch shapes, UDF signatures — is real and
tested; the actual codec calls are STUBBED (image/audio libs are not in this
container): ``decode_image_real`` raises NotImplementedError, and the
default pipeline uses a deterministic fake decoder so the distributed path
is exercised end-to-end.

Scale notes:
* mapInPandas streams Arrow batches — peak memory is one batch per task, so
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set low here) is the
  lever that keeps 10 MB-per-row media from blowing the Python worker.
* Feature extraction is embarrassingly parallel; repartition by a size
  bucket first when media sizes are heavily skewed, so one task doesn't get
  all the 4K videos.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("fake_width", T.IntegerType(), True),
        T.StructField("fake_height", T.IntegerType(), True),
        T.StructField("fake_mean_px", T.DoubleType(), True),
    ]
)


def decode_image_real(payload: bytes) -> "object":
    """Real image decode — STUB. Wire to PIL/OpenCV when available:
        from PIL import Image; return Image.open(io.BytesIO(payload))
    """
    raise NotImplementedError("image codec not available in this container")


def fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic fake decoder: derives (width, height, mean_pixel) from
    the payload bytes so tests/oracles are reproducible. Stands in for the
    real codec with identical call shape."""
    if payload is None:
        return (0, 0, 0.0)
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    mean_px = (sum(payload[:256]) / max(1, len(payload[:256]))) if payload else 0.0
    return (width, height, float(mean_px))


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas.

    One Arrow batch in → one feature frame out per iteration; peak task
    memory is one batch. Batch size is governed by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` — for fat media rows
    (MBs per payload) set it low (e.g. 64) in the session so
    rows-per-batch × payload size stays inside the Python worker budget;
    the engine default (session.py) is tuned for slim rows."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else None
                w, hgt, mean_px = fake_decode(raw)
                feats.append(
                    (
                        int(mid),
                        len(raw) if raw is not None else None,
                        hashlib.md5(raw).hexdigest() if raw is not None else None,
                        w,
                        hgt,
                        mean_px,
                    )
                )
            yield pd.DataFrame(
                feats,
                columns=[
                    "media_id", "n_bytes", "digest",
                    "fake_width", "fake_height", "fake_mean_px",
                ],
            )

    sized = media.select("media_id", "payload")
    return sized.mapInPandas(op, schema=FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payloads through the Python worker with target
    dims attached; the codec call is the stub. Output schema == input schema
    + resize metadata, so the operator composes in pipelines today and the
    real codec drops in later."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["target_width"] = width
            out["target_height"] = height
            # real impl: out["payload"] = [reencode(resize(decode(p))) ...]
            yield out

    schema = T.StructType(
        list(MEDIA_SCHEMA.fields)
        + [
            T.StructField("target_width", T.IntegerType(), False),
            T.StructField("target_height", T.IntegerType(), False),
        ]
    )
    return media.mapInPandas(op, schema=schema)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: expands each media row into frame-index
    rows (pure Catalyst — sequence + explode), ready for a decode UDF per
    frame. Frame count is faked from payload length (stub for container
    probing)."""
    n_frames = (F.octet_length("payload") % 300 + 1).alias("n_frames")
    return (
        media.select("media_id", n_frames)
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Build a media table from `documents` (no binary test data exists):
    payload = UTF-8 bytes of the text, metadata derived deterministically.
    Gives the multimodal path a real distributed input."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("n_chars") % 640).cast("int").alias("meta_width"),
        (F.col("n_chars") % 480).cast("int").alias("meta_height"),
    )
