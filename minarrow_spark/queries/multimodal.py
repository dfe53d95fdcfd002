"""Multimodal pipeline queries: binary payload feature extraction via
mapInPandas (the Arrow-batched Python path, SURVEY §2.13 F4/F5) and a
frame-sampling plan expansion.

The decode step is a deterministic fake (codec libs absent — see
operators/multimodal.py); everything around it — binary columns, Arrow
batch flow, schemas, explode plans — is the real distributed shape.
The oracle recomputes the fake decode in SQL (payloads are ASCII text
bytes, so byte arithmetic is expressible both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minarrow_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    synthesize_media,
)
from minarrow_spark.queries._util import T
from minarrow_spark.registry import query

# Byte-exact oracle arithmetic: DuckDB md5(VARCHAR) hashes the string's
# UTF-8 bytes (same bytes Spark's payload carries), so digest-derived
# columns are byte-true for ANY text. n_bytes/fake_mean_px go through
# encode() + hex() so they count/sum real UTF-8 bytes, not characters —
# a non-ASCII document hashes identically on both sides.
_NIB = "(strpos('0123456789abcdef', substr(md5(text), {pos}, 1)) - 1)"
_BYTE0 = f"(16 * {_NIB.format(pos=1)} + {_NIB.format(pos=2)})"
_BYTE1 = f"(16 * {_NIB.format(pos=3)} + {_NIB.format(pos=4)})"
_HEXNIB = "(strpos('0123456789ABCDEF', substr(hex(encode(text)), {pos}, 1)) - 1)"
_PAYLOAD_BYTE = (
    f"(16 * {_HEXNIB.format(pos='2*i + 1')} + {_HEXNIB.format(pos='2*i + 2')})"
)


@query(
    "q50_multimodal_features",
    oracle=f"""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS digest,
           CAST(16 + {_BYTE0} % 64 AS INTEGER) AS fake_width,
           CAST(16 + {_BYTE1} % 64 AS INTEGER) AS fake_height,
           CAST(COALESCE(list_sum(list_transform(
                  range(0, least(octet_length(encode(text)), 256)),
                  i -> {_PAYLOAD_BYTE})), 0) AS DOUBLE)
             / greatest(least(octet_length(encode(text)), 256), 1) AS fake_mean_px
    FROM documents
    """,
    tags=("multimodal", "F4", "F5"),
)
def q50_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction: documents → media table (binary +
    typed metadata) → mapInPandas decode/extract. One Arrow batch per
    iteration; memory bounded by batch size, not partition size."""
    media = synthesize_media(T(spark, sf_dir, "documents"))
    return extract_features(media)


@query(
    "q51_frame_sample",
    oracle="""
    SELECT doc_id AS media_id, CAST(f.i AS BIGINT) AS frame_idx
    FROM documents,
         LATERAL (SELECT unnest(range(0, length(text) % 300 + 1, 30)) AS i) f
    """,
    tags=("multimodal", "frame-sample"),
)
def q51_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plan: each media row expands to every-30th frame index
    (sequence + explode — pure Catalyst, the decode UDF applies per row)."""
    media = synthesize_media(T(spark, sf_dir, "documents"))
    return frame_sample_plan(media, every_n=30).select(
        "media_id", F.col("frame_idx").cast("bigint").alias("frame_idx")
    )
