from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minarrow_spark.operators.multimodal import (
    decode_image_real,
    extract_features,
    resize_stub,
    synthesize_media,
)
from minarrow_spark.sources.catalog import load_table


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")


def test_resize_plumbing(spark, sf_dir):
    media = synthesize_media(load_table(spark, sf_dir, "documents")).limit(20)
    out = resize_stub(media, 224, 224)
    rows = out.collect()
    assert len(rows) == 20
    assert all(r.target_width == 224 and r.target_height == 224 for r in rows)
    # payload passes through the Python worker unchanged
    assert all(r.payload is not None for r in rows)


def test_features_match_expressions(spark, sf_dir):
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    check = media.select(
        "media_id",
        F.octet_length("payload").cast("bigint").alias("n_bytes_expr"),
        F.md5("payload").alias("digest_expr"),
    )
    j = feats.join(check, "media_id")
    bad = j.filter(
        (F.col("n_bytes") != F.col("n_bytes_expr"))
        | (F.col("digest") != F.col("digest_expr"))
    ).count()
    assert bad == 0
    assert feats.count() == media.count()
