"""Multimodal plumbing tests: typed binary columns, Arrow-batched
mapInPandas operators, row-expanding frame sampling, determinism, and the
stub boundary for real decoders."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_data_ingestion_scraper_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.synthetic_media(spark, n=30, parts=3)


def test_schema_and_kinds(media):
    assert media.schema == M.MEDIA_SCHEMA
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_shape_and_determinism(spark, media):
    out = M.extract_features(media)
    rows = out.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r["features"]) == M.FEATURE_DIM
        assert all(0.0 <= x < 1.0 for x in r["features"])
    # deterministic across runs (stable fake decode)
    again = {r["media_id"]: r["features"] for r in M.extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["features"] for r in rows)


def test_resize_images_only_images(spark, media):
    out = M.resize_images(media, 32, 32)
    n_images = media.filter(F.col("kind") == "image").count()
    rows = out.collect()
    assert len(rows) == n_images
    assert all(r["width"] == 32 and len(r["payload"]) == 32 for r in rows)


def test_sample_frames_expands_rows(spark, media):
    out = M.sample_frames(media, every_ms=500)
    videos = media.filter(F.col("kind") == "video").select(
        "media_id", "meta.duration_ms"
    ).collect()
    expected = sum((v["duration_ms"] + 499) // 500 for v in videos)
    assert out.count() == expected
    one = out.filter(F.col("media_id") == videos[0]["media_id"]).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in one] == list(range(len(one)))


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError, match="real media decoding"):
        M._decode_bytes(b"x", real_decoder=lambda b: b)


def test_media_feature_join_runs(spark, media):
    out = M.media_feature_join(media, k=2).collect()
    assert len(out) > 0
    assert all(r["rnk"] <= 2 for r in out)
