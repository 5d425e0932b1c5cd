"""Multimodal tests: pure-numpy codecs (BMP/PPM/WAV/RVID round-trips),
Arrow-batched mapInPandas operators over REAL encoded payloads, exact
pinned feature values, real nearest-neighbor resize, and real frame
extraction."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from market_data_ingestion_scraper_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.synthetic_media(spark, n=30, parts=3)


# ------------------------------------------------------------- codecs


def test_bmp_round_trip_odd_width():
    # odd width exercises the 4-byte row padding
    px = M._synth_image(3, 7, 5)
    out = M.decode_bmp(M.encode_bmp(px))
    assert out.shape == (5, 7, 3)
    assert np.array_equal(out, px)


def test_bmp_features_match_handwritten_spec_fixture(spark):
    """Shared-code blind-spot closure (r7 review): the golden-literal
    multimodal oracle builds its expectations through the same
    ``_decode_bytes`` the Spark path uses, so a decoder bug would cancel
    out there.  This fixture is independent end-to-end: the BMP bytes are
    assembled BY HAND from the public BITMAPFILEHEADER/BITMAPINFOHEADER
    spec (not via encode_bmp) and the 16 expected features are hand
    arithmetic from the pixel values (not via _decode_bytes)."""
    import struct

    # 2x2 24-bit BI_RGB BMP: top row (255,0,0),(0,255,0); bottom row
    # (0,0,255),(255,255,255).  File = 14-byte file header + 40-byte info
    # header + 2 bottom-up rows of BGR triples padded to 4 bytes.
    header = struct.pack("<2sIHHI", b"BM", 70, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 0, 0, 0, 0)
    pixel_rows = bytes(
        [255, 0, 0, 255, 255, 255, 0, 0,     # bottom image row, BGR + pad
         0, 0, 255, 0, 255, 0, 0, 0]          # top image row, BGR + pad
    )
    payload = header + info + pixel_rows
    # hand arithmetic: six 0s and six 255s per channel-set => every mean
    # is 127.5 and every std is exactly 127.5 (deviations are +/-127.5);
    # first row/col each hold one 255 among three values => 85.0;
    # sum 1530 % 997 = 533.
    expected = [
        2.0, 2.0, 3.0,                 # w, h, channels
        127.5, 127.5, 0.0, 255.0,      # global mean/std/min/max
        127.5, 127.5, 127.5,           # per-channel means
        127.5, 127.5, 127.5,           # per-channel stds
        85.0, 85.0,                    # first-row / first-col means
        533.0,                         # checksum feature
    ]
    media = spark.createDataFrame(
        [(0, "image", payload, ("image/bmp", 2, 2, None, None))],
        M.MEDIA_SCHEMA,
    )
    row = M.extract_features(media).collect()[0]
    assert row["n_bytes"] == 70
    assert row["features"] == expected


def test_ppm_round_trip():
    px = M._synth_image(11, 9, 4)
    assert np.array_equal(M.decode_ppm(M.encode_ppm(px)), px)


def test_wav_round_trip():
    samples = (np.sin(np.arange(800) / 10.0) * 20000).astype(np.int16)
    got, rate = M.decode_wav(M.encode_wav(samples, 8000))
    assert rate == 8000
    assert np.array_equal(got, samples)


def test_rvid_round_trip():
    frames = np.stack([M._synth_image(i, 8, 8) for i in range(4)])
    assert np.array_equal(M.decode_rvid(M.encode_rvid(frames)), frames)


def test_decode_dispatch_and_fallback():
    # image features carry real dimensions at indices 0..2
    px = M._synth_image(0, 10, 6)
    feats = M._decode_bytes(M.encode_bmp(px))
    assert feats[0] == 10 and feats[1] == 6 and feats[2] == 3
    assert feats[3] == pytest.approx(px.astype(np.float64).mean())
    # unknown payloads fall back to the digest vector, flagged by zeros
    fb = M._decode_bytes(b"not-a-media-file")
    assert fb[0] == fb[1] == fb[2] == 0.0
    assert len(fb) == M.FEATURE_DIM


def test_real_decoder_override():
    out = M._decode_bytes(b"xyz", real_decoder=lambda b: np.arange(16.0))
    assert out.tolist() == list(range(16))


# ---------------------------------------------------------- operators


def test_schema_and_kinds(media):
    assert media.schema == M.MEDIA_SCHEMA
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_real_values_and_determinism(spark, media):
    out = M.extract_features(media)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 30
    # exact pinned values: media 0 is a BMP image of size 64x48
    f0 = rows[0]["features"]
    px0 = M._synth_image(0, 64, 48).astype(np.float64)
    assert f0[0] == 64 and f0[1] == 48 and f0[2] == 3
    assert f0[3] == pytest.approx(px0.mean(), abs=1e-12)
    assert f0[5] == px0.min() and f0[6] == px0.max()
    # media 1 is WAV audio: length/rate/channels then sample stats
    f1 = rows[1]["features"]
    assert f1[0] == 16000 * 2 and f1[1] == 16000 and f1[2] == 1
    assert abs(f1[3]) < 50  # sine wave ≈ zero mean
    # media 2 is RVID video: frame count and frame dims
    f2 = rows[2]["features"]
    assert f2[0] == 3000 // 250 and f2[1] == 8 and f2[2] == 8
    # deterministic across runs (real decode of identical payloads)
    again = {r["media_id"]: r["features"] for r in M.extract_features(media).collect()}
    assert all(again[k] == v["features"] for k, v in rows.items())


def test_resize_images_real_pixels(spark, media):
    out = M.resize_images(media, 16, 12)
    n_images = media.filter(F.col("kind") == "image").count()
    rows = out.collect()
    assert len(rows) == n_images
    for r in rows:
        payload = bytes(r["payload"])
        px = (
            M.decode_bmp(payload) if payload[:2] == b"BM" else M.decode_ppm(payload)
        )
        assert px.shape == (12, 16, 3)
    # pinned: resizing media 0 (64x48 BMP) matches direct numpy indexing
    src = M._synth_image(0, 64, 48)
    ys = ((np.arange(12) + 0.5) * 48 / 12).astype(np.int64)
    xs = ((np.arange(16) + 0.5) * 64 / 16).astype(np.int64)
    expected = src[ys][:, xs]
    got = next(r for r in rows if r["media_id"] == 0)
    assert np.array_equal(M.decode_bmp(bytes(got["payload"])), expected)


def test_sample_frames_real_frames(spark, media):
    out = M.sample_frames(media, every_ms=500)
    videos = media.filter(F.col("kind") == "video").select(
        "media_id", "meta.duration_ms"
    ).collect()
    expected = sum((v["duration_ms"] + 499) // 500 for v in videos)
    assert out.count() == expected
    one = (
        out.filter(F.col("media_id") == 2).orderBy("frame_idx").collect()
    )
    assert [r["frame_idx"] for r in one] == list(range(len(one)))
    # each emitted frame is a decodable PPM holding the true source frame
    vid = M.decode_rvid(bytes(M._synth_media_row(2)[2]))
    dur = 3000
    for r in one:
        frame = M.decode_ppm(bytes(r["frame"]))
        src = min(vid.shape[0] - 1, r["frame_ts_ms"] * vid.shape[0] // dur)
        assert np.array_equal(frame, vid[src])


def test_media_feature_join_runs(spark, media):
    out = M.media_feature_join(media, k=2).collect()
    assert len(out) > 0
    assert all(r["rnk"] <= 2 for r in out)


def test_image_average_hash_deterministic_and_distinct(spark, media):
    out = {r["media_id"]: r["ahash"] for r in M.image_average_hash(media).collect()}
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(out) == n_images
    again = {r["media_id"]: r["ahash"] for r in M.image_average_hash(media).collect()}
    assert out == again


def test_image_near_duplicates_planted_pair(spark):
    # plant: image 1 is image 0 with a single pixel nudged (aHash equal or
    # 1 bit off); image 2 is an unrelated pattern.  The detector must pair
    # (0, 1) and not (0, 2)/(1, 2).
    base = M._synth_image(0, 64, 48)
    tweaked = base.copy()
    tweaked[10, 10] = (tweaked[10, 10] + 3) % 256
    other = M._synth_image(9, 64, 48)[:, ::-1]  # mirrored different pattern
    rows = [
        (0, "image", M.encode_bmp(base), ("image/bmp", 64, 48, None, None)),
        (1, "image", M.encode_ppm(tweaked), ("image/x-portable-pixmap", 64, 48, None, None)),
        (2, "image", M.encode_bmp(other), ("image/bmp", 64, 48, None, None)),
    ]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    pairs = {(r["media_a"], r["media_b"]): r["hamming"]
             for r in M.image_near_duplicates(media, max_hamming=3).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] <= 1
    assert (0, 2) not in pairs and (1, 2) not in pairs
