"""Multimodal column plumbing (SURVEY.md §2.11 / driver brief): image,
audio, and video as opaque ``binary`` columns with typed metadata, processed
by Arrow-batched ``mapInPandas`` operators.

Decoding is REAL for uncompressed public formats, implemented in pure
numpy (no external media libs exist in this container):

- **BMP** 24-bit bottom-up BI_RGB (the Windows bitmap format, public
  spec) and **PPM** ``P6`` (netpbm) for images;
- **WAV** RIFF/PCM-16 mono for audio;
- a minimal raw-RGB video container (``RVID`` magic + frame count +
  dimensions + concatenated RGB24 frames) standing in for real codecs,
  so frame *sampling* extracts genuine pixel frames.

Compressed formats (JPEG/PNG/MP3/H.264) need codec libraries — plug one
in via ``real_decoder=``; unknown payloads fall back to a deterministic
digest-derived vector so arbitrary binary still flows through the
pipeline (clearly signalled by ``channels == 0`` in the features).

Scale notes (100 TB of media): payloads never shuffle — every operator is
``mapInPandas`` over the scan partitions; only extracted features (small,
fixed-width) flow into joins/aggregations downstream.  Batch size is
governed by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — lower it
for large payload rows so an Arrow batch stays within executor memory.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The mapInPandas closures below reference module-level helpers; by default
# cloudpickle serializes those BY REFERENCE, so executor python workers must
# be able to `import` this package — which fails when the driving process
# runs from a different cwd without the repo on PYTHONPATH (exactly how an
# external harness loads __spark_entry__.py by file path).  Registering the
# module for by-value pickling makes every shipped closure self-contained.
import sys as _sys  # noqa: E402

from pyspark import cloudpickle as _cloudpickle  # noqa: E402

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16


# --------------------------------------------------------------- codecs
# Pure-numpy encoders/decoders for uncompressed public formats.  Format
# references: BMP — BITMAPFILEHEADER/BITMAPINFOHEADER public layout;
# PPM — netpbm P6; WAV — RIFF/WAVE fmt+data PCM.


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit bottom-up BI_RGB BMP bytes."""
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # BGR order, bottom row first, each row padded to a 4-byte boundary
    bgr = pixels[::-1, :, ::-1]
    rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    data = rows.tobytes()
    file_size = 54 + len(data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes → (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=offset)
    bgr = rows.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb[::-1] if bottom_up else rgb


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → netpbm P6 bytes."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """netpbm P6 bytes → (h, w, 3) uint8 RGB (single-whitespace header
    form, as produced by :func:`encode_ppm`)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    parts = payload.split(b"\n", 3)
    w, h = (int(x) for x in parts[1].split())
    return np.frombuffer(parts[3], dtype=np.uint8, count=h * w * 3).reshape(h, w, 3)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """1-D int16 samples → RIFF/WAVE PCM-16 mono bytes."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    body = b"WAVE" + fmt + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI", b"RIFF", 4 + len(body) - 4 + 4) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM-16 mono bytes → (int16 samples, sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", payload, pos + 8)
            if audio_fmt != 1 or channels != 1:
                raise ValueError("only PCM mono supported")
        elif cid == b"data":
            samples = np.frombuffer(payload, dtype="<i2", count=size // 2,
                                    offset=pos + 8)
        pos += 8 + size
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, rate


def encode_rvid(frames: np.ndarray) -> bytes:
    """(n, h, w, 3) uint8 RGB frames → minimal raw container: ``RVID``
    magic, u32 n/w/h little-endian, concatenated RGB24 frames."""
    n, h, w, _ = frames.shape
    return struct.pack("<4sIII", b"RVID", n, w, h) + frames.tobytes()


def decode_rvid(payload: bytes) -> np.ndarray:
    """RVID bytes → (n, h, w, 3) uint8 RGB frames."""
    if payload[:4] != b"RVID":
        raise ValueError("not an RVID payload")
    _, n, w, h = struct.unpack_from("<4sIII", payload, 0)
    return np.frombuffer(
        payload, dtype=np.uint8, count=n * h * w * 3, offset=16
    ).reshape(n, h, w, 3)


def _image_features(rgb: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 → FEATURE_DIM floats: dims, global + per-channel
    moments, extrema, first-row/col means."""
    h, w, c = rgb.shape
    px = rgb.astype(np.float64)
    return np.array(
        [
            w, h, c,
            px.mean(), px.std(), px.min(), px.max(),
            px[:, :, 0].mean(), px[:, :, 1].mean(), px[:, :, 2].mean(),
            px[:, :, 0].std(), px[:, :, 1].std(), px[:, :, 2].std(),
            px[0, :, :].mean(), px[:, 0, :].mean(),
            px.sum() % 997.0,
        ],
        dtype=np.float64,
    )


def _audio_features(samples: np.ndarray, rate: int) -> np.ndarray:
    """int16 samples → FEATURE_DIM floats: length/rate, moments, rms,
    zero-crossing count, endpoints."""
    x = samples.astype(np.float64)
    zc = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return np.array(
        [
            x.size, rate, 1,
            x.mean(), x.std(), x.min(), x.max(),
            float(np.sqrt(np.mean(x * x))), zc, np.abs(x).mean(),
            x[0], x[-1], np.abs(x).max(),
            0.0, 0.0, 0.0,
        ],
        dtype=np.float64,
    )


def _video_features(frames: np.ndarray) -> np.ndarray:
    """(n, h, w, 3) uint8 → FEATURE_DIM floats: frame count/dims, global
    moments, first/last frame means, mean inter-frame delta."""
    n, h, w, _ = frames.shape
    px = frames.astype(np.float64)
    delta = (
        np.abs(np.diff(px, axis=0)).mean() if n > 1 else 0.0
    )
    return np.array(
        [
            n, w, h,
            px.mean(), px.std(), px.min(), px.max(),
            px[0].mean(), px[-1].mean(), delta,
            0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
        ],
        dtype=np.float64,
    )


def _digest_features(payload: bytes) -> np.ndarray:
    """Fallback for undecodable payloads: FEATURE_DIM floats derived from
    the sha256 digest — deterministic, clearly marked by channels == 0
    (index 2) and dims == 0."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer(
        (h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4], dtype=np.uint32
    )
    out = (raw / np.float64(2**32)).astype(np.float64)
    out[:3] = 0.0  # no real dims/channels — signals "not decoded"
    return out


def _decode_bytes(payload: bytes, real_decoder: Callable | None = None) -> np.ndarray:
    """Decode a media payload into a FEATURE_DIM float feature vector.

    Dispatches on magic bytes: BMP / PPM P6 / WAV PCM / RVID are decoded
    for real (pure numpy — public uncompressed formats).  ``real_decoder``
    (payload → feature ndarray) overrides for formats that need codec
    libraries; without one, unknown payloads get the deterministic digest
    fallback so arbitrary binary still flows."""
    if real_decoder is not None:
        return np.asarray(real_decoder(payload), dtype=np.float64)[:FEATURE_DIM]
    head = bytes(payload[:4])
    if head[:2] == b"BM":
        return _image_features(decode_bmp(payload))
    if head[:2] == b"P6":
        return _image_features(decode_ppm(payload))
    if head == b"RIFF":
        return _audio_features(*decode_wav(payload))
    if head == b"RVID":
        return _video_features(decode_rvid(payload))
    return _digest_features(payload)


# ------------------------------------------------------------- fixtures


def _synth_image(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) gradient-plus-offset test pattern."""
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 3 + i) % 256
    g = (yy * 5 + 2 * i) % 256
    b = (xx + yy + 7 * i) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def _synth_media_row(i: int) -> tuple:
    kind = ("image", "audio", "video")[i % 3]
    if kind == "image":
        w, h = 64 + i, 48 + i
        px = _synth_image(i, w, h)
        # alternate the two supported encodings so both decode paths run
        payload = encode_bmp(px) if i % 2 == 0 else encode_ppm(px)
        mime = "image/bmp" if i % 2 == 0 else "image/x-portable-pixmap"
        return (i, kind, payload, (mime, w, h, None, None))
    if kind == "audio":
        rate, dur_ms = 16000, 1000 * (i + 1)
        n = rate * dur_ms // 1000
        t = np.arange(n, dtype=np.float64)
        freq = 110.0 * ((i % 8) + 1)
        samples = (
            np.sin(2 * np.pi * freq * t / rate) * 12000
        ).astype(np.int16)
        return (i, kind, encode_wav(samples, rate), ("audio/wav", None, None, rate, dur_ms))
    # video: 8×8 frames, one per 250 ms of duration
    dur_ms = 1000 * (i + 1)
    n_frames = max(1, dur_ms // 250)
    frames = np.stack(
        [_synth_image(i * 31 + j, 8, 8) for j in range(n_frames)]
    )
    return (i, kind, encode_rvid(frames), ("video/x-raw-rgb", 8, 8, None, dur_ms))


def synthetic_media(spark: SparkSession, n: int = 64, parts: int = 4) -> DataFrame:
    """Deterministic synthetic media table: REAL encoded payloads —
    BMP/PPM images, WAV PCM audio, RVID raw video — so the decode path
    under test is genuine byte parsing, not a fake."""
    rows = [_synth_media_row(i) for i in range(n)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(parts)


# ------------------------------------------------------------- operators


def extract_features(media: DataFrame) -> DataFrame:
    """Per-item feature extraction: binary payload → FEATURE_DIM floats.
    ``mapInPandas`` iterates Arrow batches per partition — payloads are
    decoded where they were read, never shuffled."""
    out_schema = (
        "media_id long, kind string, n_bytes long, features array<double>"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "features": pdf["payload"].map(
                        lambda p: _decode_bytes(bytes(p)).tolist()
                    ),
                }
            )

    return media.mapInPandas(op, out_schema)


def resize_images(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Image resize: decode BMP/PPM pixels, nearest-neighbor resample with
    numpy integer indexing, re-encode in the source format.  Filter to
    images is pushed to the scan; the map never shuffles payloads."""
    out_schema = "media_id long, payload binary, width int, height int"

    def _resize(payload: bytes) -> bytes:
        is_bmp = payload[:2] == b"BM"
        px = decode_bmp(payload) if is_bmp else decode_ppm(payload)
        h, w, _ = px.shape
        # nearest-neighbor sample grid (floor((i + .5) * src / dst))
        ys = ((np.arange(height) + 0.5) * h / height).astype(np.int64)
        xs = ((np.arange(width) + 0.5) * w / width).astype(np.int64)
        out = px[ys][:, xs]
        return encode_bmp(out) if is_bmp else encode_ppm(out)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(lambda p: _resize(bytes(p))),
                    "width": width,
                    "height": height,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(op, out_schema)


def sample_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame sampling: one output row per sampled timestamp
    (row-expanding mapInPandas — the UDTF shape).  Sample times come from
    duration metadata; each emitted frame is the REAL decoded RGB frame
    nearest the timestamp, re-encoded as PPM P6."""
    out_schema = "media_id long, frame_idx int, frame_ts_ms int, frame binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                dur = meta["duration_ms"] or 0
                n_samples = (dur + every_ms - 1) // every_ms
                if n_samples == 0:
                    continue
                vid = decode_rvid(bytes(payload))
                n_frames = vid.shape[0]
                for j in range(n_samples):
                    ts = j * every_ms
                    # frame whose time slot covers ts (uniform spacing)
                    src = min(n_frames - 1, ts * n_frames // max(dur, 1))
                    ids.append(mid)
                    idxs.append(j)
                    tss.append(ts)
                    frames.append(encode_ppm(vid[src]))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int32"),
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    return media.filter(F.col("kind") == "video").mapInPandas(op, out_schema)


def media_feature_join(media: DataFrame, k: int = 3) -> DataFrame:
    """End-to-end shape: extract features → treat as vectors → nearest
    media by cosine within each kind (reuses the similarity operators on a
    multimodal feature column — X5's 'vector carried through joins')."""
    from .similarity import brute_force_topk

    feats = extract_features(media).select(
        F.col("media_id").alias("vec_id"),
        F.col("features").alias("embedding"),
        "kind",
    )
    img = feats.filter(F.col("kind") == "image").drop("kind")
    return brute_force_topk(img, img.limit(4), k=k)


def image_average_hash(media: DataFrame, hash_size: int = 8) -> DataFrame:
    """64-bit perceptual average-hash per image — the public aHash recipe:
    decode → integer luma grayscale → ``hash_size``² nearest-grid
    downsample → bit_i = (pixel_i · n > Σpixels), packed into an int64.
    All-integer arithmetic (luma = (299R+587G+114B)//1000, mean compare
    cross-multiplied), so the hash is bit-reproducible everywhere.

    Output (media_id, ahash) — one long per image; the corpus of hashes
    is what shuffles downstream, never pixels."""

    def _ahash(payload: bytes) -> int:
        px = (
            decode_bmp(payload) if payload[:2] == b"BM" else decode_ppm(payload)
        ).astype(np.int64)
        h, w, _ = px.shape
        luma = (px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114) // 1000
        ys = ((np.arange(hash_size) + 0.5) * h / hash_size).astype(np.int64)
        xs = ((np.arange(hash_size) + 0.5) * w / hash_size).astype(np.int64)
        cells = luma[ys][:, xs].ravel()
        n = cells.size
        total = int(cells.sum())
        bits = (cells * n > total).astype(np.uint64)
        # pack into 63 bits (drop the last cell) so the value fits a
        # SIGNED long on every engine, like the SimHash signature
        return int(np.bitwise_or.reduce(bits[: n - 1] << np.arange(n - 1, dtype=np.uint64)))

    out_schema = "media_id long, ahash long"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "ahash": pdf["payload"].map(lambda p: _ahash(bytes(p))),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(op, out_schema)


def image_near_duplicates(
    media: DataFrame, max_hamming: int = 3, n_blocks: int | None = None
) -> DataFrame:
    """Perceptual image dedup: pairs of images whose average-hashes are
    within ``max_hamming`` bits — re-encodes, resizes, and mild edits
    hash nearby, so this catches visual duplicates exact byte-hashing
    misses.

    Same scale shape as SimHash text dedup, sharing its block-permuted
    banding (:func:`~.dedup.hamming_band_keys`): candidates come from an
    equi-join on (table, key) over the (media_id, ahash) table — one
    long per image, no pixel ever shuffles, no crossJoin — then
    bit_count(a XOR b) verifies.  Recall is exact at any ``n_blocks``;
    the default 4 is the classic 4-chunk pigeonhole, raise it (6 ⇒ 20
    tables on ~32-bit keys) once the image count makes 16-bit buckets
    collide by birthday (10⁸⁺ items — 100 TB of images)."""
    from .dedup import hamming_band_keys

    if n_blocks is None:
        n_blocks = max_hamming + 1  # minimal pigeonhole: 1-block keys
    from .dedup import _persist_generation

    ah = _persist_generation(
        "image_near_dups.ahash", image_average_hash(media)
    )
    chunks = ah.select(
        "media_id",
        "ahash",
        F.explode(
            hamming_band_keys(F.col("ahash"), max_hamming, n_blocks)
        ).alias("c"),
    ).select("media_id", "ahash", F.col("c.tbl"), F.col("c.key"))
    l, r = chunks.alias("l"), chunks.alias("r")
    return (
        l.join(
            r,
            (F.col("l.tbl") == F.col("r.tbl"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.media_id") < F.col("r.media_id")),
        )
        .select(
            F.col("l.media_id").alias("media_a"),
            F.col("r.media_id").alias("media_b"),
            F.bit_count(
                F.col("l.ahash").bitwiseXOR(F.col("r.ahash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["media_a", "media_b"])
    )
