"""Multimodal column plumbing (SURVEY.md §2.11 / driver brief): image,
audio, and video as opaque ``binary`` columns with typed metadata, processed
by Arrow-batched ``mapInPandas`` operators.

The decode step itself is STUBBED — the image/audio libraries are not in
this container — behind ``_decode_bytes``: by default a deterministic fake
(seeded from the payload) so every downstream shape/partition/schema path
is real and testable; pass ``real_decoder=`` to plug an actual decoder in
(raises NotImplementedError otherwise).  Everything Spark-side — schemas,
UDF signatures, Arrow batch iteration, partition-preserving execution —
is the production design.

Scale notes (100 TB of media): payloads never shuffle — every operator is
``mapInPandas`` over the scan partitions; only extracted features (small,
fixed-width) flow into joins/aggregations downstream.  Batch size is
governed by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — lower it
for large payload rows so an Arrow batch stays within executor memory.
"""

from __future__ import annotations

import hashlib
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


def _decode_bytes(payload: bytes, real_decoder: Callable | None = None) -> np.ndarray:
    """Decode a media payload into a float feature vector.

    STUB: real decoding (PIL/librosa/ffmpeg) is unavailable in this
    container.  The deterministic fake derives FEATURE_DIM floats from the
    payload's sha256 — stable across runs/executors, so tests can assert
    exact values while the real decoder slots in unchanged."""
    if real_decoder is not None:
        raise NotImplementedError(
            "real media decoding requires image/audio libs not present in "
            "this environment; plug a decoder in here"
        )
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4],
                        dtype=np.uint32)
    return (raw / np.float64(2**32)).astype(np.float64)


def synthetic_media(spark: SparkSession, n: int = 64, parts: int = 4) -> DataFrame:
    """Deterministic synthetic media table (fixture for the plumbing)."""
    kinds = ("image", "audio", "video")
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 8
        meta = (
            f"{kind}/fake",
            64 + i if kind == "image" else None,
            48 + i if kind == "image" else None,
            16000 if kind == "audio" else None,
            1000 * (i + 1) if kind != "image" else None,
        )
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(parts)


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
    """Image resize plumbing: filters to images (pushed to the scan), maps
    each payload to a resized payload + updated metadata.  The pixel work
    is the stubbed decode; the dataflow (filter → mapInPandas → typed
    output) is real."""
    out_schema = "media_id long, payload binary, width int, height int"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(
                lambda p: hashlib.sha256(
                    bytes(p) + f"{width}x{height}".encode()
                ).digest()
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": resized,
                    "width": width,
                    "height": height,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(op, out_schema)


def sample_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (row-expanding
    mapInPandas — the UDTF shape).  Frame count derives from duration
    metadata; frame payloads are stubbed decodes of (payload, frame_idx)."""
    out_schema = "media_id long, frame_idx int, frame_ts_ms int, frame binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # Vectorized row expansion: per-row frame count → np.repeat
            # builds the (media_id, payload) spine and a cumsum trick
            # yields the within-row frame index, all in C.  Only the
            # per-frame digest (the stand-in for real frame decode, which
            # would dominate anyway) touches Python.
            durations = np.array(
                [(m["duration_ms"] or 0) for m in pdf["meta"]], dtype=np.int64
            )
            counts = (durations + every_ms - 1) // every_ms
            media_id = np.repeat(pdf["media_id"].to_numpy(), counts)
            payloads = np.repeat(pdf["payload"].to_numpy(), counts)
            frame_idx = np.arange(counts.sum(), dtype=np.int64) - np.repeat(
                np.cumsum(counts) - counts, counts
            )
            yield pd.DataFrame(
                {
                    "media_id": media_id,
                    "frame_idx": frame_idx,
                    "frame_ts_ms": frame_idx * every_ms,
                    "frame": [
                        hashlib.sha256(
                            bytes(p) + int(j).to_bytes(4, "big")
                        ).digest()
                        for p, j in zip(payloads, frame_idx)
                    ],
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
