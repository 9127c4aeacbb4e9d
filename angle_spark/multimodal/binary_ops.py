"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side architecture is real and tested — schema, Arrow batch shape,
partition sizing, UDF signatures. The image codec leaf is REAL for PNG
(pure stdlib zlib decode + numpy unfilter, angle_spark/multimodal/png.py —
no PIL required); non-PNG payloads (JPEG/WAV would need external
libraries the container doesn't ship) fall back to the disclosed
deterministic histogram stub. A real deployment swaps the fallback for
PIL/torchvision inside the same mapInPandas; nothing else changes.

Schema convention:
    media(media_id long, kind string, payload binary,
          meta struct<width:int, height:int, sample_rate:int, n_frames:int>)

Ops:
    synth_media_df        deterministic fake payloads for tests/bench
    decode_features       mapInPandas: payload -> fixed-D float feature vec
    resize_meta           pure-column: recompute meta for a target size
    frame_sample_plan     pure-column: frame indices to sample per video
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURE_DIM = 32

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)


def synth_media_df(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """deterministic opaque payloads (bytes are a pure function of id)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = np.array(["image", "audio", "video"])
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            rng_bytes = [
                np.random.default_rng(seed * 1_000_003 + int(i)).bytes(256) for i in ids
            ]
            kind = kinds[ids % 3]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": kind,
                    "payload": rng_bytes,
                    "meta": [
                        {
                            "width": int(64 + (i % 8) * 32),
                            "height": int(64 + (i % 5) * 32),
                            "sample_rate": 16000,
                            "n_frames": int(1 + i % 300),
                        }
                        for i in ids
                    ],
                }
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """FALLBACK stub for non-PNG payloads (no JPEG/WAV codec in the
    container). Deterministic fake: feature = normalized byte histogram
    folded to FEATURE_DIM. A real deployment replaces this body with
    PIL.Image.open + a model forward; the signature
    (bytes -> float32[FEATURE_DIM]) is the contract."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(np.float32)
    total = hist.sum()
    return hist / total if total else hist


def png_features(pixels: np.ndarray) -> np.ndarray:
    """decoded pixels -> FEATURE_DIM features: a normalized intensity
    histogram over the channel-mean image (FEATURE_DIM equal-width bins
    of [0, 256)) — real pixel statistics, deterministic, model-free."""
    gray = pixels.astype(np.float32).mean(axis=2)
    bins = np.minimum(
        (gray * (FEATURE_DIM / 256.0)).astype(np.int64), FEATURE_DIM - 1
    )
    hist = np.bincount(bins.ravel(), minlength=FEATURE_DIM).astype(np.float32)
    total = hist.sum()
    return hist / total if total else hist


def _decode_image(payload: bytes) -> np.ndarray:
    """REAL path for PNG (stdlib zlib + numpy unfilter); histogram stub
    otherwise. Both return float32[FEATURE_DIM]."""
    from angle_spark.multimodal.png import decode_png, is_png

    if is_png(payload):
        try:
            return png_features(decode_png(payload))
        except ValueError:
            pass  # unsupported PNG variant -> disclosed fallback
    return _decode_image_stub(payload)


def decode_features(media: DataFrame, emit_batch_size: bool = False) -> DataFrame:
    """payload -> feature array<float>, Arrow-batched; one vectorized
    pass per batch, no per-row Spark calls. Batch size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch — THE memory-envelope
    knob at 100 TB: peak executor memory for this op is
    maxRecordsPerBatch * (payload + decoded frame) bytes, independent of
    partition size. tests/test_multimodal.py sets the knob and asserts
    the batch sizes the UDF actually sees stay under it.

    emit_batch_size=True appends the observed Arrow batch length per row
    (test/observability hook)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_image(p).tolist() for p in pdf["payload"]
            ]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )
            if emit_batch_size:
                out["batch_rows"] = len(pdf)
            yield out

    schema = "media_id long, kind string, features array<float>"
    if emit_batch_size:
        schema += ", batch_rows int"
    return media.mapInPandas(fn, schema=schema)


def resize_meta(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """pure-column resize bookkeeping (aspect-preserving fit)."""
    w = F.col("meta.width").cast("double")
    h = F.col("meta.height").cast("double")
    scale = F.least(F.lit(float(target_w)) / w, F.lit(float(target_h)) / h)
    return media.withColumn(
        "resized",
        F.struct(
            F.round(w * scale).cast("int").alias("width"),
            F.round(h * scale).cast("int").alias("height"),
        ),
    )


def frame_sample_plan(media: DataFrame, every_n: int = 30, max_frames: int = 8) -> DataFrame:
    """per-video frame indices to sample: 0, n, 2n... capped — pure
    column arithmetic (sequence), no decode needed to plan the work."""
    n = F.col("meta.n_frames")
    last = F.least(n - 1, F.lit((max_frames - 1) * every_n))
    return media.filter(F.col("kind") == "video").withColumn(
        "frame_plan",
        F.sequence(F.lit(0), last, F.lit(every_n)),
    )
