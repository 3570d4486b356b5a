"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step is STUBBED (no image/audio libs in this container):
`decode_image_batch` raises NotImplementedError unless
`deterministic_fake=True`, in which case it produces a seeded fake
feature vector from the bytes — making the Spark-side plumbing
(schema, Arrow batch shape, partitioning, UDF signature) fully real
and testable, which is the contract here.

At scale: binary payloads ride their own column so column pruning
keeps them out of every stage that doesn't decode; decode runs in
`mapInPandas` with small `maxRecordsPerBatch` (payloads are big), and
the decoded features (small) are what shuffles onward — never the
bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "sample_rate int, duration_ms int"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, feature array<double>"


def attach_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testing aid: derive a deterministic opaque binary payload +
    metadata from an existing column (stands in for real media bytes)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col("doc_id").alias("media_id"),
        (F.when(F.col("doc_id") % 3 == 0, "image")
         .when(F.col("doc_id") % 3 == 1, "audio")
         .otherwise("video")).alias("kind"),
        payload.alias("payload"),
        (F.length(text_col) % 640 + 1).cast("int").alias("width"),
        (F.length(text_col) % 480 + 1).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.length(text_col) * 10).cast("int").alias("duration_ms"),
    )


def decode_image_batch(payloads: pd.Series, dim: int, deterministic_fake: bool) -> np.ndarray:
    if not deterministic_fake:
        raise NotImplementedError(
            "real image/audio decode needs PIL/librosa — not in this "
            "container; pass deterministic_fake=True for the test path"
        )
    out = np.zeros((len(payloads), dim), dtype=np.float64)
    for i, b in enumerate(payloads):
        seed = int.from_bytes(hashlib.md5(bytes(b)).digest()[:8], "big")
        out[i] = np.random.default_rng(seed).standard_normal(dim)
    return out


def extract_features(
    media: DataFrame, dim: int = 8, deterministic_fake: bool = True
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = decode_image_batch(pdf["payload"], dim, deterministic_fake)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(b)) for b in pdf["payload"]],
                    "feature": list(feats),
                }
            )

    return media.mapInPandas(fn, FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, kind string, out_width int, out_height int, payload binary"
)

FRAME_SCHEMA = (
    "media_id long, frame_idx int, frame_ms int, payload binary"
)


def _fake_bytes(src: bytes, tag: str, n: int = 64) -> bytes:
    """Deterministic stand-in payload derived from the input bytes —
    keeps the real-plumbing/stub-compute contract of this module."""
    h = hashlib.md5(tag.encode() + bytes(src)).digest()
    return (h * (n // len(h) + 1))[:n]


def resize_images(
    media: DataFrame,
    out_width: int = 224,
    out_height: int = 224,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Resize step of an image pipeline: one output row per image with
    the target dimensions and the (stubbed) resized payload.

    Real plumbing, stubbed compute: the mapInPandas batching, the
    binary-in/binary-out schema, and the kind filter are exactly what
    a PIL-backed resize uses; only the pixel work is faked (no PIL in
    this container — raises otherwise, same contract as
    decode_image_batch)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real resize needs PIL — pass deterministic_fake=True"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "out_width": out_width,
                    "out_height": out_height,
                    "payload": [
                        _fake_bytes(b, f"resize|{out_width}x{out_height}")
                        for b in pdf["payload"]
                    ],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(fn, RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled
    frame (frame_idx, timestamp-ms, frame payload), capped at
    max_frames per video.

    The fan-out shape is the real thing — a video row explodes into
    frame rows INSIDE the Arrow batch (no JVM-side explode of the big
    binary), so the bytes cross into Python once and only small frame
    payloads flow onward. Decode is stubbed like everything else here."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real frame extraction needs an av/ffmpeg binding — "
                    "pass deterministic_fake=True"
                )
            ids, idxs, mss, payloads = [], [], [], []
            for mid, dur, b in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["payload"]
            ):
                n = min(max_frames, max(int(dur) // every_ms, 1))
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    mss.append(i * every_ms)
                    payloads.append(_fake_bytes(b, f"frame|{i}"))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame_ms": mss,
                    "payload": payloads,
                }
            )

    return media.filter(F.col("kind") == "video").mapInPandas(fn, FRAME_SCHEMA)
