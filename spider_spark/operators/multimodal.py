"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The media codec libraries (Pillow,
ffmpeg, torchaudio, …) are NOT in this container, so the decode kernels are
STUBBED: ``deterministic=True`` produces a seeded fake (stable bytes → stable
features, good enough to test schema/partitioning/batching end-to-end);
``deterministic=False`` raises NotImplementedError where the real codec call
belongs. The Spark-side plumbing — schemas, batch iteration, partition
sizing — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("url", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
        StructField("meta_duration_ms", IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType()),
    ]
)


def _fake_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """Deterministic payload → feature vector (sha256-seeded); stands in for
    the real decoder so the distributed plumbing is testable."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") % (2**32)
    return np.random.RandomState(seed).standard_normal(out_dim).astype(np.float32)


def generate_media(spark, n: int, kind: str = "image") -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                payload = hashlib.sha256(f"media-{kind}-{i}".encode()).digest() * 4
                rows.append(
                    {
                        "media_id": int(i),
                        "url": f"https://cdn.crawl.test/{kind}/{i}",
                        "kind": kind,
                        "content_type": {"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[kind],
                        "payload": payload,
                        "meta_width": 64 + int(i) % 512 if kind != "audio" else None,
                        "meta_height": 64 + (int(i) * 7) % 512 if kind != "audio" else None,
                        "meta_duration_ms": (1000 + int(i) * 33) if kind != "image" else None,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def extract_image_features(
    media: DataFrame, out_dim: int = 32, deterministic: bool = True
) -> DataFrame:
    """image binary → (width, height, embedding) via mapInPandas batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic:
                raise NotImplementedError(
                    "real image decode requires Pillow/torchvision — not in this container; "
                    "plug the codec call here"
                )
            rows = []
            for _, r in pdf.iterrows():
                emb = _fake_decode(bytes(r["payload"]), out_dim)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "width": r["meta_width"],
                        "height": r["meta_height"],
                        "embedding": emb.tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return media.filter(F.col("kind") == "image").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def sample_video_frames(
    media: DataFrame, frames_per_video: int = 4, deterministic: bool = True
) -> DataFrame:
    """video binary → N sampled frame rows (row explosion inside the UDF —
    batch shape changes, which is why this is mapInPandas, not a UDF col)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg/decord — plug the codec call here"
                )
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                for fi in range(frames_per_video):
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": fi,
                            "frame": hashlib.sha256(payload + fi.to_bytes(4, "big")).digest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields])

    return media.filter(F.col("kind") == "video").mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def resize_images(media: DataFrame, max_px: int = 256, deterministic: bool = True) -> DataFrame:
    """image binary → resized binary + new dims (stubbed resize keeps the
    payload, recomputes dims — real impl swaps in the codec)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic:
                raise NotImplementedError("real resize requires Pillow — plug the codec call here")
            rows = []
            for _, r in pdf.iterrows():
                w = int(r["meta_width"] or 0)
                h = int(r["meta_height"] or 0)
                scale = min(1.0, max_px / max(w, h, 1))
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "payload": bytes(r["payload"]),
                        "width": int(w * scale),
                        "height": int(h * scale),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return media.filter(F.col("kind") == "image").mapInPandas(run, out_schema)
