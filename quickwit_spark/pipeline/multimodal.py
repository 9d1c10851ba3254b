"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed with Arrow-batched ``mapInPandas``.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode step is STUBBED: ``decoder='fake'`` produces deterministic features
derived from the payload bytes (seeded by content, no wall-clock), while
``decoder='real'`` raises NotImplementedError at the exact point a codec
call would go.  Everything Spark-side — schema, batch iteration, partition
sizing, UDF signatures, output shapes — is real and tested.

Scale notes: payloads stay in executors end-to-end (mapInPandas streams
Arrow batches; nothing is collected); repartition by size before heavy
decode so one task ≈ one memory-bounded batch of assets.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, media_type string, payload binary, "
    "width int, height int, duration_ms int, sample_rate int"
)

FEATURE_SCHEMA = (
    "asset_id long, media_type string, n_bytes long, feature array<float>, "
    "thumb_w int, thumb_h int, n_frames int"
)


def synthesize_assets(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table (binary payloads from seeded bytes)."""
    rng = np.random.RandomState(seed)
    rows = []
    types = ["image", "audio", "video"]
    for i in range(n):
        mt = types[i % 3]
        payload = rng.bytes(256 + (i % 5) * 128)
        rows.append(
            (
                i,
                mt,
                bytearray(payload),
                64 + (i % 4) * 32 if mt != "audio" else None,
                48 + (i % 3) * 32 if mt != "audio" else None,
                1000 * (1 + i % 7) if mt != "image" else None,
                16000 if mt == "audio" else None,
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _fake_decode(payload: bytes, media_type: str, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a codec+model feature extractor: features
    derived from a content digest (stable across runs/machines)."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype="<u4")
    return (raw.astype(np.float64) / 2**32).astype(np.float32)


def extract_features(df: DataFrame, decoder: str = "fake", dim: int = 16, frame_sample_ms: int = 500) -> DataFrame:
    """Decode / feature-extract / thumbnail-size / frame-sample via
    mapInPandas (one Arrow batch of assets at a time)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg, not available "
                    "in this environment — plug the codec call here"
                )
            feats = [_fake_decode(bytes(p), m, dim) for p, m in zip(pdf["payload"], pdf["media_type"])]
            thumb_w = np.where(pdf["width"].notna(), np.minimum(pdf["width"].fillna(0), 128), 0)
            thumb_h = np.where(pdf["height"].notna(), np.minimum(pdf["height"].fillna(0), 128), 0)
            n_frames = np.where(
                pdf["media_type"] == "video",
                (pdf["duration_ms"].fillna(0) // frame_sample_ms).astype(int) + 1,
                np.where(pdf["media_type"] == "image", 1, 0),
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype(np.int64),
                    "feature": [f.tolist() for f in feats],
                    "thumb_w": thumb_w.astype(np.int32),
                    "thumb_h": thumb_h.astype(np.int32),
                    "n_frames": n_frames.astype(np.int32),
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)
