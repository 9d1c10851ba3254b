"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed with Arrow-batched ``mapInPandas``.

Decode tiers:

* ``decoder='real'`` REALLY decodes the container formats that need no
  external codec — RIFF/WAV PCM audio (stdlib ``wave`` + numpy) and
  binary PPM (P6) images (header + raw RGB) — and extracts real signal
  features (RMS, zero-crossing rate, spectral centroid/rolloff, FFT band
  energies; per-cell RGB grid means for images).  Formats that require a
  codec library (JPEG/MP4/FLAC — PIL/ffmpeg are not in this container)
  raise NotImplementedError at the exact point the codec call would go.
* ``decoder='fake'`` produces deterministic features derived from a
  content digest (stable across runs/machines) for any payload — the
  plumbing-only tier the driver-contract oracle uses.

Everything Spark-side — schema, batch iteration, partition sizing, UDF
signatures, output shapes — is identical across tiers.  Scale notes:
payloads stay in executors end-to-end (mapInPandas streams Arrow
batches; nothing is collected); repartition by size before heavy decode
so one task ≈ one memory-bounded batch of assets.
"""

from __future__ import annotations

import hashlib
import io
import wave
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


def synthesize_real_assets(spark, n: int = 48, seed: int = 42) -> DataFrame:
    """Asset table whose payloads are REAL containers: 16-bit PCM WAV
    (seeded sine + noise) and binary PPM (P6) images (seeded gradients) —
    both decodable with stdlib+numpy, no codec library.  Deterministic:
    content depends only on (seed, asset index)."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        if i % 2 == 0:  # WAV: 0.05-0.25 s of f0-sine + noise at 8/16 kHz
            sr = 16000 if i % 4 == 0 else 8000
            f0 = 200.0 + 50.0 * (i % 9)
            t = np.arange(int(sr * (0.05 + 0.01 * (i % 20)))) / sr
            x = 0.6 * np.sin(2 * np.pi * f0 * t) + 0.05 * rng.randn(len(t))
            pcm = (np.clip(x, -1, 1) * 32767).astype("<i2")
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sr)
                w.writeframes(pcm.tobytes())
            rows.append(
                (i, "audio", bytearray(buf.getvalue()), None, None,
                 int(1000 * len(t) / sr), sr)
            )
        else:  # PPM P6: w×h seeded gradient image
            w_, h_ = 16 + 8 * (i % 4), 12 + 4 * (i % 5)
            img = rng.randint(0, 256, size=(h_, w_, 3), dtype=np.uint8)
            payload = f"P6\n{w_} {h_}\n255\n".encode() + img.tobytes()
            rows.append((i, "image", bytearray(payload), w_, h_, None, None))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAV 16-bit PCM → (sample_rate, mono float32 in [-1, 1])."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        sr = w.getframerate()
        n_ch = w.getnchannels()
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                f"only 16-bit PCM WAV is stdlib-decodable (got width {w.getsampwidth()})"
            )
        raw = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    x = raw.astype(np.float32) / 32768.0
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return sr, x


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → HxWx3 uint8 array (header + raw RGB; supports
    the single-whitespace header form every P6 writer emits)."""
    if not payload.startswith(b"P6"):
        raise NotImplementedError("only binary PPM (P6) images are stdlib-decodable")
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> raster
    parts, idx, token = [], 2, b""
    while len(parts) < 3:
        c = payload[idx:idx + 1]
        idx += 1
        if c.isspace():
            if token:
                parts.append(int(token))
                token = b""
        elif c == b"#":  # comment to end of line
            while payload[idx:idx + 1] not in (b"\n", b""):
                idx += 1
        else:
            token += c
    w, h, maxval = parts
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM is supported")
    return np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=idx).reshape(h, w, 3)


def _audio_features(sr: int, x: np.ndarray, dim: int) -> np.ndarray:
    """Real DSP features: [rms, zero-crossing rate, spectral centroid,
    spectral rolloff(0.85)] + (dim-4) log-energy FFT bands — all plain
    numpy, deterministic."""
    if len(x) == 0:
        return np.zeros(dim, np.float32)
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
    spec = np.abs(np.fft.rfft(x))
    power = spec * spec
    freqs = np.fft.rfftfreq(len(x), d=1.0 / sr)
    total = float(power.sum()) or 1.0
    centroid = float((freqs * power).sum() / total) / (sr / 2.0)
    cum = np.cumsum(power)
    rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * cum[-1]))]) / (sr / 2.0)
    n_bands = max(dim - 4, 0)
    bands = np.zeros(n_bands, np.float32)
    if n_bands and len(power):
        edges = np.linspace(0, len(power), n_bands + 1).astype(int)
        for b in range(n_bands):
            seg = power[edges[b]:edges[b + 1]]
            bands[b] = np.log1p(float(seg.sum()))
    return np.concatenate(
        [np.array([rms, zcr, centroid, rolloff], np.float32), bands]
    )[:dim].astype(np.float32)


def _image_features(img: np.ndarray, dim: int) -> np.ndarray:
    """Real pixel features: mean R,G,B over a ceil(dim/3)-cell row grid,
    flattened channel-major to dim floats in [0,1]."""
    h, w, _ = img.shape
    cells = max((dim + 2) // 3, 1)
    edges = np.linspace(0, w, cells + 1).astype(int)
    feats = []
    for c in range(cells):
        lo, hi = edges[c], max(edges[c + 1], edges[c] + 1)
        feats.extend(img[:, lo:hi, :].reshape(-1, 3).mean(axis=0) / 255.0)
    return np.asarray(feats[:dim], np.float32)


def _real_decode(payload: bytes, media_type: str, dim: int) -> tuple[np.ndarray, int, int, int]:
    """Dispatch on the container magic; returns (feature, width, height,
    sample_rate).  Codec-required formats raise NotImplementedError —
    the honest boundary (PIL/ffmpeg are not in this container)."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        sr, x = _decode_wav(payload)
        return _audio_features(sr, x, dim), 0, 0, sr
    if payload[:2] == b"P6":
        img = _decode_ppm(payload)
        return _image_features(img, dim), img.shape[1], img.shape[0], 0
    raise NotImplementedError(
        f"payload format not stdlib-decodable (media_type={media_type!r}; "
        "JPEG/MP4/FLAC need PIL/ffmpeg — plug the codec call here)"
    )


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
                feats = [
                    _real_decode(bytes(p), m, dim)[0]
                    for p, m in zip(pdf["payload"], pdf["media_type"])
                ]
            else:
                feats = [
                    _fake_decode(bytes(p), m, dim)
                    for p, m in zip(pdf["payload"], pdf["media_type"])
                ]
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
