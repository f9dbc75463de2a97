"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media payloads are opaque ``binary`` columns with typed metadata
(width/height/codec/duration), processed by Arrow-batched pandas UDFs over
``mapInPandas``. The codec layer is pluggable at runtime:
``decode_image``/``decode_audio`` use Pillow / soundfile when importable
(real JPEG/PNG decode + resize, real WAV decode + frame-energy binning)
and otherwise raise ``NotImplementedError`` unless ``fake=True``, where a
deterministic hash-derived payload stands in so the Spark-side plumbing
(schema, batch shape, partitioning) is fully testable in codec-less
containers. The registered oracle queries PIN ``fake=True`` (the oracle
recomputes the deterministic fixture); the real path is covered by unit
tests that skip when the library is absent.

The Spark-side contract IS the real design:
  - media rows are large → keep ``spark.sql.files.maxPartitionBytes`` small
    for these tables and never collect; all transforms are mapInPandas.
  - feature columns (embeddings, resized thumbnails) are appended columns,
    written back partitioned by content shard.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

THUMB_W, THUMB_H = 4, 4  # deterministic fake "thumbnail" grid
AUDIO_FRAMES = 8


def _fake_pixels(payload: bytes, w: int, h: int) -> list[float]:
    """Deterministic stand-in for a decoded+resized image: bytes of
    sha256(payload) scaled to [0,1], tiled to w*h values."""
    d = hashlib.sha256(payload).digest()
    vals = np.frombuffer((d * ((w * h) // len(d) + 1))[: w * h], dtype=np.uint8)
    return (vals / 255.0).round(6).tolist()


def _try_import(name: str):
    try:
        return __import__(name)
    except ImportError:
        return None


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """Decoded + grayscale-resized THUMB_W×THUMB_H pixel grid in [0,1].
    Real path via Pillow when importable; ``fake=True`` forces the
    deterministic fixture either way (the oracle-pinned path)."""
    if fake:
        return _fake_pixels(payload, THUMB_W, THUMB_H)
    if _try_import("PIL") is not None:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload)).convert("L").resize((THUMB_W, THUMB_H))
        return (np.asarray(img, dtype=np.float64).ravel() / 255.0).round(6).tolist()
    raise NotImplementedError(
        "image codecs unavailable in this environment (pip install Pillow), "
        "or use fake=True"
    )


def decode_audio(payload: bytes, fake: bool = False) -> list[float]:
    """AUDIO_FRAMES mean-|amplitude| energy frames in [0,1]. Real path via
    soundfile when importable; ``fake=True`` forces the deterministic
    fixture either way (the oracle-pinned path)."""
    if fake:
        return _fake_pixels(payload, AUDIO_FRAMES, 1)
    if _try_import("soundfile") is not None:
        import io

        import soundfile as sf

        samples, _sr = sf.read(io.BytesIO(payload), dtype="float64", always_2d=True)
        mono = np.abs(samples).mean(axis=1)
        if len(mono) == 0:
            return [0.0] * AUDIO_FRAMES
        bins = np.array_split(mono, AUDIO_FRAMES)
        return [round(float(b.mean()) if len(b) else 0.0, 6) for b in bins]
    raise NotImplementedError(
        "audio codecs unavailable in this environment (pip install soundfile), "
        "or use fake=True"
    )


def image_features(
    df: DataFrame, payload_col: str, pk_col: str, fake: bool = True
) -> DataFrame:
    """payload binary → (pk, thumb array<double>, phash bigint), Arrow-batched.
    ``fake=False`` switches to the real Pillow decode (same schema/shape)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            thumbs = [decode_image(bytes(b), fake=fake) for b in pdf[payload_col]]
            # 60-bit perceptual-hash stand-in: first 15 hex chars of the
            # digest — integer arithmetic only, so an external SQL oracle
            # can recompute it exactly (no fp, no sign games)
            phash = [
                int(hashlib.sha256(bytes(b)).hexdigest()[:15], 16)
                for b in pdf[payload_col]
            ]
            yield pd.DataFrame({
                pk_col: pdf[pk_col].to_numpy(),
                "thumb": thumbs,
                "phash": np.asarray(phash, dtype=np.int64),
            })

    return df.select(pk_col, payload_col).mapInPandas(
        run, schema=f"{pk_col} long, thumb array<double>, phash long"
    )


def audio_features(
    df: DataFrame, payload_col: str, pk_col: str, fake: bool = True
) -> DataFrame:
    """audio binary → (pk, fbank array<double>[AUDIO_FRAMES]) — the
    fixed-frame feature shape (fbank/mfcc stand-in), Arrow-batched.
    ``fake=False`` switches to the real soundfile decode (same schema)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame({
                pk_col: pdf[pk_col].to_numpy(),
                "fbank": [decode_audio(bytes(b), fake=fake) for b in pdf[payload_col]],
            })

    return df.select(pk_col, payload_col).mapInPandas(
        run, schema=f"{pk_col} long, fbank array<double>"
    )


def frame_sample(
    df: DataFrame, payload_col: str, pk_col: str, len_col: str, every_n: int = 2
) -> DataFrame:
    """Video frame sampling stub: emit one row per sampled 'frame' index —
    demonstrates the row-expanding mapInPandas shape used for real decoders.
    The fake frame count derives from ``len_col`` (the media duration
    stand-in) so row expansion actually varies per document, and each
    frame's pixels hash the payload + the decimal frame index — both
    choices SQL-reproducible for the external oracle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pk, b, ln in zip(pdf[pk_col], pdf[payload_col], pdf[len_col]):
                n_frames = (int(ln) % 7) + 2  # deterministic fake frame count
                for i in range(0, n_frames, every_n):
                    rows.append(
                        (int(pk), i, _fake_pixels(bytes(b) + str(i).encode(), THUMB_W, 1))
                    )
            if rows:
                yield pd.DataFrame(rows, columns=[pk_col, "frame_idx", "frame_vec"])

    return df.select(pk_col, payload_col, len_col).mapInPandas(
        run, schema=f"{pk_col} long, frame_idx int, frame_vec array<double>"
    )


def make_media_table(df: DataFrame, pk_col: str, text_col: str) -> DataFrame:
    """Derive a deterministic binary 'media' column from a text column —
    test fixture for the plumbing (sha256-seeded payload + metadata)."""
    payload = F.sha2(F.col(text_col), 256).cast("binary")
    return df.select(
        F.col(pk_col),
        payload.alias("media"),
        F.length(F.col(text_col)).alias("media_len"),
        F.lit("fake/v1").alias("codec"),
    )
