"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media payloads are opaque ``binary`` columns with typed metadata
(width/height/codec/duration), processed by Arrow-batched pandas UDFs over
``mapInPandas``. The actual codec work (JPEG decode, resampling, frame
extraction) requires libraries not present in this container, so the decode
kernels are STUBS — ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless ``fake=True``, where a deterministic
hash-derived payload stands in so the Spark-side plumbing (schema, batch
shape, partitioning) is fully testable.

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


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    if not fake:
        raise NotImplementedError("image codecs unavailable in this environment; use fake=True")
    return _fake_pixels(payload, THUMB_W, THUMB_H)


def decode_audio(payload: bytes, fake: bool = False) -> list[float]:
    if not fake:
        raise NotImplementedError("audio codecs unavailable in this environment; use fake=True")
    return _fake_pixels(payload, AUDIO_FRAMES, 1)


def image_features(df: DataFrame, payload_col: str, pk_col: str) -> DataFrame:
    """payload binary → (pk, thumb array<double>, phash bigint), Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            thumbs = [decode_image(bytes(b), fake=True) for b in pdf[payload_col]]
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


def audio_features(df: DataFrame, payload_col: str, pk_col: str) -> DataFrame:
    """audio binary → (pk, fbank array<double>[AUDIO_FRAMES]) — the
    fixed-frame feature shape (fbank/mfcc stand-in), Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame({
                pk_col: pdf[pk_col].to_numpy(),
                "fbank": [decode_audio(bytes(b), fake=True) for b in pdf[payload_col]],
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
