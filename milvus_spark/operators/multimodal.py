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


def _decode_bmp(payload: bytes) -> list[float]:
    """REAL, library-free BMP decode (uncompressed 24-bit BI_RGB — the
    format every tool can emit): parse BITMAPFILEHEADER/BITMAPINFOHEADER,
    honor 4-byte row alignment and bottom-up row order, BT.601 luma
    (Pillow's "L" formula), then THUMB_W×THUMB_H block-mean downscale.
    Pure numpy, so the real-codec path executes (and is oracle-gated via
    mm_bmp_real_decode) even in containers without Pillow."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down, hh = h < 0, abs(h)
    rowsize = ((bpp * w + 31) // 32) * 4
    arr = np.frombuffer(payload, np.uint8, count=rowsize * hh, offset=off)
    px = arr.reshape(hh, rowsize)[:, : w * 3].reshape(hh, w, 3).astype(np.float64)
    if not top_down:
        px = px[::-1]
    # pixel order in a BMP row is BGR; ITU-R BT.601 luma = Pillow "L"
    gray = 0.299 * px[..., 2] + 0.587 * px[..., 1] + 0.114 * px[..., 0]
    # images smaller than the thumb grid upsample nearest-neighbor so
    # every block has pixels (deterministic, solid colors unaffected)
    if gray.shape[0] < THUMB_H:
        gray = np.repeat(gray, THUMB_H, axis=0)
    if gray.shape[1] < THUMB_W:
        gray = np.repeat(gray, THUMB_W, axis=1)
    out: list[float] = []
    for rblock in np.array_split(gray, THUMB_H, axis=0):
        for cblock in np.array_split(rblock, THUMB_W, axis=1):
            out.append(round(float(cblock.mean()) / 255.0, 6))
    return out


def _decode_wav(payload: bytes) -> list[float]:
    """REAL, library-free WAV decode (RIFF/WAVE, PCM 8/16-bit): walk the
    chunk list for fmt/data, scale samples to [-1, 1] exactly as
    soundfile does (float64, /32768 for s16, offset-128/128 for u8),
    mono-fold by channel mean of |amplitude|, then AUDIO_FRAMES energy
    bins. Pure numpy — oracle-gated via mm_wav_real_decode."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        sz = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are 2-byte aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_ch = int.from_bytes(fmt[2:4], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits not in (8, 16) or n_ch < 1:
        raise ValueError(f"unsupported WAV (fmt={audio_format}, bits={bits})")
    if bits == 16:
        s = np.frombuffer(data[: len(data) - len(data) % (2 * n_ch)], "<i2")
        s = s.astype(np.float64) / 32768.0
    else:
        s = np.frombuffer(data[: len(data) - len(data) % n_ch], np.uint8)
        s = (s.astype(np.float64) - 128.0) / 128.0
    mono = np.abs(s.reshape(-1, n_ch)).mean(axis=1)
    if len(mono) == 0:
        return [0.0] * AUDIO_FRAMES
    bins = np.array_split(mono, AUDIO_FRAMES)
    return [round(float(b.mean()) if len(b) else 0.0, 6) for b in bins]


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """Decoded + grayscale-resized THUMB_W×THUMB_H pixel grid in [0,1].
    BMP payloads decode via the library-free numpy parser (deterministic
    across environments); other formats via Pillow when importable;
    ``fake=True`` forces the deterministic fixture either way (the
    oracle-pinned path)."""
    if fake:
        return _fake_pixels(payload, THUMB_W, THUMB_H)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
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
    """AUDIO_FRAMES mean-|amplitude| energy frames in [0,1]. PCM WAV
    payloads decode via the library-free numpy parser (deterministic
    across environments); other formats via soundfile when importable;
    ``fake=True`` forces the deterministic fixture either way (the
    oracle-pinned path)."""
    if fake:
        return _fake_pixels(payload, AUDIO_FRAMES, 1)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        try:
            return _decode_wav(payload)
        except ValueError:
            pass  # non-PCM WAV: fall through to soundfile
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


def make_bmp(w: int, h: int, rgb: tuple) -> bytes:
    """A real, well-formed uncompressed 24-bit BMP of one solid color —
    the encoder side of _decode_bmp, used by tests and by the
    mm_bmp_real_decode oracle query (solid color makes the decoded luma
    an exact closed form the SQL oracle recomputes, while the parser
    still exercises headers, BGR order, bottom-up rows and row padding)."""
    rowsize = ((24 * w + 31) // 32) * 4
    img_size = rowsize * h
    off = 14 + 40
    fh = (
        b"BM"
        + (off + img_size).to_bytes(4, "little")
        + b"\x00" * 4
        + off.to_bytes(4, "little")
    )
    ih = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + img_size.to_bytes(4, "little")
        + b"\x00" * 16
    )
    r, g, b = rgb
    row = bytes([b, g, r]) * w + b"\x00" * (rowsize - 3 * w)
    return fh + ih + row * h


def make_wav(n_samples: int, value: int, n_ch: int = 1, sr: int = 8000) -> bytes:
    """A real RIFF/WAVE PCM-16 file of one constant sample value — the
    encoder side of _decode_wav (constant amplitude makes every energy
    bin exactly value/32768, closed-form for the SQL oracle, while the
    parser still walks the chunk list and scales samples)."""
    data = value.to_bytes(2, "little", signed=True) * (n_samples * n_ch)
    fmt = (
        (1).to_bytes(2, "little")
        + n_ch.to_bytes(2, "little")
        + sr.to_bytes(4, "little")
        + (sr * n_ch * 2).to_bytes(4, "little")
        + (n_ch * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(chunks).to_bytes(4, "little") + chunks


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
