"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media payloads are opaque ``binary`` columns with typed metadata
(width/height/codec/duration), processed by Arrow-batched pandas UDFs over
``mapInPandas``. The codec layer is pluggable at runtime:
``decode_image``/``decode_audio`` decode BMP, PNG (stdlib zlib — headers,
CRC, inflate, all five scanline filters), baseline JPEG (Huffman entropy
decode, dequantize, IDCT — grayscale + 4:4:4 color), GIF (from-scratch
LZW), and PCM + G.711 μ-law/A-law WAV natively with numpy, use Pillow /
soundfile when importable for the remaining formats
(progressive/subsampled JPEG, FLAC, …),
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
from typing import Iterator, Sequence

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


def _thumb_from_gray(gray: np.ndarray) -> list[float]:
    """THUMB_W×THUMB_H block-mean downscale of a float grayscale image in
    [0,255] → flat [0,1] list (shared by every real image decoder).
    Images smaller than the thumb grid upsample nearest-neighbor so every
    block has pixels (deterministic, solid colors unaffected)."""
    if gray.shape[0] < THUMB_H:
        gray = np.repeat(gray, THUMB_H, axis=0)
    if gray.shape[1] < THUMB_W:
        gray = np.repeat(gray, THUMB_W, axis=1)
    out: list[float] = []
    for rblock in np.array_split(gray, THUMB_H, axis=0):
        for cblock in np.array_split(rblock, THUMB_W, axis=1):
            out.append(round(float(cblock.mean()) / 255.0, 6))
    return out


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
    return _thumb_from_gray(gray)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# Adam7 pass grid (PNG spec §8.2): (x0, y0, dx, dy) per pass — each pass
# is an independently filtered sub-image scattered into the full grid
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, off: int, ph: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the five scanline filters (spec §9 reconstruction
    functions) over one filtered sub-image: ``bpp`` is the filter byte
    distance (bytes per complete pixel — channels × bytes-per-sample,
    min 1). Returns (ph, stride) uint8."""
    px = np.empty((ph, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(ph):
        ft = raw[off + y * (1 + stride)]
        line = np.frombuffer(
            raw, np.uint8, stride, off + y * (1 + stride) + 1
        ).astype(np.int64)
        if ft == 0:
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft in (1, 3, 4):  # Sub / Average / Paeth: left-dependent
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = int(prev[x])
                if ft == 1:
                    rec = a
                elif ft == 3:
                    rec = (a + b) >> 1
                else:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    rec = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(line[x]) + rec) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter type {ft}")
        px[y] = cur.astype(np.uint8)
        prev = cur
    return px


def _png_samples(px: np.ndarray, pw: int, depth: int, channels: int) -> np.ndarray:
    """Filtered bytes → per-pixel sample values: 16-bit recombines
    big-endian pairs, sub-8 unpacks MSB-first bit fields (palette
    indices, channels == 1). Returns (ph, pw*channels) int64."""
    if depth == 8:
        return px[:, : pw * channels].astype(np.int64)
    if depth == 16:
        b = px.astype(np.int64)
        return ((b[:, 0::2] << 8) | b[:, 1::2])[:, : pw * channels]
    per = 8 // depth
    shifts = np.arange(per - 1, -1, -1, dtype=np.uint8) * depth
    unpacked = (px[:, :, None].astype(np.uint16) >> shifts) & ((1 << depth) - 1)
    return unpacked.reshape(px.shape[0], -1)[:, :pw].astype(np.int64)


def _png_passes(w: int, h: int, interlace: int) -> list:
    """(x0, y0, dx, dy, pw, ph) for each non-empty pass."""
    grid = [(0, 0, 1, 1)] if interlace == 0 else list(_ADAM7)
    out = []
    for x0, y0, dx, dy in grid:
        pw = max(0, -(-(w - x0) // dx))
        ph = max(0, -(-(h - y0) // dy))
        if pw and ph:
            out.append((x0, y0, dx, dy, pw, ph))
    return out


def _decode_png(payload: bytes) -> list[float]:
    """REAL PNG decode with stdlib ``zlib`` only (r8 — the first
    COMPRESSED format executing for real in this codec-less container):
    chunk walk (IHDR/IDAT/IEND with CRC-32 verification), zlib inflate of
    the concatenated IDAT stream, per-scanline unfilter (all five filter
    types 0-4: None/Sub/Up/Average/Paeth, the spec's §9 reconstruction
    functions), BT.601 luma, then the shared block-mean thumb.

    Scope (widened through r9): truecolor/grayscale color types 0/2/6 at
    8 AND 16 bits per sample (16-bit maps through /257 — exactly the
    v*257 16-bit expansion inverted; alpha ignored as Pillow's "L"
    conversion does), PALETTE images (color type 3: 8-bit and packed
    1/2/4-bit indices through the PLTE table), and ADAM7 INTERLACE for
    every in-scope combination (spec §8.2: seven independently filtered
    sub-images scattered into the grid; the sequential layout rides the
    same path as the degenerate single pass). Remaining refusals are
    spec-invalid or vanishing shapes: 16-bit palette (forbidden by the
    spec), sub-8-bit truecolor, unknown interlace methods. Oracle-gated
    end-to-end via mm_png_real_decode + mm_png_palette_decode +
    mm_png_adam7_decode."""
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, plte = len(_PNG_SIG), None, b"", None
    while pos + 8 <= len(payload):
        sz = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + sz]
        crc = int.from_bytes(payload[pos + 8 + sz : pos + 12 + sz], "big")
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} fails CRC")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + sz
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color, _comp, _filt, interlace = ihdr[8:13]
    if interlace not in (0, 1):
        raise ValueError(f"unsupported PNG (interlace method {interlace})")
    # sub-8-bit depths are in scope ONLY for palette images (r9: packed
    # 1/2/4-bit indices — the common icon shape); 16-bit samples are in
    # scope for gray/truecolor (r9b); the spec itself forbids 16-bit
    # palette. Filtering always operates on bytes (spec §9: the filter
    # distance is the byte stride of one pixel).
    if depth not in (8, 16) and not (color == 3 and depth in (1, 2, 4)):
        raise ValueError(f"unsupported PNG (bit depth {depth})")
    if depth == 16 and color == 3:
        raise ValueError("unsupported PNG (bit depth 16 palette)")
    channels = {0: 1, 2: 3, 3: 1, 6: 4}.get(color)
    if channels is None or w <= 0 or h <= 0:
        raise ValueError(f"unsupported PNG (color type {color})")
    if color == 3:
        if plte is None or len(plte) == 0 or len(plte) % 3 != 0:
            raise ValueError("palette PNG missing a valid PLTE chunk")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3).astype(np.float64)
    raw = zlib.decompress(idat)
    bpp = max(1, channels * (2 if depth == 16 else 1))
    samples = np.zeros((h, w, channels), dtype=np.int64)
    off = 0
    # interlace == 0 degenerates to a single full-frame pass, so the
    # Adam7 scatter path IS the sequential path
    for x0, y0, dx, dy, pw, ph in _png_passes(w, h, interlace):
        pstride = pw * bpp if depth >= 8 else -(-pw * depth // 8)
        need = ph * (1 + pstride)
        if off + need > len(raw):
            raise ValueError("PNG pixel data size mismatch")
        px = _png_unfilter(raw, off, ph, pstride, bpp)
        off += need
        s = _png_samples(px, pw, depth, channels)
        samples[y0::dy, x0::dx, :] = s.reshape(ph, pw, channels)
    if off != len(raw):
        raise ValueError("PNG pixel data size mismatch")
    scale = 257.0 if depth == 16 else 1.0
    if color == 0:
        gray = samples[..., 0].astype(np.float64) / scale
    elif color == 3:  # palette: indices -> PLTE RGB -> BT.601 luma
        idx = samples[..., 0]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("palette PNG index out of PLTE range")
        rgb = pal[idx]
        gray = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    else:  # truecolor (alpha, if present, ignored — Pillow "L" on RGB)
        img = samples.astype(np.float64) / scale
        gray = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    return _thumb_from_gray(gray)


def _g711_ulaw_table() -> np.ndarray:
    """G.711 μ-law codeword → 16-bit sample (the standard expansion:
    complement, split sign/exponent/mantissa, magnitude =
    ((m·8 + 132) << e) − 132; max = 32124)."""
    c = np.arange(256, dtype=np.int64) ^ 0xFF
    sign = np.where(c & 0x80, -1, 1)
    e = (c >> 4) & 0x7
    m = c & 0xF
    mag = (((m << 3) + 0x84) << e) - 0x84
    return sign * mag


def _g711_alaw_table() -> np.ndarray:
    """G.711 A-law codeword → 16-bit sample (xor 0x55, sign/exponent/
    mantissa split, chord expansion; max = 32256, min step = 8)."""
    c = np.arange(256, dtype=np.int64) ^ 0x55
    sign = np.where(c & 0x80, 1, -1)
    e = (c >> 4) & 0x7
    m = c & 0xF
    mag = np.where(e == 0, (m << 4) + 8, ((m << 4) + 0x108) << np.maximum(e - 1, 0))
    return sign * mag


# IMA/DVI ADPCM (WAV format 0x11) — the classic 4-bit compressed-WAV
# shape (IMA ADPCM reference algorithm; spec in the Microsoft
# multimedia registration / IMA Digital Audio Pack)
_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)
_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)


def _ima_step(pred: int, index: int, nib: int) -> tuple:
    """One IMA ADPCM quantizer step: reconstruct the next sample from a
    4-bit code (the reference decoder's exact arithmetic — also used by
    the encoder to track its own reconstruction)."""
    step = _IMA_STEP_TABLE[index]
    diff = step >> 3
    if nib & 4:
        diff += step
    if nib & 2:
        diff += step >> 1
    if nib & 1:
        diff += step >> 2
    pred = pred - diff if nib & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX_TABLE[nib & 7]))
    return pred, index


def _ima_decode(data: bytes, n_ch: int, block_align: int, spb: int) -> np.ndarray:
    """IMA ADPCM data chunk → (n, n_ch) int16: per block, a 4-byte header
    per channel (predictor int16 + step index), then channel-interleaved
    4-byte groups of 8 nibbles (low nibble first)."""
    chans: list[list[int]] = [[] for _ in range(n_ch)]
    for boff in range(0, len(data) - (len(data) % block_align), block_align):
        block = data[boff : boff + block_align]
        pred, idx = [], []
        for c in range(n_ch):
            hd = block[c * 4 : c * 4 + 4]
            p = int.from_bytes(hd[0:2], "little", signed=True)
            i = hd[2]
            if i > 88:
                raise ValueError(f"ADPCM step index {i} out of range")
            pred.append(p)
            idx.append(i)
            chans[c].append(p)  # the header carries the block's 1st sample
        body = block[4 * n_ch :]
        n_groups = len(body) // (4 * n_ch)
        done = [1] * n_ch  # samples emitted this block, per channel
        for g in range(n_groups):
            for c in range(n_ch):
                grp = body[(g * n_ch + c) * 4 : (g * n_ch + c) * 4 + 4]
                for byte in grp:
                    for nib in (byte & 0xF, byte >> 4):
                        if done[c] >= spb:
                            continue  # trailing pad nibbles
                        pred[c], idx[c] = _ima_step(pred[c], idx[c], nib)
                        chans[c].append(pred[c])
                        done[c] += 1
    n = min(len(ch) for ch in chans)
    return np.stack([np.asarray(ch[:n], dtype=np.int64) for ch in chans], axis=1)


def _decode_wav(payload: bytes) -> list[float]:
    """REAL, library-free WAV decode (RIFF/WAVE; PCM 8/16-bit plus G.711
    μ-law/A-law companded formats, r8): walk the chunk list for fmt/data,
    scale samples to [-1, 1] exactly as soundfile does (float64, /32768
    for s16 and for the expanded G.711 16-bit values, offset-128/128 for
    u8), mono-fold by channel mean of |amplitude|, then AUDIO_FRAMES
    energy bins. Pure numpy — oracle-gated via mm_wav_real_decode and
    mm_ulaw_real_decode."""
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
    if (
        n_ch < 1
        or (audio_format == 1 and bits not in (8, 16))
        or (audio_format in (6, 7) and bits != 8)
        or (audio_format == 0x11 and bits != 4)
        or audio_format not in (1, 6, 7, 0x11)
    ):
        raise ValueError(f"unsupported WAV (fmt={audio_format}, bits={bits})")
    if audio_format == 0x11:  # IMA/DVI ADPCM (r9b): 4-bit block codec
        block_align = int.from_bytes(fmt[12:14], "little")
        if block_align < 4 * n_ch + 4:
            raise ValueError(f"ADPCM block align {block_align} too small")
        # the fmt extension carries samplesPerBlock; derive when absent
        spb = (
            int.from_bytes(fmt[18:20], "little")
            if len(fmt) >= 20
            else (block_align - 4 * n_ch) * 2 // n_ch + 1
        )
        s = _ima_decode(data, n_ch, block_align, spb).astype(np.float64) / 32768.0
        s = s.reshape(-1)
    elif audio_format in (6, 7):  # G.711 A-law / μ-law companded bytes
        table = _g711_alaw_table() if audio_format == 6 else _g711_ulaw_table()
        raw = np.frombuffer(data[: len(data) - len(data) % n_ch], np.uint8)
        s = table[raw].astype(np.float64) / 32768.0
    elif bits == 16:
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


# ----------------------------------------------------------------- GIF (r8)
# GIF87a/89a with a REAL LZW codec (the third compressed format): logical
# screen descriptor + global color table, extension-block skipping, image
# descriptor, variable-width LSB-first LZW with CLEAR/END, dictionary
# growth to 12 bits and the KwKwK (code == next_code) case. First image
# block only (animation frames beyond it are ignored); interlaced images
# and local color tables REFUSE precisely.


def _lzw_decode(data: bytes, min_code: int) -> list[int]:
    """GIF-flavor LZW: codes are packed LSB-first; width starts at
    min_code+1, grows when the dictionary reaches the width's capacity,
    caps at 12 bits until a CLEAR resets it."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    acc = nbits = pos = 0
    width = min_code + 1
    dict_: dict[int, tuple] = {i: (i,) for i in range(clear)}
    next_code = end + 1
    prev: tuple = ()
    out: list[int] = []

    def read() -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    while True:
        code = read()
        if code == clear:
            dict_ = {i: (i,) for i in range(clear)}
            next_code = end + 1
            width = min_code + 1
            prev = ()
            continue
        if code == end:
            return out
        if code in dict_:
            entry = dict_[code]
        elif code == next_code and prev:
            entry = prev + (prev[0],)  # KwKwK
        else:
            raise ValueError("invalid GIF LZW code")
        out.extend(entry)
        if prev:
            dict_[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


def _lzw_encode(indices: list[int], min_code: int) -> bytes:
    """The encoder side of :func:`_lzw_decode` — real dictionary LZW
    (CLEAR at start and on dictionary overflow), round-trip-fuzzed."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    acc = nbits = 0
    width = min_code + 1

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    dict_: dict[tuple, int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    buf: tuple = ()
    for px in indices:
        cand = buf + (int(px),)
        if cand in dict_:
            buf = cand
            continue
        put(dict_[buf])
        dict_[cand] = next_code
        next_code += 1
        # one add LATER than the decoder's bump: the decoder lags one
        # dictionary entry behind (the KwKwK lag), so bumping here at
        # next_code == 1<<width would widen the encoder a code early
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            put(clear)
            dict_ = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code + 1
        buf = (int(px),)
    if buf:
        put(dict_[buf])
    put(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_interlace_rows(h: int) -> list[int]:
    """GIF 4-pass interlace row order (spec appendix E): the stream
    carries rows 0,8,16.. then 4,12.. then 2,6,10.. then 1,3,5.. —
    stream row k displays at row order[k]."""
    return (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )


def _decode_gif(payload: bytes) -> list[float]:
    """REAL GIF decode with numpy + the LZW codec above: header + logical
    screen descriptor, global color table, extension skipping, the FIRST
    image descriptor's LZW data (sub-block concatenation), palette
    lookup, BT.601 luma, shared block-mean thumb. Since r11 the decoder
    also handles INTERLACED images (the 4-pass row reorder, spec
    appendix E) and LOCAL color tables (an image-descriptor palette
    overriding the global one — a global table is only required when no
    local table is present). Oracle-gated end-to-end via
    mm_gif_real_decode / mm_gif_interlaced_decode."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    flags = payload[10]
    pos = 13
    palette = None
    if flags & 0x80:
        gct_n = 2 << (flags & 0x7)
        palette = np.frombuffer(
            payload, np.uint8, gct_n * 3, pos
        ).reshape(gct_n, 3).astype(np.float64)
        pos += gct_n * 3
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x21:  # extension: skip sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            w = int.from_bytes(payload[pos + 5 : pos + 7], "little")
            h = int.from_bytes(payload[pos + 7 : pos + 9], "little")
            iflags = payload[pos + 9]
            pos += 10
            pal = palette
            if iflags & 0x80:  # local color table wins over the global
                lct_n = 2 << (iflags & 0x7)
                pal = np.frombuffer(
                    payload, np.uint8, lct_n * 3, pos
                ).reshape(lct_n, 3).astype(np.float64)
                pos += lct_n * 3
            if pal is None:
                raise ValueError("unsupported GIF (no color table)")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                n = payload[pos]
                data += payload[pos + 1 : pos + 1 + n]
                pos += 1 + n
            idx = _lzw_decode(bytes(data), min_code)
            if len(idx) < w * h:
                raise ValueError("GIF pixel data short")
            grid = np.asarray(idx[: w * h]).reshape(h, w)
            if iflags & 0x40:  # interlaced: de-permute the pass rows
                de = np.empty_like(grid)
                de[_gif_interlace_rows(h)] = grid
                grid = de
            px = pal[grid]
            gray = (
                0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
            )
            return _thumb_from_gray(gray)
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    raise ValueError("GIF has no image block")


def make_gif(
    w: int,
    h: int,
    rgb: tuple | None = None,
    pixels: np.ndarray | None = None,
    palette: list | None = None,
    interlaced: bool = False,
    local_palette: bool = False,
) -> bytes:
    """A real GIF89a encoder (the encoder side of _decode_gif): color
    table + LZW-compressed first frame. ``rgb`` emits a solid color
    with a deterministic 4-entry palette (the closed-form oracle shape);
    ``pixels`` ((h, w) palette indices) + ``palette`` ([(r,g,b), ...])
    encode arbitrary indexed content for round-trip tests — long streams
    cross LZW width boundaries and the 4096 dictionary reset.
    ``interlaced`` writes the rows in the 4-pass interlace order with the
    interlace flag set; ``local_palette`` moves the color table into the
    image descriptor (no global table at all)."""
    if pixels is None:
        palette = [tuple(rgb), (0, 0, 0), (255, 255, 255), (1, 2, 3)]
        pixels = np.zeros((h, w), np.int64)
    pal_bits = max(1, (max(2, len(palette)) - 1).bit_length())
    gct_n = 1 << pal_bits
    pal = list(palette) + [(0, 0, 0)] * (gct_n - len(palette))
    min_code = max(2, pal_bits)
    grid = np.asarray(pixels).reshape(h, w)
    if interlaced:
        grid = grid[_gif_interlace_rows(h)]
    lzw = _lzw_encode([int(v) for v in grid.ravel()], min_code)
    sub = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        sub += bytes([len(chunk)]) + chunk
    sub += b"\x00"
    pal_bytes = b"".join(bytes(p) for p in pal)
    head = (
        b"GIF89a"
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + (
            bytes([0, 0, 0])
            if local_palette
            else bytes([0x80 | (pal_bits - 1), 0, 0]) + pal_bytes
        )
    )
    iflags = (0x40 if interlaced else 0) | (
        0x80 | (pal_bits - 1) if local_palette else 0
    )
    img = (
        b"\x2c" + b"\x00" * 4
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([iflags])
        + (pal_bytes if local_palette else b"")
        + bytes([min_code]) + bytes(sub)
    )
    return head + img + b"\x3b"


# ---------------------------------------------------------------- FLAC (r9)
# Free Lossless Audio Codec with pure numpy/stdlib — the FOURTH compressed
# format executing for real. Scope: 8/16/24-bit (24 since r11 — the
# dominant hi-res shape), up to the spec's 8 channels, CONSTANT /
# VERBATIM / FIXED (orders 0-4) / LPC subframes, all four stereo modes
# (independent, left-side, right-side, mid-side — the side channel at
# bps+1), partitioned Rice residuals (4- and 5-bit parameter widths,
# escape partitions), wasted-bits shifts, UTF-8 frame numbers, CRC-8
# header + CRC-16 frame verification. Out of scope, REFUSED precisely:
# 12/20/32-bit depths, reserved residual methods.


class _FlacBits:
    """MSB-first bit reader over a byte buffer (no byte stuffing — FLAC
    entropy data is raw; frame boundaries come from decoded lengths)."""

    def __init__(self, d: bytes, bitpos: int = 0):
        self.d = d
        self.p = bitpos

    def bits(self, n: int) -> int:
        v = 0
        p, d = self.p, self.d
        for _ in range(n):
            byte = p >> 3
            if byte >= len(d):
                raise ValueError("FLAC bitstream truncated")
            v = (v << 1) | ((d[byte] >> (7 - (p & 7))) & 1)
            p += 1
        self.p = p
        return v

    def sbits(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if n and v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        p, d = self.p, self.d
        while True:
            byte = p >> 3
            if byte >= len(d):
                raise ValueError("FLAC bitstream truncated")
            if (d[byte] >> (7 - (p & 7))) & 1:
                self.p = p + 1
                return q
            q += 1
            p += 1

    def align(self) -> None:
        self.p = (self.p + 7) & ~7


def _flac_crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _flac_crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _flac_utf8(n: int) -> bytes:
    """FLAC's extended UTF-8 coding of the frame number."""
    if n < 0x80:
        return bytes([n])
    for nbytes, lead in ((2, 0xC0), (3, 0xE0), (4, 0xF0), (5, 0xF8), (6, 0xF8 | 2), (7, 0xFE)):
        if n < (1 << (nbytes * 5 + 1)) or nbytes == 7:
            out = [0] * nbytes
            for i in range(nbytes - 1, 0, -1):
                out[i] = 0x80 | (n & 0x3F)
                n >>= 6
            lead_bits = {2: 0xC0, 3: 0xE0, 4: 0xF0, 5: 0xF8, 6: 0xFC, 7: 0xFE}[nbytes]
            out[0] = lead_bits | n
            return bytes(out)
    raise ValueError("frame number too large")


def _flac_read_utf8(rd: "_FlacBits") -> int:
    b0 = rd.bits(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("invalid FLAC UTF-8 frame number")
    v = b0 & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        b = rd.bits(8)
        if b & 0xC0 != 0x80:
            raise ValueError("invalid FLAC UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


_FLAC_FIXED = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _flac_residual(rd: "_FlacBits", bs: int, order: int) -> list:
    method = rd.bits(2)
    if method > 1:
        raise ValueError("unsupported FLAC (reserved residual method)")
    pbits, esc = (4, 0xF) if method == 0 else (5, 0x1F)
    po = rd.bits(4)
    if bs % (1 << po) != 0:
        raise ValueError("FLAC partition order does not divide block size")
    out: list = []
    for p in range(1 << po):
        n = (bs >> po) - (order if p == 0 else 0)
        param = rd.bits(pbits)
        if param == esc:
            raw = rd.bits(5)
            out.extend(rd.sbits(raw) if raw else 0 for _ in range(n))
        else:
            for _ in range(n):
                u = (rd.unary() << param) | rd.bits(param)
                out.append((u >> 1) ^ -(u & 1))
    return out


def _flac_subframe(rd: "_FlacBits", bs: int, bps: int) -> list:
    if rd.bits(1) != 0:
        raise ValueError("FLAC subframe padding bit set")
    t = rd.bits(6)
    wasted = 0
    if rd.bits(1):
        wasted = rd.unary() + 1
    eff = bps - wasted
    if t == 0:  # CONSTANT
        out = [rd.sbits(eff)] * bs
    elif t == 1:  # VERBATIM
        out = [rd.sbits(eff) for _ in range(bs)]
    elif 8 <= t <= 12:  # FIXED
        order = t - 8
        out = [rd.sbits(eff) for _ in range(order)]
        res = _flac_residual(rd, bs, order)
        coefs = _FLAC_FIXED[order]
        for r in res:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coefs))
            out.append(r + pred)
    elif t >= 32:  # LPC
        order = (t & 31) + 1
        out = [rd.sbits(eff) for _ in range(order)]
        prec = rd.bits(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = rd.sbits(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [rd.sbits(prec) for _ in range(order)]
        res = _flac_residual(rd, bs, order)
        for r in res:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coefs)) >> shift
            out.append(r + pred)
    else:
        raise ValueError(f"unsupported FLAC subframe type {t}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _decode_flac(payload: bytes) -> list[float]:
    """REAL FLAC decode with pure Python/numpy: metadata walk
    (STREAMINFO), frame header parse (sync, block size / sample rate
    codes, UTF-8 frame number, CRC-8), per-channel subframe decode
    (CONSTANT / VERBATIM / FIXED / LPC with partitioned Rice residuals),
    stereo decorrelation (left-side / right-side / mid-side at the spec's
    side-channel bps+1), CRC-16 frame verification, then the same
    energy-bin features as _decode_wav (samples / 32768)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        ln = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        if btype == 0:
            info = payload[pos + 4 : pos + 4 + ln]
        pos += 4 + ln
        if last:
            break
    if info is None or len(info) < 34:
        raise ValueError("FLAC missing STREAMINFO")
    rd0 = _FlacBits(info)
    rd0.bits(16); rd0.bits(16); rd0.bits(24); rd0.bits(24)
    _sr = rd0.bits(20)
    n_ch = rd0.bits(3) + 1
    bps = rd0.bits(5) + 1
    total = rd0.bits(36)
    # r11: 8/24-bit streams and up to the spec's 8 channels decode for
    # real (24-bit is the dominant real-world hi-res shape); 12/20/32-bit
    # remain refused precisely
    if bps not in (8, 16, 24):
        raise ValueError(f"unsupported FLAC (bit depth {bps})")
    chans: list = [[] for _ in range(n_ch)]
    got = 0
    while pos + 4 <= len(payload) and got < total:
        if payload[pos] != 0xFF or (payload[pos + 1] & 0xFC) != 0xF8:
            raise ValueError("FLAC frame sync lost")
        rd = _FlacBits(payload, pos * 8)
        rd.bits(16)  # sync + reserved + blocking strategy
        bs_code = rd.bits(4)
        sr_code = rd.bits(4)
        ch_code = rd.bits(4)
        ss_code = rd.bits(3)
        rd.bits(1)
        _fnum = _flac_read_utf8(rd)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = rd.bits(8) + 1
        elif bs_code == 7:
            bs = rd.bits(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 12:
            rd.bits(8)
        elif sr_code in (13, 14):
            rd.bits(16)
        fbps = {0: bps, 1: 8, 4: 16, 6: 24}.get(ss_code)
        if fbps is None:
            raise ValueError(
                f"unsupported FLAC (frame sample size code {ss_code})"
            )
        if fbps != bps:
            raise ValueError(
                "FLAC frame sample size disagrees with STREAMINFO"
            )
        hdr_end = rd.p >> 3
        if _flac_crc8(payload[pos:hdr_end]) != rd.bits(8):
            raise ValueError("FLAC frame header fails CRC-8")
        if ch_code < 8:
            if ch_code + 1 != n_ch:
                raise ValueError("FLAC frame channel count mismatch")
            subs = [_flac_subframe(rd, bs, fbps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            if n_ch != 2:
                raise ValueError("FLAC stereo frame in non-stereo stream")
            # side channel carries one extra bit (spec: difference range)
            if ch_code == 8:  # left-side
                left = _flac_subframe(rd, bs, fbps)
                side = _flac_subframe(rd, bs, fbps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right-side (side first)
                side = _flac_subframe(rd, bs, fbps + 1)
                right = _flac_subframe(rd, bs, fbps)
                subs = [[s + r for s, r in zip(side, right)], right]
            else:  # mid-side
                mid = _flac_subframe(rd, bs, fbps)
                side = _flac_subframe(rd, bs, fbps + 1)
                subs = [[], []]
                for m, s in zip(mid, side):
                    mm = (m << 1) | (s & 1)
                    subs[0].append((mm + s) >> 1)
                    subs[1].append((mm - s) >> 1)
        else:
            raise ValueError("reserved FLAC channel assignment")
        rd.align()
        frame_end = rd.p >> 3
        crc16 = int.from_bytes(payload[frame_end : frame_end + 2], "big")
        if _flac_crc16(payload[pos:frame_end]) != crc16:
            raise ValueError("FLAC frame fails CRC-16")
        for c in range(n_ch):
            chans[c].extend(subs[c])
        got += bs
        pos = frame_end + 2
    if got < total:
        raise ValueError("FLAC stream truncated")
    s = np.asarray(chans, dtype=np.float64).T[: int(total)] / float(
        1 << (bps - 1)
    )
    mono = np.abs(s).mean(axis=1)
    if len(mono) == 0:
        return [0.0] * AUDIO_FRAMES
    bins = np.array_split(mono, AUDIO_FRAMES)
    return [round(float(b.mean()) if len(b) else 0.0, 6) for b in bins]


class _FlacWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.bits(0, 8 - self.n)

    def done(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _flac_write_residual(w: "_FlacWriter", res: list, param: int) -> None:
    w.bits(0, 2)  # 4-bit rice parameters
    w.bits(0, 4)  # partition order 0 (one partition)
    w.bits(param, 4)
    for v in res:
        u = (v << 1) if v >= 0 else ((-v) << 1) - 1
        q, rem = u >> param, u & ((1 << param) - 1)
        w.bits(1, q + 1)  # q zeros then a 1 — bits(1, q+1) writes 0..01
        if param:
            w.bits(rem, param)


def _flac_encode_subframe(w: "_FlacWriter", x: list, bps: int, order: int) -> None:
    if all(v == x[0] for v in x):
        w.bits(0, 1); w.bits(0, 6); w.bits(0, 1)  # CONSTANT
        w.bits(x[0] & ((1 << bps) - 1), bps)
        return
    order = min(order, len(x) - 1)
    w.bits(0, 1); w.bits(8 + order, 6); w.bits(0, 1)  # FIXED
    for v in x[:order]:
        w.bits(v & ((1 << bps) - 1), bps)
    coefs = _FLAC_FIXED[order]
    res = [
        x[i] - sum(c * x[i - j - 1] for j, c in enumerate(coefs))
        for i in range(order, len(x))
    ]
    mx = max((abs(r) for r in res), default=0)
    param = min(14, max(0, (2 * mx + 1).bit_length() - 1))
    _flac_write_residual(w, res, param)


def make_flac(
    samples: "np.ndarray | list",
    channels: int = 1,
    block_size: int = 1024,
    fixed_order: int = 2,
    stereo_mode: str = "independent",
    sample_rate: int = 8000,
    bps: int = 16,
) -> bytes:
    """A real, spec-conformant FLAC encoder (pure Python) — the encoder
    side of _decode_flac. ``samples``: integer values at ``bps`` bits
    (8/16/24), shape (n,) mono or (n, n_ch) multi-channel (up to the
    spec's 8; stereo decorrelation only applies at n_ch == 2). CONSTANT
    subframes for solid runs (the closed-form oracle shape), FIXED order
    0-4 otherwise; ``stereo_mode`` in independent / left_side /
    right_side / mid_side exercises every decorrelation path the decoder
    supports."""
    assert bps in (8, 16, 24)
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, n_ch = x.shape
    assert n_ch == channels
    info = _FlacWriter()
    info.bits(block_size, 16); info.bits(block_size, 16)
    info.bits(0, 24); info.bits(0, 24)
    info.bits(sample_rate, 20); info.bits(n_ch - 1, 3); info.bits(bps - 1, 5)
    info.bits(n, 36)
    streaminfo = info.done() + bytes(16)
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    fno = 0
    for start in range(0, n, block_size):
        blk = x[start : start + block_size]
        bs = len(blk)
        h = _FlacWriter()
        h.bits(0b11111111111110, 14); h.bits(0, 1); h.bits(0, 1)
        h.bits(7, 4)      # 16-bit block size - 1 follows
        h.bits(0, 4)      # sample rate from STREAMINFO
        ch_code = {
            "independent": n_ch - 1, "left_side": 8,
            "right_side": 9, "mid_side": 10,
        }[stereo_mode if n_ch == 2 else "independent"]
        h.bits(ch_code, 4)
        h.bits({8: 1, 16: 4, 24: 6}[bps], 3)  # sample size code
        h.bits(0, 1)
        hdr = bytearray(h.done())
        hdr += _flac_utf8(fno)
        hdr += (bs - 1).to_bytes(2, "big")
        hdr.append(_flac_crc8(bytes(hdr)))
        body = _FlacWriter()
        if n_ch == 1 or ch_code < 8:
            for c in range(n_ch):
                _flac_encode_subframe(body, [int(v) for v in blk[:, c]], bps, fixed_order)
        else:
            l = [int(v) for v in blk[:, 0]]
            r = [int(v) for v in blk[:, 1]]
            side = [a - b for a, b in zip(l, r)]
            if ch_code == 8:
                _flac_encode_subframe(body, l, bps, fixed_order)
                _flac_encode_subframe(body, side, bps + 1, fixed_order)
            elif ch_code == 9:
                _flac_encode_subframe(body, side, bps + 1, fixed_order)
                _flac_encode_subframe(body, r, bps, fixed_order)
            else:
                mid = [(a + b) >> 1 for a, b in zip(l, r)]
                _flac_encode_subframe(body, mid, bps, fixed_order)
                _flac_encode_subframe(body, side, bps + 1, fixed_order)
        frame = bytes(hdr) + body.done()
        out += frame + _flac_crc16(frame).to_bytes(2, "big")
        fno += 1
    return bytes(out)


# ---------------------------------------------------------------- JPEG (r8)
# Baseline sequential DCT JPEG with stdlib + numpy only — the second
# COMPRESSED format executing for real. Scope: 8-bit baseline (SOF0)
# and, since r11, 12-BIT EXTENDED SEQUENTIAL (SOF1, level shift 2048 —
# the DICOM/medical shape) with 8- OR 16-bit (Pq=1) quant tables,
# grayscale or YCbCr with sampling factors 1-2 per axis — 4:4:4 and,
# since r9, SUBSAMPLED chroma (4:2:0, the shape most real-world JPEGs
# are, plus 4:2:2/4:4:0) via generic interleaved-MCU decode with
# box-upsampled chroma — custom-DHT Huffman entropy coding, byte
# stuffing, and (r9) DRI restart intervals (byte-aligned cycling RSTn
# markers with DC-predictor resets, spec E.2.4). Out of scope, REFUSED
# precisely: lossless/hierarchical frame types, sampling factors > 2,
# arithmetic coding.
# The encoder emits a spec-conformant stream with a CONSTANT quant table
# (all 16s) and flat canonical Huffman tables declared in DHT — chosen so
# a solid color with EVEN gray level round-trips EXACTLY (constant block
# ⇒ DC-only ⇒ decoded = round(8·(L−128)/16)·16/8 + 128 = L for even L),
# which is what makes mm_jpeg_real_decode's oracle a closed form.

_ZIGZAG = [
    (r, s - r)
    for s in range(15)
    for r in (range(min(s, 7), max(0, s - 7) - 1, -1) if s % 2 == 0
              else range(max(0, s - 7), min(s, 7) + 1))
]
_DCT_M = None


def _dct_matrix() -> np.ndarray:
    global _DCT_M
    if _DCT_M is None:
        u, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
        M = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
        M[0] /= np.sqrt(2.0)
        _DCT_M = M
    return _DCT_M


# flat canonical Huffman tables (declared in DHT, so any conformant
# decoder reads them): 12 DC category symbols at code length 4, the 162
# standard AC run/size symbols at code length 8 — Kraft-valid, trivially
# canonical, and symbol order == value order keeps both sides simple
# 13 categories: 12-bit sequential DC diffs reach category 12 at the
# constant-quant encoder's coefficient bound (8·2047/16 → ±1024 → diff
# range ±2048); 13 symbols at length 4 stay Kraft-valid
_DC_SYMS = list(range(13))
_AC_SYMS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
] + [
    # EOBn codes (r9, progressive): size-0 symbols carrying an EOBRUN of
    # 2^r..2^(r+1)-1 blocks (spec G.1.2.2) — 176 total symbols at code
    # length 8 stays Kraft-valid (< 256)
    r << 4 for r in range(1, 15)
]


def _canonical_codes(symbols: list, length: int) -> dict:
    return {sym: (i, length) for i, sym in enumerate(symbols)}


def _jpeg_huff_decoder(bits: list, vals: list) -> tuple:
    """DHT (BITS, HUFFVAL) → (lut, maxlen): the spec's canonical code
    construction flattened into a 2^maxlen peek table — the decoder reads
    maxlen bits and resolves any symbol with ONE probe (each code of
    length L owns the 2^(maxlen−L) peek values it prefixes)."""
    entries, code, k = [], 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            entries.append((ln, code, vals[k]))
            code += 1
            k += 1
        code <<= 1
    maxlen = max((ln for ln, _, _ in entries), default=1)
    lut: list = [None] * (1 << maxlen)
    for ln, c, sym in entries:
        base = c << (maxlen - ln)
        for suffix in range(1 << (maxlen - ln)):
            lut[base + suffix] = (sym, ln)
    return lut, maxlen


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-pad to the byte boundary

    def raw(self, bts: bytes) -> None:
        """Append marker bytes verbatim (markers are never byte-stuffed)."""
        self.buf.extend(bts)

    def done(self) -> bytes:
        self.align()
        return bytes(self.buf)


class _BitReader:
    """MSB-first bit reader over a byte-stuffed JPEG entropy stream —
    multi-bit extraction with a table-driven Huffman fast path (r8: the
    bit-at-a-time reader dominated decode wall time; a (length, code)
    walk is ~10× slower than one LUT probe per symbol)."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self, need: int) -> None:
        d, pos, acc, n = self.d, self.pos, self.acc, self.n
        while n < need and pos < len(d):
            b = d[pos]
            pos += 1
            if b == 0xFF:
                if pos >= len(d) or d[pos] != 0x00:
                    if pos < len(d) and 0xD0 <= d[pos] <= 0xD7:
                        # RSTn ahead: stop filling at the marker — the
                        # decode loop consumes it via restart() (r9 DRI)
                        pos -= 1
                        break
                    raise ValueError("JPEG marker inside entropy stream")
                pos += 1  # unstuff
            acc = (acc << 8) | b
            n += 8
        self.pos, self.acc, self.n = pos, acc, n

    def restart(self, idx: int) -> None:
        """Consume an expected RSTn marker (spec E.2.4 — r9): discard the
        current byte's 1-padding bits, verify the interleave-numbered
        marker, and resume byte-aligned after it."""
        if self.n >= 8:
            raise ValueError("JPEG data before restart marker")
        self.acc = 0
        self.n = 0
        d, pos = self.d, self.pos
        if pos + 2 > len(d) or d[pos] != 0xFF or d[pos + 1] != 0xD0 + (idx & 7):
            raise ValueError("JPEG restart marker missing or out of order")
        self.pos = pos + 2

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill(k)
        if self.n < k:
            raise ValueError("JPEG entropy stream truncated")
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table: tuple) -> int:
        """One lookup on the next ``maxlen`` bits (zero-padded near the
        stream end — a valid code always completes within the remaining
        bits, padding only disambiguates the peek width)."""
        lut, maxlen = table
        self._fill(maxlen)
        avail = min(self.n, maxlen)
        peek = ((self.acc >> (self.n - avail)) if avail else 0) << (
            maxlen - avail
        )
        hit = lut[peek]
        if hit is None:
            raise ValueError("invalid JPEG Huffman code")
        sym, ln = hit
        if ln > avail:
            raise ValueError("JPEG entropy stream truncated")
        self.n -= ln
        self.acc &= (1 << self.n) - 1
        return sym


def _jpeg_extend(v: int, t: int) -> int:
    """DECODE_EXTEND (spec F.12): t-bit value → signed coefficient."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _entropy_end(payload: bytes, pos: int) -> int:
    """Index of the first marker that ENDS an entropy-coded segment: a
    0xFF followed by anything but 0x00 (stuffing) or RSTn (restarts stay
    inside the segment)."""
    i = pos
    n = len(payload)
    while True:
        i = payload.find(b"\xff", i)
        if i < 0 or i + 1 >= n:
            return n
        nxt = payload[i + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            i += 2
            continue
        return i


def _jpeg_process_scan(
    coefs: list,
    comps: list,
    sel: list,
    Ss: int,
    Se: int,
    Ah: int,
    Al: int,
    rd: "_BitReader",
    dcs: dict,
    acs: dict,
    dri: int,
    mcux: int,
    mcuy: int,
    dims: tuple,
) -> None:
    """One entropy-coded scan into the zigzag-order coefficient store —
    the four progressive modes of spec G.2 (DC first / DC refine with the
    successive-approximation point transform, AC first with EOBRUN, AC
    refine with correction bits, G.1.2.3) PLUS baseline as the degenerate
    single scan (Ss=0, Se=63, Ah=Al=0: DC and AC in one block visit).
    Interleaved (multi-component) scans walk MCU order; single-component
    scans walk the component's own block raster (spec A.2.2)."""
    w, h, hmax, vmax = dims
    cid_to_ci = {c[0]: i for i, c in enumerate(comps)}
    info = []
    for cid, tabs in sel:
        if cid not in cid_to_ci:
            raise ValueError("JPEG scan names an undeclared component")
        info.append((cid_to_ci[cid], tabs >> 4, tabs & 0xF))
    pred = [0] * len(comps)
    state = {"eobrun": 0}

    def block(ci: int, td: int, ta: int, yb: int, xb: int) -> None:
        coef = coefs[ci][yb, xb]
        if Ss == 0:
            if Ah == 0:  # DC first (baseline rides this at Al=0)
                t = rd.huff(dcs[td])
                pred[ci] += _jpeg_extend(rd.bits(t), t)
                coef[0] = pred[ci] << Al
            else:  # DC refinement: one bit ORs into the approximation
                if rd.bits(1):
                    coef[0] |= 1 << Al
            if Se == 0:
                return
            k = 1
        else:
            k = Ss
        if Ah == 0:  # AC first (EOBRUN counts fully-skipped blocks)
            if state["eobrun"] > 0:
                state["eobrun"] -= 1
                return
            while k <= Se:
                rs = rd.huff(acs[ta])
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += rd.bits(r)
                    break
                k += r
                if k > Se:
                    raise ValueError("JPEG AC coefficient overrun")
                coef[k] = _jpeg_extend(rd.bits(s), s) << Al
                k += 1
            return
        # AC refinement (G.1.2.3): p1/m1 corrections on history
        # coefficients, size-1 codes mark newly-significant ones
        p1, m1 = 1 << Al, -(1 << Al)
        if state["eobrun"] == 0:
            while k <= Se:
                rs = rd.huff(acs[ta])
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r < 15:
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += rd.bits(r)
                        break
                    val = 0  # ZRL: 16 zero-history positions
                else:
                    if s != 1:
                        raise ValueError("JPEG AC refinement size != 1")
                    val = p1 if rd.bits(1) else m1
                while k <= Se:
                    if coef[k] != 0:
                        if rd.bits(1) and (int(coef[k]) & p1) == 0:
                            coef[k] += p1 if coef[k] > 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val != 0 and k <= Se:
                    coef[k] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= Se:
                if coef[k] != 0 and rd.bits(1) and (int(coef[k]) & p1) == 0:
                    coef[k] += p1 if coef[k] > 0 else m1
                k += 1
            state["eobrun"] -= 1

    def maybe_restart(mcu_no: int) -> None:
        if dri and mcu_no and mcu_no % dri == 0:
            rd.restart(mcu_no // dri - 1)
            pred[:] = [0] * len(comps)
            state["eobrun"] = 0

    if len(info) > 1:  # interleaved MCU order
        mcu_no = 0
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart(mcu_no)
                mcu_no += 1
                for ci, td, ta in info:
                    _, hi, vi, _ = comps[ci]
                    for byi in range(vi):
                        for bxi in range(hi):
                            block(ci, td, ta, my * vi + byi, mx * hi + bxi)
    else:  # non-interleaved: the component's own block raster
        ci, td, ta = info[0]
        _, hi, vi, _ = comps[ci]
        cw, ch = -(-w * hi // hmax), -(-h * vi // vmax)
        mcu_no = 0
        for yb in range(-(-ch // 8)):
            for xb in range(-(-cw // 8)):
                maybe_restart(mcu_no)
                mcu_no += 1
                block(ci, td, ta, yb, xb)


def _decode_jpeg(payload: bytes) -> list[float]:
    """REAL JPEG decode with numpy only: marker walk, DQT/DHT parse,
    SOF0 (baseline) or SOF2 (progressive, r9) frame header, multi-scan
    Huffman entropy decode into a zigzag coefficient store (DC diff
    categories, AC run/size with ZRL/EOB(RUN), the four progressive
    successive-approximation modes, byte unstuffing, DRI restarts), then
    dequantize, un-zigzag, vectorized IDCT (8x8 DCT-II basis einsum over
    all blocks), level shift + clamp, box-upsampled chroma, and for
    color frames YCbCr->RGB->BT.601 luma into the shared block-mean
    thumb. Non-supported shapes refuse precisely (see the scope note
    above)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    frame = None
    dri = 0
    scans: list = []
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (Pq=0: 8-bit entries; Pq=1: 16-bit, r11)
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0xF
                if prec == 1:
                    qt[tid] = np.frombuffer(
                        body, ">u2", 64, b + 1
                    ).astype(np.float64)
                    b += 129
                elif prec == 0:
                    qt[tid] = np.frombuffer(
                        body, np.uint8, 64, b + 1
                    ).astype(np.float64)
                    b += 65
                else:
                    raise ValueError(
                        f"unsupported JPEG (quant table precision {prec})"
                    )
        elif marker == 0xC4:  # DHT (tables may redefine between scans)
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                nv = sum(bits)
                vals = list(body[b + 17 : b + 17 + nv])
                (huff_dc if cls == 0 else huff_ac)[tid] = _jpeg_huff_decoder(
                    bits, vals
                )
                b += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):
            # SOF0 baseline / SOF1 extended sequential (r11 — the 12-bit
            # Huffman shape DICOM/medical JPEGs ship) / SOF2 progressive
            if body[0] not in (8, 12):
                raise ValueError(
                    f"unsupported JPEG (precision {body[0]})"
                )
            prec_bits = body[0]
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            comps = []
            for ci in range(body[5]):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = samp >> 4, samp & 0xF
                # generic interleaved-MCU decode covers factors 1 and 2
                # per axis — 4:4:4, 4:2:0 (the shape most real-world
                # JPEGs are), 4:2:2 and 4:4:0. Larger factors refuse.
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(
                        f"unsupported JPEG (sampling factor {hi}x{vi})"
                    )
                comps.append((cid, hi, vi, tq))
            if len(comps) == 1 and comps[0][1:3] != (1, 1):
                raise ValueError("unsupported JPEG (sampled single component)")
            frame = (w, h, comps, marker == 0xC2, prec_bits)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG (SOF{marker - 0xC0} frame)")
        elif marker == 0xDD:  # DRI: MCUs between RSTn markers
            dri = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS: capture the scan + its entropy bytes
            ns = body[0]
            sel = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)]
            Ss, Se, A = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            data_start = pos + 2 + seg_len
            data_end = _entropy_end(payload, data_start)
            scans.append(
                (sel, Ss, Se, A >> 4, A & 0xF,
                 payload[data_start:data_end], dict(huff_dc), dict(huff_ac),
                 dri)
            )
            pos = data_end
            continue
        pos += 2 + seg_len
    if frame is None or not scans:
        raise ValueError("JPEG missing SOF/SOS")
    w, h, comps, progressive, prec_bits = frame
    center = float(1 << (prec_bits - 1))
    maxval = float((1 << prec_bits) - 1)
    if not progressive:
        if len(scans) != 1:
            raise ValueError("baseline JPEG with multiple scans")
        sel, Ss, Se, Ah, Al = scans[0][0], 0, 63, 0, 0
        scans[0] = (sel, Ss, Se, Ah, Al) + scans[0][5:]
        if len(sel) != len(comps):
            raise ValueError("JPEG scan/frame component mismatch")
    # interleaved MCU geometry (spec A.2.3): an MCU spans 8*Hmax x 8*Vmax
    # pixels and carries hi x vi blocks per component in raster order
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    # zigzag-order coefficient store per component, MCU-aligned grid
    coefs = [
        np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int64)
        for (_, hi, vi, _) in comps
    ]
    for sel, Ss, Se, Ah, Al, data, dcs, acs, sdri in scans:
        _jpeg_process_scan(
            coefs, comps, sel, Ss, Se, Ah, Al, _BitReader(data), dcs, acs,
            sdri, mcux, mcuy, (w, h, hmax, vmax),
        )
    M = _dct_matrix()
    zz_r = np.array([z[0] for z in _ZIGZAG])
    zz_c = np.array([z[1] for z in _ZIGZAG])
    full = []
    for (cid, hi, vi, tq), cf in zip(comps, coefs):
        dq = cf.astype(np.float64) * qt[tq]  # (by, bx, 64) dequantized
        blocks = np.zeros(cf.shape[:2] + (8, 8))
        blocks[:, :, zz_r, zz_c] = dq  # un-zigzag
        # IDCT over every block at once: M.T @ B @ M; level shift at
        # 2^(P-1) and clamp at 2^P - 1 (P = 8 or, since r11, 12)
        px = np.einsum("ij,abjk,kl->abil", M.T, blocks, M) + center
        by, bx = cf.shape[:2]
        plane = px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        # crop to TRUE component dims, then box-upsample subsampled chroma
        cw, ch = -(-w * hi // hmax), -(-h * vi // vmax)
        plane = np.clip(np.round(plane[:ch, :cw]), 0, maxval)
        if vi < vmax:
            plane = np.repeat(plane, vmax // vi, axis=0)
        if hi < hmax:
            plane = np.repeat(plane, hmax // hi, axis=1)
        full.append(plane[:h, :w])
    planes = full
    if len(planes) == 1:
        gray = planes[0]
    elif len(planes) == 3:
        Y, Cb, Cr = planes
        R = np.clip(np.round(Y + 1.402 * (Cr - center)), 0, maxval)
        G = np.clip(
            np.round(Y - 0.344136 * (Cb - center) - 0.714136 * (Cr - center)),
            0, maxval,
        )
        B = np.clip(np.round(Y + 1.772 * (Cb - center)), 0, maxval)
        gray = 0.299 * R + 0.587 * G + 0.114 * B
    else:
        raise ValueError(f"unsupported JPEG ({len(planes)} components)")
    # the shared thumb normalizes at /255 — rescale deeper precisions
    if maxval != 255.0:
        gray = gray * (255.0 / maxval)
    return _thumb_from_gray(gray)

def _jpeg_encode_block(
    bwr: _BitWriter, block: np.ndarray, q: np.ndarray, pred: int,
    dc_codes: dict, ac_codes: dict, center: float = 128.0,
) -> int:
    """DCT → quantize → zigzag → Huffman-encode one 8×8 block; returns
    the new DC predictor."""
    M = _dct_matrix()
    coef = M @ (block - center) @ M.T
    zz_r = np.fromiter((r for r, _ in _ZIGZAG), dtype=np.int64, count=64)
    zz_c = np.fromiter((c for _, c in _ZIGZAG), dtype=np.int64, count=64)
    zz = np.round(coef[zz_r, zz_c] / q).astype(np.int64)
    diff = int(zz[0]) - pred

    def put_val(v: int, t: int) -> None:
        if t:
            bwr.put(v if v >= 0 else v + (1 << t) - 1, t)

    t = int(abs(diff)).bit_length()
    code, ln = dc_codes[t]
    bwr.put(code, ln)
    put_val(diff, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bwr.put(code, ln)
            run -= 16
        size = int(abs(v)).bit_length()
        code, ln = ac_codes[(run << 4) | size]
        bwr.put(code, ln)
        put_val(v, size)
        run = 0
    if run:
        code, ln = ac_codes[0x00]
        bwr.put(code, ln)
    return int(zz[0])


def _jpeg_quant_all(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Quantized zigzag coefficients for every 8×8 block of an MCU-aligned
    plane: (by, bx, 64) int64. Deliberately computes each block with the
    SAME per-block `M @ (B - 128) @ M.T` expression _jpeg_encode_block
    uses — a batched einsum associates the float sums differently, and a
    coefficient landing exactly on a .5 quantization boundary can then
    round one step apart between the baseline and progressive encoders."""
    M = _dct_matrix()
    by, bx = plane.shape[0] // 8, plane.shape[1] // 8
    zz_r = np.fromiter((r for r, _ in _ZIGZAG), dtype=np.int64, count=64)
    zz_c = np.fromiter((c for _, c in _ZIGZAG), dtype=np.int64, count=64)
    out = np.zeros((by, bx, 64), dtype=np.int64)
    for yb in range(by):
        for xb in range(bx):
            blk = plane[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8]
            coef = M @ (blk.astype(np.float64) - 128.0) @ M.T
            out[yb, xb] = np.round(coef[zz_r, zz_c] / q).astype(np.int64)
    return out


def _put_val(bwr: "_BitWriter", v: int, t: int) -> None:
    if t:
        bwr.put(v if v >= 0 else v + (1 << t) - 1, t)


def _pt(v: int, al: int) -> int:
    """AC point transform (spec G.1.2.1): magnitude shift, sign kept —
    truncation toward zero, NOT an arithmetic shift."""
    return (v >> al) if v >= 0 else -((-v) >> al)


def make_jpeg(
    w: int,
    h: int,
    gray: int | None = None,
    rgb: tuple | None = None,
    pixels: np.ndarray | None = None,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
    precision: int = 8,
    quant_16bit: bool = False,
) -> bytes:
    """A real, spec-conformant baseline JPEG encoder (numpy only) — the
    encoder side of _decode_jpeg. ``gray`` emits a solid single-component
    image (the closed-form oracle shape: EVEN gray levels round-trip the
    16s quant table exactly); ``rgb`` a solid color image; ``pixels``
    ((h, w) grayscale or (h, w, 3) RGB uint8) arbitrary content for
    round-trip tests. ``subsampling="420"`` (r9) emits the 2×2-sampled-Y
    interleaved-MCU stream most real-world JPEGs use: chroma is 2×2
    box-averaged before encoding (a solid color stays exactly solid, so
    the closed-form oracle shape survives subsampling).
    ``restart_interval=R`` (r9) declares DRI and emits a cycling RSTn
    marker (byte-aligned, DC predictors reset) every R MCUs — the
    error-resilience shape camera JPEGs ship. ``progressive=True`` (r9)
    emits a SOF2 stream with BOTH progressive dimensions exercised:
    successive approximation (DC/AC first scans at Al=1 + refinement
    scans at Al=0, so the correction-bit machinery genuinely executes)
    and spectral selection (per-component AC band scans) — a solid even
    gray still round-trips exactly (DC arithmetic-shift + OR-bit
    reconstruction is lossless), keeping the closed-form oracle shape.
    Constant quant table (all 16s), flat canonical Huffman tables
    declared in DHT. ``precision=12`` (r11) emits SOF1 extended
    sequential at 12-bit sample depth (pixel values 0..4095, level shift
    2048 — the DICOM/medical shape); ``quant_16bit`` declares the quant
    table with Pq=1 16-bit entries."""
    assert precision in (8, 12)
    center = float(1 << (precision - 1))
    maxval = float((1 << precision) - 1)
    if pixels is None:
        if gray is not None:
            pixels = np.full((h, w), gray, np.int64)
        else:
            pixels = np.tile(np.asarray(rgb, np.int64), (h, w, 1))
    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim == 2:
        planes = [px]
    else:
        R, G, B = px[..., 0], px[..., 1], px[..., 2]
        planes = [
            np.round(0.299 * R + 0.587 * G + 0.114 * B),
            np.round(center - 0.168736 * R - 0.331264 * G + 0.5 * B),
            np.round(center + 0.5 * R - 0.418688 * G - 0.081312 * B),
        ]
        planes = [np.clip(p, 0, maxval) for p in planes]
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if subsampling == "420" and len(planes) == 3:
        factors = [(2, 2), (1, 1), (1, 1)]
        # chroma: pad to even dims (edge) then 2×2 box mean
        for ci in (1, 2):
            p = planes[ci]
            p = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
            planes[ci] = np.round(
                (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2])
                / 4.0
            )
    else:
        factors = [(1, 1)] * len(planes)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    q = np.full(64, 16.0)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    # edge-replicate every plane to ITS MCU-aligned dims
    padded = []
    for p, (hi, vi) in zip(planes, factors):
        th, tw = mcuy * vi * 8, mcux * hi * 8
        padded.append(
            np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        )
    planes = padded
    dc_codes = _canonical_codes(_DC_SYMS, 4)
    ac_codes = _canonical_codes(_AC_SYMS, 8)
    if progressive:
        if restart_interval:
            raise ValueError("progressive encoder does not emit DRI")
        if precision != 8:
            raise ValueError("progressive encoder is 8-bit only")
        return _make_jpeg_progressive(
            w, h, planes, factors, q, dc_codes, ac_codes, hmax, vmax,
            mcux, mcuy,
        )
    bwr = _BitWriter()
    pred = [0] * len(planes)
    mcu_no = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                bwr.align()
                rst = 0xD0 + ((mcu_no // restart_interval - 1) & 7)
                bwr.raw(bytes([0xFF, rst]))
                pred = [0] * len(planes)
            mcu_no += 1
            for ci, (p, (hi, vi)) in enumerate(zip(planes, factors)):
                for byi in range(vi):
                    for bxi in range(hi):
                        y0 = (my * vi + byi) * 8
                        x0 = (mx * hi + bxi) * 8
                        pred[ci] = _jpeg_encode_block(
                            bwr,
                            p[y0 : y0 + 8, x0 : x0 + 8],
                            q, pred[ci], dc_codes, ac_codes, center,
                        )
    entropy = bwr.done()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    nf = len(planes)
    dqt = seg(
        0xDB,
        bytes([0x10]) + b"".join(int(v).to_bytes(2, "big") for v in q)
        if quant_16bit
        else bytes([0x00]) + bytes(int(v) for v in q),
    )
    sof_comps = b"".join(
        bytes([ci + 1, (factors[ci][0] << 4) | factors[ci][1], 0])
        for ci in range(nf)
    )
    # 12-bit sample depth is an EXTENDED-sequential feature → SOF1
    sof = seg(0xC0 if precision == 8 else 0xC1,
              bytes([precision]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
              + bytes([nf]) + sof_comps)
    dht_dc = seg(
        0xC4,
        bytes([0x00]) + bytes(
            [0, 0, 0, len(_DC_SYMS)] + [0] * 12
        ) + bytes(_DC_SYMS),
    )
    dht_ac = seg(
        0xC4,
        bytes([0x10]) + bytes(
            [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMS)] + [0] * 8
        ) + bytes(_AC_SYMS),
    )
    sos = seg(0xDA, bytes([nf]) + b"".join(
        bytes([ci + 1, 0x00]) for ci in range(nf)
    ) + bytes([0, 63, 0]))
    dri_seg = (
        seg(0xDD, int(restart_interval).to_bytes(2, "big"))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8" + dqt + sof + dri_seg + dht_dc + dht_ac + sos + entropy
        + b"\xff\xd9"
    )


def _make_jpeg_progressive(
    w: int, h: int, planes: list, factors: list, q: np.ndarray,
    dc_codes: dict, ac_codes: dict, hmax: int, vmax: int,
    mcux: int, mcuy: int,
) -> bytes:
    """Progressive (SOF2) scan emission — spec G.2's two dimensions both
    exercised: successive approximation (Al=1 first scans + Al=0
    refinement scans with correction-bit coding per G.1.2.3) and spectral
    selection (per-component non-interleaved AC band scans). DC scans
    interleave all components in MCU order; AC scans walk each
    component's TRUE block raster (spec A.2.2 — smaller than the
    MCU-aligned grid for subsampled frames)."""
    nf = len(planes)
    qzz = [_jpeg_quant_all(p, q) for p in planes]
    grids = [
        (-(-(-(-h * vi // vmax)) // 8), -(-(-(-w * hi // hmax)) // 8))
        for hi, vi in factors
    ]

    def dc_scan(al: int, refine: bool) -> bytes:
        bwr = _BitWriter()
        pred = [0] * nf
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (hi, vi) in enumerate(factors):
                    for byi in range(vi):
                        for bxi in range(hi):
                            v = int(qzz[ci][my * vi + byi, mx * hi + bxi, 0])
                            if refine:
                                bwr.put((v >> al) & 1, 1)
                                continue
                            d = (v >> al) - pred[ci]  # arithmetic shift
                            pred[ci] = v >> al
                            t = abs(d).bit_length()
                            code, ln = dc_codes[t]
                            bwr.put(code, ln)
                            _put_val(bwr, d, t)
        return bwr.done()

    def ac_first_scan_band(ci: int, al: int, ss: int, se: int) -> bytes:
        bwr = _BitWriter()
        bh_c, bw_c = grids[ci]
        eobrun = 0

        def flush_eob() -> None:
            nonlocal eobrun
            if not eobrun:
                return
            r = eobrun.bit_length() - 1
            code, ln = ac_codes[r << 4]
            bwr.put(code, ln)
            if r:
                bwr.put(eobrun - (1 << r), r)
            eobrun = 0

        for yb in range(bh_c):
            for xb in range(bw_c):
                band = [_pt(int(v), al) for v in qzz[ci][yb, xb, ss : se + 1]]
                if not any(band):  # whole band zero: extend the EOB run
                    eobrun += 1
                    if eobrun == 32767:
                        flush_eob()
                    continue
                flush_eob()
                r = 0
                for pv in band:
                    if pv == 0:
                        r += 1
                        continue
                    while r > 15:
                        code, ln = ac_codes[0xF0]
                        bwr.put(code, ln)
                        r -= 16
                    s = abs(pv).bit_length()
                    code, ln = ac_codes[(r << 4) | s]
                    bwr.put(code, ln)
                    _put_val(bwr, pv, s)
                    r = 0
                if r:  # block ends early: starts a (possibly long) EOB run
                    eobrun = 1
        flush_eob()
        return bwr.done()

    def ac_refine_scan_band(ci: int, al: int, ss: int, se: int) -> bytes:
        bwr = _BitWriter()
        bh_c, bw_c = grids[ci]
        eobrun = 0
        ebits: list = []  # correction bits buffered across the EOB run

        def flush_eob() -> None:
            nonlocal eobrun
            if not eobrun:
                return
            r = eobrun.bit_length() - 1
            code, ln = ac_codes[r << 4]
            bwr.put(code, ln)
            if r:
                bwr.put(eobrun - (1 << r), r)
            for b in ebits:
                bwr.put(b, 1)
            ebits.clear()
            eobrun = 0

        for yb in range(bh_c):
            for xb in range(bw_c):
                band = [int(v) for v in qzz[ci][yb, xb, ss : se + 1]]
                ts = [abs(v) >> al for v in band]
                if not any(t == 1 for t in ts):
                    # no newly-significant coefficient: the whole block
                    # joins the EOB run; its history corrections buffer
                    eobrun += 1
                    ebits.extend(t & 1 for t in ts if t > 1)
                    if eobrun == 32767:
                        flush_eob()
                    continue
                flush_eob()
                # ZRLs must be emitted when the zero run exceeds 15 at ANY
                # nonzero position up to the LAST newly-significant one —
                # flushing only the correction bits inside each ZRL's
                # 16-zero span (a history coefficient beyond the span gets
                # its bit with a LATER code; emitting it early desyncs the
                # decoder's walk). Past last_new the tail folds into the
                # EOB run instead. This is libjpeg encode_mcu_AC_refine's
                # ordering exactly.
                last_new = max(i for i, t in enumerate(ts) if t == 1)
                r, br = 0, []
                for i, (v, t) in enumerate(zip(band, ts)):
                    if t == 0:
                        r += 1
                        continue
                    if i <= last_new:
                        while r > 15:
                            code, ln = ac_codes[0xF0]
                            bwr.put(code, ln)
                            for b in br:
                                bwr.put(b, 1)
                            br.clear()
                            r -= 16
                    if t > 1:  # history coefficient: buffered correction bit
                        br.append(t & 1)
                        continue
                    code, ln = ac_codes[(r << 4) | 1]
                    bwr.put(code, ln)
                    bwr.put(1 if v > 0 else 0, 1)  # sign of the new coef
                    for b in br:
                        bwr.put(b, 1)
                    br.clear()
                    r = 0
                if r or br:  # the block's tail starts the next EOB run
                    eobrun = 1
                    ebits.extend(br)
        flush_eob()
        return bwr.done()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def sos(sel: list, Ss: int, Se: int, Ah: int, Al: int) -> bytes:
        body = bytes([len(sel)]) + b"".join(
            bytes([cid, tabs]) for cid, tabs in sel
        ) + bytes([Ss, Se, (Ah << 4) | Al])
        return seg(0xDA, body)

    dqt = seg(0xDB, bytes([0x00]) + bytes(int(v) for v in q))
    sof = seg(
        0xC2,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([nf])
        + b"".join(
            bytes([ci + 1, (factors[ci][0] << 4) | factors[ci][1], 0])
            for ci in range(nf)
        ),
    )
    dht_dc = seg(
        0xC4,
        bytes([0x00]) + bytes([0, 0, 0, len(_DC_SYMS)] + [0] * 12)
        + bytes(_DC_SYMS),
    )
    dht_ac = seg(
        0xC4,
        bytes([0x10]) + bytes([0, 0, 0, 0, 0, 0, 0, len(_AC_SYMS)] + [0] * 8)
        + bytes(_AC_SYMS),
    )
    all_sel = [(ci + 1, 0x00) for ci in range(nf)]
    out = b"\xff\xd8" + dqt + sof + dht_dc + dht_ac
    out += sos(all_sel, 0, 0, 0, 1) + dc_scan(1, refine=False)
    out += sos(all_sel, 0, 0, 1, 0) + dc_scan(0, refine=True)
    for ci in range(nf):
        # spectral selection: two AC bands per component, each at Al=1
        for (ss, se) in ((1, 5), (6, 63)):
            out += sos([(ci + 1, 0x00)], ss, se, 0, 1) + ac_first_scan_band(
                ci, 1, ss, se
            )
    for ci in range(nf):
        for (ss, se) in ((1, 5), (6, 63)):
            out += sos([(ci + 1, 0x00)], ss, se, 1, 0) + ac_refine_scan_band(
                ci, 0, ss, se
            )
    return out + b"\xff\xd9"


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
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        try:
            return _decode_png(payload)
        except ValueError:
            # out-of-scope PNG (interlaced/16-bit/palette): Pillow if
            # present, else surface the precise refusal
            if _try_import("PIL") is None:
                raise
    if payload[:2] == b"\xff\xd8":
        try:
            return _decode_jpeg(payload)
        except ValueError:
            # out-of-scope JPEG (lossless/hierarchical SOFs, arithmetic
            # coding, >2 sampling factors): Pillow if present, else
            # surface the precise refusal
            if _try_import("PIL") is None:
                raise
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        try:
            return _decode_gif(payload)
        except ValueError:
            # out-of-scope GIF (interlaced/local color table): Pillow if
            # present, else surface the precise refusal
            if _try_import("PIL") is None:
                raise
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
    if payload[:4] == b"fLaC":
        try:
            return _decode_flac(payload)
        except ValueError:
            # out-of-scope FLAC (12/20/32-bit depths): soundfile if
            # present, else surface the precise refusal
            if _try_import("soundfile") is None:
                raise
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


def fan_out_ids(df: DataFrame, rows_per_task: int = 640) -> DataFrame:
    """Round-robin an ids-only fixture frame across the session's cores,
    sized to the WORK, not just the core count.

    The codec suites GENERATE their media payloads per id inside the next
    mapInPandas, so all the heavy work hangs off this frame. When the ids
    come from a single-row-group parquet file (the bench fixtures), the
    scan is ONE input split and the whole generate+decode chain would run
    as one task on one core. The explicit repartition moves only the id
    column — a few bytes per row at any scale, negligible next to the
    per-row encode/decode that follows.

    Width (r12 — the r11 verdict's work-aware fix): the r11 version
    unconditionally repartitioned to defaultParallelism, which the driver
    bench showed INVERTING on cheap codecs (mm_png_real_decode 0.53x with
    its 8-core run beating its 32-core run): task launches + 2
    Python-worker handshakes per task compete with the per-row work at
    bench scale. Width therefore derives from the estimated row count —
    ``clamp(est_rows / rows_per_task, 1, defaultParallelism)`` — so small
    frames fan just wide enough and EVERY codec reaches full parallelism
    once the corpus is large enough (at 100 TB est_rows dwarfs the hint).

    The default rows_per_task=640 is the r12 interleaved width-A/B result
    (scripts/ab_fanout_width.py, min-of-5 per variant, idle host): width 8
    beat BOTH width 1 (png 1.02->0.47 s, jpeg 2.01->0.58 s, avi
    2.26->0.62 s) and width 32 (0.65/0.71/0.73 s) on every codec row at
    sf0.1's 5000 ids — per-row codec cost differences do not separate at
    this scale; what the extra 24 tasks cost is scheduling + worker
    round-trips. 5000 rows / 640 -> width 9; a 10x corpus already fans to
    the full core count. Row values are per-id closed forms, so results
    are independent of the partitioning."""
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    try:
        raw = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        # py4j maps java.math.BigInteger to a Python int directly
        est_bytes = int(raw.longValue()) if hasattr(raw, "longValue") else int(raw)
    except Exception:
        est_bytes = None
    if est_bytes is None or est_bytes >= 1 << 60:
        width = par  # unknown size: assume big (scale posture)
    else:
        # ids-only frame: Catalyst estimates ~20 B/row for a single long
        # column scan+project (8 B data + row overhead)
        est_rows = est_bytes // 20 + 1
        width = int(max(1, min(par, est_rows // max(1, rows_per_task) + 1)))
    if width <= 1:
        return df
    return df.repartition(width)


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


def _riff_walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload, is_list) over a RIFF chunk run; chunk
    payloads pad to even length per the RIFF rule."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("RIFF: truncated chunk")
        yield fourcc, body, fourcc == b"LIST"
        pos += 8 + size + (size & 1)


def _demux_avi(payload: bytes) -> tuple:
    """Generic RIFF 'AVI ' walk shared by the MJPG and DIB paths: hdrl
    (avih main header, strl/strh/strf stream headers) and the movi LIST.
    Returns (frames, compression, w, h, bitcount). Refusals: non-AVI
    RIFF, a non-'vids' first stream, a frame-count mismatch vs avih."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI file")
    total_frames = None
    compression = None
    fcc_type = None
    w = h = bitcount = 0
    frames: list[bytes] = []
    for fourcc, body, is_list in _riff_walk(payload, 12, 8 + int.from_bytes(payload[4:8], "little")):
        if not is_list:
            continue
        kind = body[:4]
        if kind == b"hdrl":
            for f2, b2, l2 in _riff_walk(body, 4, len(body)):
                if f2 == b"avih":
                    total_frames = int.from_bytes(b2[16:20], "little")
                elif l2 and b2[:4] == b"strl" and fcc_type is None:
                    for f3, b3, _ in _riff_walk(b2, 4, len(b2)):
                        if f3 == b"strh":
                            fcc_type = b3[:4]
                        elif f3 == b"strf":
                            # BITMAPINFOHEADER: biWidth/biHeight/biBitCount
                            w = int.from_bytes(b3[4:8], "little", signed=True)
                            h = int.from_bytes(b3[8:12], "little", signed=True)
                            bitcount = int.from_bytes(b3[14:16], "little")
                            compression = b3[16:20]
        elif kind == b"movi":
            for f2, b2, _ in _riff_walk(body, 4, len(body)):
                if f2[2:4] in (b"dc", b"db") and f2[:2].isdigit():
                    frames.append(b2)
    if fcc_type != b"vids":
        raise ValueError(f"AVI: first stream is not video ({fcc_type!r})")
    if total_frames is None or total_frames != len(frames):
        raise ValueError(
            f"AVI: header declares {total_frames} frames, movi has {len(frames)}"
        )
    return frames, compression, w, h, bitcount


def demux_avi_mjpeg(payload: bytes) -> list[bytes]:
    """REAL AVI demux for MJPEG video: the generic RIFF walk above, then
    the MJPG contract — each '##dc'/'##db' chunk must be a baseline JPEG
    stream for the existing from-scratch decoder. Refusals are precise:
    a compression other than MJPG, or a chunk that is not a JPEG
    stream."""
    frames, compression, _w, _h, _bc = _demux_avi(payload)
    if compression != b"MJPG":
        raise ValueError(f"AVI: unsupported codec {compression!r} (MJPG only)")
    for fr in frames:
        if fr[:2] != b"\xff\xd8":
            raise ValueError("AVI: MJPG chunk is not a JPEG stream")
    return frames


def demux_avi_dib(payload: bytes) -> tuple:
    """REAL AVI demux for UNCOMPRESSED video (r11 — the first non-MJPEG
    codec): biCompression == BI_RGB (0) at biBitCount 24, each movi
    chunk a raw bottom-up BGR DIB with 4-byte-aligned rows (the same
    pixel layout _decode_bmp parses, headerless). Returns
    (frames, w, h); other bit depths refuse precisely."""
    frames, compression, w, h, bitcount = _demux_avi(payload)
    if compression != b"\x00\x00\x00\x00":
        raise ValueError(
            f"AVI: compression {compression!r} is not BI_RGB (uncompressed)"
        )
    if bitcount != 24:
        raise ValueError(f"AVI: unsupported DIB bit count {bitcount} (24 only)")
    rowsize = ((24 * w + 31) // 32) * 4
    for fr in frames:
        if len(fr) != rowsize * abs(h):
            raise ValueError("AVI: DIB chunk size mismatch")
    return frames, w, h


def _dib_frame_gray(frame: bytes, w: int, h: int) -> np.ndarray:
    """Headerless 24-bit DIB frame → float gray plane: bottom-up BGR rows
    padded to 4 bytes (negative height = top-down, like BMP)."""
    rowsize = ((24 * w + 31) // 32) * 4
    rows = np.frombuffer(frame, np.uint8).reshape(abs(h), rowsize)
    px = rows[:, : w * 3].reshape(abs(h), w, 3).astype(np.float64)
    if h > 0:
        px = px[::-1]
    # BGR order
    return 0.299 * px[..., 2] + 0.587 * px[..., 1] + 0.114 * px[..., 0]


def make_avi_mjpeg(frames: list, w: int, h: int, fps: int = 10) -> bytes:
    """A real, spec-conformant MJPEG AVI around already-encoded JPEG
    frames — RIFF('AVI ') { LIST(hdrl){ avih, LIST(strl){ strh('vids'/
    'MJPG'), strf(BITMAPINFOHEADER, biCompression='MJPG') } },
    LIST(movi){ 00dc... }, idx1 } — the encoder side of
    demux_avi_mjpeg, used by tests and the mm_avi_frame_sample oracle
    query (solid-gray frames keep the decoded luma an exact closed form
    while the parser exercises the full container walk)."""

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + len(body).to_bytes(4, "little") + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    n = len(frames)
    maxsz = max((len(f) for f in frames), default=0)
    avih = b"".join(
        v.to_bytes(4, "little")
        for v in (
            1_000_000 // fps, 0, 0, 0x10, n, 0, 1, maxsz, w, h, 0, 0, 0, 0,
        )
    )
    strh = (
        b"vidsMJPG"
        + b"".join(
            v.to_bytes(4, "little")
            for v in (0, 0, 0, 1, fps, 0, n, maxsz, 0, 0)
        )
        + b"\x00" * 8  # rcFrame
    )
    strf = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + b"MJPG"
        + (w * h * 3).to_bytes(4, "little")
        + b"\x00" * 16
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_body)
    # idx1: one KEYFRAME entry per chunk, offsets relative to 'movi'
    idx_entries, off = [], 4
    for f in frames:
        idx_entries.append(
            b"00dc" + (0x10).to_bytes(4, "little")
            + off.to_bytes(4, "little") + len(f).to_bytes(4, "little")
        )
        off += 8 + len(f) + (len(f) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def make_avi_dib(
    frames_rgb: list, w: int, h: int, fps: int = 10
) -> bytes:
    """A real uncompressed-video AVI (r11 — the encoder side of
    demux_avi_dib): same RIFF skeleton as make_avi_mjpeg but
    biCompression = BI_RGB (0), '00db' chunks of raw bottom-up BGR DIB
    rows padded to 4 bytes. ``frames_rgb``: list of (h, w, 3) RGB uint8
    arrays."""
    rowsize = ((24 * w + 31) // 32) * 4
    dib_frames = []
    for fr in frames_rgb:
        px = np.asarray(fr, np.uint8).reshape(h, w, 3)
        bgr = px[::-1, :, ::-1]  # bottom-up, BGR
        rows = np.zeros((h, rowsize), np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        dib_frames.append(rows.tobytes())

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + len(body).to_bytes(4, "little") + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    n = len(dib_frames)
    maxsz = rowsize * h
    avih = b"".join(
        v.to_bytes(4, "little")
        for v in (
            1_000_000 // fps, 0, 0, 0x10, n, 0, 1, maxsz, w, h, 0, 0, 0, 0,
        )
    )
    strh = (
        b"vidsDIB "
        + b"".join(
            v.to_bytes(4, "little")
            for v in (0, 0, 0, 1, fps, 0, n, maxsz, 0, 0)
        )
        + b"\x00" * 8
    )
    strf = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + b"\x00\x00\x00\x00"  # BI_RGB
        + (rowsize * h).to_bytes(4, "little")
        + b"\x00" * 16
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", f) for f in dib_frames))
    idx_entries, off = [], 4
    for f in dib_frames:
        idx_entries.append(
            b"00db" + (0x10).to_bytes(4, "little")
            + off.to_bytes(4, "little") + len(f).to_bytes(4, "little")
        )
        off += 8 + len(f) + (len(f) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def video_frames(
    df: DataFrame, payload_col: str, pk_col: str, every_n: int = 2,
    fake: bool = False,
) -> DataFrame:
    """REAL video frame sampling: demux each row's AVI container, decode
    every ``every_n``-th frame — MJPEG through the from-scratch JPEG
    decoder, or (r11) uncompressed BI_RGB DIB frames through the BMP
    pixel path — and emit one row per sampled frame, the row-EXPANDING
    mapInPandas shape (pk, frame_idx, frame_vec). Scale shape: one
    map-side Arrow-batched pass, zero shuffles, media bytes never leave
    their partition; only sampled frames pay the decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pk, b in zip(pdf[pk_col], pdf[payload_col]):
                payload = bytes(b)
                _frames, comp, fw, fh, _bc = _demux_avi(payload)
                if comp == b"\x00\x00\x00\x00":
                    frames, fw, fh = demux_avi_dib(payload)
                    decoded = {
                        i: _thumb_from_gray(_dib_frame_gray(frames[i], fw, fh))
                        for i in range(0, len(frames), every_n)
                    }
                else:
                    frames = demux_avi_mjpeg(payload)
                    decoded = {
                        i: decode_image(frames[i], fake=fake)
                        for i in range(0, len(frames), every_n)
                    }
                for i in sorted(decoded):
                    rows.append((int(pk), i, decoded[i]))
            if rows:
                yield pd.DataFrame(rows, columns=[pk_col, "frame_idx", "frame_vec"])

    return df.select(pk_col, payload_col).mapInPandas(
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


def make_png(
    w: int,
    h: int,
    rgb: tuple | None = None,
    pixels: np.ndarray | None = None,
    color_type: int = 2,
    filter_type: int = 0,
    bit_depth: int = 8,
    interlace: int = 0,
    palette: Sequence | None = None,
) -> bytes:
    """A real, spec-conformant PNG encoder (stdlib zlib) — the encoder
    side of _decode_png. ``rgb`` emits a solid color (the closed-form
    oracle shape, like make_bmp); ``pixels`` ((h, w, channels) uint8)
    lets tests round-trip arbitrary images through each scanline filter
    type (the encoder applies ``filter_type`` to every row, so filters
    1-4 are exercised against known pixel data). ``color_type=3`` with
    ``palette`` ([(r,g,b), ...]) emits a PALETTE image: ``pixels`` then
    holds (h, w) uint8 indices (``rgb`` emits a 1-entry palette, index
    0 everywhere — the closed-form shape). ``bit_depth=16`` emits real
    16-bit samples for gray/truecolor (``pixels``/``rgb`` values then
    span 0..65535); ``interlace=1`` emits REAL Adam7 passes (r9b) —
    both decode-path counterparts now, no longer refusal-only headers."""
    import zlib

    channels = {0: 1, 2: 3, 3: 1, 6: 4}[color_type]
    if color_type == 3 and palette is None:
        palette = [tuple(rgb)] if rgb is not None else [(0, 0, 0)]
    if pixels is None:
        base = {
            0: (rgb[0],) if rgb else (0,),
            2: tuple(rgb or (0, 0, 0)),
            3: (0,),  # index 0 -> the palette's first (solid) entry
            6: tuple(rgb or (0, 0, 0)) + (255,),
        }[color_type]
        pixels = np.tile(np.asarray(base, np.int64), (h, w, 1))
    grid = np.asarray(pixels, dtype=np.int64).reshape(h, w, channels)
    bpp = max(1, channels * (2 if bit_depth == 16 else 1))

    def _serialize(sub: np.ndarray) -> np.ndarray:
        """(ph, pw, channels) samples -> (ph, bytes-per-line) filter input."""
        ph, pw = sub.shape[:2]
        if color_type == 3 and bit_depth in (1, 2, 4):
            # pack indices MSB-first, 8/depth per byte (sub-8-bit palette)
            per = 8 // bit_depth
            idx = sub.reshape(ph, pw)
            padw = -(-pw // per) * per
            idx = np.pad(idx, ((0, 0), (0, padw - pw)))
            shifts = np.arange(per - 1, -1, -1, dtype=np.int64) * bit_depth
            return (idx.reshape(ph, -1, per) << shifts).sum(axis=2)
        if bit_depth == 16 and color_type != 3:
            v = sub.reshape(ph, pw * channels)
            out = np.zeros((ph, pw * channels * 2), dtype=np.int64)
            out[:, 0::2] = v >> 8
            out[:, 1::2] = v & 0xFF
            return out
        return sub.reshape(ph, pw * channels)

    lines = b""
    passes = (
        _png_passes(w, h, 1) if interlace == 1 else [(0, 0, 1, 1, w, h)]
    )
    for x0, y0, dx, dy, _pw, _ph in passes:
        px = _serialize(grid[y0::dy, x0::dx, :])
        stride = px.shape[1]
        prev = np.zeros(stride, dtype=np.int64)
        for y in range(px.shape[0]):
            cur = px[y]
            if filter_type == 0:
                enc = cur
            elif filter_type == 2:
                enc = (cur - prev) & 0xFF
            else:  # 1/3/4: left-dependent — encode w/ the inverse recon fn
                enc = np.zeros(stride, dtype=np.int64)
                for x in range(stride):
                    a = int(cur[x - bpp]) if x >= bpp else 0
                    b = int(prev[x])
                    if filter_type == 1:
                        rec = a
                    elif filter_type == 3:
                        rec = (a + b) >> 1
                    else:
                        c = int(prev[x - bpp]) if x >= bpp else 0
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        rec = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    enc[x] = (int(cur[x]) - rec) & 0xFF
            lines += bytes([filter_type]) + enc.astype(np.uint8).tobytes()
            prev = cur

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            len(body).to_bytes(4, "big")
            + ctype
            + body
            + (zlib.crc32(ctype + body) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([bit_depth, color_type, 0, 0, interlace])
    )
    plte = (
        chunk(b"PLTE", b"".join(bytes(map(int, p)) for p in palette))
        if color_type == 3
        else b""
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + plte
        + chunk(b"IDAT", zlib.compress(lines))
        + chunk(b"IEND", b"")
    )


def make_wav(
    n_samples: int,
    value: int,
    n_ch: int = 1,
    sr: int = 8000,
    audio_format: int = 1,
) -> bytes:
    """A real RIFF/WAVE file of one constant sample — the encoder side of
    _decode_wav (constant amplitude makes every energy bin a closed form
    for the SQL oracle, while the parser still walks the chunk list and
    scales samples). ``audio_format`` 1 emits PCM-16 with ``value`` as
    the signed sample; 6 (A-law) / 7 (μ-law) emit ``value`` as the raw
    8-bit G.711 codeword per sample (r8), whose expanded 16-bit level is
    itself a closed form of the codeword."""
    if audio_format in (6, 7):
        width = 1
        data = bytes([value & 0xFF]) * (n_samples * n_ch)
    else:
        width = 2
        data = value.to_bytes(2, "little", signed=True) * (n_samples * n_ch)
    fmt = (
        audio_format.to_bytes(2, "little")
        + n_ch.to_bytes(2, "little")
        + sr.to_bytes(4, "little")
        + (sr * n_ch * width).to_bytes(4, "little")
        + (n_ch * width).to_bytes(2, "little")
        + (8 * width).to_bytes(2, "little")
    )
    chunks = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(chunks).to_bytes(4, "little") + chunks


def make_wav_adpcm(
    st: np.ndarray, sr: int = 8000, block_samples: int = 65
) -> tuple:
    """A real IMA ADPCM WAV (format 0x11) encoder — the encoder side of
    _ima_decode. ``st`` is (n, channels) int16; returns (payload,
    reconstruction): ADPCM is lossy, so tests compare the decode against
    the encoder's OWN tracked reconstruction (bit-exact by construction —
    both sides run the same _ima_step quantizer). ``block_samples`` must
    be 8k+1 so each block's nibbles fill whole 4-byte groups; input pads
    to full blocks by repeating the last sample (a constant signal
    therefore stays a closed form: index starts at 0 where step>>3 == 0,
    so zero-delta nibbles reconstruct the constant exactly)."""
    if (block_samples - 1) % 8:
        raise ValueError("block_samples must be 8k+1")
    st = np.asarray(st, dtype=np.int64)
    if st.ndim == 1:
        st = st[:, None]
    n, n_ch = st.shape
    if n == 0:
        raise ValueError("ADPCM needs at least one sample")
    pad = (-n) % block_samples
    if pad:
        st = np.concatenate([st, np.repeat(st[-1:], pad, axis=0)])
    n_total = st.shape[0]
    idx = [0] * n_ch
    recon = np.zeros_like(st)
    data = b""
    for b0 in range(0, n_total, block_samples):
        blk = b""
        nibbles: list[list[int]] = []
        for c in range(n_ch):
            pred = int(st[b0, c])
            blk += pred.to_bytes(2, "little", signed=True) + bytes([idx[c], 0])
            recon[b0, c] = pred
            nibs = []
            for k in range(1, block_samples):
                sample = int(st[b0 + k, c])
                step = _IMA_STEP_TABLE[idx[c]]
                diff = sample - pred
                nib = 8 if diff < 0 else 0
                diff = abs(diff)
                if diff >= step:
                    nib |= 4
                    diff -= step
                if diff >= step >> 1:
                    nib |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    nib |= 1
                pred, idx[c] = _ima_step(pred, idx[c], nib)
                recon[b0 + k, c] = pred
                nibs.append(nib)
            nibbles.append(nibs)
        # channel-interleaved 4-byte groups, low nibble first
        for g in range((block_samples - 1) // 8):
            for c in range(n_ch):
                grp = nibbles[c][g * 8 : g * 8 + 8]
                blk += bytes(
                    grp[j] | (grp[j + 1] << 4) for j in (0, 2, 4, 6)
                )
        data += blk
    block_align = 4 * n_ch + (block_samples - 1) // 2 * n_ch
    fmt = (
        (0x11).to_bytes(2, "little")
        + n_ch.to_bytes(2, "little")
        + sr.to_bytes(4, "little")
        + (sr * block_align // block_samples).to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + (4).to_bytes(2, "little")
        + (2).to_bytes(2, "little")  # cbSize
        + block_samples.to_bytes(2, "little")  # samplesPerBlock
    )
    chunks = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(chunks).to_bytes(4, "little") + chunks, recon


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
