"""Minimal pure-stdlib PNG codec — the real decode path for X8
(SURVEY.md §2.10; VERDICT r4 item 7).

The container has no PIL/opencv, but PNG needs only zlib (stdlib) +
the filter spec (W3C PNG, public): chunks are length/tag/data/crc32,
IHDR carries geometry, IDAT is zlib-deflated scanlines each prefixed
with a per-row filter byte (None/Sub/Up/Average/Paeth). This module
implements the 8-bit-depth non-interlaced subset for greyscale,
grey+alpha, RGB and RGBA — enough that ``decode_image`` stops being
a stub for the one format the pipeline's synthetic corpus uses, and
the Arrow-batched featurizer downstream operates on REAL pixels.

Scope limits raise loudly: bit depths ≠ 8, palette (PLTE) images,
and interlacing are NotImplementedError — this is a correctness
reference, not a performance codec. Per-asset decode parallelizes
across executors via mapInPandas exactly like a C codec would; the
per-byte Python unfilter loop (filters 1/3/4 have a sequential
left-neighbor dependency) is the stand-in cost, bounded by image
size, not corpus size.

The encoder exists to build deterministic test/query fixtures and
deliberately cycles the filter type per row (y % 5), so every decode
path is exercised by any round-trip of height ≥ 5.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type -> samples/px
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> color_type


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data))
    )


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (encoder side: raw neighbors)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where(
        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
    )


def encode_png(arr: np.ndarray, vary_filters: bool = True) -> bytes:
    """Encode an (H, W) or (H, W, C) uint8 array (C in 1/2/3/4) as a
    PNG. ``vary_filters`` cycles the row filter type y % 5 so decoders
    must handle all five; False writes filter-0 rows only."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if ch not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    stride = w * ch
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        cur = arr[y].reshape(stride).astype(np.int16)
        left = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
        up = prev
        ul = np.concatenate([np.zeros(ch, np.int16), prev[:-ch]])
        ft = (y % 5) if vary_filters else 0
        if ft == 0:
            out = cur
        elif ft == 1:
            out = cur - left
        elif ft == 2:
            out = cur - up
        elif ft == 3:
            out = cur - (left + up) // 2
        else:
            out = cur - _paeth_vec(left, up, ul)
        raw.append(ft)
        raw += (out % 256).astype(np.uint8).tobytes()
        prev = cur
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG to an (H, W, C) uint8 array. Supports bit depth 8,
    color types 0/2/4/6, no interlace; anything else raises
    NotImplementedError (palette) or ValueError (corrupt)."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        crc_bytes = data[pos + 8 + length : pos + 12 + length]
        if len(body) != length or len(crc_bytes) != 4:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", crc_bytes)
        if crc != zlib.crc32(tag + body):
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8:
                raise NotImplementedError(f"bit depth {depth} (only 8)")
            if color_type == 3:
                raise NotImplementedError("palette (PLTE) images")
            if color_type not in _CHANNELS:
                raise ValueError(f"bad color type {color_type}")
            if interlace:
                raise NotImplementedError("interlaced PNG")
            if comp or filt:
                raise ValueError("bad compression/filter method")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("decompressed size mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(height):
        off = y * (stride + 1)
        ft = raw[off]
        line = np.frombuffer(raw[off + 1 : off + 1 + stride], np.uint8).astype(
            np.int16
        )
        if ft == 0:
            rec = line % 256
        elif ft == 2:
            rec = (line + prev) % 256
        elif ft in (1, 3, 4):
            # Sequential: reconstructed LEFT neighbor feeds the next
            # byte (the spec's data dependency — a C codec has the
            # same loop, just compiled).
            rec = np.zeros(stride, dtype=np.int16)
            for i in range(stride):
                a = rec[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if ft == 1:
                    v = line[i] + a
                elif ft == 3:
                    v = line[i] + (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    v = line[i] + pred
                rec[i] = v % 256
        else:
            raise ValueError(f"bad filter type {ft} in row {y}")
        out[y] = rec.astype(np.uint8)
        prev = rec.astype(np.int16)
    return out.reshape(height, width, ch)
