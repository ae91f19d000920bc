"""Minimal pure-stdlib baseline JPEG codec — the JPEG sibling of the
PNG/WAV reference codecs (SURVEY.md §2.10 X8; VERDICT r5 item 7).

The container has no PIL/libjpeg, but baseline JFIF needs only the
public ITU T.81 spec: marker segments (SOI/APP0/DQT/SOF0/DHT/SOS/EOI),
canonical Huffman coding of DC differences and run-length-coded AC
coefficients in zigzag order, dequantization, and the 8x8 inverse DCT.
This module implements the baseline-sequential subset in both
directions: GRAYSCALE (one component, 8-bit) and COLOR — a
three-component interleaved YCbCr scan, 4:2:0 (luma 2x2) or 4:4:4
sampling, JFIF/T.871 color transform, per-component quant/Huffman
table selectors — with the standard Annex-K luminance AND chrominance
tables so the emitted files are plain JFIF any external decoder reads.

Scope limits raise loudly: progressive (SOF2), arithmetic coding,
other component counts / sampling layouts, non-interleaved
multi-scan streams, 16-bit quant tables and restart markers are
NotImplementedError — a correctness reference, not a performance
codec, exactly like :mod:`.png`.

Exactness property the query oracle leans on: for an image made of
CONSTANT 8x8 blocks, the forward DCT has a single nonzero coefficient
F(0,0) = 8*(v-128); with the default table's DC quantizer q00 = 8 the
round-trip quantize → dequantize → IDCT → +128 reproduces v EXACTLY
(integer arithmetic throughout: round(8s/8) = s, IDCT of a lone DC
term is D/8), so decoded pixels equal source pixels and a DuckDB
oracle can state decoded statistics analytically — while the decode
still runs the full marker/Huffman/dequant/IDCT machinery. Arbitrary
images round-trip within a small quantization tolerance (the lossy
path), pinned by a property test.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_SOI = b"\xff\xd8"

# Annex K.1 luminance quantization table (public spec), EXCEPT the DC
# entry which is 8 (not 16) — see the module docstring's exactness
# property. AC entries only matter for non-constant blocks.
DEFAULT_QUANT = np.array(
    [
        [8, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

# Annex K.1 chrominance quantization table (public spec), EXCEPT the
# DC entry which is 8 (not 17) — the same exactness trick as the luma
# table: with q00 = 8 a constant chroma block round-trips bit-exactly.
DEFAULT_QUANT_CHROMA = np.array(
    [
        [8, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# Annex K.3 standard luminance Huffman tables (public spec).
_DC_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]  # [1..16]
_DC_VALS = list(range(12))
_AC_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


# Annex K.3 standard chrominance Huffman tables (public spec,
# Tables K.4 and K.6).
_DC_BITS_CHROMA = [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_VALS_CHROMA = list(range(12))
_AC_BITS_CHROMA = [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_VALS_CHROMA = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _zigzag_order() -> list[tuple[int, int]]:
    """The 64 (row, col) pairs in JPEG zigzag order, generated from
    the diagonal walk (no hand-typed table to get wrong)."""
    out = []
    for s in range(15):
        diag = [(r, s - r) for r in range(max(0, s - 7), min(7, s) + 1)]
        # even diagonals run bottom-left -> top-right (row decreasing)
        out.extend(diag[::-1] if s % 2 == 0 else diag)
    return out


_ZIGZAG = _zigzag_order()

# Orthonormal 8-point DCT-II basis: C[u, x]. With this scaling the
# 2-D transform F = C f C^T matches the T.81 convention exactly
# (constant block s -> F(0,0) = 8 s), and the inverse is C^T F C.
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) with canonical code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the decoder-side view."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            self.write(0x7F, 8 - self._n)  # pad with 1-bits per spec


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker inside entropy data")
                self.pos += 1  # skip the stuffed 0x00
            self._acc = byte
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    ssss = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << ssss) - 1
    return ssss, bits


def _extend(bits: int, ssss: int) -> int:
    """Inverse of _magnitude: sign-extend ssss received bits."""
    if ssss == 0:
        return 0
    return bits if bits >= (1 << (ssss - 1)) else bits - (1 << ssss) + 1


_ZZ_R = np.array([r for r, _ in _ZIGZAG])
_ZZ_C = np.array([c for _, c in _ZIGZAG])


def _write_block(
    writer: _BitWriter,
    block: np.ndarray,
    q: np.ndarray,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    prev_dc: int,
) -> int:
    """FDCT + quantize + Huffman-write one level-shifted 8x8 block;
    returns the new DC predictor for the component."""
    coef = _C @ block @ _C.T
    # round-half-away like libjpeg's integer quantizer (np.round
    # is half-to-even, which would diverge from the analytic
    # oracle's arithmetic on exact .5 quotients)
    quo = coef / q
    qc = (np.sign(quo) * np.floor(np.abs(quo) + 0.5)).astype(np.int64)
    zz = qc[_ZZ_R, _ZZ_C]
    ssss, bits = _magnitude(int(zz[0]) - prev_dc)
    code, length = dc_codes[ssss]
    writer.write(code, length)
    if ssss:
        writer.write(bits, ssss)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        ssss, bits = _magnitude(int(zz[k]))
        code, length = ac_codes[(run << 4) | ssss]
        writer.write(code, length)
        writer.write(bits, ssss)
        run = 0
    if last < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _check_quant(q: np.ndarray | None, default: np.ndarray) -> np.ndarray:
    q = default if q is None else np.asarray(q, dtype=np.int64)
    if q.shape != (8, 8) or (q < 1).any() or (q > 255).any():
        raise ValueError("quant table must be 8x8 with entries in [1, 255]")
    return q


def _zz_bytes(q: np.ndarray) -> bytes:
    return bytes(int(q[r, c]) for r, c in _ZIGZAG)


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF (ITU T.871) full-range color transform on a (..., 3)
    float/uint8 array, rounded half-up to integer samples — the exact
    arithmetic the analytic query oracles replay in SQL (floor(x+0.5)
    on non-negative values; identical double literals + evaluation
    order on both sides makes the doubles bit-equal)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack(
        [np.clip(np.floor(p + 0.5), 0, 255) for p in (y, cb, cr)], axis=-1
    )


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """Inverse JFIF transform, rounded half-up and clamped to uint8 —
    the decoder side of the oracle-replayable arithmetic."""
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64)
    cr = ycc[..., 2].astype(np.float64)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack(
        [
            np.clip(np.floor(p + 0.5), 0, 255).astype(np.uint8)
            for p in (r, g, b)
        ],
        axis=-1,
    )


def encode_jpeg(
    arr: np.ndarray,
    quant: np.ndarray | None = None,
    chroma_quant: np.ndarray | None = None,
    subsampling: str = "4:2:0",
) -> bytes:
    """Encode a uint8 array as baseline JFIF: (H, W) grayscale as a
    single-component scan, (H, W, 3) RGB as a three-component YCbCr
    interleaved scan (``subsampling`` '4:2:0' — luma sampling 2x2 —
    or '4:4:4'; Annex-K chroma tables, table ids 0/1 — plain JFIF any
    external decoder reads).

    Images whose dimensions are not multiples of the MCU size (8 for
    grayscale/4:4:4, 16 for 4:2:0 color) are edge-padded to the MCU
    grid (decoders crop back to the SOF dimensions per spec)."""
    if arr.dtype != np.uint8:
        raise ValueError(f"expected uint8 pixels, got {arr.dtype}")
    if arr.ndim == 3:
        if arr.shape[2] != 3:
            raise NotImplementedError(
                "color encoding expects (H, W, 3) RGB"
            )
        if subsampling not in ("4:2:0", "4:4:4"):
            raise NotImplementedError(
                f"subsampling {subsampling!r}: only 4:2:0 and 4:4:4"
            )
        return _encode_jpeg_color(arr, quant, chroma_quant, subsampling)
    if arr.ndim != 2:
        raise NotImplementedError(
            "only grayscale (H, W) and RGB (H, W, 3) encoding is implemented"
        )
    q = _check_quant(quant, DEFAULT_QUANT)
    h, w = arr.shape
    if h == 0 or w == 0:
        raise ValueError("cannot encode an empty image")
    ph, pw = -h % 8, -w % 8
    padded = np.pad(arr, ((0, ph), (0, pw)), mode="edge").astype(np.float64)

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    writer = _BitWriter()
    prev_dc = 0
    for by in range(0, padded.shape[0], 8):
        for bx in range(0, padded.shape[1], 8):
            prev_dc = _write_block(
                writer,
                padded[by : by + 8, bx : bx + 8] - 128.0,
                q,
                dc_codes,
                ac_codes,
                prev_dc,
            )
    writer.flush()

    out = bytearray()
    out += JPEG_SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + _zz_bytes(q))  # DQT: 8-bit table id 0
    out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += _seg(0xC4, b"\x00" + bytes(_DC_BITS[1:]) + bytes(_DC_VALS))
    out += _seg(0xC4, b"\x10" + bytes(_AC_BITS[1:]) + bytes(_AC_VALS))
    out += _seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_jpeg_color(
    arr: np.ndarray,
    quant: np.ndarray | None,
    chroma_quant: np.ndarray | None,
    subsampling: str,
) -> bytes:
    """Three-component interleaved baseline scan. At 4:2:0 each 16x16
    MCU carries four Y blocks (2x2, row-major), one Cb and one Cr
    block (2x2-averaged chroma); at 4:4:4 each 8x8 MCU carries one
    block per component. Each component has its own DC predictor,
    quant table (0=luma, 1=chroma) and Annex-K Huffman pair. For an
    image made of CONSTANT macroblocks the whole chain is exact per
    channel: constant RGB -> constant integer YCbCr (rgb_to_ycbcr
    rounds to integers), constant chroma averages to itself, and the
    q00 = 8 DC trick reproduces every plane bit-exactly — so
    decode(encode(img)) == ycbcr_to_rgb(rgb_to_ycbcr(img)), an
    analytic statement a SQL oracle can make."""
    qy = _check_quant(quant, DEFAULT_QUANT)
    qc = _check_quant(chroma_quant, DEFAULT_QUANT_CHROMA)
    sub = subsampling == "4:2:0"
    mcu = 16 if sub else 8
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("cannot encode an empty image")
    ph, pw = -h % mcu, -w % mcu
    padded = np.pad(arr, ((0, ph), (0, pw), (0, 0)), mode="edge")
    ycc = rgb_to_ycbcr(padded)  # float64 planes holding integer values
    y_pl = ycc[..., 0]
    if sub:
        # 4:2:0: 2x2 mean of the integer chroma samples (float math; a
        # constant block averages to exactly itself)
        cb_pl = (
            ycc[0::2, 0::2, 1] + ycc[0::2, 1::2, 1]
            + ycc[1::2, 0::2, 1] + ycc[1::2, 1::2, 1]
        ) / 4.0
        cr_pl = (
            ycc[0::2, 0::2, 2] + ycc[0::2, 1::2, 2]
            + ycc[1::2, 0::2, 2] + ycc[1::2, 1::2, 2]
        ) / 4.0
    else:
        cb_pl, cr_pl = ycc[..., 1], ycc[..., 2]

    dc_y = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_y = _canonical_codes(_AC_BITS, _AC_VALS)
    dc_c = _canonical_codes(_DC_BITS_CHROMA, _DC_VALS_CHROMA)
    ac_c = _canonical_codes(_AC_BITS_CHROMA, _AC_VALS_CHROMA)
    writer = _BitWriter()
    preds = [0, 0, 0]
    nb = 2 if sub else 1  # luma blocks per MCU side
    for my in range(padded.shape[0] // mcu):
        for mx in range(padded.shape[1] // mcu):
            for by in range(nb):
                for bx in range(nb):
                    y0, x0 = my * mcu + by * 8, mx * mcu + bx * 8
                    preds[0] = _write_block(
                        writer,
                        y_pl[y0 : y0 + 8, x0 : x0 + 8] - 128.0,
                        qy, dc_y, ac_y, preds[0],
                    )
            y0, x0 = my * 8, mx * 8
            preds[1] = _write_block(
                writer, cb_pl[y0 : y0 + 8, x0 : x0 + 8] - 128.0,
                qc, dc_c, ac_c, preds[1],
            )
            preds[2] = _write_block(
                writer, cr_pl[y0 : y0 + 8, x0 : x0 + 8] - 128.0,
                qc, dc_c, ac_c, preds[2],
            )
    writer.flush()

    luma_samp = b"\x22" if sub else b"\x11"
    out = bytearray()
    out += JPEG_SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + _zz_bytes(qy))
    out += _seg(0xDB, b"\x01" + _zz_bytes(qc))
    out += _seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + b"\x01" + luma_samp + b"\x00" + b"\x02\x11\x01" + b"\x03\x11\x01",
    )
    out += _seg(0xC4, b"\x00" + bytes(_DC_BITS[1:]) + bytes(_DC_VALS))
    out += _seg(0xC4, b"\x10" + bytes(_AC_BITS[1:]) + bytes(_AC_VALS))
    out += _seg(
        0xC4, b"\x01" + bytes(_DC_BITS_CHROMA[1:]) + bytes(_DC_VALS_CHROMA)
    )
    out += _seg(
        0xC4, b"\x11" + bytes(_AC_BITS_CHROMA[1:]) + bytes(_AC_VALS_CHROMA)
    )
    out += _seg(0xDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_dimensions(data: bytes) -> tuple[int, int]:
    """Cheap (height, width) probe: walk marker segments up to the
    first SOFn frame header without touching entropy data — used by
    the AVI encoder to validate that every MJPEG frame's actual
    geometry matches the container's declared size (ADVICE r6)."""
    if data[:2] != JPEG_SOI:
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at offset {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        pos += 2
        if marker in (0x01, 0xD9) or 0xD0 <= marker <= 0xD7:
            continue  # stand-alone markers carry no length field
        if pos + 2 > len(data):
            raise ValueError("JPEG marker stream truncated")
        (seglen,) = struct.unpack_from(">H", data, pos)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if seglen < 7:
                raise ValueError("JPEG SOF segment truncated")
            _, h, w = struct.unpack_from(">BHH", data, pos + 2)
            return h, w
        pos += seglen
    raise ValueError("JPEG stream missing SOF frame header")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline grayscale JFIF back to an (H, W) uint8 array.

    Parses the real marker stream (tables come from the FILE, not
    from this module's constants), Huffman-decodes every MCU,
    dequantizes, applies the inverse DCT and crops the MCU padding."""
    if data[:2] != JPEG_SOI:
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = -1
    comps: list[dict] = []
    scan: bytes | None = None
    while pos < len(data):
        if pos + 2 > len(data):
            raise ValueError("JPEG marker stream truncated")
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at offset {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte (spec-legal 0xFF padding)
            pos += 1
            continue
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01:  # TEM — stand-alone, no length field
            continue
        if 0xD0 <= marker <= 0xD7:
            # RSTn outside entropy data (and we reject DRI above, so
            # none should appear at all): a named error beats the
            # confusing offset error of mis-reading a length field.
            raise ValueError(
                f"unexpected restart marker RST{marker - 0xD0} in the"
                " JPEG header stream"
            )
        if pos + 2 > len(data):
            raise ValueError("JPEG marker stream truncated")
        (seglen,) = struct.unpack_from(">H", data, pos)
        if pos + seglen > len(data):
            raise ValueError("JPEG segment truncated")
        payload = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                prec, tid = payload[p] >> 4, payload[p] & 0x0F
                if prec:
                    raise NotImplementedError("16-bit quant tables")
                if p + 65 > len(payload):
                    raise ValueError("JPEG DQT segment truncated")
                tbl = np.zeros((8, 8), dtype=np.int64)
                for k, (r, c) in enumerate(_ZIGZAG):
                    tbl[r, c] = payload[p + 1 + k]
                quant[tid] = tbl
                p += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0x0F
                if p + 17 > len(payload):
                    raise ValueError("JPEG DHT segment truncated")
                bits = [0] + list(payload[p + 1 : p + 17])
                n = sum(bits)
                if p + 17 + n > len(payload):
                    raise ValueError("JPEG DHT segment truncated")
                vals = list(payload[p + 17 : p + 17 + n])
                huff[(cls, tid)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if len(payload) < 6:
                raise ValueError("JPEG SOF0 segment truncated")
            prec, h, w, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component scans: only 1 (grayscale) and"
                    " 3 (YCbCr) are implemented"
                )
            if len(payload) < 6 + 3 * ncomp:
                raise ValueError("JPEG SOF0 segment truncated")
            # per-component bytes: id, sampling (H<<4|V), quant id Tq
            comps = [
                {
                    "id": payload[6 + 3 * ci],
                    "h": payload[7 + 3 * ci] >> 4,
                    "v": payload[7 + 3 * ci] & 0x0F,
                    "tq": payload[8 + 3 * ci],
                }
                for ci in range(ncomp)
            ]
            if ncomp == 1:
                if (comps[0]["h"], comps[0]["v"]) != (1, 1):
                    raise NotImplementedError("subsampled components")
            else:
                lum = (comps[0]["h"], comps[0]["v"])
                chroma_ok = all(
                    (c["h"], c["v"]) == (1, 1) for c in comps[1:]
                )
                if lum not in ((1, 1), (2, 2)) or not chroma_ok:
                    raise NotImplementedError(
                        "sampling layout: only 4:4:4 (1x1) and 4:2:0"
                        " (luma 2x2) are implemented"
                    )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise NotImplementedError(
                f"SOF{marker - 0xC0}: only baseline sequential (SOF0)"
            )
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals")
        elif marker == 0xDA:  # SOS — entropy data follows the segment
            if not comps:
                raise ValueError("JPEG SOS before SOF")
            if len(payload) < 1 + 2 * len(comps) + 3:
                raise ValueError("JPEG SOS segment truncated")
            if payload[0] != len(comps):
                raise NotImplementedError(
                    "non-interleaved (multi-scan) streams"
                )
            sel = {
                payload[1 + 2 * i]: payload[2 + 2 * i]
                for i in range(payload[0])
            }
            for c in comps:
                if c["id"] not in sel:
                    raise ValueError(
                        "JPEG SOS does not cover every SOF component"
                    )
                c["td"], c["ta"] = sel[c["id"]] >> 4, sel[c["id"]] & 0x0F
            scan = data[pos : len(data) - 2]  # up to EOI
            break
    if scan is None or h < 0:
        raise ValueError("JPEG stream missing SOF/SOS")
    for c in comps:
        c["q"] = quant.get(c["tq"])
        c["dc"] = huff.get((0, c["td"]))
        c["ac"] = huff.get((1, c["ta"]))
        if c["q"] is None or c["dc"] is None or c["ac"] is None:
            raise ValueError("JPEG stream missing quant/Huffman tables")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    reader = _BitReader(scan)
    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.uint8)
        for c in comps
    ]
    preds = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz, preds[ci] = _decode_block(
                            reader, c["dc"], c["ac"], preds[ci]
                        )
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = _idct(
                            zz, c["q"]
                        )
    if len(comps) == 1:
        return planes[0][:h, :w]
    full = []
    for c, pl in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:  # nearest-neighbor chroma upsample
            pl = np.repeat(np.repeat(pl, ry, axis=0), rx, axis=1)
        full.append(pl[:h, :w])
    return ycbcr_to_rgb(np.stack(full, axis=-1))


def _decode_block(
    reader: _BitReader,
    dc: dict[tuple[int, int], int],
    ac: dict[tuple[int, int], int],
    prev_dc: int,
) -> tuple[np.ndarray, int]:
    """Huffman-decode one block's zigzag coefficients; returns
    (zz[64], new DC predictor)."""
    zz = np.zeros(64, dtype=np.int64)
    ssss = reader.read_symbol(dc)
    prev_dc += _extend(reader.read_bits(ssss), ssss)
    zz[0] = prev_dc
    k = 1
    while k < 64:
        sym = reader.read_symbol(ac)
        if sym == 0x00:  # EOB
            break
        run, ssss = sym >> 4, sym & 0x0F
        if ssss == 0:
            if run != 15:
                raise ValueError(f"invalid AC symbol {sym:#x}")
            k += 16  # ZRL
            continue
        k += run
        if k > 63:
            raise ValueError("AC run overflows the block")
        zz[k] = _extend(reader.read_bits(ssss), ssss)
        k += 1
    return zz, prev_dc


def _idct(zz: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Dequantize + inverse DCT + level shift one block to uint8."""
    coef = np.zeros((8, 8), dtype=np.float64)
    coef[_ZZ_R, _ZZ_C] = zz * q[_ZZ_R, _ZZ_C]
    block = _C.T @ coef @ _C + 128.0
    return np.clip(np.floor(block + 0.5), 0, 255).astype(np.uint8)
