"""Minimal pure-stdlib baseline JPEG codec — the JPEG sibling of the
PNG/WAV reference codecs (SURVEY.md §2.10 X8; VERDICT r5 item 7).

The container has no PIL/libjpeg, but baseline JFIF needs only the
public ITU T.81 spec: marker segments (SOI/APP0/DQT/SOF0/DHT/SOS/EOI),
canonical Huffman coding of DC differences and run-length-coded AC
coefficients in zigzag order, dequantization, and the 8x8 inverse DCT.
This module implements the GRAYSCALE baseline-sequential subset
(one component, 8-bit, no subsampling, no restart intervals) in both
directions, with the standard Annex-K luminance Huffman tables so the
emitted files are plain JFIF any external decoder reads.

Scope limits raise loudly: progressive (SOF2), arithmetic coding,
multi-component scans, 16-bit quant tables and restart markers are
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


def encode_jpeg(arr: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    """Encode an (H, W) uint8 grayscale array as baseline JFIF.

    Images whose dimensions are not multiples of 8 are edge-padded to
    the MCU grid (decoders crop back to the SOF dimensions per spec)."""
    if arr.ndim != 2:
        raise NotImplementedError(
            "only grayscale (H, W) encoding is implemented"
        )
    if arr.dtype != np.uint8:
        raise ValueError(f"expected uint8 pixels, got {arr.dtype}")
    q = DEFAULT_QUANT if quant is None else np.asarray(quant, dtype=np.int64)
    if q.shape != (8, 8) or (q < 1).any() or (q > 255).any():
        raise ValueError("quant table must be 8x8 with entries in [1, 255]")
    h, w = arr.shape
    if h == 0 or w == 0:
        raise ValueError("cannot encode an empty image")
    ph, pw = -h % 8, -w % 8
    padded = np.pad(arr, ((0, ph), (0, pw)), mode="edge").astype(np.float64)

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    zz_r = np.array([r for r, _ in _ZIGZAG])
    zz_c = np.array([c for _, c in _ZIGZAG])

    writer = _BitWriter()
    prev_dc = 0
    for by in range(0, padded.shape[0], 8):
        for bx in range(0, padded.shape[1], 8):
            block = padded[by : by + 8, bx : bx + 8] - 128.0
            coef = _C @ block @ _C.T
            # round-half-away like libjpeg's integer quantizer (np.round
            # is half-to-even, which would diverge from the analytic
            # oracle's arithmetic on exact .5 quotients)
            quo = coef / q
            qc = (np.sign(quo) * np.floor(np.abs(quo) + 0.5)).astype(np.int64)
            zz = qc[zz_r, zz_c]
            ssss, bits = _magnitude(int(zz[0]) - prev_dc)
            prev_dc = int(zz[0])
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
    writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    zz_quant = bytes(int(q[r, c]) for r, c in _ZIGZAG)
    out = bytearray()
    out += JPEG_SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + zz_quant)  # DQT: 8-bit table id 0
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += seg(0xC4, b"\x00" + bytes(_DC_BITS[1:]) + bytes(_DC_VALS))
    out += seg(0xC4, b"\x10" + bytes(_AC_BITS[1:]) + bytes(_AC_VALS))
    out += seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
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
    comp_q_tbl = 0
    comp_dc_tbl = comp_ac_tbl = 0
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
            if len(payload) < 9:
                raise ValueError("JPEG SOF0 segment truncated")
            prec, h, w, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            if ncomp != 1:
                raise NotImplementedError(
                    "multi-component (color) scans are not implemented"
                )
            # per-component bytes: id, sampling (H<<4|V), quant id
            if payload[7] != 0x11:
                raise NotImplementedError("subsampled components")
            comp_q_tbl = payload[8]  # Tq: the component's table SELECTOR
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise NotImplementedError(
                f"SOF{marker - 0xC0}: only baseline sequential (SOF0)"
            )
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals")
        elif marker == 0xDA:  # SOS — entropy data follows the segment
            if len(payload) < 3:
                raise ValueError("JPEG SOS segment truncated")
            tbls = payload[2]
            comp_dc_tbl, comp_ac_tbl = tbls >> 4, tbls & 0x0F
            scan = data[pos : len(data) - 2]  # up to EOI
            break
    if scan is None or h < 0:
        raise ValueError("JPEG stream missing SOF/SOS")
    q = quant.get(comp_q_tbl)
    dc = huff.get((0, comp_dc_tbl))
    ac = huff.get((1, comp_ac_tbl))
    if q is None or dc is None or ac is None:
        raise ValueError("JPEG stream missing quant/Huffman tables")

    reader = _BitReader(scan)
    bh, bw = (h + 7) // 8, (w + 7) // 8
    out = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
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
            coef = np.zeros((8, 8), dtype=np.float64)
            for idx, (r, c) in enumerate(_ZIGZAG):
                coef[r, c] = zz[idx] * q[r, c]
            block = _C.T @ coef @ _C + 128.0
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.floor(block + 0.5), 0, 255
            ).astype(np.uint8)
    return out[:h, :w]
