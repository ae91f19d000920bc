"""Pure-stdlib WebP-LOSSLESS (VP8L) codec — the third real image
decode path for X8 next to PNG and baseline JPEG (VERDICT r12 item 7:
VP8L is Huffman + integer transforms, no float DCT, so it is
pure-stdlib-feasible where VP8-lossy is not).

Format (public: "WebP Lossless Bitstream Specification", RFC 9649):
a RIFF/WEBP container wraps a VP8L chunk; the bitstream is LSB-first
bit-packed and carries (a) a list of invertible integer transforms —
predictor, cross-color, subtract-green, color-indexing — whose
parameters are themselves entropy-coded sub-images, and (b) the ARGB
pixels as an LZ77-over-pixels stream: canonical-Huffman-coded
literals (one code per channel), backward references with
prefix-coded lengths/distances, and a color-cache of recently-seen
pixels. Distances ≤ 120 name a 2D pixel neighborhood instead of a
scan-line offset.

Implemented subset (everything the encoder below can emit, decoded
exactly; every path is round-trip-tested):

- simple (1–2 symbol) and normal (code-length-coded) Huffman codes;
- literals, LZ77 backward references (any distance), color cache;
- SUBTRACT_GREEN, PREDICTOR (all 14 modes), and CROSS-COLOR
  transforms;
- COLOR_INDEXING (palette) and the meta-Huffman (multiple entropy
  groups) raise NotImplementedError loudly — the PNG codec's palette
  precedent: this is a correctness reference, not libwebp.

The short-distance neighborhood table is GENERATED from the spec's
ordering (increasing dx²+dy², larger dy first within a tie, then
smaller |dx|, positive before negative) rather than transcribed; the
first rows are pinned against the spec's published table in
tests/test_multimodal.py, and the encoder maps short distances
through the same table, so round-trips exercise the mapping in both
directions.

The encoder exists to build deterministic fixtures (the encode_png
discipline): it uses BALANCED canonical codes (valid and complete by
construction — Kraft equality — but not frequency-optimal; ratio is
not the goal), optional run-detection that emits distance-1 LZ77
references, an optional color cache, and optional constant-parameter
predictor / cross-color transforms, so a round-trip of a suitable
fixture exercises every decoder path above.
"""

from __future__ import annotations

import struct

import numpy as np

RIFF_MAGIC = b"RIFF"
WEBP_TAG = b"WEBP"
VP8L_TAG = b"VP8L"
_VP8L_SIGNATURE = 0x2F

# code-length-code symbol order (spec)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_NUM_LITERALS = 256
_NUM_LENGTH_PREFIXES = 24
_NUM_DISTANCES = 40


def _dist_neighborhood() -> list[tuple[int, int]]:
    """The 120-entry short-distance (dx, dy) table, generated from
    the spec's ordering rule (module docstring); prefix pinned in
    tests."""
    cand = [
        (dx, dy)
        for dy in range(9)
        for dx in range(-8, 9)
        if not (dy == 0 and dx <= 0)
    ]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], abs(p[0]), p[0] < 0))
    return cand[:120]


_DIST_MAP = _dist_neighborhood()


class _BitReader:
    """LSB-first bit reader (VP8L packing)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.data[self.pos >> 3]
            v |= ((byte >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class _BitWriter:
    """LSB-first bit writer; Huffman codes go MSB-of-code first."""

    def __init__(self) -> None:
        self.bytes = bytearray()
        self.bitpos = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            if self.bitpos == 0:
                self.bytes.append(0)
            if (value >> i) & 1:
                self.bytes[-1] |= 1 << self.bitpos
            self.bitpos = (self.bitpos + 1) & 7

    def write_code(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)


def _balanced_lengths(symbols: list[int]) -> dict[int, int]:
    """Complete canonical code over the given symbols with balanced
    lengths: L = ceil(log2 n); 2^L − n symbols get L−1 bits, the rest
    L — Kraft sum exactly 1, depth ≤ log2(n)+1, deterministic (length
    by symbol order). n == 1 is the zero-bit single-symbol code."""
    n = len(symbols)
    if n == 1:
        return {symbols[0]: 0}
    length = max(1, (n - 1).bit_length())
    shorter = (1 << length) - n
    return {
        s: (length - 1 if i < shorter and length > 1 else length)
        for i, s in enumerate(sorted(symbols))
    }


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """DEFLATE-style canonical assignment: symbols sorted by
    (length, symbol) get consecutive codes per length."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for sym in sorted((s for s, ln in lengths.items() if ln > 0),
                      key=lambda s: (lengths[s], s)):
        ln = lengths[sym]
        code <<= ln - prev_len
        codes[sym] = (code, ln)
        code += 1
        prev_len = ln
    return codes


class _HuffTable:
    """Canonical decode table: counts per length + length-sorted
    symbols; `read` walks bit by bit (codes arrive MSB-first)."""

    def __init__(self, lengths: list[int]) -> None:
        nonzero = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
        if not nonzero:
            raise ValueError("huffman code with no symbols")
        self.single = nonzero[0][1] if len(nonzero) == 1 else None
        if self.single is not None:
            return
        max_len = max(ln for ln, _ in nonzero)
        kraft = sum(1 << (max_len - ln) for ln, _ in nonzero)
        if kraft != 1 << max_len:
            raise ValueError("incomplete or oversubscribed huffman code")
        self.counts = [0] * (max_len + 1)
        for ln, _ in nonzero:
            self.counts[ln] += 1
        self.symbols = [s for _, s in sorted(nonzero)]

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        first = 0
        index = 0
        for ln in range(1, len(self.counts)):
            code = (code << 1) | br.read(1)
            count = self.counts[ln]
            if code - first < count:
                return self.symbols[index + code - first]
            index += count
            first = (first + count) << 1
        raise ValueError("invalid huffman code in stream")


def _read_huffman(br: _BitReader, alphabet_size: int) -> _HuffTable:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        if br.read(1):
            first = br.read(8)
        else:
            first = br.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            lengths[first] = 1  # table treats single-symbol as 0-bit
            return _HuffTable(lengths)
        second = br.read(8)
        lengths[first] = 1
        lengths[second] = 1
        return _HuffTable(lengths)
    # normal: code-length code, then RLE-coded symbol lengths
    num_cl = br.read(4) + 4
    cl_lengths = [0] * len(_CL_ORDER)
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_table = _HuffTable(cl_lengths)
    if br.read(1):  # explicit max-symbol
        length_nbits = 2 * br.read(3) + 2
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        code_len = cl_table.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        elif code_len == 16:
            rep = br.read(2) + 3
            for _ in range(rep):
                if symbol < alphabet_size:
                    lengths[symbol] = prev_len
                    symbol += 1
        elif code_len == 17:
            symbol += br.read(3) + 3
        else:  # 18
            symbol += br.read(7) + 11
    return _HuffTable(lengths)


def _write_huffman(
    bw: _BitWriter, lengths: dict[int, int], alphabet_size: int
) -> None:
    """Emit a code: the simple form for ≤2 symbols, else the normal
    form with a balanced code-length code and no RLE (every symbol's
    length written individually — validity over ratio)."""
    present = sorted(s for s, ln in lengths.items() if ln >= 0)
    if len(present) <= 2 and all(s < 256 for s in present):
        bw.write(1, 1)  # simple
        bw.write(len(present) - 1, 1)
        bw.write(1, 1)  # first symbol in 8 bits
        bw.write(present[0], 8)
        if len(present) == 2:
            bw.write(present[1], 8)
        return
    full = [lengths.get(s, 0) for s in range(alphabet_size)]
    if not any(full):
        raise ValueError("normal code with no nonzero lengths")
    cl_syms = sorted(set(full))
    if len(cl_syms) == 1:
        # single-symbol CL code must be STATED at length 1 (an
        # all-zero statement would mean "no symbols"); the decoder
        # treats one nonzero length as the 0-bit code either way
        cl_lengths = {cl_syms[0]: 1}
    else:
        cl_lengths = _balanced_lengths(cl_syms)
    if max(cl_lengths.values()) > 7:
        raise ValueError("code-length code deeper than 3-bit field allows")
    cl_codes = _canonical_codes(cl_lengths)
    bw.write(0, 1)  # normal
    bw.write(len(_CL_ORDER) - 4, 4)  # transmit all 19 slots
    for sym in _CL_ORDER:
        bw.write(cl_lengths.get(sym, 0), 3)
    bw.write(0, 1)  # no explicit max-symbol
    single_cl = len(cl_syms) == 1  # 0-bit code: write nothing per symbol
    if not single_cl:
        for ln in full:
            code, nbits = cl_codes[ln]
            bw.write_code(code, nbits)


def _prefix_decode(code: int, br: _BitReader) -> int:
    """length/distance prefix code → value (spec: 4 direct codes,
    then exponentially-growing extra-bit ranges)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value → (prefix_code, extra_bits_value, extra_bits_count)."""
    if value <= 4:
        return value - 1, 0, 0
    shifted = value - 1
    extra = shifted.bit_length() - 2
    offset = (2 + ((shifted >> extra) & 1)) << extra
    return 2 * extra + 2 + ((shifted >> extra) & 1), value - offset - 1, extra


def _hash_pixel(argb: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


def _decode_pixel_stream(
    br: _BitReader, width: int, height: int, level0: bool = False
) -> np.ndarray:
    """One entropy-coded VP8L image (used for the main ARGB data and
    for transform sub-images): optional color cache, the meta-Huffman
    bit (level-0 / ARGB streams only — spec order puts it AFTER the
    cache info and transform sub-images never carry it), one group of
    five Huffman codes, then the literal/backref/cache pixel loop.
    Returns (h*w, 4) uint8 [a, r, g, b]."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"invalid color-cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0
    if level0 and br.read(1):
        raise NotImplementedError("VP8L meta-huffman (multiple groups)")
    green = _read_huffman(br, _NUM_LITERALS + _NUM_LENGTH_PREFIXES + cache_size)
    red = _read_huffman(br, _NUM_LITERALS)
    blue = _read_huffman(br, _NUM_LITERALS)
    alpha = _read_huffman(br, _NUM_LITERALS)
    dist = _read_huffman(br, _NUM_DISTANCES)
    n = width * height
    out = np.zeros((n, 4), dtype=np.uint8)  # a, r, g, b
    cache = [0] * cache_size
    pos = 0
    while pos < n:
        sym = green.read(br)
        if sym < _NUM_LITERALS:
            g = sym
            r = red.read(br)
            b = blue.read(br)
            a = alpha.read(br)
            out[pos] = (a, r, g, b)
            if cache_bits:
                argb = (a << 24) | (r << 16) | (g << 8) | b
                cache[_hash_pixel(argb, cache_bits)] = argb
            pos += 1
        elif sym < _NUM_LITERALS + _NUM_LENGTH_PREFIXES:
            length = _prefix_decode(sym - _NUM_LITERALS, br)
            dcode = _prefix_decode(dist.read(br), br)
            if dcode > 120:
                d = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                d = max(1, dy * width + dx)
            if d > pos or pos + length > n:
                raise ValueError("backward reference out of range")
            for i in range(length):  # may self-overlap (run)
                out[pos + i] = out[pos + i - d]
                if cache_bits:
                    a, r, g, b = (int(x) for x in out[pos + i])
                    argb = (a << 24) | (r << 16) | (g << 8) | b
                    cache[_hash_pixel(argb, cache_bits)] = argb
            pos += length
        else:
            if not cache_bits:
                raise ValueError("cache symbol without a color cache")
            argb = cache[sym - _NUM_LITERALS - _NUM_LENGTH_PREFIXES]
            out[pos] = (
                (argb >> 24) & 0xFF,
                (argb >> 16) & 0xFF,
                (argb >> 8) & 0xFF,
                argb & 0xFF,
            )
            pos += 1
    return out


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.int32) + b.astype(np.int32)) // 2


def _predict(mode: int, left, top, topleft, topright) -> np.ndarray:
    """The 14 spec predictors over [a, r, g, b] int32 vectors."""
    if mode == 0:
        return np.array([255, 0, 0, 0], dtype=np.int32)
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return _avg2(_avg2(left, topright), top)
    if mode == 6:
        return _avg2(left, topleft)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(topleft, top)
    if mode == 9:
        return _avg2(top, topright)
    if mode == 10:
        return _avg2(_avg2(left, topleft), _avg2(top, topright))
    if mode == 11:  # Select
        p = left + top - topleft
        if int(np.abs(p - left).sum()) <= int(np.abs(p - top).sum()):
            return left
        return top
    if mode == 12:  # ClampAddSubtractFull
        return np.clip(left + top - topleft, 0, 255)
    if mode == 13:  # ClampAddSubtractHalf
        ave = _avg2(left, top)
        d = ave - topleft
        # C-truncating /2 (the spec's integer division), not floor
        return np.clip(ave + np.sign(d) * (np.abs(d) // 2), 0, 255)
    raise ValueError(f"invalid predictor mode {mode}")


def _inverse_predictor(pix: np.ndarray, w: int, h: int, bits: int,
                       modes: np.ndarray) -> None:
    """In-place inverse predictor transform over the (h*w, 4) residual
    frame. Edge rules per spec: (0,0) uses mode 0, top row uses L,
    left column uses T; TR for the last column indexes pos−w+1 (the
    current row's first pixel, already decoded)."""
    sub_w = _sub_size(w, bits)
    for y in range(h):
        for x in range(w):
            pos = y * w + x
            if y == 0 and x == 0:
                mode = 0
            elif y == 0:
                mode = 1
            elif x == 0:
                mode = 2
            else:
                mode = int(modes[(y >> bits) * sub_w + (x >> bits)])
            left = pix[pos - 1].astype(np.int32) if x > 0 else None
            top = pix[pos - w].astype(np.int32) if y > 0 else None
            tl = pix[pos - w - 1].astype(np.int32) if (x > 0 and y > 0) else None
            tr = pix[pos - w + 1].astype(np.int32) if y > 0 else None
            zero = np.zeros(4, dtype=np.int32)
            pred = _predict(
                mode,
                left if left is not None else zero,
                top if top is not None else zero,
                tl if tl is not None else zero,
                tr if tr is not None else zero,
            )
            pix[pos] = (pix[pos].astype(np.int32) + pred) % 256


def _ct_delta(t: int, c: int) -> int:
    """Cross-color delta: (int8(t) · int8(c)) >> 5 (arithmetic)."""
    t8 = t - 256 if t >= 128 else t
    c8 = c - 256 if c >= 128 else c
    return (t8 * c8) >> 5


def _inverse_color_transform(pix: np.ndarray, w: int, h: int, bits: int,
                             elems: np.ndarray) -> None:
    """In-place inverse cross-color transform: red += f(green),
    blue += f(green) + g(red'), per-block elements packed as
    (red=red_to_blue, green=green_to_blue, blue=green_to_red)."""
    sub_w = _sub_size(w, bits)
    for y in range(h):
        for x in range(w):
            pos = y * w + x
            e = elems[(y >> bits) * sub_w + (x >> bits)]
            g2r, g2b, r2b = int(e[3]), int(e[2]), int(e[1])
            a, r, g, b = (int(v) for v in pix[pos])
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            pix[pos] = (a, r, g, b)


def decode_webp_lossless(data: bytes) -> np.ndarray:
    """Decode a lossless WebP (VP8L) payload to an (H, W, 4) uint8
    RGBA array. Palette (color-indexing) images and meta-Huffman
    streams raise NotImplementedError; corrupt data raises
    ValueError."""
    if data[:4] != RIFF_MAGIC or data[8:12] != WEBP_TAG:
        raise ValueError("not a WebP (bad RIFF/WEBP header)")
    if data[12:16] != VP8L_TAG:
        raise NotImplementedError("not a lossless (VP8L) WebP")
    (chunk_len,) = struct.unpack("<I", data[16:20])
    payload = data[20 : 20 + chunk_len]
    if not payload or payload[0] != _VP8L_SIGNATURE:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    transforms: list[tuple[int, int, np.ndarray | None]] = []
    while br.read(1):
        ttype = br.read(2)
        if ttype == 3:
            raise NotImplementedError(
                "VP8L color-indexing (palette) transform"
            )
        if ttype == 2:  # subtract green
            transforms.append((2, 0, None))
            continue
        bits = br.read(3) + 2
        sub = _decode_pixel_stream(
            br, _sub_size(w, bits), _sub_size(h, bits)
        )
        transforms.append((ttype, bits, sub))
    pix = _decode_pixel_stream(br, w, h, level0=True)
    for ttype, bits, sub in reversed(transforms):
        if ttype == 2:  # add green back
            g = pix[:, 2].astype(np.int32)
            pix[:, 1] = ((pix[:, 1].astype(np.int32) + g) % 256).astype(np.uint8)
            pix[:, 3] = ((pix[:, 3].astype(np.int32) + g) % 256).astype(np.uint8)
        elif ttype == 0:
            _inverse_predictor(pix, w, h, bits, sub[:, 2])
        elif ttype == 1:
            _inverse_color_transform(pix, w, h, bits, sub)
    rgba = pix[:, [1, 2, 3, 0]].reshape(h, w, 4)
    return rgba


def _write_pixel_stream(
    bw: _BitWriter,
    pix: np.ndarray,
    cache_bits: int,
    use_runs: bool,
    level0: bool = False,
) -> None:
    """Emit one entropy-coded image for the (n, 4) [a, r, g, b]
    frame: optional cache, balanced codes over the observed symbols,
    literals with run-detection (distance-1 backrefs) and cache hits."""
    n = len(pix)
    cache_size = (1 << cache_bits) if cache_bits else 0
    # token pass: decide literal / run / cache per pixel
    tokens: list[tuple] = []  # ("lit", a,r,g,b) | ("run", len) | ("cache", idx)
    cache = [None] * cache_size
    pos = 0
    while pos < n:
        if use_runs and pos > 0:
            run = 0
            while (
                pos + run < n
                and run < 4096
                and (pix[pos + run] == pix[pos - 1]).all()
            ):
                run += 1
            if run >= 3:
                tokens.append(("run", run))
                if cache_bits:
                    a, r, g, b = (int(v) for v in pix[pos])
                    argb = (a << 24) | (r << 16) | (g << 8) | b
                    cache[_hash_pixel(argb, cache_bits)] = argb
                pos += run
                continue
        a, r, g, b = (int(v) for v in pix[pos])
        argb = (a << 24) | (r << 16) | (g << 8) | b
        if cache_bits:
            idx = _hash_pixel(argb, cache_bits)
            if cache[idx] == argb:
                tokens.append(("cache", idx))
                pos += 1
                continue
            cache[idx] = argb
        tokens.append(("lit", a, r, g, b))
        pos += 1
    # histograms → balanced codes
    g_syms, r_syms, b_syms, a_syms, d_syms = set(), set(), set(), set(), set()
    for t in tokens:
        if t[0] == "lit":
            a_syms.add(t[1])
            r_syms.add(t[2])
            g_syms.add(t[3])
            b_syms.add(t[4])
        elif t[0] == "run":
            pc, _, _ = _prefix_encode(t[1])
            g_syms.add(_NUM_LITERALS + pc)
            dpc, _, _ = _prefix_encode(121)  # distance 1 as plain 1+120
            d_syms.add(dpc)
        else:
            g_syms.add(_NUM_LITERALS + _NUM_LENGTH_PREFIXES + t[1])
    for s in (r_syms, b_syms, a_syms, d_syms):
        if not s:
            s.add(0)
    g_len = _balanced_lengths(sorted(g_syms))
    r_len = _balanced_lengths(sorted(r_syms))
    b_len = _balanced_lengths(sorted(b_syms))
    a_len = _balanced_lengths(sorted(a_syms))
    d_len = _balanced_lengths(sorted(d_syms))
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if level0:
        bw.write(0, 1)  # no meta-huffman (spec order: after cache info)
    galpha = _NUM_LITERALS + _NUM_LENGTH_PREFIXES + cache_size
    _write_huffman(bw, g_len, galpha)
    _write_huffman(bw, r_len, _NUM_LITERALS)
    _write_huffman(bw, b_len, _NUM_LITERALS)
    _write_huffman(bw, a_len, _NUM_LITERALS)
    _write_huffman(bw, d_len, _NUM_DISTANCES)
    g_codes = _canonical_codes(g_len)
    r_codes = _canonical_codes(r_len)
    b_codes = _canonical_codes(b_len)
    a_codes = _canonical_codes(a_len)
    d_codes = _canonical_codes(d_len)

    def emit_maybe(codes, lens, sym):
        # zero-bit single-symbol codes write nothing
        if len(lens) == 1:
            return
        code, ln = codes[sym]
        bw.write_code(code, ln)

    for t in tokens:
        if t[0] == "lit":
            a, r, g, b = t[1], t[2], t[3], t[4]
            emit_maybe(g_codes, g_len, g)
            emit_maybe(r_codes, r_len, r)
            emit_maybe(b_codes, b_len, b)
            emit_maybe(a_codes, a_len, a)
        elif t[0] == "run":
            pc, extra_v, extra_n = _prefix_encode(t[1])
            emit_maybe(g_codes, g_len, _NUM_LITERALS + pc)
            bw.write(extra_v, extra_n)
            dpc, dv, dn = _prefix_encode(121)
            emit_maybe(d_codes, d_len, dpc)
            bw.write(dv, dn)
        else:
            emit_maybe(
                g_codes, g_len, _NUM_LITERALS + _NUM_LENGTH_PREFIXES + t[1]
            )


def encode_webp_lossless(
    arr: np.ndarray,
    subtract_green: bool = True,
    cache_bits: int = 0,
    use_runs: bool = True,
    predictor_mode: int | None = None,
    color_element: tuple[int, int, int] | None = None,
) -> bytes:
    """Encode an (H, W, 3|4) or (H, W) uint8 array as a lossless WebP.
    Fixture encoder (module docstring): balanced codes, optional
    subtract-green, optional constant-mode predictor transform,
    optional constant cross-color element (g2r, g2b, r2b), optional
    color cache and distance-1 run references — between them they
    exercise every decoder path. Transforms are applied
    subtract-green → cross-color → predictor and written in that
    order (the decoder inverse-applies in reverse)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if ch == 1:
        arr = np.repeat(arr, 3, axis=2)
        ch = 3
    if ch == 3:
        arr = np.concatenate(
            [arr, np.full((h, w, 1), 255, dtype=np.uint8)], axis=2
        )
    elif ch != 4:
        raise ValueError(f"unsupported channel count {ch}")
    # internal layout (n, 4) = [a, r, g, b]
    pix = arr.reshape(h * w, 4)[:, [3, 0, 1, 2]].astype(np.uint8).copy()
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if ch == 4 else 0, 1)  # alpha hint
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        g = pix[:, 2].astype(np.int32)
        pix[:, 1] = ((pix[:, 1].astype(np.int32) - g) % 256).astype(np.uint8)
        pix[:, 3] = ((pix[:, 3].astype(np.int32) - g) % 256).astype(np.uint8)
    bits = 5  # 32-px blocks — small fixtures get a tiny sub-image
    if color_element is not None:
        g2r, g2b, r2b = (v & 0xFF for v in color_element)
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(bits - 2, 3)
        sub_n = _sub_size(w, bits) * _sub_size(h, bits)
        elems = np.zeros((sub_n, 4), dtype=np.uint8)
        elems[:, 3] = g2r  # blue channel carries green_to_red
        elems[:, 2] = g2b  # green channel carries green_to_blue
        elems[:, 1] = r2b  # red channel carries red_to_blue
        _write_pixel_stream(bw, elems, cache_bits=0, use_runs=True)
        # forward transform: subtract the deltas (inverse of decode)
        for pos in range(h * w):
            a, r, gg, b = (int(v) for v in pix[pos])
            b = (b - _ct_delta(g2b, gg) - _ct_delta(r2b, r)) & 0xFF
            r = (r - _ct_delta(g2r, gg)) & 0xFF
            pix[pos] = (a, r, gg, b)
    if predictor_mode is not None:
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(bits - 2, 3)
        sub_n = _sub_size(w, bits) * _sub_size(h, bits)
        modes = np.zeros((sub_n, 4), dtype=np.uint8)
        modes[:, 2] = predictor_mode  # green channel carries the mode
        modes[:, 0] = 255
        _write_pixel_stream(bw, modes, cache_bits=0, use_runs=True)
        # forward residuals, row-major: prediction sees ORIGINAL
        # neighbors (lossless ⇒ decoded == original at decode time)
        orig = pix.copy()
        res = pix  # in place
        zero = np.zeros(4, dtype=np.int32)
        for y in range(h):
            for x in range(w):
                pos = y * w + x
                if y == 0 and x == 0:
                    mode = 0
                elif y == 0:
                    mode = 1
                elif x == 0:
                    mode = 2
                else:
                    mode = predictor_mode
                left = orig[pos - 1].astype(np.int32) if x > 0 else zero
                top = orig[pos - w].astype(np.int32) if y > 0 else zero
                tl = (
                    orig[pos - w - 1].astype(np.int32)
                    if (x > 0 and y > 0)
                    else zero
                )
                tr = orig[pos - w + 1].astype(np.int32) if y > 0 else zero
                pred = _predict(mode, left, top, tl, tr)
                res[pos] = (orig[pos].astype(np.int32) - pred) % 256
    bw.write(0, 1)  # end of transforms
    _write_pixel_stream(
        bw, pix, cache_bits=cache_bits, use_runs=use_runs, level0=True
    )
    payload = bytes([_VP8L_SIGNATURE]) + bytes(bw.bytes)
    if len(payload) & 1:
        padded = payload + b"\x00"
    else:
        padded = payload
    chunk = VP8L_TAG + struct.pack("<I", len(payload)) + padded
    riff = RIFF_MAGIC + struct.pack("<I", 4 + len(chunk)) + WEBP_TAG + chunk
    return riff
