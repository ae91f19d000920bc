"""Metadata-only MP3 (MPEG-1 Layer III) frame-header walker — the
corpus-statistics sibling of the real PNG/WAV/JPEG/AVI codecs
(SURVEY.md §2.10 X8; VERDICT r10 "What's missing" #5).

What a 100 TB media-corpus pipeline actually needs from MP3 is the
HEADER walk — duration, bitrate profile, sample rate, frame count —
none of which touches the entropy-coded audio payload. That walk is
pure public spec (ISO/IEC 11172-3 frame header layout: 11-bit sync,
version/layer bits, bitrate and sample-rate indices, padding bit;
frame_bytes = 144000·bitrate_kbps / sample_rate + padding for
MPEG-1 Layer III) plus the ID3v2 (syncsafe-size prefix tag) and
ID3v1 (128-byte 'TAG' trailer) skips, and is implementable exactly
in stdlib ``struct`` — so it lives here as a REAL parser, while full
audio decode stays an honest ``NotImplementedError`` in
``multimodal.decode_audio`` (a correct MDCT+Huffman decoder is a
library, not a metadata walk).

``build_mp3`` writes syntactically valid frame sequences with
deterministic FILLER payloads — a fixture writer for the parser and
the analytic DuckDB oracles (the wav.py pattern: synthesize →
parse → compare against the closed-form stats), NOT an audio
encoder; the filler is silence to a spec-agnostic reader and garbage
to a real one, which is exactly the metadata-only contract.

Scope limits raise loudly (the shared codec error contract):
MPEG-2/2.5 and Layer I/II headers, free-format (bitrate index 0)
and bad/reserved indices are NotImplementedError; structural damage
(lost sync mid-stream, truncated frame, truncated ID3 tag) is
ValueError.
"""

from __future__ import annotations

# MPEG-1 Layer III bitrate table, index 1..14 → kbps (index 0 =
# free-format, index 15 = reserved — both out of scope).
BITRATE_KBPS = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
# MPEG-1 sample-rate table, index 0..2 (3 = reserved).
SAMPLE_RATES = (44100, 48000, 32000)
SAMPLES_PER_FRAME = 1152  # MPEG-1 Layer III
ID3V1_LEN = 128


def _frame_len(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    return 144000 * bitrate_kbps // sample_rate + padding


def _header(bitrate_idx: int, sr_idx: int, padding: int) -> bytes:
    """4-byte MPEG-1 Layer III frame header: sync=0x7FF, version=11
    (MPEG-1), layer=01 (III), no CRC; channel mode fixed to stereo."""
    b0 = 0xFF
    b1 = 0xFB  # 111 (sync) | 11 (v1) | 01 (layer III) | 1 (no crc)
    b2 = (bitrate_idx << 4) | (sr_idx << 2) | (padding << 1)
    b3 = 0x00  # stereo, no mode ext, no copyright/original/emphasis
    return bytes((b0, b1, b2, b3))


def encode_id3v2(payload: bytes) -> bytes:
    """Minimal ID3v2.3 tag wrapping ``payload`` (the parser only ever
    SKIPS it, so content is opaque); size is the spec's 28-bit
    syncsafe integer."""
    n = len(payload)
    if n >= 1 << 28:
        raise ValueError("ID3v2 payload exceeds the syncsafe size field")
    size = bytes(
        ((n >> s) & 0x7F for s in (21, 14, 7, 0))
    )
    return b"ID3" + bytes((3, 0, 0)) + size + payload


def build_mp3(
    frame_bitrate_idx: list[int],
    sr_idx: int,
    pad_bits: list[int] | None = None,
    id3v2_payload: bytes | None = None,
    id3v1: bool = False,
    seed: int = 0,
) -> bytes:
    """Fixture writer: one syntactically valid MPEG-1 Layer III frame
    per entry of ``frame_bitrate_idx`` (VBR when indices differ),
    deterministic filler payload bytes keyed by ``seed`` and the
    frame index. Optional ID3v2 prefix / ID3v1 trailer exercise the
    parser's skip paths."""
    if sr_idx not in (0, 1, 2):
        raise ValueError(f"sample-rate index {sr_idx} out of range 0..2")
    if not frame_bitrate_idx:
        raise ValueError("cannot build a zero-frame mp3")
    pads = [0] * len(frame_bitrate_idx) if pad_bits is None else pad_bits
    if len(pads) != len(frame_bitrate_idx):
        raise ValueError("pad_bits length must match frame count")
    out = bytearray()
    if id3v2_payload is not None:
        out += encode_id3v2(id3v2_payload)
    sr = SAMPLE_RATES[sr_idx]
    for i, (bi, pad) in enumerate(zip(frame_bitrate_idx, pads)):
        if not 1 <= bi <= 14:
            raise ValueError(f"bitrate index {bi} out of range 1..14")
        if pad not in (0, 1):
            raise ValueError(f"padding bit {pad} not in (0, 1)")
        flen = _frame_len(BITRATE_KBPS[bi], sr, pad)
        body = bytes(
            (seed * 31 + i * 17 + j * 7) % 256 for j in range(flen - 4)
        )
        out += _header(bi, sr_idx, pad) + body
    if id3v1:
        out += b"TAG" + bytes((seed + j) % 256 for j in range(ID3V1_LEN - 3))
    return bytes(out)


def mp3_metadata(payload: bytes) -> dict:
    """Walk every frame header: returns ``{"n_frames", "sample_rate",
    "duration_s_e6" (micro-seconds as an exact int — callers divide),
    "audio_bytes", "bitrate_kbps_sum", "has_id3v2", "has_id3v1"}``.

    duration = n_frames·1152/sample_rate is reported in exact integer
    MICRO-seconds (n·1152·1e6 div sr is exact for the three MPEG-1
    rates only up to rounding — we use the half-up integer division,
    the doc_trigram_perplexity tie discipline) so the Spark query and
    the DuckDB oracle agree bit-for-bit without a float round."""
    data = bytes(payload)
    pos = 0
    has_id3v2 = False
    if data[:3] == b"ID3":
        has_id3v2 = True
        if len(data) < 10:
            raise ValueError("truncated ID3v2 header")
        if any(b & 0x80 for b in data[6:10]):
            raise ValueError("ID3v2 size bytes are not syncsafe")
        size = 0
        for b in data[6:10]:
            size = (size << 7) | b
        pos = 10 + size
        if pos > len(data):
            raise ValueError("ID3v2 tag extends past end of payload")
    end = len(data)
    has_id3v1 = end - pos >= ID3V1_LEN and data[end - ID3V1_LEN:end - 125] == b"TAG"
    if has_id3v1:
        end -= ID3V1_LEN

    n_frames = 0
    audio_bytes = 0
    bitrate_sum = 0
    sr: int | None = None
    while pos < end:
        if end - pos < 4:
            raise ValueError(f"truncated frame header at byte {pos}")
        b0, b1, b2, _b3 = data[pos:pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"lost frame sync at byte {pos}")
        version = (b1 >> 3) & 0x3
        layer = (b1 >> 1) & 0x3
        if version != 0b11 or layer != 0b01:
            raise NotImplementedError(
                "only MPEG-1 Layer III headers are in scope "
                f"(version bits {version:#b}, layer bits {layer:#b})"
            )
        bi = (b2 >> 4) & 0xF
        sri = (b2 >> 2) & 0x3
        pad = (b2 >> 1) & 0x1
        if bi == 0:
            raise NotImplementedError("free-format bitrate is out of scope")
        if bi == 15 or sri == 3:
            raise ValueError(f"reserved bitrate/sample-rate index at byte {pos}")
        this_sr = SAMPLE_RATES[sri]
        if sr is None:
            sr = this_sr
        elif sr != this_sr:
            raise ValueError("sample rate changes mid-stream")
        flen = _frame_len(BITRATE_KBPS[bi], sr, pad)
        if pos + flen > end:
            raise ValueError(f"truncated frame at byte {pos}")
        n_frames += 1
        audio_bytes += flen
        bitrate_sum += BITRATE_KBPS[bi]
        pos += flen
    if n_frames == 0:
        raise ValueError("no MPEG frames found")
    dur_num = n_frames * SAMPLES_PER_FRAME * 1_000_000
    duration_us = (2 * dur_num + sr) // (2 * sr)  # half-up integer div
    return {
        "n_frames": n_frames,
        "sample_rate": sr,
        "duration_s_e6": duration_us,
        "audio_bytes": audio_bytes,
        "bitrate_kbps_sum": bitrate_sum,
        "has_id3v2": has_id3v2,
        "has_id3v1": has_id3v1,
    }
