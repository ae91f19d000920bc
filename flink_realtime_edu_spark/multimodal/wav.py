"""Pure-stdlib WAV (RIFF PCM) codec — the audio sibling of
:mod:`.png`, giving the X8 multimodal pipeline a REAL audio decode
path in a container without soundfile/ffmpeg.

Scope (same honesty discipline as the PNG codec): 16-bit integer PCM,
any channel count and sample rate, chunk-walking with size
validation. Float/8-/24-bit/compressed WAVs raise NotImplementedError
(they are different codecs, not corrupt files); structural damage
(bad magic, truncated chunks, fmt/data inconsistencies) raises
ValueError. The spec is public and tiny: RIFF container, `fmt `
describing the sample layout, `data` carrying interleaved
little-endian frames, chunks padded to even offsets.

Reference parity: the Flink-family repos treat media as opaque
payloads next to typed metadata; this codec exists so the Spark-side
pipeline (binary column → Arrow batch → decode → per-asset stats) is
exercised with true sample values, oracle-checkable analytically
(queries/media.py::wav_decode_stats).

Why not stdlib ``wave``: the stdlib module could read/write this
subset, but it (a) raises a mixed taxonomy (wave.Error/EOFError/
struct.error) where the pipeline contract wants exactly
ValueError-for-corruption vs NotImplementedError-for-other-codecs,
(b) is stream-oriented (seeks a file object per asset) where this
decoder is one linear pass over bytes already in an Arrow batch, and
(c) silently tolerates some structural inconsistencies (e.g. a
block_align that contradicts channels×width) that a data pipeline
should reject loudly. The format is 3 fixed-layout chunks; owning the
~90 lines is cheaper than wrapping and re-mapping the stdlib's
behavior, and the round-trip/rejection tests pin the edge cases.
"""

from __future__ import annotations

import struct

import numpy as np

RIFF_MAGIC = b"RIFF"
WAVE_TAG = b"WAVE"


def encode_wav(samples: "np.ndarray", sample_rate: int) -> bytes:
    """Encode int16 samples — shape (n,) mono or (n, ch) — to a PCM
    WAV byte string."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"samples must be (n,) or (n, ch), got {arr.shape}")
    n, ch = arr.shape
    data = arr.tobytes()  # interleaved: row-major (frame, channel)
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16
    )
    body = (
        WAVE_TAG
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return RIFF_MAGIC + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple["np.ndarray", int]:
    """Decode a PCM WAV to ((n, ch) int16 array, sample_rate).

    Only 16-bit integer PCM is in scope; other encodings raise
    NotImplementedError, structural corruption raises ValueError."""
    if data[:4] != RIFF_MAGIC or data[8:12] != WAVE_TAG:
        raise ValueError("not a WAV (bad RIFF/WAVE magic)")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("fmt chunk too short")
            audio_format, ch, rate, _byte_rate, block_align, bits = (
                struct.unpack("<HHIIHH", body[:16])
            )
            if audio_format != 1:
                raise NotImplementedError(
                    f"audio format {audio_format} (only integer PCM=1)"
                )
            if bits != 16:
                raise NotImplementedError(f"{bits}-bit samples (only 16)")
            if ch == 0 or block_align != ch * 2:
                raise ValueError("inconsistent fmt chunk")
            fmt = (ch, rate)
        elif tag == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt chunk")
            pcm = body
        pos += 8 + length + (length % 2)  # chunks pad to even offsets
    if fmt is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    ch, rate = fmt
    if len(pcm) % (ch * 2):
        raise ValueError("data chunk is not a whole number of frames")
    return np.frombuffer(pcm, dtype="<i2").reshape(-1, ch), rate
