"""Audio fingerprinting for near-duplicate clip detection — the
audio sibling of :mod:`flink_realtime_edu_spark.multimodal.phash`
(X8↔X5 bridge, round 8).

A chromaprint-style acoustic fingerprint reduced to INTEGER-ONLY
arithmetic so a SQL oracle replays every bit: the clip is cut into
``N_FRAMES`` equal frames, each frame's ENERGY is the exact int64 sum
of squared 16-bit samples, and bit i is set iff frame i+1 carries
more energy than frame i — the energy-delta sign profile, robust to
uniform gain changes in sign (a scaled clip keeps the same profile)
and exactly reproducible from an analytic waveform. 63 bits, so the
hash never touches a BIGINT's sign bit in either engine.

Pairing reuses the SimHash pigeonhole Hamming banding
(operators/dedup.py::simhash_near_duplicates): ``max_hamming + 1``
chunks, bucket-join, exact bit_count verify — never all-pairs.

100 TB shape: fingerprinting is per-row work inside Arrow batches
(one decode + one reshape-sum per clip); only the 8-byte fingerprint
enters the shuffle.
"""

from __future__ import annotations

import numpy as np

N_FRAMES = 64  # energy frames per clip
FP_BITS = N_FRAMES - 1  # consecutive-frame deltas


def audio_fingerprint63(samples: np.ndarray) -> int:
    """63-bit energy-delta fingerprint of a mono int16 clip whose
    length is a multiple of ``N_FRAMES`` (whole frames — the codec
    queries synthesize exact multiples; real pipelines pad/trim)."""
    n = samples.shape[0]
    if n % N_FRAMES:
        raise ValueError(
            f"clip length must be a multiple of {N_FRAMES}, got {n}"
        )
    s = samples.astype(np.int64).reshape(N_FRAMES, n // N_FRAMES)
    energy = (s * s).sum(axis=1)  # exact int64: 2^31 * frame_len
    bits = energy[1:] > energy[:-1]
    return int(sum(1 << i for i in range(FP_BITS) if bits[i]))
