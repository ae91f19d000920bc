"""Perceptual image hashing (pHash) — the multimodal↔dedup bridge
(VERDICT r7 item 6): decode → pool → DCT → median-threshold → 63-bit
hash, then Hamming-banded bucketing via the SimHash pigeonhole
machinery (operators/dedup.py::simhash_near_duplicates).

The classic pHash recipe (resize, 2D DCT-II, keep the low-frequency
8×8 block, threshold at the median) is re-derived here INTEGER-ONLY so
a SQL oracle can replay every bit:

- pooling is a floor-mean over f×f cells (no resampling kernels);
- the DCT basis is the scaled integer matrix
  ``B[u][x] = round(cos((2x+1)·u·π/64) · 2^14)`` for u ∈ 0..7,
  x ∈ 0..31 — precomputed ONCE here and embedded verbatim in the
  DuckDB oracle (one source of truth, no engine-side cosine);
- coefficients ``C = B · pooled · Bᵀ`` are exact int64 (|C| ≤
  255·32² · 2^28 < 2^63);
- the threshold is the DISCRETE lower median (32nd smallest of the 63
  AC values — the value at rank 32, which every engine agrees on
  regardless of tie ordering);
- bit ``8u+v−1`` is set iff ``C[u][v] > median`` (the DC coefficient
  (0,0) is excluded, so the hash occupies bits 0..62 and never
  touches a BIGINT's sign bit in either engine).

100 TB shape: hashing is per-row work inside Arrow batches (decode +
two 8×32 integer matmuls per image); candidate pairs come from the
pigeonhole banding — ``max_hamming + 1`` chunks, bucket-join, exact
bit_count verify — so the all-pairs product never materializes,
exactly like the text SimHash path it reuses.
"""

from __future__ import annotations

import math

import numpy as np

PHASH_POOLED = 32  # pooled image edge
PHASH_DCT = 8      # retained low-frequency block edge
PHASH_BITS = PHASH_DCT * PHASH_DCT - 1  # DC excluded
_SCALE = 1 << 14

#: int64 [8][32] scaled DCT-II basis — the single source of truth for
#: both the numpy kernel and the SQL oracle (see ``basis_sql_rows``).
DCT_BASIS = np.array(
    [
        [
            round(math.cos((2 * x + 1) * u * math.pi / 64) * _SCALE)
            for x in range(PHASH_POOLED)
        ]
        for u in range(PHASH_DCT)
    ],
    dtype=np.int64,
)


def phash63(gray: np.ndarray) -> int:
    """63-bit perceptual hash of an (H, W) uint8 grayscale image with
    H and W multiples of 32 (integer pooling needs whole cells)."""
    h, w = gray.shape
    if h % PHASH_POOLED or w % PHASH_POOLED:
        raise ValueError(f"image sides must be multiples of 32, got {h}x{w}")
    fy, fx = h // PHASH_POOLED, w // PHASH_POOLED
    pooled = (
        gray.astype(np.int64)
        .reshape(PHASH_POOLED, fy, PHASH_POOLED, fx)
        .sum(axis=(1, 3))
        // (fy * fx)
    )
    coeff = DCT_BASIS @ pooled @ DCT_BASIS.T  # exact int64
    ac = coeff.reshape(-1)[1:]  # drop DC, 63 values in (u,v) order
    med = int(np.sort(ac)[PHASH_BITS // 2])  # rank 32 of 63
    bits = ac > med
    return int(sum(1 << i for i in range(PHASH_BITS) if bits[i]))


def basis_sql_rows() -> str:
    """The DCT basis as SQL VALUES rows ``(u, x, b)`` — embed in a
    ``basis(u, x, b) AS (VALUES …)`` CTE so the oracle multiplies the
    IDENTICAL integers the numpy kernel uses."""
    return ",\n".join(
        f"({u}, {x}, {int(DCT_BASIS[u, x])})"
        for u in range(PHASH_DCT)
        for x in range(PHASH_POOLED)
    )
