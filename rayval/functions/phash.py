"""Perceptual hash (average-hash, 64-bit) over decoded pixels.

Used for: (a) the ``phash`` column of the synthetic images table, (b) the
decode stage's phash-recompute cross-check, (c) exact-duplicate detection
(north_star: "every pHash duplicate flagged") where hot buckets get
skew-aware handling (stages/dedup.py).

Average-hash: downsample the grayscale image to 8x8 by grid sampling, set
bit i iff cell i is above the mean.  Returned as int64 (the uint64 bit
pattern reinterpreted, matching the Arrow int64 column type).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


@lru_cache(maxsize=8192)
def _grid(h: int, w: int):
    """Cached 8x8 sample-grid indexer per image size — linspace+ix_ per call
    was a measurable slice of the decode actor's per-image time."""
    ys = np.linspace(0, h - 1, 8).round().astype(int)
    xs = np.linspace(0, w - 1, 8).round().astype(int)
    return np.ix_(ys, xs)


def phash64(pixels: np.ndarray) -> int:
    """(h, w, 3) uint8 -> int64 average-hash.

    Samples the 8x8 grid FIRST, then grayscales just those 64 pixels —
    bit-identical to grayscaling the whole image (same pixels, same float32
    channel mean) at ~1/100th the work for typical sizes."""
    h, w = pixels.shape[0], pixels.shape[1]
    cells = pixels[_grid(h, w)].astype(np.float32).mean(axis=2)
    bits = (cells > cells.mean()).ravel()
    packed = np.packbits(bits, bitorder="little")  # bit i -> 1 << i
    return int(packed.view(np.uint64)[0].astype(np.int64))


def hamming64(a: np.ndarray, b: int) -> np.ndarray:
    """Vectorized hamming distance between an int64 column and one hash."""
    x = np.asarray(a, dtype=np.int64).view(np.uint64) ^ np.uint64(b & 0xFFFFFFFFFFFFFFFF)
    return _popcount64(x)


def _popcount64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    out = np.zeros(x.shape, dtype=np.int64)
    for shift in range(0, 64, 8):
        out += _POP8[(x >> np.uint64(shift)) & np.uint64(0xFF)]
    return out


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)
