"""Bloom filter — the broadcast small-side of the referential-integrity join
(north_rule: "broadcast Bloom-filter join with explicit hash-partitioned
shuffle").  Built as mergeable per-batch partials (bitwise OR), broadcast once
via ``ray.put``, probed vectorized inside ``map_batches``.

No false negatives: an id NOT in the filter is definitely not a member —
those rows are immediate violations.  Positives may be false, so they go to
the exact hash-partitioned anti-join stage (stages/referential.py).
"""

from __future__ import annotations

import numpy as np

from rayval.state.hashing import hash64, rehash


class Bloom:
    __slots__ = ("m", "k", "bits")

    def __init__(self, n_expected: int, fpp: float = 0.01, bits: np.ndarray | None = None, k: int | None = None):
        if bits is not None:
            self.bits = bits
            self.m = len(bits) * 64
            self.k = k or 7
            return
        m = max(64, int(-n_expected * np.log(fpp) / (np.log(2) ** 2)))
        self.m = ((m + 63) // 64) * 64
        self.k = max(1, int(round(self.m / max(1, n_expected) * np.log(2))))
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        """(k, n) bit positions via double hashing h1 + i*h2."""
        h1 = h.astype(np.uint64, copy=False)
        h2 = rehash(h1, 0xB10053)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m)).astype(np.int64)

    def add_hashed(self, h: np.ndarray) -> "Bloom":
        pos = self._positions(h).ravel()
        np.bitwise_or.at(self.bits, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
        return self

    def add(self, values) -> "Bloom":
        return self.add_hashed(hash64(values))

    def contains_hashed(self, h: np.ndarray) -> np.ndarray:
        pos = self._positions(h)
        word = self.bits[pos >> 6]
        bit = (word >> (pos & 63).astype(np.uint64)) & np.uint64(1)
        return bit.all(axis=0)

    def contains(self, values) -> np.ndarray:
        return self.contains_hashed(hash64(values))

    def merge(self, other: "Bloom") -> "Bloom":
        assert self.m == other.m and self.k == other.k
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    def to_bytes(self) -> bytes:
        return self.k.to_bytes(2, "little") + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "Bloom":
        k = int.from_bytes(b[:2], "little")
        return cls(0, bits=np.frombuffer(b[2:], dtype=np.uint64).copy(), k=k)
