"""HyperLogLog — mergeable distinct-count sketch for per-partition uniqueness
stats (image_id / phash cardinality, north_star: "HyperLogLog uniqueness
sketches"). Standard HLL (Flajolet et al.) with linear-counting correction for
the small range; registers merge by elementwise max, so partial sketches from
map_batches tasks combine associatively — safe for partial+final aggregation
and for re-merging serialized partials on checkpoint resume.
"""

from __future__ import annotations

import numpy as np

from rayval.state.hashing import hash64


class HLL:
    __slots__ = ("p", "m", "regs")

    def __init__(self, p: int = 12, regs: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.regs = regs if regs is not None else np.zeros(self.m, dtype=np.uint8)

    def add_hashed(self, h: np.ndarray) -> "HLL":
        h = h.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1)  # sentinel bit caps rho at 64-p
        # vectorized leading-zero count: 63 - floor(log2(x)); the float64
        # mantissa is exact for the top bits that matter here, and the sentinel
        # guarantees x != 0
        lz = np.clip(63 - np.floor(np.log2(rest.astype(np.float64))), 0, 63).astype(np.uint8)
        np.maximum.at(self.regs, idx, lz + 1)
        return self

    def add(self, values) -> "HLL":
        return self.add_hashed(hash64(values))

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        np.maximum(self.regs, other.regs, out=self.regs)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-self.regs.astype(np.float64)))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.regs == 0))
            if zeros:
                est = m * np.log(m / zeros)
        return float(est)

    # -- serialization (checkpointable) ---------------------------------------
    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.regs.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HLL":
        p = b[0]
        return cls(p, np.frombuffer(b[1:], dtype=np.uint8).copy())
