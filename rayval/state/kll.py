"""KLL quantile sketch — mergeable, serializable; powers distribution-drift
checks (north_star: "KLL/t-digest quantile sketches for distribution-drift
detection against a reference profile").

Compactor-array design after Karnin–Lang–Liberty (FOCS'16; see PAPERS.md
"KLL±" and the EDBT'23 quantile-sketch survey): level ℓ holds items with
weight 2^ℓ; when a level overflows, sort it and keep every other item,
promoting survivors one level up.  Offset parity is drawn from a
deterministic counter-seeded RNG so runs (and checkpoint resumes) reproduce
bit-identically while staying unbiased across compactions.

Merge = concatenate levels, then compact down to capacity — associative
enough for partial+final aggregation (each worker sketches its batches, the
driver merges partials).
"""

from __future__ import annotations

import pickle
from typing import Optional, Sequence

import numpy as np

_CAP_RATIO = 2.0 / 3.0


class KLL:
    def __init__(self, k: int = 200, seed: int = 42):
        self.k = k
        self.seed = seed
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self.min = np.inf
        self.max = -np.inf
        self._compactions = 0

    # -- capacity of level i (higher levels larger; geometric decay downward) --
    def _cap(self, lvl: int) -> int:
        depth = len(self.levels) - lvl - 1
        return max(2, int(np.ceil(self.k * (_CAP_RATIO**depth))))

    def add(self, values: Sequence[float] | np.ndarray) -> "KLL":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.n += int(v.size)
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()
        return self

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self._cap(i):
                buf = np.sort(self.levels[i])
                rng = np.random.default_rng(self.seed + self._compactions)
                self._compactions += 1
                off = int(rng.integers(0, 2))
                kept = buf[off::2]
                self.levels[i] = np.empty(0, dtype=np.float64)
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[i + 1] = np.concatenate([self.levels[i + 1], kept])
            i += 1

    def merge(self, other: "KLL") -> "KLL":
        if other.n == 0:
            return self
        self.n += other.n
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, lv in enumerate(other.levels):
            if lv.size:
                self.levels[i] = np.concatenate([self.levels[i], lv])
        self._compress()
        return self

    def quantile(self, q: float) -> float:
        qs = self.quantiles([q])
        return qs[0]

    def quantiles(self, qs: Sequence[float]) -> list[float]:
        if self.n == 0:
            return [float("nan")] * len(qs)
        items, weights = [], []
        for lvl, lv in enumerate(self.levels):
            if lv.size:
                items.append(lv)
                weights.append(np.full(lv.size, 1 << lvl, dtype=np.int64))
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        it, wt = it[order], wt[order]
        cum = np.cumsum(wt)
        total = cum[-1]
        out = []
        for q in qs:
            if q <= 0:
                out.append(self.min)
            elif q >= 1:
                out.append(self.max)
            else:
                pos = np.searchsorted(cum, q * total, side="left")
                out.append(float(it[min(pos, len(it) - 1)]))
        return out

    def cdf(self, x: float) -> float:
        if self.n == 0:
            return float("nan")
        total = 0
        le = 0
        for lvl, lv in enumerate(self.levels):
            if lv.size:
                w = 1 << lvl
                total += lv.size * w
                le += int(np.count_nonzero(lv <= x)) * w
        return le / total

    # -- serialization ---------------------------------------------------------
    def to_bytes(self) -> bytes:
        return pickle.dumps(
            {
                "k": self.k,
                "seed": self.seed,
                "levels": self.levels,
                "n": self.n,
                "min": self.min,
                "max": self.max,
                "compactions": self._compactions,
            }
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "KLL":
        d = pickle.loads(b)
        s = cls(d["k"], d["seed"])
        s.levels = d["levels"]
        s.n = d["n"]
        s.min = d["min"]
        s.max = d["max"]
        s._compactions = d["compactions"]
        return s


def ks_distance(a: KLL, b: KLL, grid: Optional[np.ndarray] = None) -> float:
    """Kolmogorov–Smirnov-style sup |CDF_a - CDF_b| over a quantile grid —
    the drift statistic compared against a threshold (stages/stats.py)."""
    if a.n == 0 or b.n == 0:
        return float("nan")
    if grid is None:
        qs = np.linspace(0.01, 0.99, 33)
        grid = np.unique(np.concatenate([a.quantiles(qs), b.quantiles(qs)]))
    return float(max(abs(a.cdf(x) - b.cdf(x)) for x in grid))
