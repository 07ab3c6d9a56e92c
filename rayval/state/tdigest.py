"""t-digest quantile sketch — the second mergeable quantile family the
north_star names ("KLL/t-digest quantile sketches for distribution-drift
detection").  KLL (state/kll.py) is the default engine sketch; the t-digest
is the tail-accurate alternative: centroid capacity shrinks toward q→0/1
under the k1 scale function, so extreme percentiles (p99.9 latency-style
checks) carry proportionally more resolution than the uniform-rank KLL.

Merging-digest design after Dunning & Ertl ("Computing extremely accurate
quantiles using t-digests", 2019, public arXiv/implementation notes): a
digest is a mean-sorted list of (mean, weight) centroids; ``add``/``merge``
concatenate points/centroids, sort by mean, and re-cluster greedily
left-to-right under the k1 (arcsine) scale function — a centroid closes when
absorbing the next item would push ``k1(q_right) - k1(q_left)`` past 1,
which bounds the digest at ~δ centroids regardless of n (the fixed-size-blob
property partial aggregation needs).  DETERMINISTIC in the checkpoint sense:
no RNG anywhere, so the same sequence of add/merge calls over the same
inputs reproduces bit-identically — re-merging SAVED partials in a pinned
order (grouped_quantiles_sketch sorts blobs first) always agrees with the
original run.  Like every t-digest, estimates are NOT batch-split
invariant: add(all) and add(a).merge(add(b)) are different (equally valid)
clusterings, so resume-by-re-reading-rows under different block boundaries
may shift estimates within the error envelope — resume from the serialized
partials, not the rows.

Quantile query interpolates between adjacent centroid means with the usual
half-weight convention; min/max are tracked exactly and pin the tails.
"""

from __future__ import annotations

import pickle

import numpy as np


class TDigest:
    def __init__(self, delta: int = 100):
        self.delta = int(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.n = 0
        self.min = np.inf
        self.max = -np.inf

    # ---------------------------------------------------------------- build
    def add(self, values) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.n += int(v.size)
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self._cluster(np.concatenate([self.means, v]),
                      np.concatenate([self.weights, np.ones(v.size)]))
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        if other.n == 0:
            return self
        if self.delta != other.delta:
            raise ValueError(f"t-digest delta mismatch: {self.delta} vs {other.delta}")
        self.n += other.n
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._cluster(np.concatenate([self.means, other.means]),
                      np.concatenate([self.weights, other.weights]))
        return self

    def _k1(self, q: float) -> float:
        """The k1 scale: δ/(2π)·asin(2q−1).  Its derivative blows up at the
        ends, so per-centroid rank-width shrinks toward q→0/1 (tail
        resolution) while the total k-range is exactly δ/2 — one unit of k
        per centroid bounds the digest at ~δ/2..δ centroids."""
        return self.delta / (2.0 * np.pi) * float(np.arcsin(2.0 * min(max(q, 0.0), 1.0) - 1.0))

    def _cluster(self, means: np.ndarray, weights: np.ndarray) -> None:
        """Greedy left-to-right re-cluster: merge while the prospective
        centroid stays within one k1 unit of its left rank boundary."""
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        out_m: list[float] = []
        out_w: list[float] = []
        acc_m, acc_w, seen = means[0], weights[0], 0.0
        k_lo = self._k1(0.0)
        for m, w in zip(means[1:], weights[1:]):
            q_new = (seen + acc_w + w) / total
            if self._k1(q_new) - k_lo <= 1.0:
                acc_m += (m - acc_m) * (w / (acc_w + w))  # running weighted mean
                acc_w += w
            else:
                out_m.append(acc_m)
                out_w.append(acc_w)
                seen += acc_w
                k_lo = self._k1(seen / total)
                acc_m, acc_w = m, w
        out_m.append(acc_m)
        out_w.append(acc_w)
        self.means = np.asarray(out_m, dtype=np.float64)
        self.weights = np.asarray(out_w, dtype=np.float64)

    # ---------------------------------------------------------------- query
    def quantile(self, q: float) -> float:
        if self.n == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        q = min(max(float(q), 0.0), 1.0)
        total = self.weights.sum()
        target = q * total
        # cumulative rank at each centroid's MIDPOINT (half-weight convention)
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            # interpolate from the exact min into the first centroid
            t = target / max(cum[0], 1e-12)
            return float(self.min + t * (self.means[0] - self.min))
        if target >= cum[-1]:
            t = (target - cum[-1]) / max(total - cum[-1], 1e-12)
            return float(self.means[-1] + t * (self.max - self.means[-1]))
        i = int(np.searchsorted(cum, target, side="right")) - 1
        span = cum[i + 1] - cum[i]
        t = (target - cum[i]) / max(span, 1e-12)
        return float(self.means[i] + t * (self.means[i + 1] - self.means[i]))

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    # ------------------------------------------------------------- serialize
    def to_bytes(self) -> bytes:
        return pickle.dumps(
            {"v": 1, "delta": self.delta, "means": self.means, "weights": self.weights,
             "n": self.n, "min": self.min, "max": self.max}
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        d = pickle.loads(b)
        if d.get("v") != 1:
            raise ValueError(f"unsupported t-digest blob version {d.get('v')!r}")
        out = cls(delta=d["delta"])
        out.means, out.weights = d["means"], d["weights"]
        out.n, out.min, out.max = d["n"], d["min"], d["max"]
        return out
