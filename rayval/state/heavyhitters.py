"""Misra-Gries — mergeable heavy-hitters (frequent items) summary.

The north_star's sketch family (HLL uniqueness, KLL/t-digest quantiles) covers
"how many distinct / how are values distributed"; this adds "WHICH keys are
hot" — the input every skew defense in this repo wants (``bucket_join(
hot_keys=...)`` salted probes, ``dedup.py``'s hot-bucket bypass, LSH hot-cap
tuning).  At 10^12 rows the exact answer is a full groupby; a Misra-Gries
summary finds every key with frequency > n/(k+1) in ONE map-only pass with
fixed-size mergeable partials.

Guarantees (classic MG + the Agarwal et al. "Mergeable Summaries" merge):
- at most ``k`` counters survive at any time;
- for every tracked key: ``est <= true_count <= est + deducted`` where
  ``deducted`` is the summary's cumulative decrement (tracked exactly);
- ``deducted <= n/(k+1)``, so every key with true frequency > n/(k+1) is
  guaranteed to be present;
- if the stream's distinct-key count never exceeds ``k``, no decrement ever
  fires and every estimate is EXACT (the planted-oracle device, same as
  HLL's linear-counting range in ``grouped_distinct``).

Merge rule: sum counters key-wise, then if more than ``k`` survive, subtract
the (k+1)-th largest count from all and drop the non-positive — associative
in the error bound (deducted adds), so partial summaries from map_batches
tasks combine safely in any tree shape.

Keys are stored RAW (no hashing), so blobs are pickled with their own magic +
format version rather than the hash-scheme stamp used by the hashing sketches.
"""

from __future__ import annotations

import pickle

import numpy as np

_MAGIC = b"RVMG"
_VERSION = 1


class MisraGries:
    __slots__ = ("k", "counters", "n", "deducted")

    def __init__(self, k: int = 64):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.counters: dict = {}
        self.n = 0          # total stream weight seen
        self.deducted = 0   # cumulative decrement: est <= true <= est + deducted

    # -- updates ---------------------------------------------------------
    def update(self, values) -> "MisraGries":
        """Absorb a batch of values. Vectorized pre-aggregation: one
        ``np.unique`` collapses the batch to (value, count) pairs, so the
        Python dict loop runs over the batch's DISTINCT keys, not its rows."""
        arr = np.asarray(values)
        if arr.size == 0:
            return self
        uniq, counts = np.unique(arr, return_counts=True)
        return self.update_weighted(uniq.tolist(), counts.tolist())

    def update_weighted(self, keys, weights) -> "MisraGries":
        """Absorb pre-aggregated (key, weight) pairs (weights > 0)."""
        c = self.counters
        for key, w in zip(keys, weights):
            w = int(w)
            self.n += w
            c[key] = c.get(key, 0) + w
        self._shrink()
        return self

    def _shrink(self) -> None:
        # batched MG decrement: subtract the (k+1)-th largest count from all
        # counters and drop the non-positive — equivalent to repeating the
        # textbook one-at-a-time decrement, but one pass per batch
        if len(self.counters) <= self.k:
            return
        counts = np.fromiter(self.counters.values(), dtype=np.int64)
        # (k+1)-th largest = the largest count that must reach zero
        m = int(np.partition(counts, len(counts) - self.k - 1)[len(counts) - self.k - 1])
        self.deducted += m
        self.counters = {key: v - m for key, v in self.counters.items() if v > m}

    # -- merge (Agarwal et al.) -------------------------------------------
    def merge(self, other: "MisraGries") -> "MisraGries":
        if self.k != other.k:
            raise ValueError(f"cannot merge MisraGries(k={self.k}) with k={other.k}")
        c = self.counters
        for key, v in other.counters.items():
            c[key] = c.get(key, 0) + v
        self.n += other.n
        self.deducted += other.deducted
        self._shrink()
        return self

    # -- queries -----------------------------------------------------------
    def items(self) -> list[tuple]:
        """(key, lower-bound estimate) pairs, largest first; ties broken by
        str(key) so the output is deterministic for oracle comparison even
        when keys are mixed-type after a merge.  Note str-order differs from
        numeric order on tied integer keys ("10" < "2") — consumers slicing
        top-N at a tie boundary should re-sort in their key's native order."""
        return sorted(self.counters.items(), key=lambda kv: (-kv[1], str(kv[0])))

    def error_bound(self) -> int:
        """Exact upper bound on (true_count - estimate) for any tracked key;
        also an upper bound on the true count of any UNtracked key."""
        return self.deducted

    # -- serialization (checkpointable) ------------------------------------
    def to_bytes(self) -> bytes:
        payload = (self.k, self.counters, self.n, self.deducted)
        return _MAGIC + bytes([_VERSION]) + pickle.dumps(payload)

    @classmethod
    def from_bytes(cls, b: bytes) -> "MisraGries":
        if b[:4] != _MAGIC:
            raise ValueError("not a MisraGries blob (bad magic)")
        if b[4] != _VERSION:
            raise ValueError(f"MisraGries blob v{b[4]} != supported v{_VERSION}")
        k, counters, n, deducted = pickle.loads(b[5:])
        mg = cls(k)
        mg.counters, mg.n, mg.deducted = counters, n, deducted
        return mg
