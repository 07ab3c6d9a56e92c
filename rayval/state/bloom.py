"""Bloom filters — the broadcast small-side of the referential-integrity join
(north_rule: "broadcast Bloom-filter join with explicit hash-partitioned
shuffle").  Built as mergeable per-batch partials (bitwise OR), broadcast once
via ``ray.put``, probed vectorized inside ``map_batches``.

No false negatives: an id NOT in the filter is definitely not a member —
those rows are immediate violations.  Positives may be false, so they go to
the exact hash-partitioned anti-join stage (stages/referential.py).

Two shapes:

- ``Bloom``: one flat filter — right when ``n_expected`` fits one blob
  (small dimension tables, per-group partials at test scale).
- ``ShardedBloom``: the 10^12-key shape — the key space splits into
  ``n_shards`` buckets by the SAME ``hash64(id) % B`` the referential join
  shuffles on, each shard an independent Bloom sized ``n_expected / B``.
  A per-batch partial touches (and serializes) only the shards its rows hash
  to, so partial-blob volume is bounded by batch contents, not by
  ``n_expected`` — a single monolithic filter at 10^12 keys / 1% fpp would be
  ~1.2 TB per partial, unbuildable.  Probe tasks fetch only the shards their
  rows' buckets name (``shard_blob_refs`` + per-shard ``ray.get``), and the
  per-bucket exact-verify task needs exactly one shard.

Persistence is VERSION-STAMPED: every blob carries a magic + the hash-scheme
version (state/hashing.py:HASH_SCHEME_VERSION).  Checkpoint/resume re-merges
serialized partials across engine versions, and a filter built under a
different string-hash scheme would merge silently into false NEGATIVES —
deserialization refuses instead.
"""

from __future__ import annotations

import struct

import numpy as np

from rayval.state.hashing import HASH_SCHEME_VERSION, hash64, rehash

_BLOOM_MAGIC = b"RVBF"
_SHARDED_MAGIC = b"RVSB"
# decorrelates in-shard bit positions from the shard-selection residue
# (shard = h % B constrains h's low bits; positions reuse h, so without a
# rehash the first probe position would only ever land on 1/B of the bits)
_SHARD_SALT = 0x5A4D


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
        return (
            _BLOOM_MAGIC
            + bytes([HASH_SCHEME_VERSION])
            + self.k.to_bytes(2, "little")
            + self.bits.tobytes()
        )

    @classmethod
    def from_bytes(cls, b: bytes, writable: bool = True) -> "Bloom":
        """``writable=False`` skips the buffer copy — right for probe-only
        deserialization inside map_batches (contains never mutates; merge on a
        read-only filter raises)."""
        _check_header(b, _BLOOM_MAGIC, "Bloom")
        k = int.from_bytes(b[5:7], "little")
        bits = np.frombuffer(b[7:], dtype=np.uint64)
        return cls(0, bits=bits.copy() if writable else bits, k=k)


class ShardedBloom:
    """``n_shards`` independent Blooms keyed by ``hash64(id) % n_shards`` —
    the referential join's bucket hash, so shard i IS bucket i's filter.
    Shards allocate lazily on first touch; ``to_bytes`` serializes only
    touched shards (per-batch partial blobs scale with the batch, not with
    ``n_expected``)."""

    __slots__ = ("n_shards", "shard_capacity", "fpp", "shards")

    def __init__(self, n_expected: int, fpp: float = 0.01, n_shards: int = 32,
                 shards: dict[int, Bloom] | None = None):
        self.n_shards = int(n_shards)
        self.shard_capacity = max(64, -(-int(n_expected) // self.n_shards))
        self.fpp = fpp
        self.shards: dict[int, Bloom] = shards if shards is not None else {}

    def _shard(self, sid: int) -> Bloom:
        b = self.shards.get(sid)
        if b is None:
            b = self.shards[sid] = Bloom(self.shard_capacity, self.fpp)
        return b

    def add_hashed(self, h: np.ndarray) -> "ShardedBloom":
        h = h.astype(np.uint64, copy=False)
        sids = (h % np.uint64(self.n_shards)).astype(np.int64)
        hh = rehash(h, _SHARD_SALT)
        for sid in np.unique(sids):
            self._shard(int(sid)).add_hashed(hh[sids == sid])
        return self

    def add(self, values) -> "ShardedBloom":
        return self.add_hashed(hash64(values))

    def contains_hashed(self, h: np.ndarray) -> np.ndarray:
        h = h.astype(np.uint64, copy=False)
        out = np.zeros(len(h), dtype=bool)
        sids = (h % np.uint64(self.n_shards)).astype(np.int64)
        hh = rehash(h, _SHARD_SALT)
        for sid in np.unique(sids):
            b = self.shards.get(int(sid))
            if b is not None:
                m = sids == sid
                out[m] = b.contains_hashed(hh[m])
        return out

    def contains(self, values) -> np.ndarray:
        return self.contains_hashed(hash64(values))

    def merge(self, other: "ShardedBloom") -> "ShardedBloom":
        assert self.n_shards == other.n_shards, (self.n_shards, other.n_shards)
        for sid, b in other.shards.items():
            mine = self.shards.get(sid)
            if mine is None:
                self.shards[sid] = Bloom(0, bits=b.bits.copy(), k=b.k)
            else:
                mine.merge(b)
        return self

    def to_bytes(self) -> bytes:
        parts = [
            _SHARDED_MAGIC,
            bytes([HASH_SCHEME_VERSION]),
            struct.pack("<IQ", self.n_shards, self.shard_capacity),
            struct.pack("<I", len(self.shards)),
        ]
        for sid in sorted(self.shards):
            blob = self.shards[sid].to_bytes()
            parts.append(struct.pack("<II", sid, len(blob)))
            parts.append(blob)
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, b: bytes) -> "ShardedBloom":
        _check_header(b, _SHARDED_MAGIC, "ShardedBloom")
        n_shards, cap = struct.unpack_from("<IQ", b, 5)
        (n_entries,) = struct.unpack_from("<I", b, 17)
        out = cls(cap * n_shards, n_shards=n_shards)
        pos = 21
        for _ in range(n_entries):
            sid, blen = struct.unpack_from("<II", b, pos)
            pos += 8
            out.shards[sid] = Bloom.from_bytes(b[pos : pos + blen])
            pos += blen
        return out

    # -- distributed probe plumbing -------------------------------------------
    def shard_blobs(self) -> dict[int, bytes]:
        """{shard_id: serialized shard} — callers ``ray.put`` each blob
        separately so probe tasks fetch only the buckets their rows name."""
        return {sid: b.to_bytes() for sid, b in self.shards.items()}


def shard_probe_hash(h: np.ndarray) -> np.ndarray:
    """The in-shard probe hash for already-``hash64``ed values — what
    ``ShardedBloom`` feeds each shard's ``contains_hashed``.  Exposed so a
    probe task that fetched a single shard blob can probe it directly."""
    return rehash(h.astype(np.uint64, copy=False), _SHARD_SALT)


def bloom_from_bytes(b: bytes):
    """Deserialize either filter shape by magic (checkpoint files may hold
    whichever the run's config chose)."""
    if b[:4] == _SHARDED_MAGIC:
        return ShardedBloom.from_bytes(b)
    return Bloom.from_bytes(b)


def _check_header(b: bytes, magic: bytes, what: str) -> None:
    if len(b) < 5 or b[:4] != magic:
        raise ValueError(
            f"not a version-stamped {what} blob (pre-versioning checkpoint or "
            "foreign data) — recompute the partial instead of merging it"
        )
    ver = b[4]
    if ver != HASH_SCHEME_VERSION:
        raise ValueError(
            f"{what} blob was built under hash scheme v{ver}, this engine is "
            f"v{HASH_SCHEME_VERSION}: merging would produce false negatives — "
            "recompute the partial"
        )
