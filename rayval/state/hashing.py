"""Deterministic vectorized 64-bit hashing shared by sketches and shuffles.

One hash function for the whole engine so partials computed in different
worker processes / rounds merge consistently (checkpoint/resume re-merges
serialized partials, so cross-process determinism is load-bearing).

Numeric columns hash via ``pd.util.hash_array`` (murmur-based, fixed key,
stable across processes/machines).  String/binary columns hash WITHOUT any
per-row Python objects: a wrapping-mod-2^64 polynomial over the raw Arrow
data buffer, evaluated with numpy cumsum/cumprod over the concatenated
bytes, then sliced per string via the offsets buffer and avalanched with a
splitmix64 finalizer.  O(total_bytes) vectorized work, zero ``to_pylist``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# Bump whenever hash64's output changes for ANY input (v2 = the round-2
# switch from pd.util.hash_array strings to the buffer polynomial below;
# v3 = null-bearing NUMERIC arrays hash non-nulls in native dtype with a
# null sentinel, instead of widening the whole block through float64).
# Persisted Bloom/sketch blobs embed this (state/bloom.py, stages/stats.py);
# a resume across schemes refuses to merge instead of producing silent false
# negatives.
HASH_SCHEME_VERSION = 3

# polynomial base (odd -> invertible mod 2^64) and its modular inverse
_P = np.uint64(0x100000001B3)
_P_INV = np.uint64(pow(0x100000001B3, -1, 1 << 64))
_NULL_HASH = np.uint64(0x9E3779B97F4A7C15)

# Block power tables: P^j = _HIGH[j >> 16] * _LOW[j & 0xFFFF] (mod 2^64).
# Built once at import; numpy's uint64 cumprod/np.full are slow at tens of
# millions of elements, so per-call power series are assembled from these
# 64Ki-entry blocks with one outer product instead of a data-length cumprod.
_BLOCK = 1 << 16


def _pow_table(base: np.uint64, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    out[0] = 1
    with np.errstate(over="ignore"):
        np.cumprod(np.full(n - 1, base, dtype=np.uint64), out=out[1:])
    return out


_LOW = _pow_table(_P, _BLOCK)
_ILOW = _pow_table(_P_INV, _BLOCK)
with np.errstate(over="ignore"):
    _P_BLOCK = np.uint64(_LOW[-1] * _P)
    _IP_BLOCK = np.uint64(_ILOW[-1] * _P_INV)


def _splitmix(z: np.ndarray) -> np.ndarray:
    z = (z + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


# Row-chunk the buffer pass: this host (like many cloud VMs) falls off a
# memory-bandwidth cliff on >~10M-element uint64 temporaries (50M-element
# multiply measured 100x slower per element than 4M).  Chunking keeps every
# temporary cache-/TLB-friendly; per-string hashes are position-normalized so
# chunk boundaries are invisible in the output.
_CHUNK_BYTES = 4 << 20


def _hash_string_array(arr: pa.Array) -> np.ndarray:
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    large = pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)
    off_dtype = np.int64 if large else np.int32
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype, count=n + 1 + arr.offset)[arr.offset :]
    total = int(offsets[-1]) - int(offsets[0])
    if total <= _CHUNK_BYTES:
        return _hash_string_chunk(arr)
    # split on row boundaries at ~_CHUNK_BYTES of data each
    out = np.empty(n, dtype=np.uint64)
    row = 0
    while row < n:
        target = int(offsets[row]) + _CHUNK_BYTES
        nxt = int(np.searchsorted(offsets, target, side="left"))
        nxt = max(nxt, row + 1)
        nxt = min(nxt, n)
        out[row:nxt] = _hash_string_chunk(arr.slice(row, nxt - row))
        row = nxt
    return out


def _hash_string_chunk(arr: pa.Array) -> np.ndarray:
    """uint64[n] over a string/large_string/binary/large_binary Array.

    For string i spanning data[a:b): h = sum_j data[j] * P^(j-a)  (mod 2^64)
    computed as (S[b] - S[a]) * P^-a from ONE pass over the data buffer:
      S[j]  = cumsum(data[:j] * P^positions)   (wrapping)
      P^-a  gathered from a cumprod table of the inverse base (P odd ->
      invertible mod 2^64), so every string is hashed as if it started at
      position 0 — no per-row loop, no python objects.
    """
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    large = pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)
    off_dtype = np.int64 if large else np.int32
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype, count=n + 1 + arr.offset)[arr.offset :]
    base = int(offsets[0])  # rebase so a slice only touches its own bytes
    starts = offsets[:-1].astype(np.int64) - base
    ends = offsets[1:].astype(np.int64) - base
    n_bytes = int(ends[-1])
    lens = (ends - starts).astype(np.uint64)

    with np.errstate(over="ignore"):
        if n_bytes:
            data = np.frombuffer(arr.buffers()[2], dtype=np.uint8, count=n_bytes, offset=base).astype(np.uint64)
            hi_n = (n_bytes >> 16) + 1
            high = _pow_table(_P_BLOCK, hi_n + 1)
            ihigh = _pow_table(_IP_BLOCK, hi_n + 1)
            # P^j for j in [0, n_bytes): outer product of the block tables
            pw = (high[:hi_n, None] * _LOW[None, :]).ravel()[:n_bytes]
            s = np.empty(n_bytes + 1, dtype=np.uint64)
            s[0] = 0
            np.cumsum(data * pw, out=s[1:])
            # P^-start gathered per string (starts <= n_bytes, incl. the
            # empty/null-final-element case start == n_bytes)
            ipw_s = ihigh[starts >> 16] * _ILOW[starts & (_BLOCK - 1)]
            seg = (s[ends] - s[starts]) * ipw_s
        else:
            seg = np.zeros(n, dtype=np.uint64)
        h = _splitmix(seg ^ (lens * np.uint64(0xC2B2AE3D27D4EB4F)))
    if arr.null_count:
        h[arr.is_null().to_numpy(zero_copy_only=False)] = _NULL_HASH
    return h


def window_hashes(codes: np.ndarray, k: int) -> np.ndarray:
    """uint64 hashes of ALL length-k sliding windows of ``codes`` (uint64
    code units, e.g. UTF-32 codepoints) — the same polynomial/segment scheme
    as :func:`_hash_string_chunk`, so every window hashes as if it started at
    position 0.  Returns ``len(codes) - k + 1`` hashes (empty if shorter).

    Used by the vectorized MinHash shingler: one pass over the concatenated
    corpus instead of per-document substring loops.
    """
    n = len(codes)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    n_win = n - k + 1
    out = np.empty(n_win, dtype=np.uint64)
    step = max(k, _CHUNK_BYTES // 8)
    pos = 0
    with np.errstate(over="ignore"):
        while pos < n_win:
            hi = min(pos + step, n_win)
            seg_codes = codes[pos : hi + k - 1].astype(np.uint64, copy=False)
            m = len(seg_codes)
            hi_n = (m >> 16) + 1
            high = _pow_table(_P_BLOCK, hi_n + 1)
            ihigh = _pow_table(_IP_BLOCK, hi_n + 1)
            pw = (high[:hi_n, None] * _LOW[None, :]).ravel()[:m]
            s = np.empty(m + 1, dtype=np.uint64)
            s[0] = 0
            np.cumsum(seg_codes * pw, out=s[1:])
            starts = np.arange(hi - pos, dtype=np.int64)
            ipw_s = ihigh[starts >> 16] * _ILOW[starts & (_BLOCK - 1)]
            seg = (s[starts + k] - s[starts]) * ipw_s
            out[pos:hi] = _splitmix(seg ^ (np.uint64(k) * np.uint64(0xC2B2AE3D27D4EB4F)))
            pos = hi
    return out


def hash64(values) -> np.ndarray:
    """uint64[n] deterministic hash of an arrow/numpy/list column."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        t = values.type
        if (
            pa.types.is_string(t)
            or pa.types.is_large_string(t)
            or pa.types.is_binary(t)
            or pa.types.is_large_binary(t)
        ):
            return _hash_string_array(values)
        if values.null_count:
            # hash the NON-NULL values in their NATIVE dtype and give null
            # slots a fixed sentinel.  The old to_numpy(zero_copy_only=False)
            # on a null-bearing int64 column silently widened EVERY value to
            # float64, so (a) the same key hashed differently depending on
            # whether its batch happened to contain a null — matching rows
            # landed in different buckets and hash-partitioned joins missed
            # them — and (b) int64 keys > 2^53 collapsed onto shared floats.
            valid = values.is_valid().to_numpy(zero_copy_only=False)
            out = np.full(len(values), _NULL_HASH, dtype=np.uint64)
            nn = values.drop_null().to_numpy(zero_copy_only=False)
            if nn.dtype == object:
                # type=pa.string() matches the dense object path below: for
                # non-str objects (e.g. decimal128) pa.array would otherwise
                # infer a non-string type and _hash_string_array would misread
                # its buffers as string offsets — silent garbage where the
                # dense path raises loudly, and the same column hashing
                # differently depending on whether a batch contains a null
                out[valid] = _hash_string_array(pa.array(nn, type=pa.string()))
            else:
                out[valid] = pd.util.hash_array(nn)
            return out
        arr = values.to_numpy(zero_copy_only=False)
    else:
        arr = np.asarray(values)
    if arr.dtype == object:
        # list-of-python-str path (tests, tiny driver-side inputs): route
        # through Arrow so python and arrow inputs hash identically
        return _hash_string_array(pa.array(arr, type=pa.string()))
    return pd.util.hash_array(arr)


def rehash(h: np.ndarray, salt: int) -> np.ndarray:
    """Cheap second hash family: splitmix64 finalizer over h ^ salt."""
    z = (h ^ np.uint64(salt)) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))
