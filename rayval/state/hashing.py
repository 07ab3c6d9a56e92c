"""Deterministic vectorized 64-bit hashing shared by sketches and shuffles.

One hash function for the whole engine so partials computed in different
worker processes / rounds merge consistently (checkpoint/resume re-merges
serialized partials, so cross-process determinism is load-bearing).
``pd.util.hash_array`` is murmur-based with a fixed key — stable across
processes and machines, vectorized over numpy arrays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def hash64(values) -> np.ndarray:
    """uint64[n] deterministic hash of an arrow/numpy/list column."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        if pa.types.is_string(values.type) or pa.types.is_large_string(values.type):
            arr = np.asarray(values.to_pylist(), dtype=object)
        else:
            arr = values.to_numpy(zero_copy_only=False)
    else:
        arr = np.asarray(values)
    if arr.dtype == object:
        return pd.util.hash_array(arr, categorize=False)
    return pd.util.hash_array(arr)


def rehash(h: np.ndarray, salt: int) -> np.ndarray:
    """Cheap second hash family: splitmix64 finalizer over h ^ salt."""
    z = (h ^ np.uint64(salt)) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))
