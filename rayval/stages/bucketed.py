"""Shared hash-bucketed reduce dispatch for the per-key-window operators
(stages/asof.py, stages/windows.py): ``groupby(by).map_groups`` pays one
Python call + one Arrow table materialization PER KEY — the dispatch cost
that dominates at 10^8+ small keys — so these operators group by
``hash64(by) % n_buckets`` and handle every key inside a bucket with one
vectorized pass.  ``n_buckets <= 0`` falls back to exact per-key grouping
with the SAME udf (one bucket == one key), which the conformance tests use
to pin bucketed ≡ per-key."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from rayval.state.hashing import hash64

DEFAULT_BUCKETS = 64


def grouped_reduce(ds: "ray.data.Dataset", by: str, n_buckets: int, udf) -> "ray.data.Dataset":
    if n_buckets <= 0:
        return ds.groupby(by).map_groups(udf, batch_format="pyarrow")

    def add_bucket(b: pa.Table) -> pa.Table:
        col = b[by]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        bk = (hash64(col) % np.uint64(n_buckets)).astype(np.int64)
        return b.append_column("__bucket", pa.array(bk))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(udf, batch_format="pyarrow")
    )


def drop_bucket_col(g: pa.Table) -> pa.Table:
    return g.drop_columns(["__bucket"]) if "__bucket" in g.column_names else g


def key_codes(col) -> np.ndarray:
    """Per-row key-run codes for a (sorted or unsorted) key column:
    dictionary codes with nulls mapped to -1, so null keys form one group —
    a value comparison would make null != null and split them."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    enc = pc.dictionary_encode(col)
    return pc.fill_null(pc.cast(enc.indices, pa.int64()), -1).to_numpy(zero_copy_only=False)


def null_fill_of(t: pa.DataType):
    """Arbitrary non-null fill for a null-bearing group-key column crossing
    a Ray groupby exchange (whose sort rejects None-vs-value comparisons);
    rows carrying it are distinguished from genuine occurrences of the same
    value by a paired null-flag key column, so the choice is semantics-free."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pa.scalar("", t)
    if pa.types.is_fixed_size_binary(t):
        return pa.scalar(b"\x00" * t.byte_width, t)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return pa.scalar(b"", t)
    if pa.types.is_boolean(t):
        return pa.scalar(False, t)
    if (pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_decimal(t)
            or pa.types.is_temporal(t)):
        return pa.scalar(0, t)
    raise TypeError(f"unsupported group-key type for a null-safe exchange: {t}")


def pack_null_key(col, t: pa.DataType):
    """(filled, null_flag) pair for a group-key column about to cross a Ray
    groupby exchange: Ray's sort rejects None-vs-value comparisons, so the
    key travels as a non-null filled column plus a boolean flag and is
    rebuilt with restore_null_key after the aggregate.  Exact and
    collision-free (a genuine fill-value key differs in the flag)."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return pc.fill_null(col, null_fill_of(t)), pc.is_null(col)


def restore_null_key(filled, flag, t: pa.DataType):
    """Inverse of pack_null_key: null where the flag is set."""
    return pc.if_else(flag, pa.scalar(None, t), filled)
