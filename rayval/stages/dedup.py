"""Exact pHash uniqueness with skew-aware hot-bucket handling.

North rule: "every pHash duplicate flagged ... skew-aware repartitioning on
hot pHash buckets".  The scalable shape chosen here avoids shuffling ANY wide
data and avoids sending hot keys through a groupby at all:

1. count pass — per-batch partial (phash, count) aggregation inside
   map_batches (combiner), then a tiny ``groupby(phash).sum`` over partials.
   The shuffle moves one row per distinct phash per batch, not per image row.
2. dup set = keys with total count > 1; HOT keys (count >= hot_threshold,
   e.g. the constant-image cluster at ~1% of all rows) are split out.  A hot
   key would make one groupby task a straggler (all its rows land on one
   reducer); instead BOTH hot and normal dup membership is resolved by
   broadcasting the dup-key set (``ray.put`` once) and filtering in
   map_batches — no row-level shuffle at all.
3. the broadcast-set assumption: |distinct duplicated phashes| must fit in
   memory (it's bounded by #duplicate groups, far smaller than #rows). If it
   ever didn't, the fallback is a hash-partitioned semi-join on
   ``phash % B`` buckets with hot keys pre-filtered exactly as here — the
   hot-key split is what keeps that shuffle skew-free.

Only decodable rows participate (an undecodable payload has no trustworthy
content hash; it is already flagged ``bytes.decodable``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from rayval.constraints.profile import PARTITION_COL


def phash_counts(results: "ray.data.Dataset") -> pa.Table:
    """Small table (phash, n) of total counts, via partial aggregation."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch
        if "decodable" in t.column_names:
            t = t.filter(t["decodable"])
        vals, counts = np.unique(t["phash"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"phash": pa.array(vals, type=pa.int64()), "n": pa.array(counts, type=pa.int64())})

    from rayval.util import collect_tables

    partials = results.select_columns([c for c in ("phash", "decodable") if c in results.schema().names]) \
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = partials.groupby("phash").sum("n")
    tbl = collect_tables(merged)
    if tbl.num_rows == 0:
        return pa.table({"phash": pa.array([], type=pa.int64()), "n": pa.array([], type=pa.int64())})
    col = "sum(n)" if "sum(n)" in tbl.column_names else "n"
    return pa.table({"phash": tbl["phash"], "n": tbl[col]})


def duplicate_violations(
    results: "ray.data.Dataset",
    hot_threshold: int = 1000,
    counts: Optional[pa.Table] = None,
) -> "ray.data.Dataset":
    """Violation rows (partition_id, image_id, 'phash.unique') for EVERY member
    of every duplicate group.  Membership via broadcast dup-set filter — hot
    keys never enter a shuffle (see module doc)."""
    if counts is None:
        counts = phash_counts(results)
    n = counts["n"].to_numpy(zero_copy_only=False)
    dup_keys = counts["phash"].to_numpy(zero_copy_only=False)[n > 1]
    n_hot = int((n >= hot_threshold).sum())
    dup_ref = ray.put(dup_keys)  # broadcast ONCE; tasks read from object store

    def flag(batch: pa.Table) -> pa.Table:
        keys = ray.get(dup_ref)
        t = batch
        if "decodable" in t.column_names:
            t = t.filter(t["decodable"])
        member = np.isin(t["phash"].to_numpy(zero_copy_only=False), keys)
        t = t.filter(pa.array(member))
        return pa.table(
            {
                PARTITION_COL: t[PARTITION_COL],
                "image_id": t["image_id"],
                "constraint_id": pa.array(["phash.unique"] * t.num_rows, type=pa.string()),
            }
        )

    ds = results.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)
    ds._rayval_hot_buckets = n_hot  # introspection for tests/reporting
    return ds


def top_hot_buckets(counts: pa.Table, k: int = 10) -> pa.Table:
    """Top-k most frequent phash values — the skew report (sort+limit over
    the tiny pre-aggregated counts table from ``phash_counts``)."""
    order = pc.sort_indices(
        counts, sort_keys=[("n", "descending"), ("phash", "ascending")]
    )
    return counts.take(order[:k])
