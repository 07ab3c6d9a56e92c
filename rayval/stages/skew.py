"""Skew-aware aggregation utilities (north_rule: "skew-aware repartitioning
on hot pHash buckets").

Two complementary strategies live in this engine:

1. **Hot-key bypass** (stages/dedup.py): detect hot keys from cheap partial
   counts and resolve their membership by broadcast filter — hot keys never
   enter a shuffle at all.  Preferred when the downstream op is a
   filter/flag (dedup violations).
2. **Salting** (here): when hot keys MUST be aggregated through a groupby
   (e.g. a per-key metric), append ``salt = hash(row) % S`` for hot keys
   only, aggregate by (key, salt) — splitting each hot key across S reducers
   — then run a second tiny groupby over the S partials per hot key.
   Correct for any commutative-associative aggregate.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from rayval.state.hashing import hash64, rehash


def salted_group_counts(
    ds: "ray.data.Dataset",
    key: str,
    hot_keys: Optional[np.ndarray] = None,
    n_salts: int = 16,
) -> "ray.data.Dataset":
    """Exact per-key counts with hot keys salted across ``n_salts`` reducers.

    ``hot_keys``: int64 array of keys known (e.g. from a sampled pre-count) to
    be heavy; rows with other keys use salt 0.  Result: a DISTRIBUTED
    Dataset of (key, n) — distinct-keys-sized, so callers decide whether to
    collect (small key spaces) or keep streaming (filter / write / join).
    """
    hot = np.asarray(hot_keys if hot_keys is not None else [], dtype=np.int64)
    # broadcast the ARROW set once — rebuilding pa.array(hot) per batch
    # would pay an O(|hot|) conversion in every map task
    hot_ref = ray.put(pa.array(hot, type=pa.int64()))

    def tag(batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        hot_set = ray.get(hot_ref)
        salt = np.zeros(n_rows, dtype=np.int64)
        if len(hot_set):
            # Arrow is_in (null -> not hot) + null-safe hash64: np.isin over
            # to_numpy would widen a null-bearing int block to float64 and
            # miss hot keys past 2^53 (counts stay exact either way — only
            # the salting would degrade)
            is_hot = pc.fill_null(
                pc.is_in(batch[key], value_set=hot_set), False
            ).to_numpy(zero_copy_only=False)
            if is_hot.any():
                # per-row salt from a row hash (hot rows ONLY — hashing the
                # whole column would waste work on every non-hot row) so each
                # hot key spreads evenly
                mask = pa.array(is_hot)
                hh = hash64(batch[key].filter(mask))
                salt[is_hot] = (rehash(hh, 0x5A17) % np.uint64(n_salts)).astype(np.int64)
                # vary by position too (same key -> different reducers)
                salt[is_hot] = (salt[is_hot] + np.arange(int(is_hot.sum()))) % n_salts
        return pa.table(
            {
                key: batch[key],
                "salt": pa.array(salt),
                "n": pa.array(np.ones(n_rows, dtype=np.int64)),
            }
        )

    # level 1: aggregate by (key, salt) — hot keys split across n_salts groups
    lvl1 = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True).groupby([key, "salt"]).sum("n")
    # level 2: collapse salts per key, STILL distributed — the output is
    # distinct-keys-sized, which is not driver-sized for high-cardinality
    # keys; the caller collects only if its key space is known-small
    return (
        lvl1.map_batches(
            lambda b: pa.table({key: b[key], "n": b["sum(n)"]}), batch_format="pyarrow"
        )
        .groupby(key)
        .sum("n")
        .map_batches(lambda b: b.rename_columns([key, "n"]), batch_format="pyarrow")
    )
