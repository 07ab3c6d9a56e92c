"""Pivot / one-hot aggregation — per-key counts of a low-cardinality
category column spread into wide integer columns (``SUM(CASE WHEN cat = v
THEN 1 END) GROUP BY key`` for each declared v).

Training pipelines use this for per-user behavior features, per-source
label distributions, and monitoring tables.  Pivot semantics REQUIRE the
category set to be small and known — the operator takes the declared
``values`` list (discover it beforehand with ``ds.unique`` or
``stats.heavy_hitters`` when unknown); undeclared categories land in an
optional ``other_col`` so nothing is silently dropped.

Scale shape: per-batch partial — one vectorized ``==`` + segmented sum per
declared value collapses the batch to (distinct keys in batch) wide rows —
then a tiny ``groupby(key).sum`` over the already-wide partials.  The
exchange carries |values|+1 int64 columns per touched key per batch, never
input rows; a hot key collapses to one partial row per batch (the combiner
IS the skew defense, same as grouped_histogram).

Null semantics: null CATEGORY rows count toward ``other_col`` (they match no
declared value; SQL's CASE WHEN treats them the same) — and null KEYS form
their own group, crossing the exchange as (filled, null-flag) pairs like
every other null-keyed aggregate here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rayval.stages.bucketed import pack_null_key, restore_null_key


def pivot_counts(
    ds,
    key_col: str,
    cat_col: str,
    values: list,
    prefix: str = "n_",
    other_col: str | None = "n_other",
):
    """Wide per-key counts: one ``prefix + str(v)`` int64 column per declared
    value, plus ``other_col`` for everything else (None disables it)."""
    if not values:
        raise ValueError("pivot_counts needs at least one declared value")
    if len(set(map(str, values))) != len(values):
        raise ValueError("pivot values must be distinct after str()")
    key_t = ds.schema().base_schema.field(key_col).type
    val_cols = [f"{prefix}{v}" for v in values]

    def partial(batch: pa.Table) -> pa.Table:
        cols = {"_kf": pa.array([], key_t), "_kn": pa.array([], pa.bool_())}
        for c in val_cols + ([other_col] if other_col else []):
            cols[c] = pa.array([], pa.int64())
        if batch.num_rows == 0:
            return pa.table(cols)
        # dictionary-encode the key once; one bincount per declared value
        from rayval.stages.bucketed import key_codes

        codes = key_codes(batch[key_col])  # nulls -> -1
        codes2 = codes + 1  # bincount needs non-negative
        n_keys = int(codes2.max()) + 1
        cat = batch[cat_col].combine_chunks() if isinstance(batch[cat_col], pa.ChunkedArray) else batch[cat_col]
        matched = np.zeros(batch.num_rows, dtype=bool)
        out_counts = []
        for v in values:
            m = pc.fill_null(pc.equal(cat, pa.scalar(v, type=cat.type)), False)
            m = m.to_numpy(zero_copy_only=False)
            matched |= m
            out_counts.append(np.bincount(codes2, weights=m, minlength=n_keys).astype(np.int64))
        if other_col:
            out_counts.append(
                np.bincount(codes2, weights=~matched, minlength=n_keys).astype(np.int64)
            )
        # one row per distinct key in this batch (incl. the null key if
        # present) — np.unique's return_index gives first occurrences
        seen, first_idx = np.unique(codes2, return_index=True)
        keys = batch[key_col].take(pa.array(first_idx))
        kf, kn = pack_null_key(keys, key_t)
        cols = {"_kf": kf, "_kn": kn}
        names = val_cols + ([other_col] if other_col else [])
        for name, cnts in zip(names, out_counts):
            cols[name] = pa.array(cnts[seen], type=pa.int64())
        return pa.table(cols)

    from ray.data.aggregate import Sum

    aggs = [Sum(c, alias_name=c) for c in val_cols + ([other_col] if other_col else [])]

    def restore(batch: pa.Table) -> pa.Table:
        cols = {key_col: restore_null_key(batch["_kf"], batch["_kn"], key_t)}
        for c in val_cols + ([other_col] if other_col else []):
            cols[c] = batch[c]
        return pa.table(cols)

    return (
        ds.select_columns([key_col, cat_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["_kf", "_kn"])
        .aggregate(*aggs)
        .map_batches(restore, batch_format="pyarrow", zero_copy_batch=True)
    )
