"""Temporal joins — as-of and range, operators Ray Data lacks, composed from
the engine's partitioned-log shape (the build brief's canonical
custom-operator examples).

Shape (scales): both sides project to narrow columns, tag a side marker,
union, and ``groupby(by).map_groups`` — each key's log is sorted once and
matched VECTORIZED with ``np.searchsorted`` (no per-row Python).  This is the
same partitioning assumption as the sessionization/LAG windows
(pipelines/queries.py): one key's rows fit a reducer; skewed keys are bounded
by per-key log length, and a pathological single-key log would be salted by
time-range exactly like the windowed aggregates.

Dispatch note: map_groups pays a per-KEY python call; per-key work here is
a sort + searchsorted, so dispatch stays a minor fraction while keys carry
real logs.  If a deployment's key space is huge with tiny per-key logs, the
bucketed-reduce upgrade used by ``topn_per_group``/``ngram_jaccard_pairs``
(group by ``hash(by) % B``, segment keys inside the UDF) applies here with
``np.lexsort`` over (by, on) + per-key ``searchsorted`` bounds.

Null semantics (matches the SQL oracles): a left row with a NULL ``on``
matches nothing (comparisons with NULL are never true); right rows with a
NULL ``on`` never match.  Ties on ``on`` within a key are broken by the
LARGEST right-side pick value (Arrow sort over (on, pick), null picks
smallest), so output is deterministic even when (by, on) repeats on the
right.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _tag_union(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    by: str,
    on: str,
    l_cols: list[str],
    pick_col: Optional[str],
    pick_type,
    l_types: dict,
) -> "ray.data.Dataset":
    """Union of both sides over the LEFT schema + side marker (+ optional
    pick column).  All types are resolved ONCE on the driver and captured as
    plain values — capturing a Dataset object inside a per-batch closure
    would serialize the whole upstream plan into every task."""

    def tag_left(b: pa.Table) -> pa.Table:
        t = b.select(l_cols)
        t = t.append_column("__side", pa.array(np.zeros(b.num_rows, dtype=np.int8)))
        if pick_col is not None:
            t = t.append_column("__pick", pa.nulls(b.num_rows, pick_type))
        return t

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {c: (b[c] if c in b.column_names else pa.nulls(n, l_types[c])) for c in l_cols}
        t = pa.table(cols)
        t = t.append_column("__side", pa.array(np.ones(n, dtype=np.int8)))
        if pick_col is not None:
            t = t.append_column("__pick", b[pick_col])
        return t

    r_proj = list(dict.fromkeys([by, on] + ([pick_col] if pick_col else [])))
    return left.map_batches(tag_left, batch_format="pyarrow").union(
        right.select_columns(r_proj).map_batches(tag_right, batch_format="pyarrow")
    )


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    by: str,
    on: str,
    left_keep: list[str],
    right_pick: str,
    out_col: str = "matched",
) -> "ray.data.Dataset":
    """LEFT as-of join: for every left row, the right row of the same ``by``
    key with the greatest ``on`` <= the left row's ``on`` (SQL ``ASOF LEFT
    JOIN ... ON l.by = r.by AND l.on >= r.on``).  Emits ``left_keep`` columns
    plus ``out_col`` = that row's ``right_pick`` value (null when nothing
    precedes)."""
    l_cols = list(dict.fromkeys([by, on] + left_keep))
    pick_type = right.schema().base_schema.field(right_pick).type
    l_schema = left.schema().base_schema
    l_types = {c: l_schema.field(c).type for c in l_cols}
    keep_types = {c: l_types[c] for c in left_keep}
    both = _tag_union(left, right, by, on, l_cols, right_pick, pick_type, l_types)

    def per_key(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {**{c: pa.array([], keep_types[c]) for c in left_keep},
             out_col: pa.array([], pick_type)}
        )
        side = g["__side"].to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 0))
        if lt.num_rows == 0:
            return empty
        rt = g.filter(pa.array(side == 1))
        # right rows with null `on` can never match; drop them BEFORE any
        # to_numpy (a null would force a float64/NaT conversion, and NaN/NaT
        # sort greater-than-everything in searchsorted — silently matching)
        rt = rt.filter(rt[on].is_valid())
        out_cols = {c: lt[c] for c in left_keep}
        if rt.num_rows == 0:
            out_cols[out_col] = pa.nulls(lt.num_rows, pick_type)
            return pa.table(out_cols)
        picks = rt["__pick"].combine_chunks() if isinstance(rt["__pick"], pa.ChunkedArray) else rt["__pick"]
        # sort by (on asc, pick asc, nulls first): among equal `on`,
        # searchsorted's rightmost hit is the LARGEST pick — the documented
        # deterministic tie-break; a NULL pick sorts smallest, so it loses a
        # tie to any non-null pick (and a tie of only-null picks yields null).
        # Arrow sort, not np.lexsort: an object array of (None, str) from a
        # null-bearing string pick column would TypeError inside lexsort.
        order = pc.sort_indices(
            pa.table({"__on": rt[on], "__p": picks}),
            sort_keys=[("__on", "ascending"), ("__p", "ascending")],
            null_placement="at_start",
        )
        r_on = rt[on].take(order).to_numpy(zero_copy_only=False)
        picks = picks.take(order)
        l_valid = lt[on].is_valid().to_numpy(zero_copy_only=False)
        idx = np.zeros(lt.num_rows, dtype=np.int64)
        if l_valid.any():
            l_on = lt.filter(pa.array(l_valid))[on].to_numpy(zero_copy_only=False)
            idx[l_valid] = np.searchsorted(r_on, l_on, side="right") - 1
        idx[~l_valid] = -1  # null `on` matches nothing (SQL semantics)
        hit = idx >= 0
        # Arrow-native masking: a pandas .where round-trip would convert
        # int64 picks through float64, corrupting values > 2^53
        taken = picks.take(pa.array(np.where(hit, idx, 0)))
        out_cols[out_col] = pc.if_else(pa.array(hit), taken, pa.scalar(None, pick_type))
        return pa.table(out_cols)

    return both.groupby(by).map_groups(per_key, batch_format="pyarrow")


def range_count_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    by: str,
    on: str,
    width,
    left_keep: list[str],
    out_col: str = "n_in_range",
) -> "ray.data.Dataset":
    """RANGE join (count form): for every LEFT row, the number of RIGHT rows
    of the same ``by`` key whose ``on`` lies in ``[left.on - width, left.on]``
    — per key, sort the right ``on`` once, then TWO vectorized
    ``np.searchsorted`` calls bound every window.  A full materializing range
    join (emit the pairs) is the same shape with a take per window; the
    count form is the aggregation-pushed variant that avoids the pair blowup
    at scale.  A left row with null ``on`` counts 0."""
    l_cols = list(dict.fromkeys([by, on] + left_keep))
    l_schema = left.schema().base_schema
    l_types = {c: l_schema.field(c).type for c in l_cols}
    keep_types = {c: l_types[c] for c in left_keep}
    both = _tag_union(left, right, by, on, l_cols, None, None, l_types)

    def per_key(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 0))
        if lt.num_rows == 0:
            return pa.table(
                {**{c: pa.array([], keep_types[c]) for c in left_keep},
                 out_col: pa.array([], pa.int64())}
            )
        rt = g.filter(pa.array(side == 1))
        rt = rt.filter(rt[on].is_valid())
        counts = np.zeros(lt.num_rows, dtype=np.int64)
        l_valid = lt[on].is_valid().to_numpy(zero_copy_only=False)
        if rt.num_rows and l_valid.any():
            r_on = np.sort(rt[on].to_numpy(zero_copy_only=False), kind="stable")
            l_on = lt.filter(pa.array(l_valid))[on].to_numpy(zero_copy_only=False)
            lo = np.searchsorted(r_on, l_on - width, side="left")
            hi = np.searchsorted(r_on, l_on, side="right")
            counts[l_valid] = hi - lo
        out = {c: lt[c] for c in left_keep}
        out[out_col] = pa.array(counts)
        return pa.table(out)

    return both.groupby(by).map_groups(per_key, batch_format="pyarrow")


def range_pairs_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    by: str,
    on: str,
    width,
    left_keep: list[str],
    right_pick: str,
    out_col: str = "r_pick",
    max_pairs_per_key: Optional[int] = None,
) -> "ray.data.Dataset":
    """RANGE join (pair form): one output row per (left row, right row) pair
    of the same ``by`` key with ``right.on`` in ``[left.on - width, left.on]``
    — "which views preceded this purchase".  Emits ``left_keep`` plus
    ``out_col`` = the matched right row's ``right_pick``.  INNER semantics:
    a left row with an empty window (or a null ``on``) emits nothing — use
    :func:`range_count_join` when you need the zeros.

    Same partitioned-log skeleton as the count form; the windows are bounded
    by the same two ``searchsorted`` calls, then materialized with one
    vectorized gather (np.repeat over window starts + flat offsets).

    Skew guard: the pair count per key is quadratic in a hot key's density
    (every left row can window every right row).  ``max_pairs_per_key``
    REFUSES (raises) past the cap instead of silently flooding a reducer —
    at scale, salt the hot key by time-range or fall back to the count form."""
    l_cols = list(dict.fromkeys([by, on] + left_keep))
    pick_type = right.schema().base_schema.field(right_pick).type
    l_schema = left.schema().base_schema
    l_types = {c: l_schema.field(c).type for c in l_cols}
    keep_types = {c: l_types[c] for c in left_keep}
    both = _tag_union(left, right, by, on, l_cols, right_pick, pick_type, l_types)

    def per_key(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {**{c: pa.array([], keep_types[c]) for c in left_keep},
             out_col: pa.array([], pick_type)}
        )
        side = g["__side"].to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 0))
        if lt.num_rows == 0:
            return empty
        rt = g.filter(pa.array(side == 1))
        rt = rt.filter(rt[on].is_valid())
        lt = lt.filter(lt[on].is_valid())  # null left `on` matches nothing
        if rt.num_rows == 0 or lt.num_rows == 0:
            return empty
        picks = rt["__pick"].combine_chunks() if isinstance(rt["__pick"], pa.ChunkedArray) else rt["__pick"]
        order = pc.sort_indices(
            pa.table({"__on": rt[on], "__p": picks}),
            sort_keys=[("__on", "ascending"), ("__p", "ascending")],
            null_placement="at_start",
        )
        r_on = rt[on].take(order).to_numpy(zero_copy_only=False)
        picks = picks.take(order)
        l_on = lt[on].to_numpy(zero_copy_only=False)
        lo = np.searchsorted(r_on, l_on - width, side="left")
        hi = np.searchsorted(r_on, l_on, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if max_pairs_per_key is not None and total > max_pairs_per_key:
            raise ValueError(
                f"range_pairs_join: key {g[by][0].as_py()!r} would emit {total} pairs "
                f"(> max_pairs_per_key={max_pairs_per_key}); salt the key by time-range "
                "or use range_count_join"
            )
        if total == 0:
            return empty
        l_idx = np.repeat(np.arange(lt.num_rows, dtype=np.int64), counts)
        ends = np.cumsum(counts)
        offsets = np.arange(total, dtype=np.int64) - np.repeat(ends - counts, counts)
        r_idx = np.repeat(lo, counts) + offsets
        out = {c: lt[c].take(pa.array(l_idx)) for c in left_keep}
        out[out_col] = picks.take(pa.array(r_idx))
        return pa.table(out)

    return both.groupby(by).map_groups(per_key, batch_format="pyarrow")
