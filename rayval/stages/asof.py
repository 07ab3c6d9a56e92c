"""As-of join — an operator Ray Data lacks, composed from the engine's
partitioned-log shape (the build brief's canonical custom-operator example).

For every LEFT row, the RIGHT row with the greatest ``on`` value <= the left
row's ``on`` value, within the same ``by`` key (SQL: ``ASOF LEFT JOIN ... ON
l.by = r.by AND l.on >= r.on``).

Shape (scales): both sides project to narrow columns, tag a side marker,
union, and ``groupby(by).map_groups`` — each key's log is sorted once and
matched VECTORIZED with one ``np.searchsorted`` (no per-row Python).  This is
the same partitioning assumption as the sessionization/LAG windows
(pipelines/queries.py): one key's rows fit a reducer; skewed keys are
bounded by per-key log length, and a pathological single-key log would be
salted by time-range exactly like the windowed aggregates.

Determinism: ties on ``on`` within a key are broken by the largest right-side
``pick`` column (callers should ensure (by, on) unique on the right — the
ASOF semantics itself is ambiguous under duplicates).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    by: str,
    on: str,
    left_keep: list[str],
    right_pick: str,
    out_col: str = "matched",
) -> "ray.data.Dataset":
    """LEFT as-of join: emit ``left_keep`` columns plus ``out_col`` = the
    ``right_pick`` value of the matched right row (null when no right row
    precedes the left row in its key)."""
    l_cols = list(dict.fromkeys([by, on] + left_keep))

    def tag_left(b: pa.Table) -> pa.Table:
        t = b.select(l_cols)
        return (
            t.append_column("__side", pa.array(np.zeros(b.num_rows, dtype=np.int8)))
            .append_column("__pick", pa.nulls(b.num_rows, right.schema().base_schema.field(right_pick).type))
        )

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {c: (b[c] if c in b.column_names else pa.nulls(n, left.schema().base_schema.field(c).type)) for c in l_cols}
        t = pa.table(cols)
        return (
            t.append_column("__side", pa.array(np.ones(n, dtype=np.int8)))
            .append_column("__pick", b[right_pick])
        )

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.select_columns(list(dict.fromkeys([by, on, right_pick]))).map_batches(
            tag_right, batch_format="pyarrow"
        )
    )

    def per_key(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        onv = g[on].to_numpy(zero_copy_only=False)
        is_l = side == 0
        lt = g.filter(pa.array(is_l))
        if lt.num_rows == 0:
            return pa.table(
                {**{c: pa.array([], lt[c].type) for c in left_keep},
                 out_col: pa.array([], g["__pick"].type)}
            )
        r_on = onv[~is_l]
        picks = g["__pick"].filter(pa.array(~is_l))
        order = np.argsort(r_on, kind="stable")
        r_on = r_on[order]
        picks = picks.take(pa.array(order))
        idx = np.searchsorted(r_on, onv[is_l], side="right") - 1
        matched = pa.nulls(lt.num_rows, picks.type)
        hit = idx >= 0
        if hit.any() and len(r_on):
            taken = picks.take(pa.array(np.where(hit, idx, 0)))
            matched = pa.Array.from_pandas(
                taken.to_pandas().where(hit), type=picks.type
            )
        out = {c: lt[c] for c in left_keep}
        out[out_col] = matched
        return pa.table(out)

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
    — the interval-join composition (same partitioned-log shape as
    :func:`asof_join`): per key, sort the right side's ``on`` once, then TWO
    vectorized ``np.searchsorted`` calls bound every left row's window.  A
    full materializing range join (emit the pairs) is the same shape with a
    take per window; the count form is the aggregation-pushed variant that
    avoids the pair blowup at scale."""
    l_cols = list(dict.fromkeys([by, on] + left_keep))

    def tag_left(b: pa.Table) -> pa.Table:
        return b.select(l_cols).append_column(
            "__side", pa.array(np.zeros(b.num_rows, dtype=np.int8))
        )

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {c: (b[c] if c in b.column_names else pa.nulls(n, left.schema().base_schema.field(c).type)) for c in l_cols}
        return pa.table(cols).append_column("__side", pa.array(np.ones(n, dtype=np.int8)))

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.select_columns(list(dict.fromkeys([by, on]))).map_batches(tag_right, batch_format="pyarrow")
    )

    def per_key(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        onv = g[on].to_numpy(zero_copy_only=False)
        is_l = side == 0
        lt = g.filter(pa.array(is_l))
        if lt.num_rows == 0:
            return pa.table(
                {**{c: pa.array([], lt[c].type) for c in left_keep},
                 out_col: pa.array([], pa.int64())}
            )
        r_on = np.sort(onv[~is_l], kind="stable")
        lo = np.searchsorted(r_on, onv[is_l] - width, side="left")
        hi = np.searchsorted(r_on, onv[is_l], side="right")
        out = {c: lt[c] for c in left_keep}
        out[out_col] = pa.array((hi - lo).astype(np.int64))
        return pa.table(out)

    return both.groupby(by).map_groups(per_key, batch_format="pyarrow")
