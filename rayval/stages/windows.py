"""Ordered-log window operators (LAG / sessionization) — per-key sorted
windows Ray Data lacks natively, reduced BY HASH BUCKET like the temporal
joins (stages/asof.py): ``groupby(by).map_groups`` pays one Python call per
KEY, which dominates at 10^8+ small keys, so both operators group by
``hash64(by) % n_buckets`` and handle every key in the bucket with ONE
vectorized pass (Arrow sort + numpy boundary masks — key transitions are
just positions where the sorted key column changes).

``n_buckets=0`` falls back to exact per-key grouping with the same UDF (one
bucket == one key); the conformance tests pin bucketed ≡ per-key, and the
driver queries pin both against DuckDB window oracles.

Both operators assume one BUCKET's rows fit a reducer (size ``n_buckets``
accordingly); a single pathological key is bounded by its own log length
exactly as under per-key grouping — bucketing only packs many small keys
into one call, it never co-locates more than one key's rows beyond that.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from rayval.stages.bucketed import (
    DEFAULT_BUCKETS,
    drop_bucket_col,
    grouped_reduce,
    key_codes,
    pack_null_key,
    restore_null_key,
)
from rayval.util import round_half_away


def _key_change(col, n: int) -> np.ndarray:
    """Boolean mask: True where the SORTED key column starts a new key run
    (dictionary codes with nulls as -1, so null keys form one group)."""
    codes = key_codes(col)
    change = np.ones(n, dtype=bool)
    change[1:] = codes[1:] != codes[:-1]
    return change


def grouped_lag(
    ds: "ray.data.Dataset",
    by: str,
    ts_col: str,
    id_col: str,
    prev_col: str = "prev_event_id",
    gap_col: str = "gap_us",
    n_buckets: int = DEFAULT_BUCKETS,
) -> "ray.data.Dataset":
    """Per-key LAG over the (ts, id)-ordered log: one output row per input
    row with the previous row's id and the microsecond gap (null on each
    key's first row) — SQL ``LAG(...) OVER (PARTITION BY by ORDER BY ts,
    id)``.  One Arrow sort + shifted-compare per bucket.

    Null-``ts`` rows: emitted with null prev/gap and never serve as another
    row's prev (a NaT would otherwise round-trip to int64-min and poison the
    next row's gap arithmetic with a wrapped garbage value)."""
    sch = ds.schema().base_schema
    by_t, id_t = sch.field(by).type, sch.field(id_col).type

    def per_bucket(g: pa.Table) -> pa.Table:
        g = drop_bucket_col(g)
        n = g.num_rows
        if n == 0:
            return pa.table(
                {id_col: pa.array([], id_t), by: pa.array([], by_t),
                 prev_col: pa.array([], id_t), gap_col: pa.array([], pa.int64())}
            )
        idx = pc.sort_indices(
            g,
            sort_keys=[(by, "ascending"), (ts_col, "ascending"), (id_col, "ascending")],
            null_placement="at_start",
        )
        s = g.take(idx)
        ts_valid = s[ts_col].is_valid().to_numpy(zero_copy_only=False)
        ts = s[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        first = _key_change(s[by], n)
        # a row has no prev when it heads its key run, its own ts is null,
        # or the sorted predecessor's ts is null (nulls sort at the run head)
        first |= ~ts_valid
        first[1:] |= ~ts_valid[:-1]
        not_first = pa.array(~first)
        # previous row's id via a shifted take (typed — works for any id
        # type), masked null where there is no prev
        shifted = s[id_col].take(pa.array(np.maximum(np.arange(n, dtype=np.int64) - 1, 0)))
        shifted = shifted.combine_chunks() if isinstance(shifted, pa.ChunkedArray) else shifted
        gap = np.empty(n, dtype=np.int64)
        gap[1:] = ts[1:] - ts[:-1]
        gap[0] = 0  # masked null below
        return pa.table(
            {
                id_col: s[id_col],
                by: s[by],
                prev_col: pc.if_else(not_first, shifted, pa.scalar(None, id_t)),
                gap_col: pa.array(gap, mask=first),
            }
        )

    return grouped_reduce(ds, by, n_buckets, per_bucket)


def sessionize(
    ds: "ray.data.Dataset",
    by: str,
    ts_col: str,
    gap_us: int,
    start_col: str = "session_start",
    count_col: str = "n_events",
    n_buckets: int = DEFAULT_BUCKETS,
) -> "ray.data.Dataset":
    """Gaps-and-islands sessionization: one output row per (key, session)
    with the session's start timestamp (epoch us) and event count; a gap
    > ``gap_us`` (or a key change) starts a new session.  One Arrow sort +
    run-length pass per bucket.  Rows with null ``ts`` are DROPPED (a NaT
    would round-trip to int64-min and fabricate a garbage session_start);
    note plain SQL windowing orders NULLs LAST and would count them into the
    last session, so the paired oracles filter ``ts IS NOT NULL`` to share
    this semantics."""
    by_t = ds.schema().base_schema.field(by).type

    def per_bucket(g: pa.Table) -> pa.Table:
        g = drop_bucket_col(g)
        g = g.filter(g[ts_col].is_valid())
        n = g.num_rows
        if n == 0:
            return pa.table(
                {by: pa.array([], by_t), start_col: pa.array([], pa.int64()),
                 count_col: pa.array([], pa.int64())}
            )
        idx = pc.sort_indices(
            g, sort_keys=[(by, "ascending"), (ts_col, "ascending")], null_placement="at_start"
        )
        s = g.take(idx)
        ts = s[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        new = _key_change(s[by], n)
        new[1:] |= (ts[1:] - ts[:-1]) > gap_us
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, n))
        return pa.table(
            {
                by: s[by].take(pa.array(starts)),
                start_col: pa.array(ts[starts]),
                count_col: pa.array(counts.astype(np.int64)),
            }
        )

    return grouped_reduce(ds, by, n_buckets, per_bucket)


def hopping_window_agg(
    ds: "ray.data.Dataset",
    ts_col: str,
    by: str,
    value_col: str,
    window_us: int,
    hop_us: int,
    n_col: str = "n",
    sum_col: str = "sum_value_e3",
    ws_col: str = "window_start_us",
) -> "ray.data.Dataset":
    """Hopping (sliding) window aggregate: for every window of length
    ``window_us`` starting on a ``hop_us`` boundary, the event count and the
    e3 fixed-point sum of ``value_col`` per ``by`` group — SQL ``GROUP BY
    window_start, by`` after a k-way window-membership expansion
    (k = window/hop).  events_hourly is the tumbling special case (k = 1).

    Scale shape: each batch is PARTIAL-AGGREGATED on its (hop-bucket, by)
    pairs first — one row per pair per batch — and the k-way expansion runs
    on that reduced space, so the global groupby shuffles ~k * buckets *
    groups rows per batch, never the input rows.  No sort, no per-key
    dispatch; output cardinality is (time-range / hop) * |by| regardless of
    input size.  Null-``ts`` rows are dropped (no window membership — SQL
    oracles filter them identically); null ``value`` sums as 0 — note SQL
    SUM alone returns NULL for an all-null group, so oracles COALESCE their
    SUM to 0 to share this semantics.
    """
    if window_us <= 0 or hop_us <= 0 or window_us % hop_us:
        raise ValueError("window_us and hop_us must be positive with window a multiple of hop")
    k = window_us // hop_us
    by_t = ds.schema().base_schema.field(by).type

    def partial(batch: pa.Table) -> pa.Table:
        # same schema as the populated path — a heterogeneous empty block
        # entering the sort-based exchange is the documented Ray pathology
        empty = pa.table(
            {ws_col: pa.array([], pa.int64()), "_byf": pa.array([], by_t),
             "_byn": pa.array([], pa.bool_()), "_e3": pa.array([], pa.int64()),
             "_one": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        batch = batch.filter(batch[ts_col].is_valid())
        if batch.num_rows == 0:
            return empty
        ts = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = pc.fill_null(batch[value_col], 0.0).to_numpy(zero_copy_only=False)
        e3 = round_half_away(v * 1000)  # shared DuckDB ROUND parity helper
        t = pa.table(
            {by: batch[by], "_b": pa.array(ts // hop_us), "_e3": pa.array(e3),
             "_one": pa.array(np.ones(batch.num_rows, dtype=np.int64))}
        )
        part = t.group_by([by, "_b"]).aggregate([("_e3", "sum"), ("_one", "sum")]).combine_chunks()
        m = part.num_rows
        rep = pa.array(np.repeat(np.arange(m, dtype=np.int64), k))
        offs = np.tile(np.arange(k, dtype=np.int64), m)
        b = part["_b"].to_numpy(zero_copy_only=False)
        # Ray's groupby sort chokes on null keys (None vs str compare): pack
        # the key as (filled, flag) on the m-row reduced space, THEN expand
        byf, byn = pack_null_key(part[by], by_t)
        return pa.table(
            {
                ws_col: pa.array((np.repeat(b, k) - offs) * hop_us),
                "_byf": byf.take(rep),
                "_byn": byn.take(rep),
                "_e3": part["_e3_sum"].take(rep),
                "_one": part["_one_sum"].take(rep),
            }
        )

    def restore(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                ws_col: batch[ws_col],
                by: restore_null_key(batch["_byf"], batch["_byn"], by_t),
                n_col: batch[n_col],
                sum_col: batch[sum_col],
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([ws_col, "_byf", "_byn"])
        .aggregate(Sum("_one", alias_name=n_col), Sum("_e3", alias_name=sum_col))
        .map_batches(restore, batch_format="pyarrow", zero_copy_batch=True)
    )


def grouped_cumsum(
    ds: "ray.data.Dataset",
    by: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    run_col: str = "run_e3",
    n_buckets: int = DEFAULT_BUCKETS,
) -> "ray.data.Dataset":
    """Per-key RUNNING TOTAL over the (ts, id)-ordered log — SQL
    ``SUM(value) OVER (PARTITION BY by ORDER BY ts, id ROWS UNBOUNDED
    PRECEDING)`` in e3 fixed point (round_half_away per element, integer
    cumsum — exact DuckDB ROUND parity like the hopping window).  One Arrow
    sort + one vectorized cumsum-with-run-reset pass per BUCKET (the
    bucketed-reduce pattern: n_buckets Python dispatches, never per-key).

    Null semantics: null VALUES add 0 (SQL SUM skips them; an all-null
    prefix shows 0 via the oracle's COALESCE); null TS rows sort LAST within
    their key (DuckDB's window-ORDER BY default) and still accumulate."""
    sch = ds.schema().base_schema
    by_t, id_t = sch.field(by).type, sch.field(id_col).type

    def per_bucket(g: pa.Table) -> pa.Table:
        g = drop_bucket_col(g)
        n = g.num_rows
        if n == 0:
            return pa.table(
                {id_col: pa.array([], id_t), by: pa.array([], by_t),
                 run_col: pa.array([], pa.int64())}
            )
        idx = pc.sort_indices(
            g,
            sort_keys=[(by, "ascending"), (ts_col, "ascending"), (id_col, "ascending")],
            null_placement="at_end",
        )
        s = g.take(idx)
        v = pc.fill_null(s[value_col], 0.0).to_numpy(zero_copy_only=False)
        e3 = round_half_away(v * 1000)  # shared DuckDB ROUND parity helper
        c = np.cumsum(e3)
        first = _key_change(s[by], n)
        pos = np.arange(n, dtype=np.int64)
        start_pos = np.maximum.accumulate(np.where(first, pos, 0))
        # run-relative cumsum: c[i] - (total BEFORE the run's first row)
        run = c - (c - e3)[start_pos]
        return pa.table(
            {id_col: s[id_col], by: s[by], run_col: pa.array(run, type=pa.int64())}
        )

    return grouped_reduce(ds, by, n_buckets, per_bucket)


def grouped_rolling_sum(
    ds: "ray.data.Dataset",
    by: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    k: int,
    roll_col: str = "roll_e3",
    n_buckets: int = DEFAULT_BUCKETS,
) -> "ray.data.Dataset":
    """Per-key ROLLING SUM over the last ``k`` rows plus the current one —
    SQL ``SUM(value) OVER (PARTITION BY by ORDER BY ts, id ROWS BETWEEN k
    PRECEDING AND CURRENT ROW)`` in e3 fixed point.  Same bucketed single
    sort pass as :func:`grouped_cumsum`; the rolling window is the cumsum
    DIFFERENCE ``run[i] - run[i-k-1]`` (one vectorized gather — no per-row
    loop, no per-key dispatch).  Null values add 0; null-ts rows order last
    within their key (the SQL window default)."""
    if k < 0:
        raise ValueError("k must be >= 0 (0 = current row only)")
    sch = ds.schema().base_schema
    by_t, id_t = sch.field(by).type, sch.field(id_col).type

    def per_bucket(g: pa.Table) -> pa.Table:
        g = drop_bucket_col(g)
        n = g.num_rows
        if n == 0:
            return pa.table(
                {id_col: pa.array([], id_t), by: pa.array([], by_t),
                 roll_col: pa.array([], pa.int64())}
            )
        idx = pc.sort_indices(
            g,
            sort_keys=[(by, "ascending"), (ts_col, "ascending"), (id_col, "ascending")],
            null_placement="at_end",
        )
        s = g.take(idx)
        v = pc.fill_null(s[value_col], 0.0).to_numpy(zero_copy_only=False)
        e3 = round_half_away(v * 1000)  # shared DuckDB ROUND parity helper
        c = np.cumsum(e3)
        first = _key_change(s[by], n)
        pos = np.arange(n, dtype=np.int64)
        start_pos = np.maximum.accumulate(np.where(first, pos, 0))
        run = c - (c - e3)[start_pos]  # run-relative cumsum
        shift = k + 1
        rpos = pos - start_pos
        older = run[np.maximum(pos - shift, 0)]
        roll = run - np.where(rpos >= shift, older, 0)
        return pa.table(
            {id_col: s[id_col], by: s[by], roll_col: pa.array(roll, type=pa.int64())}
        )

    return grouped_reduce(ds, by, n_buckets, per_bucket)


def grouped_lead(
    ds: "ray.data.Dataset",
    by: str,
    ts_col: str,
    id_col: str,
    next_col: str = "next_event_id",
    gap_col: str = "gap_us",
    n_buckets: int = DEFAULT_BUCKETS,
) -> "ray.data.Dataset":
    """Per-key LEAD over the (ts, id)-ordered log — the forward mirror of
    :func:`grouped_lag`: one output row per input row with the NEXT row's id
    and the microsecond gap to it (null on each key's last row) — SQL
    ``LEAD(...) OVER (PARTITION BY by ORDER BY ts, id)``.  Same bucketed
    dispatch, same single Arrow sort + shifted-compare per bucket.

    Null-``ts`` rows: emitted with null next/gap and never serve as another
    row's next (mirroring grouped_lag's null-ts containment)."""
    sch = ds.schema().base_schema
    by_t, id_t = sch.field(by).type, sch.field(id_col).type

    def per_bucket(g: pa.Table) -> pa.Table:
        g = drop_bucket_col(g)
        n = g.num_rows
        if n == 0:
            return pa.table(
                {id_col: pa.array([], id_t), by: pa.array([], by_t),
                 next_col: pa.array([], id_t), gap_col: pa.array([], pa.int64())}
            )
        idx = pc.sort_indices(
            g,
            sort_keys=[(by, "ascending"), (ts_col, "ascending"), (id_col, "ascending")],
            null_placement="at_start",
        )
        s = g.take(idx)
        ts_valid = s[ts_col].is_valid().to_numpy(zero_copy_only=False)
        ts = s[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        change = _key_change(s[by], n)
        # a row has no next when it closes its key run, its own ts is null,
        # or the sorted successor's ts is null (can't happen under at_start
        # ordering, kept for symmetry with grouped_lag's defensive mask)
        last = np.zeros(n, dtype=bool)
        last[:-1] = change[1:]
        last[-1] = True
        last |= ~ts_valid
        last[:-1] |= ~ts_valid[1:]
        not_last = pa.array(~last)
        shifted = s[id_col].take(pa.array(np.minimum(np.arange(n, dtype=np.int64) + 1, n - 1)))
        shifted = shifted.combine_chunks() if isinstance(shifted, pa.ChunkedArray) else shifted
        gap = np.empty(n, dtype=np.int64)
        gap[:-1] = ts[1:] - ts[:-1]
        gap[-1] = 0  # masked null below
        return pa.table(
            {
                id_col: s[id_col],
                by: s[by],
                next_col: pc.if_else(not_last, shifted, pa.scalar(None, id_t)),
                gap_col: pa.array(gap, mask=last),
            }
        )

    return grouped_reduce(ds, by, n_buckets, per_bucket)


def grouped_first_last(
    ds: "ray.data.Dataset",
    by: str,
    ts_col: str,
    id_col: str,
    first_col: str = "first_event_id",
    last_col: str = "last_event_id",
    n_buckets: int = DEFAULT_BUCKETS,
) -> "ray.data.Dataset":
    """Per-row FIRST_VALUE / LAST_VALUE of ``id_col`` over the whole key
    partition ordered by (ts, id) — SQL ``FIRST_VALUE/LAST_VALUE ... OVER
    (PARTITION BY by ORDER BY ts, id ROWS BETWEEN UNBOUNDED PRECEDING AND
    UNBOUNDED FOLLOWING)``.  The bucketed reduce guarantees every key's rows
    land in one bucket, so run boundaries in the sorted bucket give both
    endpoints with two vectorized accumulates — no per-key dispatch.

    Null-``ts`` rows sort LAST within their key (``null_placement=at_end``),
    matching DuckDB's default ASC NULLS LAST — so a null-ts row can be the
    partition's LAST_VALUE, exactly as the SQL window would report."""
    sch = ds.schema().base_schema
    by_t, id_t = sch.field(by).type, sch.field(id_col).type

    def per_bucket(g: pa.Table) -> pa.Table:
        g = drop_bucket_col(g)
        n = g.num_rows
        if n == 0:
            return pa.table(
                {id_col: pa.array([], id_t), by: pa.array([], by_t),
                 first_col: pa.array([], id_t), last_col: pa.array([], id_t)}
            )
        idx = pc.sort_indices(
            g,
            sort_keys=[(by, "ascending"), (ts_col, "ascending"), (id_col, "ascending")],
            null_placement="at_end",
        )
        s = g.take(idx)
        change = _key_change(s[by], n)
        pos = np.arange(n, dtype=np.int64)
        starts = np.maximum.accumulate(np.where(change, pos, 0))
        is_end = np.empty(n, dtype=bool)
        is_end[:-1] = change[1:]
        is_end[-1] = True
        ends = np.minimum.accumulate(np.where(is_end, pos, n)[::-1])[::-1]
        first_ids = s[id_col].take(pa.array(starts))
        last_ids = s[id_col].take(pa.array(ends))
        first_ids = first_ids.combine_chunks() if isinstance(first_ids, pa.ChunkedArray) else first_ids
        last_ids = last_ids.combine_chunks() if isinstance(last_ids, pa.ChunkedArray) else last_ids
        return pa.table(
            {id_col: s[id_col], by: s[by], first_col: first_ids, last_col: last_ids}
        )

    return grouped_reduce(ds, by, n_buckets, per_bucket)
