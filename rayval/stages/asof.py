"""Temporal joins — as-of and range, operators Ray Data lacks, composed from
the engine's partitioned-log shape (the build brief's canonical
custom-operator examples).

Shape (scales): both sides project to narrow columns, tag a side marker,
union, and reduce BY HASH BUCKET (``hash64(by) % n_buckets``), not by key:
``groupby(by).map_groups`` pays one Python call + one Arrow-table
construction PER KEY, which dominates wall time when the key space is large
with small per-key logs (10^8+ users; the same dispatch failure mode this
repo measured on n-gram groups and fixed by bucketing — see
``docdedup.ngram_jaccard_pairs``).  Each bucket is matched in ONE fully
vectorized merge pass:

    sort the bucket's tagged union by (by, probe_value, side[, pick])
    — Arrow sort_indices, C++ —
    then for every LEFT row, the number of RIGHT rows at or before it is a
    cumulative-sum lookup: with right rows sorted BEFORE equal probe values
    the count is searchsorted(..., side='right'); sorted AFTER, side='left'.
    No per-key work at all; ties and segment membership fall out of the one
    sort order.

Python calls per reduce: ``n_buckets`` (default 64), independent of key
count.  ``n_buckets=0`` falls back to exact per-key grouping (one bucket ==
one key — the same UDF), which the conformance tests use to pin
bucketed ≡ per-key.  Size ``n_buckets`` so one bucket's rows fit a reducer
(rows / n_buckets ≈ 10^7 for narrow logs); skewed keys are bounded by
per-key log length exactly as before — bucketing never co-locates MORE than
the old per-key grouping did, it only packs many small keys into one call.

Null semantics (matches the SQL oracles): a left row with a NULL ``on``
matches nothing (comparisons with NULL are never true); right rows with a
NULL ``on`` never match.  Ties on ``on`` within a key are broken by the
LARGEST right-side pick value (sort places null picks first, so a null pick
loses ties), so output is deterministic even when (by, on) repeats on the
right.  Null ``by`` keys follow SQL ON-clause semantics: ``l.by = r.by`` is
never true for NULL, so null-key RIGHT rows are dropped at bucket prep and
null-key LEFT rows come out unmatched (null pick / count 0 / no pairs) —
unlike the window operators (windows.py), whose SQL analog is PARTITION BY,
which groups NULL keys together.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from rayval.stages.bucketed import DEFAULT_BUCKETS, drop_bucket_col, grouped_reduce, key_codes


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




def _merge_pass(
    g: pa.Table,
    by: str,
    probe: str,
    right_first: bool,
    with_pick: bool,
    with_codes: bool = True,
    rid_only: bool = False,
):
    """ONE vectorized merge pass over a bucket's tagged union table.

    Sorts by (by asc, probe asc, side, [pick asc]) with nulls first; with
    ``right_first`` the side order puts RIGHT rows before LEFT rows on equal
    (by, probe) — the searchsorted(side='right') bound — else after
    (side='left').  Returns, for every LEFT row:

      rid        its ``__rid`` (original bucket row id, for cross-pass align)
      upto       bucket-GLOBAL count of right rows sorted before it
      codes_l    its key-run code (dictionary code of ``by`` in sorted order)
      pos        its position in the sorted table

    plus the sorted table ``s``, the right-row mask ``is_r`` and the right
    rows' key codes ``codes_r`` (right rows enumerate identically across
    passes: their relative order is (by, probe=on, pick), independent of the
    side tie-break).  A left row with null ``on`` sorts at its key run's
    head (nulls first), so its ``upto`` counts no same-key rights — the
    null-matches-nothing semantics falls out of the sort order.

    ``with_codes=False`` skips the dictionary-encode of ``by`` (the range
    joins never consume codes: both bounds are bucket-global counts in the
    same key-sorted order, so other keys' rights cancel in the difference).
    ``rid_only=True`` additionally gathers just (__side, __rid) instead of
    materializing every payload column — the lower-bound pass needs only
    (rid, upto), and the full-table take was its dominant cost."""
    keys = [(by, "ascending"), (probe, "ascending"),
            ("__side", "descending" if right_first else "ascending")]
    if with_pick:
        keys.append(("__pick", "ascending"))
    idx = pc.sort_indices(g, sort_keys=keys, null_placement="at_start")
    if rid_only:
        sl = g.select(["__side", "__rid"]).take(idx)
        is_r = sl["__side"].to_numpy(zero_copy_only=False) == 1
        pos = np.flatnonzero(~is_r)
        return {
            "rid": sl["__rid"].to_numpy(zero_copy_only=False)[pos],
            "upto": np.cumsum(is_r)[pos],
        }
    s = g.take(idx)
    is_r = s["__side"].to_numpy(zero_copy_only=False) == 1
    cumr = np.cumsum(is_r)
    pos = np.flatnonzero(~is_r)
    codes = key_codes(s[by]) if with_codes else None
    return {
        "s": s,
        "is_r": is_r,
        "codes_r": codes[is_r] if with_codes else None,
        "rid": s["__rid"].to_numpy(zero_copy_only=False)[pos],
        "upto": cumr[pos],  # rights strictly before each left row (left rows
        # contribute 0 to cumr, so the inclusive cumsum at a left position
        # counts exactly the rights sorted before it)
        "codes_l": codes[pos] if with_codes else None,
        "pos": pos,
    }


def _prep_bucket(g: pa.Table, on: str, by: str) -> pa.Table:
    """Drop the bucket column and right rows with a null ``on`` OR a null
    ``by`` key (SQL ``ON l.by = r.by`` is never true for NULL, so they can
    never match; left rows keep LEFT-join semantics: emitted unmatched), and
    attach ``__rid`` row ids for cross-pass alignment."""
    g = drop_bucket_col(g)
    side = g["__side"]
    keep = pc.or_(
        pc.equal(side, pa.scalar(0, pa.int8())),
        pc.and_(g[on].is_valid(), g[by].is_valid()),
    )
    g = g.filter(keep)
    return g.append_column("__rid", pa.array(np.arange(g.num_rows, dtype=np.int64)))


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    by: str,
    on: str,
    left_keep: list[str],
    right_pick: str,
    out_col: str = "matched",
    n_buckets: int = DEFAULT_BUCKETS,
) -> "ray.data.Dataset":
    """LEFT as-of join: for every left row, the right row of the same ``by``
    key with the greatest ``on`` <= the left row's ``on`` (SQL ``ASOF LEFT
    JOIN ... ON l.by = r.by AND l.on >= r.on``).  Emits ``left_keep`` columns
    plus ``out_col`` = that row's ``right_pick`` value (null when nothing
    precedes).  One merge pass per hash bucket (see module docstring)."""
    l_cols = list(dict.fromkeys([by, on] + left_keep))
    pick_type = right.schema().base_schema.field(right_pick).type
    l_schema = left.schema().base_schema
    l_types = {c: l_schema.field(c).type for c in l_cols}
    keep_types = {c: l_types[c] for c in left_keep}
    both = _tag_union(left, right, by, on, l_cols, right_pick, pick_type, l_types)

    def per_bucket(g: pa.Table) -> pa.Table:
        g = _prep_bucket(g, on, by)
        if g.num_rows == 0:
            return pa.table(
                {**{c: pa.array([], keep_types[c]) for c in left_keep},
                 out_col: pa.array([], pick_type)}
            )
        m = _merge_pass(g, by, on, right_first=True, with_pick=True)
        lt = m["s"].take(pa.array(m["pos"]))
        g_idx = m["upto"] - 1
        safe = np.maximum(g_idx, 0)
        # hit: at least one right sorted before it AND that right belongs to
        # the same key run (a left row heading its run would otherwise pick
        # up the previous key's last right)
        hit = (g_idx >= 0) & (m["codes_r"][safe] == m["codes_l"]) if len(m["codes_r"]) else np.zeros(len(g_idx), dtype=bool)
        out = {c: lt[c] for c in left_keep}
        if hit.any():
            picks = m["s"].filter(pa.array(m["is_r"]))["__pick"]
            picks = picks.combine_chunks() if isinstance(picks, pa.ChunkedArray) else picks
            taken = picks.take(pa.array(np.where(hit, g_idx, 0)))
            out[out_col] = pc.if_else(pa.array(hit), taken, pa.scalar(None, pick_type))
        else:
            out[out_col] = pa.nulls(lt.num_rows, pick_type)
        return pa.table(out)

    return grouped_reduce(both, by, n_buckets, per_bucket)


def _probe_lo_col(g: pa.Table, on: str, width) -> pa.Table:
    """Append ``__vlo`` = (left rows: on - width, right rows: on) — the lower
    window bound probe, computed in Arrow so nulls stay null."""
    if isinstance(width, pa.Scalar):
        w = width
    elif isinstance(width, np.timedelta64):
        # Arrow has no hour/day duration units — normalize to microseconds
        w = pa.scalar(width.astype("timedelta64[us]"))
    else:
        w = pa.scalar(width)
    is_left = pc.equal(g["__side"], pa.scalar(0, pa.int8()))
    lowered = pc.subtract(g[on], w)
    return g.append_column("__vlo", pc.if_else(is_left, lowered, g[on]))


def range_count_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    by: str,
    on: str,
    width,
    left_keep: list[str],
    out_col: str = "n_in_range",
    n_buckets: int = DEFAULT_BUCKETS,
) -> "ray.data.Dataset":
    """RANGE join (count form): for every LEFT row, the number of RIGHT rows
    of the same ``by`` key whose ``on`` lies in ``[left.on - width, left.on]``
    — TWO merge passes per bucket (upper bound: rights before the probe with
    right-first ties = searchsorted 'right'; lower bound on ``on - width``
    with left-first ties = searchsorted 'left'); the count is the bucket-
    global difference (the other keys' rights cancel).  A full materializing
    range join (emit the pairs) is :func:`range_pairs_join`; the count form
    is the aggregation-pushed variant that avoids the pair blowup at scale.
    A left row with null ``on`` counts 0."""
    l_cols = list(dict.fromkeys([by, on] + left_keep))
    l_schema = left.schema().base_schema
    l_types = {c: l_schema.field(c).type for c in l_cols}
    keep_types = {c: l_types[c] for c in left_keep}
    both = _tag_union(left, right, by, on, l_cols, None, None, l_types)

    def per_bucket(g: pa.Table) -> pa.Table:
        g = _prep_bucket(g, on, by)
        if g.num_rows == 0:
            return pa.table(
                {**{c: pa.array([], keep_types[c]) for c in left_keep},
                 out_col: pa.array([], pa.int64())}
            )
        g = _probe_lo_col(g, on, width)
        hi = _merge_pass(g, by, on, right_first=True, with_pick=False, with_codes=False)
        lo = _merge_pass(g, by, "__vlo", right_first=False, with_pick=False, rid_only=True)
        lo_by_rid = np.zeros(g.num_rows, dtype=np.int64)
        lo_by_rid[lo["rid"]] = lo["upto"]
        counts = hi["upto"] - lo_by_rid[hi["rid"]]
        lt = hi["s"].take(pa.array(hi["pos"]))
        out = {c: lt[c] for c in left_keep}
        out[out_col] = pa.array(counts)
        return pa.table(out)

    return grouped_reduce(both, by, n_buckets, per_bucket)


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
    n_buckets: int = DEFAULT_BUCKETS,
) -> "ray.data.Dataset":
    """RANGE join (pair form): one output row per (left row, right row) pair
    of the same ``by`` key with ``right.on`` in ``[left.on - width, left.on]``
    — "which views preceded this purchase".  Emits ``left_keep`` plus
    ``out_col`` = the matched right row's ``right_pick``.  INNER semantics:
    a left row with an empty window (or a null ``on``) emits nothing — use
    :func:`range_count_join` when you need the zeros.

    Same two merge passes as the count form; the windows materialize with one
    vectorized gather (np.repeat over window starts + flat offsets) against
    the rights-in-sorted-order pick array (identical enumeration across both
    passes — their relative order is (by, on, pick) in each).

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

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {**{c: pa.array([], keep_types[c]) for c in left_keep},
             out_col: pa.array([], pick_type)}
        )
        g = _prep_bucket(g, on, by)
        if g.num_rows == 0:
            return empty
        g = _probe_lo_col(g, on, width)
        # codes feed only the skew guard; the lo pass feeds only (rid, upto)
        # — equal-(by, probe) rights permuting among themselves can't move a
        # left row across any right, so __pick still participates in the sort
        # for exactness of the documented enumeration but no payload columns
        # need materializing
        hi = _merge_pass(g, by, on, right_first=True, with_pick=True,
                         with_codes=max_pairs_per_key is not None)
        lo = _merge_pass(g, by, "__vlo", right_first=False, with_pick=True, rid_only=True)
        lo_by_rid = np.zeros(g.num_rows, dtype=np.int64)
        lo_by_rid[lo["rid"]] = lo["upto"]
        lo_g = lo_by_rid[hi["rid"]]
        counts = hi["upto"] - lo_g
        if max_pairs_per_key is not None and counts.sum() > 0:
            # codes are >= -1 (null key = -1): +1 gives every key — including
            # the null-key group — its OWN bincount bin (np.maximum would
            # merge null-key pairs into key 0's bin and could trip the cap
            # on their combined total)
            per_key = np.bincount(hi["codes_l"] + 1, weights=counts)
            worst = int(per_key.max())
            if worst > max_pairs_per_key:
                raise ValueError(
                    f"range_pairs_join: a key would emit {worst} pairs "
                    f"(> max_pairs_per_key={max_pairs_per_key}); salt the key by "
                    "time-range or use range_count_join"
                )
        total = int(counts.sum())
        if total == 0:
            return empty
        lt = hi["s"].take(pa.array(hi["pos"]))
        picks = hi["s"].filter(pa.array(hi["is_r"]))["__pick"]
        picks = picks.combine_chunks() if isinstance(picks, pa.ChunkedArray) else picks
        l_idx = np.repeat(np.arange(lt.num_rows, dtype=np.int64), counts)
        ends = np.cumsum(counts)
        offsets = np.arange(total, dtype=np.int64) - np.repeat(ends - counts, counts)
        r_idx = np.repeat(lo_g, counts) + offsets
        out = {c: lt[c].take(pa.array(l_idx)) for c in left_keep}
        out[out_col] = picks.take(pa.array(r_idx))
        return pa.table(out)

    return grouped_reduce(both, by, n_buckets, per_bucket)
