"""Top-N per group — the windowed-rank operator (SQL ROW_NUMBER() OVER
(PARTITION BY g ORDER BY v DESC, k ASC) <= n) as a Ray Data composition.

Scale shape: a per-batch PARTIAL top-N per group inside ``map_batches``
prunes each block to at most n rows per group BEFORE the shuffle, so the
``groupby(group)`` exchange carries <= n x num_batches rows per group instead
of every row — the groupwise analog of the global top-k combiner
(pipelines/queries.q_top_orders_combiner).  The final per-group re-rank runs
in ``map_groups``.  Deterministic tie-break: (value desc, tie_col asc).

Skew note: a group's final rows are bounded by n x num_batches, so even a
hot group cannot flood one reducer; no salting needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def topn_per_group(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    n: int,
    tie_col: str,
    ascending: bool = False,
    final_buckets: int = 64,
) -> "ray.data.Dataset":
    """Top ``n`` rows per ``group_col`` ordered by ``value_col`` descending
    (``ascending=True`` flips to bottom-n — e.g. smallest-hash stratified
    sampling), ties broken by ``tie_col`` ascending.  OUTPUT IS PROJECTED to
    exactly (group_col, value_col, tie_col) — join other columns back by
    ``tie_col`` if needed.  Null group keys form their own partition (SQL
    ROW_NUMBER PARTITION BY semantics: the NULL partition is kept, not
    dropped).  Nulls in value/tie sort last (DuckDB's NULLS LAST default).

    Arrow-native end to end: no pandas round-trip, so int64 value/tie columns
    with nulls are never squeezed through float64 (values > 2^53 survive)."""
    cols = [group_col, value_col, tie_col]
    v_dir = "ascending" if ascending else "descending"
    sort_keys = [(group_col, "ascending"), (value_col, v_dir), (tie_col, "ascending")]

    def head_n(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        if t.num_rows == 0:
            return t
        idx = pc.sort_indices(t, sort_keys=sort_keys, null_placement="at_end")
        t = t.take(idx)
        # group codes on the SORTED batch (nulls -> -1; null group rows are
        # contiguous at the end, so -1 is one run)
        from rayval.util import group_codes

        codes, _ = group_codes(t[group_col])
        m = len(codes)
        new_grp = np.empty(m, dtype=bool)
        new_grp[0] = True
        np.not_equal(codes[1:], codes[:-1], out=new_grp[1:])
        pos = np.arange(m, dtype=np.int64)
        starts = np.maximum.accumulate(np.where(new_grp, pos, 0))
        return t.filter(pa.array(pos - starts < n))

    partials = ds.map_batches(head_n, batch_format="pyarrow", zero_copy_batch=True)

    # final exact rank per group (each group sees <= n x num_batches rows).
    # The reduce groups by a HASH BUCKET of the group key, not the key
    # itself: head_n is already multi-group-aware (it segments within the
    # batch), and map_groups pays a per-GROUP python dispatch — at corpus
    # scale (millions of groups) the dispatch would dominate the work.
    # Every row of one group shares its bucket, so the rank stays exact.
    from rayval.state.hashing import hash64

    def tag(b: pa.Table) -> pa.Table:
        hb = (hash64(b[group_col]) % np.uint64(final_buckets)).astype(np.int64)
        return b.append_column("__bucket", pa.array(hb))

    return (
        partials.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(head_n, batch_format="pyarrow")
    )
