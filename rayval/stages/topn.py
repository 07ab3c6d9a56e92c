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

import pyarrow as pa

import ray.data


def topn_per_group(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    n: int,
    tie_col: str,
) -> "ray.data.Dataset":
    """Top ``n`` rows per ``group_col`` ordered by ``value_col`` descending,
    ties broken by ``tie_col`` ascending.  OUTPUT IS PROJECTED to exactly
    (group_col, value_col, tie_col) — join other columns back by ``tie_col``
    if needed.  Null group keys form their own partition (SQL ROW_NUMBER
    PARTITION BY semantics: the NULL partition is kept, not dropped)."""
    cols = [group_col, value_col, tie_col]

    def head_n(t: pa.Table) -> pa.Table:
        df = t.select(cols).to_pandas()
        df = df.sort_values(
            [group_col, value_col, tie_col], ascending=[True, False, True], kind="stable"
        )
        # dropna=False: pandas' default silently discards null-keyed rows
        df = df.groupby(group_col, sort=False, dropna=False).head(n)
        return pa.Table.from_pandas(df, preserve_index=False).cast(t.select(cols).schema)

    partials = ds.map_batches(head_n, batch_format="pyarrow", zero_copy_batch=True)
    # final exact rank per group (each group sees <= n x num_batches rows)
    return partials.groupby(group_col).map_groups(head_n, batch_format="pyarrow")
