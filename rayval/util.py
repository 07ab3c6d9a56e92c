"""Small shared helpers."""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray


def group_codes(col) -> tuple[np.ndarray, pa.Array]:
    """Per-batch group segmentation primitive shared by the grouped
    operators (topn partial, grouped sketch partials): dictionary-encode a
    group-key column and return ``(codes int64, dictionary)`` where NULL
    keys get code -1 (dictionary indices surface nulls as NaN through a
    float round-trip — the subtle part, centralized here so the null
    handling can't drift between copies)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = col.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False)
    if codes.dtype.kind == "f":
        codes = np.where(np.isnan(codes), -1, codes)
    return codes.astype(np.int64), enc.dictionary


def sorted_runs(sorted_codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(run ids, run bounds) of a SORTED code array: ``bounds[i]:bounds[i+1]``
    is run i's row span.  Empty input -> two empty arrays."""
    if len(sorted_codes) == 0:
        return np.empty(0, dtype=np.int64), np.zeros(1, dtype=np.int64)
    ids, starts = np.unique(sorted_codes, return_index=True)
    return ids, np.append(starts, len(sorted_codes))


def collect_tables(ds: "ray.data.Dataset", schema: Optional[pa.Schema] = None) -> pa.Table:
    """Collect a (small-output) Dataset into one driver-side Arrow table.

    Materializes FIRST: ``to_arrow_refs()`` on an unexecuted plan runs the
    pipeline twice (the full pass plus an internal limit-1 schema probe, which
    re-runs any upstream all-to-all) — materialize pins one execution and the
    refs are then zero-copy reads from the object store.
    """
    # one batched ray.get: per-ref gets would pay a driver round trip per block
    tables = [t for t in ray.get(ds.materialize().to_arrow_refs()) if t.num_rows]
    if not tables:
        return schema.empty_table() if schema is not None else pa.table({})
    if schema is not None:
        return pa.concat_tables([t.cast(schema) for t in tables])
    return pa.concat_tables(tables, promote_options="default")


def round_half_away(x: np.ndarray) -> np.ndarray:
    """int64 rounding with DuckDB ROUND parity: half AWAY from zero.
    np.round is banker's (half-even) — 62.5 rounds to 62 vs DuckDB's 63 —
    so an exactly-representable .5 product would hash-mismatch the oracle.
    The single shared copy: every oracle-compared fixed-point conversion
    (pipelines/queries.py, stages/windows.py) must route through here so a
    future FP-edge parity fix lands everywhere at once."""
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
