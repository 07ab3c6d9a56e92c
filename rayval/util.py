"""Small shared helpers."""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

import ray


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
