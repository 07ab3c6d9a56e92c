"""Lance source — the real-cluster entry for the north_rule's "map_batches
over Lance fragments" (the input_hint names a Lance table of image+caption
pairs).

This container has no ``lance`` package, so the TESTED stand-in is the
fragmented parquet reader (sources/parquet.py: one file = one fragment = one
``partition_id`` = the checkpoint/lineage unit).  This module keeps the exact
same contract for a real Lance deployment and is import-gated: calling it
without the package raises ``NotImplementedError`` with the stand-in pointer
(the honest-stub pattern used for the video codec).

Shape (scales): ONE Ray task per Lance fragment — the driver lists fragment
ids only (metadata), each task opens the dataset itself and reads just its
fragment with ``columns`` pruned at the read, then tags every row with the
fragment id as ``partition_id``.  No fragment's bytes ever pass through the
driver, and resume can pass the uncommitted fragment-id subset exactly like
``read_fragments`` does for parquet.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray.data

from rayval.constraints.profile import PARTITION_COL


def _require_lance():
    try:
        import lance  # noqa: F401

        return lance
    except ImportError as e:
        raise NotImplementedError(
            "the 'lance' package is not installed in this environment; use the "
            "fragmented parquet reader (rayval.sources.parquet.read_fragments) — "
            "the tested stand-in with the identical fragment = partition_id = "
            "checkpoint-unit contract"
        ) from e


def list_lance_fragments(uri: str) -> list[int]:
    """Sorted Lance fragment ids for ``uri`` (metadata-only driver call) —
    the resume unit: pass the uncommitted subset to
    :func:`read_lance_fragments`."""
    lance = _require_lance()
    return sorted(f.fragment_id for f in lance.dataset(uri).get_fragments())


def read_lance_fragments(
    uri: str,
    fragment_ids: Optional[list[int]] = None,
    columns: Optional[list[str]] = None,
) -> "ray.data.Dataset":
    """Dataset over the given Lance fragments with a ``partition_id`` column
    (= the Lance fragment id), column-pruned at the read.

    One task per fragment: ``from_items(fragment ids)`` fans out, each task
    opens the dataset (workers resolve ``uri`` themselves — no driver-side
    table bytes) and emits its fragment as one block, mirroring the
    fragment-aligned blocks of the parquet stand-in so everything downstream
    (MetaValidate -> DecodeCheck -> checkpoint groups) is source-agnostic."""
    _require_lance()
    if fragment_ids is None:
        fragment_ids = list_lance_fragments(uri)
    cols = None if columns is None else list(columns)

    def load(batch: pa.Table) -> pa.Table:
        import lance

        dset = lance.dataset(uri)
        by_id = {f.fragment_id: f for f in dset.get_fragments()}
        out = []
        for fid in batch["fid"].to_pylist():
            t = by_id[int(fid)].to_table(columns=cols)
            out.append(
                t.append_column(
                    PARTITION_COL, pa.array(np.full(t.num_rows, int(fid), dtype=np.int64))
                )
            )
        return pa.concat_tables(out)

    ids = ray.data.from_items([{"fid": int(i)} for i in fragment_ids])
    # batch_size=1 -> one fragment per task, fragment-aligned output blocks
    return ids.map_batches(load, batch_format="pyarrow", batch_size=1)
