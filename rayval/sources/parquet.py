"""Fragmented parquet source with partition tagging.

The Lance-fragment analog in this container: one parquet file = one fragment =
one ``partition_id`` = the unit of checkpoint/lineage (SURVEY.md §4
"fragment = partition_id = checkpoint unit").  ``read_fragments`` reads a
subset of fragment files (resume passes only uncommitted ones) and tags every
row with its fragment's partition id via ``include_paths`` + a vectorized
path→id map in the first ``map_batches``.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa

import ray.data

from rayval.constraints.profile import PARTITION_COL


def list_fragments(img_dir: str) -> list[str]:
    """Sorted fragment files; sort order defines partition ids (stable across
    runs, so resume and re-merge agree)."""
    files = sorted(glob.glob(os.path.join(img_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet fragments under {img_dir}")
    return files


def fragment_id(path: str) -> int:
    """part-00042.parquet -> 42; falls back to a stable name hash."""
    base = os.path.basename(path)
    digits = "".join(ch for ch in base.split(".")[0] if ch.isdigit())
    if digits:
        return int(digits)
    return abs(hash(base)) % (1 << 31)


def read_fragments(
    files: list[str],
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
) -> "ray.data.Dataset":
    """Dataset over the given fragment files with a ``partition_id`` column.

    Columns are pruned AT THE READ (``columns=[...]``) — pass only what the
    pipeline needs so wide binary payloads never leave storage unnecessarily.
    """
    id_by_path = {os.path.abspath(f): fragment_id(f) for f in files}
    cols = None if columns is None else list(columns)
    if override_num_blocks is None:
        # one block per fragment: fragment-aligned blocks keep the partition
        # mapping trivial AND avoid the streaming executor's per-block dispatch
        # overhead on many tiny split blocks (measured 2-4x on wide binary rows)
        override_num_blocks = len(files)

    ds = ray.data.read_parquet(
        files,
        columns=cols,
        include_paths=True,
        override_num_blocks=override_num_blocks,
    )

    def tag(batch: pa.Table) -> pa.Table:
        arr = np.asarray(batch["path"].to_pylist(), dtype=object)
        uniq, inv = np.unique(arr, return_inverse=True)
        ids = np.array([id_by_path.get(os.path.abspath(u), -1) for u in uniq], dtype=np.int64)[inv]
        batch = batch.drop_columns(["path"])
        return batch.append_column(PARTITION_COL, pa.array(ids, type=pa.int64()))

    return ds.map_batches(tag, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
