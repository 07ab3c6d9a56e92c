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
import pyarrow.compute as pc

import ray.data

from rayval.constraints.profile import PARTITION_COL


def list_fragments(img_dir: str) -> list[str]:
    """Sorted fragment files.  Partition ids come from :func:`fragment_id`
    (numeric stem, else stable name hash) — stable across runs AND across
    incremental additions, so resume and re-merge agree.  Refuses colliding
    ids up front: two fragments sharing a partition_id would silently merge
    their stats/violations under one key."""
    files = sorted(glob.glob(os.path.join(img_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet fragments under {img_dir}")
    seen: dict[int, str] = {}
    for f in files:
        fid = fragment_id(f)
        if fid in seen:
            raise ValueError(
                f"fragment partition_id collision: {os.path.basename(seen[fid])!r} and "
                f"{os.path.basename(f)!r} both map to {fid} — give numbered fragments "
                "unique numeric suffixes (part-00001, part-00002, ...) or use "
                "non-numbered distinct names"
            )
        seen[fid] = f
    return files


def fragment_id(path: str) -> int:
    """part-00042.parquet -> 42; non-numeric stems get a CROSS-PROCESS-stable
    name hash (``state.hashing.hash64`` — builtin ``hash()`` is randomized
    per interpreter via PYTHONHASHSEED, which would break resume: a second
    run would key the same fragment's sketches/violations under a different
    partition_id).  Only a PURELY numeric stem (ignoring non-digits ONLY when
    the digits are a single trailing run, e.g. part-00042) uses the number;
    mixed names like train-001 vs val-001 would otherwise collide on 1."""
    base = os.path.basename(path)
    stem = base.split(".")[0]
    digits = "".join(ch for ch in stem if ch.isdigit())
    if digits and (stem.isdigit() or _is_canonical_numbered(stem)):
        return int(digits)
    from rayval.state.hashing import hash64

    return int(hash64(np.array([base], dtype=object))[0] % np.uint64(1 << 31))


def _is_canonical_numbered(stem: str) -> bool:
    """True for '<prefix>-<digits>' / '<prefix>_<digits>' shapes where the
    digits are one trailing run (part-00042, fragment_7) — the shapes whose
    numeric suffix is a collision-free id within one directory."""
    for sep in ("-", "_"):
        head, s, tail = stem.rpartition(sep)
        if s and tail.isdigit() and not any(ch.isdigit() for ch in head):
            return True
    return False


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
        # dictionary-encode the (highly repetitive) path column: the per-row
        # work stays in Arrow; only the tiny dictionary crosses into Python
        col = batch["path"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        enc = pc.dictionary_encode(col)
        uniq = enc.dictionary.to_pylist()
        ids_by_code = np.empty(len(uniq), dtype=np.int64)
        for ci, u in enumerate(uniq):
            fid = id_by_path.get(os.path.abspath(u))
            if fid is None:
                # fail FAST: an unmapped path means driver/worker path
                # resolution diverged (symlinks, object-store URIs) — a -1
                # fallback would silently merge every row into one pseudo
                # partition and corrupt stats/violations/drift keying
                raise ValueError(
                    f"read returned path {u!r} not in the fragment map "
                    f"({len(id_by_path)} fragments) — path resolution mismatch"
                )
            ids_by_code[ci] = fid
        ids = ids_by_code[enc.indices.to_numpy(zero_copy_only=False)]
        batch = batch.drop_columns(["path"])
        return batch.append_column(PARTITION_COL, pa.array(ids, type=pa.int64()))

    return ds.map_batches(tag, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
