"""Stateless constraint-mask stage + violation explode.

``MetaValidate`` is the per-batch analog of the reference's compiled-closure
application (``(schema-fn instance env...)``, parser.clj:373-375): the
driver-compiled ``BatchValidator`` is captured in the map_batches closure and
evaluated as vectorized kernels, one boolean column per constraint
(``ok__<constraint_id>``).  Carrying masks as columns (rather than emitting
violation rows immediately) lets ONE pass feed every downstream consumer —
violation explode, per-partition stats, verdict — without re-running checks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rayval.constraints.base import ColumnView
from rayval.constraints.combinators import AnyOf
from rayval.constraints.profile import PARTITION_COL, BatchValidator

OK_PREFIX = "ok__"


class MetaValidate:
    """map_batches fn: append ok__* mask columns + caption_len (for sketches)."""

    def __init__(self, validator: BatchValidator):
        self.validator = validator

    def __call__(self, batch: pa.Table) -> pa.Table:
        masks = self.validator.masks(batch)
        for cid, m in masks.items():
            batch = batch.append_column(OK_PREFIX + cid, pa.array(m))
        if "caption" in batch.column_names:
            clen = pc.fill_null(pc.utf8_length(batch["caption"]), -1)
            batch = batch.append_column("caption_len", pc.cast(clen, pa.int32()))
        return batch


class Annotate:
    """``with-status`` analog (parser.clj:384-400): rewrite the table so each
    validated column becomes a struct<value, status> — the IN-BAND form of the
    verdict, vs. the out-of-band ok__ mask columns (the metadata analog,
    core.clj:263-270).  Adds a ``row_valid`` column (per-row AND of all
    checks, the row-level ``valid?``)."""

    def __init__(self, validator: BatchValidator):
        self.validator = validator
        self.by_column: dict[str, list[str]] = {}
        self.unions: list[tuple[str, "AnyOf"]] = []
        for ch in validator.checks:
            self.by_column.setdefault(ch.column, []).append(ch.constraint_id)
            if isinstance(ch.constraint, AnyOf):
                self.unions.append((ch.column, ch.constraint))

    def __call__(self, batch: pa.Table) -> pa.Table:
        # NOTE: no lazy `import rayval...` here — a runtime import executes on
        # the WORKER, which may not have the repo on its path (the by-value
        # cloudpickle fallback in __ray_entry__ ships code, not importability)
        masks = self.validator.masks(batch)
        row_valid = np.ones(batch.num_rows, dtype=bool)
        for m in masks.values():
            row_valid &= m
        out = batch
        for col, cids in self.by_column.items():
            if col not in out.column_names:
                continue
            status = np.ones(batch.num_rows, dtype=bool)
            for cid in cids:
                if cid in masks:
                    status &= masks[cid]
            vals = out[col].combine_chunks() if isinstance(out[col], pa.ChunkedArray) else out[col]
            if col in self.validator.defaults:
                # with-status shows the FILLED default, not the null — default
                # substitution happens before validation (core.clj:197-202;
                # golden parser_test.clj:574)
                vals = pc.fill_null(vals, self.validator.defaults[col])
            struct = pa.StructArray.from_arrays(
                [vals, pa.array(status)],
                names=["value", "status"],
            )
            idx = out.column_names.index(col)
            out = out.set_column(idx, col, struct)
        # ordered first-match member index for union-typed columns — the
        # decode-fidelity requirement flagged in SURVEY.md §7a (core.clj:73-78)
        for col, union in self.unions:
            if col in batch.column_names:
                view = ColumnView(batch[col], infer_scalars=self.validator.profile.infer_scalars)
                out = out.append_column(f"{col}__member", pa.array(union.match_index(view, self.validator.ctx)))
        return out.append_column("row_valid", pa.array(row_valid))


def annotate_from_masks(batch: pa.Table, drop_masks: bool = False) -> pa.Table:
    """Rewrite a table that already carries ``ok__<col>.<kind>`` mask columns
    into the in-band ``with-status`` form (parser.clj:384-400): each checked
    column becomes struct<value, status> (status = AND of its masks) and a
    ``row_valid`` column is appended.  Used to derive the annotated output
    from the flagship's narrow results without re-running any checks."""
    n = batch.num_rows
    by_col: dict[str, list[str]] = {}
    mask_cols = [c for c in batch.column_names if c.startswith(OK_PREFIX)]
    for name in mask_cols:
        cid = name[len(OK_PREFIX):]
        col = cid.rsplit(".", 1)[0]
        if col in batch.column_names:
            by_col.setdefault(col, []).append(name)
    row_valid = np.ones(n, dtype=bool)
    masks_np = {}
    for name in mask_cols:
        m = batch[name]
        m = m.combine_chunks() if isinstance(m, pa.ChunkedArray) else m
        masks_np[name] = m.to_numpy(zero_copy_only=False)
        row_valid &= masks_np[name]
    out = batch
    for col, names in by_col.items():
        status = np.ones(n, dtype=bool)
        for name in names:
            status &= masks_np[name]
        vals = out[col]
        vals = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
        struct = pa.StructArray.from_arrays([vals, pa.array(status)], names=["value", "status"])
        out = out.set_column(out.column_names.index(col), col, struct)
    if drop_masks:
        out = out.drop_columns(mask_cols)
    return out.append_column("row_valid", pa.array(row_valid))


def explode_violations(batch: pa.Table, key: str = "image_id") -> pa.Table:
    """ok__* bool columns -> violation rows (partition_id, <key>, constraint_id)."""
    part = batch[PARTITION_COL].combine_chunks() if isinstance(batch[PARTITION_COL], pa.ChunkedArray) else batch[PARTITION_COL]
    part_np = part.to_numpy(zero_copy_only=False)
    keys = batch[key].combine_chunks() if isinstance(batch[key], pa.ChunkedArray) else batch[key]
    parts, idxs, cids, counts = [], [], [], []
    for name in batch.column_names:
        if not name.startswith(OK_PREFIX):
            continue
        m = batch[name]
        m = m.combine_chunks() if isinstance(m, pa.ChunkedArray) else m
        bad = np.flatnonzero(~m.to_numpy(zero_copy_only=False))
        if bad.size:
            parts.append(part_np[bad])
            idxs.append(bad)
            cids.append(name[len(OK_PREFIX):])
            counts.append(bad.size)
    if not parts:
        # key typed from the BATCH, not hardcoded string: a clean batch must
        # emit the same schema as a violating one or downstream block
        # union/write fails on the mismatch for non-string key columns
        return pa.table(
            {
                PARTITION_COL: pa.array([], type=pa.int64()),
                key: pa.array([], type=keys.type),
                "constraint_id": pa.array([], type=pa.string()),
            }
        )
    all_idx = np.concatenate(idxs)
    return pa.table(
        {
            PARTITION_COL: pa.array(np.concatenate(parts), type=pa.int64()),
            key: keys.take(pa.array(all_idx, type=pa.int64())),
            "constraint_id": pa.array(
                np.repeat(np.array(cids, dtype=object), np.array(counts)), type=pa.string()
            ),
        }
    )
