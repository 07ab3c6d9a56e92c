"""Profile = the schema analog: column bindings + structural collection kind +
table-level constraint declarations, compiled ONCE on the driver into a
``BatchValidator`` — the engine's equivalent of the reference's
schema→closure compile step (``validation-fn-of`` core.clj:257-261,
parser.clj:331-341).  The validator is a plain picklable object shipped to
workers by closure capture in ``ds.map_batches`` — the analog of
``(partial decode schema)`` (README.md:62-67 of the reference).

Structural semantics (SURVEY.md §2.3):
- ``kind="sequence"``: batch schema must contain exactly the declared columns
  IN ORDER (core.clj:138-146 — ``(= (keys elem-map) (map :tag value))``); a
  per-fragment metadata check, not per-row.
- ``kind="all"``: same columns, order-insensitive (core.clj:161-171).
- ``kind="choice"``: per-row exactly-one-non-null across the declared columns
  (core.clj:150-159 — exactly one child whose tag ∈ schema keys).
- ``extend()``: profile inheritance — union of base+extension bindings at
  compile time (extension/complexContent, core.clj:173-195); both base and
  extension collection kinds must agree, as the reference requires.

Violation rows are ``(partition_id:int64, <key>:string, constraint_id:string)``
per FIXTURES.md F4. Structural violations carry a null key and are emitted at
most once per batch; deduplicate with ``distinct`` downstream.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rayval.constraints.base import ColumnView, CompileContext, Constraint
from rayval.constraints.combinators import _Named
from rayval.constraints.leaves import Fixed, NotNull

PARTITION_COL = "partition_id"


@dataclass
class Field:
    """One column binding — the ``element``/``attribute`` analog
    (core.clj:80-93, 197-202).

    ``constraint``: a Constraint, a registry name (``ref=`` analog), or None.
    ``default``: fill nulls with this value before any check (attr default).
    ``fixed``: value must equal this constant (attr fixed).
    ``required``: null is a violation (attr use="required").
    """

    name: str
    constraint: Any = None  # Constraint | str | None
    required: bool = False
    default: Any = None
    fixed: Any = None


@dataclass
class TableRule:
    """Declaration of a table-level check executed by pipeline stages (not per
    batch): uniqueness / referential / drift.  The profile carries these so the
    whole validation contract lives in one declarative object; stages consume
    them (rayval.stages.dedup / referential / stats)."""

    kind: str  # "unique" | "referential" | "drift" | "neardup" | "functional"
    column: str
    params: dict = dc_field(default_factory=dict)

    @property
    def constraint_id(self) -> str:
        return f"{self.column}.{self.kind}"


class Profile:
    def __init__(
        self,
        name: str,
        fields: Sequence[Field],
        kind: str = "all",
        registry: Optional[dict[str, Constraint]] = None,
        table_rules: Sequence[TableRule] = (),
        infer_scalars: bool = False,
        key: Optional[str] = None,
        choice_groups: Sequence[tuple] = (),
    ):
        assert kind in ("sequence", "all", "choice"), kind
        self.name = name
        self.fields = list(fields)
        self.kind = kind
        self.registry = dict(registry or {})
        self.table_rules = list(table_rules)
        self.infer_scalars = infer_scalars
        self.key = key  # violation key column (e.g. "image_id")
        # nested <choice> groups: [(prefix, [member columns])] — a nested
        # complexType with kind="choice" flattens to dotted fields but KEEPS
        # its exactly-one-non-null semantics per prefix (core.clj:150-159
        # compiles choice per complexType, not only at the root)
        self.choice_groups = [(p, list(m)) for p, m in choice_groups]

    def extend(self, ext_fields: Sequence[Field], kind: Optional[str] = None, name: Optional[str] = None) -> "Profile":
        """Extension analog (core.clj:173-195): base+ext column sets union; the
        collection kinds must match (the reference probes both signatures and
        requires the same collection type)."""
        if kind is not None and kind != self.kind:
            raise ValueError(f"extension collection kind {kind!r} != base {self.kind!r} (core.clj:177-195)")
        return Profile(
            name or f"{self.name}+ext",
            [*self.fields, *ext_fields],
            kind=self.kind,
            registry=self.registry,
            table_rules=self.table_rules,
            infer_scalars=self.infer_scalars,
            key=self.key,
            choice_groups=self.choice_groups,
        )

    def compile(self) -> "BatchValidator":
        return BatchValidator(self)


@dataclass
class _Check:
    constraint_id: str
    column: str
    constraint: Constraint


class BatchValidator:
    """Vectorized evaluator: ``pa.Table -> masks / violations / verdict``.

    Picklable (pure-python constraints + dicts) so a single driver-side compile
    ships to every map_batches task.
    """

    def __init__(self, profile: Profile):
        self.profile = profile
        self.ctx = CompileContext(profile.registry, infer_scalars=profile.infer_scalars)
        self.columns = [f.name for f in profile.fields]
        self.defaults = {f.name: f.default for f in profile.fields if f.default is not None}
        self.checks: list[_Check] = []
        for f in profile.fields:
            per_field: list[Constraint] = []
            if f.required:
                per_field.append(NotNull())
            if f.fixed is not None:
                per_field.append(Fixed(f.fixed))
            if f.constraint is not None:
                c = f.constraint if isinstance(f.constraint, Constraint) else _Named(f.constraint)
                per_field.extend(c.flatten())
            seen: dict[str, int] = {}
            for c in per_field:
                cid = f"{f.name}.{c.kind}"
                n = seen.get(cid, 0)
                seen[cid] = n + 1
                if n:
                    cid = f"{cid}{n + 1}"
                self.checks.append(_Check(cid, f.name, c))
        # eager ref resolution — unknown names fail at compile, not at first
        # batch (the reference resolves the env at compile, core.clj:128-134)
        for ch in self.checks:
            _validate_refs(ch.constraint, self.ctx)

    # -- schema-level (structural) --------------------------------------------
    def schema_violations(self, schema: pa.Schema) -> list[str]:
        """Structural constraint_ids violated by this batch/fragment schema.
        Dotted (nested) field names participate via their ROOT column for the
        sequence/all set checks and via struct descent for presence."""
        names = [n for n in schema.names if n != PARTITION_COL]
        roots: list[str] = []
        for c in self.columns:
            r = c.split(".")[0]
            if r not in roots:
                roots.append(r)
        out = []
        if self.profile.kind == "sequence":
            # ordered exact-key equality (core.clj:143 "TODO order!" — array-map
            # ordering is load-bearing in the reference; we pin it as declared order)
            present = [n for n in names if n in set(roots)]
            if present != roots or set(names) - set(roots):
                out.append("__schema__.sequence")
        elif self.profile.kind == "all":
            if set(names) != set(roots):
                out.append("__schema__.all")
        for c in self.columns:
            if not _schema_has(schema, c):
                out.append(f"{c}.missing")
        return out

    # -- per-batch -------------------------------------------------------------
    @staticmethod
    def _resolve(table: pa.Table, name: str):
        """Column by name, with dotted paths descending struct columns — the
        nested-element analog (reference documents are trees; nested XML maps
        to Arrow struct columns, SURVEY.md §1.5).  Returns None if absent."""
        if name in table.column_names:
            return table[name]
        if "." in name:
            root, *rest = name.split(".")
            if root not in table.column_names:
                return None
            col = table[root]
            try:
                for part in rest:
                    col = pc.struct_field(col, part)
            except (KeyError, pa.ArrowInvalid, pa.ArrowTypeError):
                return None
            return col
        return None

    def _views(self, table: pa.Table) -> dict[str, ColumnView]:
        views = {}
        for name in self.columns:
            col = self._resolve(table, name)
            if col is None:
                continue
            if name in self.defaults:
                # attr default (core.clj:197-202).  XSD defaults arrive
                # scalar-inferred (default="5" -> int 5), which Arrow refuses
                # to fill into a string column — cast to the COLUMN's type
                # (str(5) = "5"; the inference view reads it back as 5, so
                # the inferred semantics are unchanged)
                try:
                    col = pc.fill_null(col, self.defaults[name])
                except (pa.ArrowTypeError, pa.ArrowInvalid, pa.ArrowNotImplementedError):
                    col = pc.fill_null(col, pa.scalar(self.defaults[name]).cast(col.type))
            views[name] = ColumnView(col, infer_scalars=self.profile.infer_scalars)
        return views

    def masks(self, table: pa.Table) -> dict[str, np.ndarray]:
        """{constraint_id: bool[n] valid-mask} for every compiled check present
        in this batch (missing columns are structural, reported separately)."""
        views = self._views(table)
        out: dict[str, np.ndarray] = {}
        for ch in self.checks:
            v = views.get(ch.column)
            if v is None:
                continue
            out[ch.constraint_id] = ch.constraint.mask(v, self.ctx)
        if self.profile.kind == "choice":
            out["__schema__.choice"] = self._root_choice_mask(table, views)
        for prefix, members in self.profile.choice_groups:
            out[f"{prefix}.choice"] = self._choice_mask(table, views, members)
        return out

    def _root_choice_mask(self, table: pa.Table, views: dict[str, ColumnView]) -> np.ndarray:
        """Root kind="choice": exactly one ELEMENT child present.  A complex
        member flattens to dotted leaf columns, so counting raw leaves would
        tally each of its populated fields separately (a legitimately-chosen
        two-field member would count 2 and falsely violate).  Group the
        flattened columns by top-level element first — the same per-element
        semantics the nested choice_groups path gets from ``_element_paths``
        (core.clj:150-159 compiles choice over element children, not leaves).
        Member presence = the struct column non-null when it resolves whole,
        else any of its leaves non-null."""
        members: dict[str, list[str]] = {}
        for name in self.columns:
            members.setdefault(name.split(".")[0], []).append(name)
        n = table.num_rows
        cnt = np.zeros(n, dtype=np.int16)
        for top, leaves in members.items():
            if len(leaves) == 1 and leaves[0] == top:
                v = views.get(top)
                if v is not None:
                    cnt += (~v.null_np).astype(np.int16)
                continue
            col = self._resolve(table, top)
            if col is not None:
                cnt += (~col.is_null().to_numpy(zero_copy_only=False)).astype(np.int16)
                continue
            present = np.zeros(n, dtype=bool)
            for leaf in leaves:
                v = views.get(leaf)
                null_np = v.null_np if v is not None else None
                if null_np is None:
                    col = self._resolve(table, leaf)
                    if col is None:
                        continue
                    null_np = col.is_null().to_numpy(zero_copy_only=False)
                present |= ~null_np
            cnt += present.astype(np.int16)
        return cnt == 1

    def _choice_mask(self, table: pa.Table, views: dict[str, ColumnView], names) -> np.ndarray:
        """Exactly one non-null among ``names`` (core.clj:150-159) — the root
        profile's columns for kind="choice", a nested group's members for
        every flattened <choice> complexType."""
        n = table.num_rows
        cnt = np.zeros(n, dtype=np.int16)
        for name in names:
            v = views.get(name)
            if v is not None:
                cnt += (~v.null_np).astype(np.int16)
            else:
                col = self._resolve(table, name)  # non-leaf member (struct)
                if col is not None:
                    cnt += (~col.is_null().to_numpy(zero_copy_only=False)).astype(np.int16)
        return cnt == 1

    def row_valid(self, table: pa.Table) -> np.ndarray:
        m = np.ones(table.num_rows, dtype=bool)
        for mask in self.masks(table).values():
            m &= mask
        return m

    def violations(self, table: pa.Table, key: Optional[str] = None) -> pa.Table:
        """Violation rows for one batch: (partition_id, <key>, constraint_id).

        ``partition_id`` is taken from the batch if present (the source tags
        fragments), else -1.  Structural violations get a null key.
        """
        key = key or self.profile.key or "image_id"
        n = table.num_rows
        if PARTITION_COL in table.column_names:
            part = table[PARTITION_COL].combine_chunks() if isinstance(table[PARTITION_COL], pa.ChunkedArray) else table[PARTITION_COL]
            part_np = part.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        else:
            part_np = np.full(n, -1, dtype=np.int64)
        if key in table.column_names:
            keys = table[key]
            keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
        else:
            keys = pa.nulls(n, pa.string())

        parts: list[np.ndarray] = []
        key_idx: list[np.ndarray] = []
        cids: list[str] = []
        counts: list[int] = []
        for cid, mask in self.masks(table).items():
            bad = np.flatnonzero(~mask)
            if bad.size:
                parts.append(part_np[bad])
                key_idx.append(bad)
                cids.append(cid)
                counts.append(bad.size)
        # structural (schema-level) — once per batch, null key, every distinct partition
        struct_ids = self.schema_violations(table.schema)
        s_part: list[int] = []
        s_cid: list[str] = []
        if struct_ids:
            for pid in np.unique(part_np) if n else [-1]:
                for cid in struct_ids:
                    s_part.append(int(pid))
                    s_cid.append(cid)
        if not parts and not s_cid:
            return _empty_violations(key)

        if parts:
            all_idx = np.concatenate(key_idx)
            key_arr = keys.take(pa.array(all_idx, type=pa.int64()))
            part_arr = pa.array(np.concatenate(parts), type=pa.int64())
            cid_arr = pa.array(
                np.repeat(np.array(cids, dtype=object), np.array(counts)), type=pa.string()
            )
        else:
            key_arr = pa.array([], type=pa.string())
            part_arr = pa.array([], type=pa.int64())
            cid_arr = pa.array([], type=pa.string())
        if s_cid:
            part_arr = pa.concat_arrays([part_arr, pa.array(s_part, type=pa.int64())])
            key_arr = pa.concat_arrays([key_arr.combine_chunks() if isinstance(key_arr, pa.ChunkedArray) else key_arr,
                                        pa.nulls(len(s_cid), key_arr.type)])
            cid_arr = pa.concat_arrays([cid_arr, pa.array(s_cid, type=pa.string())])
        return pa.table({PARTITION_COL: part_arr, key: key_arr, "constraint_id": cid_arr})

    def verdict(self, table: pa.Table) -> bool:
        """``valid?`` analog (core.clj:279-285): every check passes."""
        return bool(self.violations(table).num_rows == 0)


def _schema_has(schema: pa.Schema, name: str) -> bool:
    parts = name.split(".")
    if parts[0] not in schema.names:
        return False
    t = schema.field(parts[0]).type
    for p in parts[1:]:
        if not pa.types.is_struct(t):
            return False
        idx = t.get_field_index(p)
        if idx < 0:
            return False
        t = t.field(idx).type
    return True


def _validate_refs(c: Constraint, ctx: CompileContext, _depth: int = 0) -> None:
    if _depth > 32:
        raise ValueError("constraint reference cycle detected")
    from rayval.constraints.combinators import AnyOf, Restriction

    if isinstance(c, _Named):
        _validate_refs(ctx.resolve(c.name), ctx, _depth + 1)
    elif isinstance(c, Restriction):
        base = c.base if isinstance(c.base, Constraint) else _Named(c.base)
        _validate_refs(base, ctx, _depth + 1)
    elif isinstance(c, AnyOf):
        for m in c.members:
            _validate_refs(m if isinstance(m, Constraint) else _Named(m), ctx, _depth + 1)


def _empty_violations(key: str) -> pa.Table:
    return pa.table(
        {
            PARTITION_COL: pa.array([], type=pa.int64()),
            key: pa.array([], type=pa.string()),
            "constraint_id": pa.array([], type=pa.string()),
        }
    )
