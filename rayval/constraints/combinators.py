"""Combinators — restriction / union / all-of, mirroring the reference's
compositional semantics (SURVEY.md §2.3) as mask algebra.

- ``Restriction(base, facets)``: base-type check AND facet conjunction, with
  multiple enumeration facets OR'd first (core.clj:66-71, parser.clj:156-158,
  307).  Flattens so each facet reports its own violation constraint_id.
- ``AnyOf`` (xs:union): ordered FIRST-MATCH semantics (core.clj:73-78,
  95-107) — members tried in declared order, memberTypes before inline
  anonymous types; ``match_index`` preserves which member matched (needed for
  decode-output fidelity, the hard part flagged in SURVEY.md §7a).
- ``AllOf``: plain conjunction; flattens for per-check violation reporting.
"""

from __future__ import annotations

from typing import Sequence, Union

import numpy as np

from rayval.constraints.base import ColumnView, CompileContext, Constraint
from rayval.constraints.leaves import Enum

ConstraintOrName = Union[Constraint, str]


class AllOf(Constraint):
    kind = "allOf"

    def __init__(self, members: Sequence[ConstraintOrName]):
        self.members = list(members)

    def mask(self, view: ColumnView, ctx: CompileContext) -> np.ndarray:
        m = np.ones(view.n, dtype=bool)
        for c in self.members:
            m &= ctx.resolve(c).mask(view, ctx)
        return m

    def flatten(self) -> list[Constraint]:
        out: list[Constraint] = []
        for c in self.members:
            if isinstance(c, Constraint):
                out.extend(c.flatten())
            else:
                out.append(_Named(c))
        return out

    def __repr__(self):
        return f"AllOf({self.members!r})"


class _Named(Constraint):
    """Registry reference kept by name — the late-bound ``ref=`` /
    named-simpleType lookup (parser.clj:186-190, core.clj:37-41)."""

    kind = "type"

    def __init__(self, name: str):
        self.name = name

    def mask(self, view: ColumnView, ctx: CompileContext) -> np.ndarray:
        return ctx.resolve(self.name).mask(view, ctx)

    def __repr__(self):
        return f"Ref({self.name!r})"


def Ref(name: str) -> Constraint:
    return _Named(name)


class Restriction(Constraint):
    """base ∧ facets, enumeration facets OR'd (core.clj:63-71)."""

    kind = "restriction"

    def __init__(self, base: ConstraintOrName, facets: Sequence[Constraint]):
        self.base = base
        enums = [f for f in facets if isinstance(f, Enum)]
        others = [f for f in facets if not isinstance(f, Enum)]
        if len(enums) > 1:
            enums = [Enum([v for e in enums for v in e.values])]
        self.facets: list[Constraint] = enums + others

    def mask(self, view: ColumnView, ctx: CompileContext) -> np.ndarray:
        m = ctx.resolve(self.base).mask(view, ctx)
        for f in self.facets:
            m &= f.mask(view, ctx)
        return m

    def flatten(self) -> list[Constraint]:
        base = self.base if isinstance(self.base, Constraint) else _Named(self.base)
        return [*base.flatten(), *self.facets]

    def __repr__(self):
        return f"Restriction({self.base!r}, {self.facets!r})"


class AnyOf(Constraint):
    """xs:union — ordered first-match (core.clj:73-78, member ordering
    core.clj:104-107). Valid iff ANY member accepts; ``match_index`` returns
    the index of the FIRST accepting member (-1 = none)."""

    kind = "union"

    def __init__(self, members: Sequence[ConstraintOrName]):
        self.members = list(members)

    def _member_masks(self, view: ColumnView, ctx: CompileContext) -> list[np.ndarray]:
        return [ctx.resolve(c).mask(view, ctx) for c in self.members]

    def mask(self, view: ColumnView, ctx: CompileContext) -> np.ndarray:
        m = np.zeros(view.n, dtype=bool)
        for mm in self._member_masks(view, ctx):
            m |= mm
        return m | view.null_np

    def match_index(self, view: ColumnView, ctx: CompileContext) -> np.ndarray:
        """int8[n]: index of first matching member, -1 if none (nulls -> -1)."""
        masks = self._member_masks(view, ctx)
        stacked = np.stack(masks) if masks else np.zeros((0, view.n), dtype=bool)
        any_m = stacked.any(axis=0)
        idx = np.where(any_m, stacked.argmax(axis=0), -1).astype(np.int8)
        idx[view.null_np] = -1
        return idx

    def __repr__(self):
        return f"AnyOf({self.members!r})"
