"""Leaf constraints — the restriction-facet library of the reference (§2.2 of
SURVEY.md; parser.clj:130-151, core.clj:49-61) re-expressed as vectorized
boolean-mask kernels over one Arrow column.

Semantics pins (documented reference divergences resolved in favor of
core.clj / XSD — see SURVEY.md §2.2 and FIXTURES.md F5):

- ``minLength`` is >= (core.clj:60; parser.clj:146-147 uses > — not followed)
- ``maxLength`` is <= (core.clj:61; parser.clj:148-149 compares the wrong
  direction — a bug, not followed)
- ``pattern`` is FULL match, like Java ``String.matches`` (core.clj:49-50)
- multiple ``enumeration`` facets OR together; everything else ANDs
  (core.clj:63-71, parser.clj:154-158)
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rayval.constraints.base import ColumnView, CompileContext, Constraint, mask_to_numpy


class Range(Constraint):
    """minInclusive/maxInclusive/minExclusive/maxExclusive over one column
    (parser.clj:136-143; core.clj:56-57 has only the inclusive pair)."""

    kind = "range"

    def __init__(
        self,
        min: Optional[float] = None,
        max: Optional[float] = None,
        min_exclusive: Optional[float] = None,
        max_exclusive: Optional[float] = None,
    ):
        self.min, self.max = min, max
        self.min_exclusive, self.max_exclusive = min_exclusive, max_exclusive

    def mask(self, view: ColumnView, ctx: CompileContext) -> np.ndarray:
        vals, ok = view.numeric()
        m = ok.copy()
        if self.min is not None:
            m &= vals >= self.min
        if self.max is not None:
            m &= vals <= self.max
        if self.min_exclusive is not None:
            m &= vals > self.min_exclusive
        if self.max_exclusive is not None:
            m &= vals < self.max_exclusive
        m |= view.null_np  # nulls pass
        return m

    def __repr__(self):
        return f"Range(min={self.min}, max={self.max}, min_ex={self.min_exclusive}, max_ex={self.max_exclusive})"


class Enum(Constraint):
    """Membership in a value set; multiple enumeration facets OR
    (core.clj:58,63-71, parser.clj:134-135)."""

    kind = "enum"

    def __init__(self, values: Sequence[Any]):
        self.values = list(values)

    def mask(self, view: ColumnView, ctx: CompileContext) -> np.ndarray:
        num_members = [float(v) for v in self.values if isinstance(v, (int, float)) and not isinstance(v, bool)]
        str_members = [v for v in self.values if isinstance(v, str)]
        if not view.infer or not view.is_string_type:
            # typed path: one zero-copy is_in kernel
            try:
                m = mask_to_numpy(pc.is_in(view.col, value_set=pa.array(self.values)), null_value=False)
            except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
                # type mismatch between column and members -> no match
                m = np.zeros(view.n, dtype=bool)
            m |= view.null_np
            return m
        # inference path: numbers compare in number-space, strings only match
        # rows that are NOT numbers (read-string turned those into numbers)
        vals, is_num = view.numeric()
        m = np.zeros(view.n, dtype=bool)
        if num_members:
            m |= is_num & np.isin(vals, np.array(num_members))
        if str_members:
            sm = mask_to_numpy(pc.is_in(view.col, value_set=pa.array(str_members)), null_value=False)
            m |= sm & ~is_num
        m |= view.null_np
        return m

    def __repr__(self):
        return f"Enum({self.values!r})"


class Pattern(Constraint):
    """Full-match regex over the stringified value — Java ``String.matches``
    semantics (core.clj:49-50, parser.clj:150-151)."""

    kind = "pattern"

    def __init__(self, pattern: str):
        self.pattern = pattern
        self._anchored = f"^(?:{pattern})$"
        # fail fast AT COMPILE TIME with the engine that will actually run
        # the pattern: Arrow uses RE2, which rejects constructs Python `re`
        # accepts (lookaround, backreferences) — validating with re.compile
        # alone would defer the failure into a per-batch worker task error
        try:
            pc.match_substring_regex(pa.array([""], pa.string()), self._anchored)
        except pa.ArrowInvalid as e:
            raise ValueError(
                f"pattern {pattern!r} is not RE2-compatible (Arrow executes "
                f"patterns with RE2): {e}"
            ) from e

    def mask(self, view: ColumnView, ctx: CompileContext) -> np.ndarray:
        m = mask_to_numpy(pc.match_substring_regex(view.as_string(), self._anchored), null_value=True)
        return m

    def __repr__(self):
        return f"Pattern({self.pattern!r})"


class _LengthBase(Constraint):
    def __init__(self, value: int):
        self.value = int(value)

    def _lengths(self, view: ColumnView) -> np.ndarray:
        lens = pc.utf8_length(view.as_string())
        return pc.fill_null(lens, -1).to_numpy(zero_copy_only=False)

    def __repr__(self):
        return f"{type(self).__name__}({self.value})"


class Length(_LengthBase):
    """Exact string length (parser.clj:130,144-145): ``count(str(v)) == n``."""

    kind = "length"

    def mask(self, view: ColumnView, ctx: CompileContext) -> np.ndarray:
        return (self._lengths(view) == self.value) | view.null_np


class MinLength(_LengthBase):
    """>= per core.clj:60 (parser.clj's > divergence not followed)."""

    kind = "minLength"

    def mask(self, view: ColumnView, ctx: CompileContext) -> np.ndarray:
        return (self._lengths(view) >= self.value) | view.null_np


class MaxLength(_LengthBase):
    """<= per core.clj:61 (parser.clj:148-149 bug not followed)."""

    kind = "maxLength"

    def mask(self, view: ColumnView, ctx: CompileContext) -> np.ndarray:
        lens = self._lengths(view)
        return ((lens <= self.value) & (lens >= 0)) | view.null_np


class NotNull(Constraint):
    """``use="required"`` analog (core.clj:197-202): nil -> [false :undefined]."""

    kind = "required"

    def mask(self, view: ColumnView, ctx: CompileContext) -> np.ndarray:
        return ~view.null_np


class Fixed(Constraint):
    """``fixed=`` attribute constant (parser.clj:237-246): value must equal."""

    kind = "fixed"

    def __init__(self, value: Any):
        self.value = value

    def mask(self, view: ColumnView, ctx: CompileContext) -> np.ndarray:
        try:
            m = mask_to_numpy(pc.equal(view.col, pa.scalar(self.value)), null_value=True)
        except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
            m = view.null_np.copy()  # type mismatch: only nulls pass
        return m

    def __repr__(self):
        return f"Fixed({self.value!r})"


class Predicate(Constraint):
    """User-extension point — the analog of injecting a custom type closure
    into ``predef-types`` (core_test.clj:270).  ``fn`` takes the Arrow column
    and returns a boolean mask (numpy or arrow)."""

    kind = "custom"

    def __init__(self, fn, kind: str = "custom"):
        self.fn = fn
        self.kind = kind

    def mask(self, view: ColumnView, ctx: CompileContext) -> np.ndarray:
        out = self.fn(view.col)
        if isinstance(out, (pa.Array, pa.ChunkedArray)):
            out = mask_to_numpy(out, null_value=True)
        return np.asarray(out, dtype=bool) | view.null_np
