"""Constraint ABC, column views, and the compile context (type registry).

The reference threads three environment maps (types / attr-groups / elements)
through every compiled closure (``fn-of`` at core.clj:11) and merges
schema-declared names over a predefined environment at validation time
(core.clj:128-134, parser.clj:197-204).  Here the analog is a flat *registry*
``{name -> Constraint}`` resolved at compile time; the predefined 17 simple
types (core.clj:220-242) are pre-registered.

Null semantics (pinned; see tests/test_constraints.py):
- value constraints (type/range/enum/pattern/length/fixed) SKIP nulls — a null
  passes; only ``NotNull`` (the analog of ``use="required"``,
  core.clj:197-202) fails on null.  This matches SQL three-valued logic so the
  DuckDB oracles (``WHERE NOT (pred)``) agree row-for-row.
- ``default`` fills nulls *before* any check runs (core.clj:197-202 substitutes
  the default when the attr is nil).

Scalar inference (opt-in, ``infer_scalars=True``): the reference parses leaf
text with ``read-string`` so ``"123"`` *is* the number 123 and is *not* a
string (special-read-string, parser.clj:14-22).  Conformance tests enable this
to reproduce golden tuples over heterogeneous values encoded as string
columns; the production path (typed Arrow columns) leaves it off and stays on
zero-copy pyarrow.compute kernels.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _as_array(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def mask_to_numpy(mask: pa.Array | pa.ChunkedArray, null_value: bool = True) -> np.ndarray:
    """Boolean arrow array -> numpy bool, nulls mapped to ``null_value``."""
    mask = _as_array(mask)
    if mask.null_count:
        mask = pc.fill_null(mask, null_value)
    return mask.to_numpy(zero_copy_only=False).astype(bool, copy=False)


class ColumnView:
    """Lazy, shared per-batch views of one column.

    Built once per (column, batch) and handed to every leaf constraint bound to
    that column, so e.g. the parsed-numeric view is computed at most once no
    matter how many range facets reference it.
    """

    def __init__(self, col: pa.ChunkedArray | pa.Array, infer_scalars: bool = False):
        self.col = _as_array(col)
        self.infer = infer_scalars
        self.n = len(self.col)
        self._numeric = None
        self._null = None
        self._as_string = None

    # -- basic type predicates -------------------------------------------------
    @property
    def is_string_type(self) -> bool:
        return pa.types.is_string(self.col.type) or pa.types.is_large_string(self.col.type)

    @property
    def is_numeric_type(self) -> bool:
        t = self.col.type
        return pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_decimal(t)

    @property
    def null_np(self) -> np.ndarray:
        if self._null is None:
            if self.col.null_count == 0:
                self._null = np.zeros(self.n, dtype=bool)
            else:
                self._null = self.col.is_null().to_numpy(zero_copy_only=False)
        return self._null

    # -- numeric view ----------------------------------------------------------
    def numeric(self) -> tuple[np.ndarray, np.ndarray]:
        """(values: float64[n], ok: bool[n]) — ok marks rows with a numeric value.

        Typed numeric column: every non-null row is ok.  String column with
        ``infer_scalars``: rows whose text parses as a number (read-string
        analog, parser.clj:14-22).  Anything else: no row is ok.
        """
        if self._numeric is None:
            if self.is_numeric_type:
                arr = self.col
                if pa.types.is_decimal(arr.type):
                    arr = pc.cast(arr, pa.float64())
                vals = pc.fill_null(arr, 0).to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
                self._numeric = (vals, ~self.null_np)
            elif self.is_string_type and self.infer:
                import pandas as pd

                parsed = pd.to_numeric(self.col.to_pandas(), errors="coerce")
                ok = parsed.notna().to_numpy()
                self._numeric = (parsed.fillna(0.0).to_numpy(dtype=np.float64), ok)
            else:
                self._numeric = (np.zeros(self.n, dtype=np.float64), np.zeros(self.n, dtype=bool))
        return self._numeric

    # -- string view -----------------------------------------------------------
    def as_string(self) -> pa.Array:
        """The column cast to string — the ``(str value)`` analog used by the
        reference's pattern/length facets (parser.clj:130, core.clj:49-50)."""
        if self._as_string is None:
            if self.is_string_type:
                self._as_string = self.col
            else:
                self._as_string = pc.cast(self.col, pa.string())
        return self._as_string

    def numeric_parseable(self) -> np.ndarray:
        """bool[n]: row's inferred value is a number (only meaningful w/ infer)."""
        return self.numeric()[1]


class Constraint(ABC):
    """A compiled check over one column: batch in, boolean valid-mask out.

    ``kind`` names the check class and becomes the suffix of the violation
    ``constraint_id`` (e.g. ``w.range``, ``fmt.enum``).
    """

    kind: str = "constraint"

    @abstractmethod
    def mask(self, view: ColumnView, ctx: "CompileContext") -> np.ndarray:
        """Return bool[n]; True = row passes. Nulls pass (see module doc)."""

    def flatten(self) -> list["Constraint"]:
        """Leaf checks to report individually (AllOf/Restriction explode)."""
        return [self]


class CompileContext:
    """Registry of named constraints — the env-map analog (core.clj:128-134).

    User-declared names shadow the predefined simple types, mirroring the
    reference's merge of schema types over ``predef-types``.
    """

    def __init__(self, registry: Optional[dict[str, Constraint]] = None, infer_scalars: bool = False):
        from rayval.constraints.predefined import PREDEFINED

        self.registry: dict[str, Constraint] = dict(PREDEFINED)
        if registry:
            self.registry.update(registry)
        self.infer_scalars = infer_scalars

    def resolve(self, name_or_constraint: "str | Constraint") -> Constraint:
        if isinstance(name_or_constraint, Constraint):
            return name_or_constraint
        try:
            return self.registry[name_or_constraint]
        except KeyError:
            raise KeyError(
                f"unknown type/constraint {name_or_constraint!r}; "
                f"known: predefined simple types + {sorted(k for k in self.registry if not k.islower())}"
            ) from None


def scalar_value(v: Any) -> Any:
    """Normalize python scalar for comparisons (int -> float for numeric ops)."""
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    return v
