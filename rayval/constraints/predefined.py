"""The 17 predefined XSD simple types (core.clj:222-242 — the reference ships 17; no boolean) as constraints.

Reference quirk pinned deliberately: ``float``/``double``/``decimal``/
``integer`` are all the *same* ``number?`` predicate (core.clj:220) — there is
no precision or integrality distinction, so 3.5 passes ``byte`` iff it's in
[-128,127].  Numeric subtypes are ``integer`` narrowed by range through the
``def-base`` chain (core.clj:17-20), e.g. unsignedByte ⊂ unsignedShort ⊂
unsignedInt ⊂ unsignedLong.

``string`` under scalar inference follows read-string semantics
(parser.clj:14-22): a numeric-looking string IS a number, hence NOT a string.
On typed columns (production path) a string column simply passes.
"""

from __future__ import annotations

import numpy as np

from rayval.constraints.base import ColumnView, CompileContext, Constraint


class TypeCheck(Constraint):
    kind = "type"

    def __init__(self, name: str):
        if name not in _SPECS:
            raise KeyError(f"unknown predefined type {name!r}")
        self.name = name
        self._lo, self._hi = _SPECS[name]

    def mask(self, view: ColumnView, ctx: CompileContext) -> np.ndarray:
        if self.name == "string":
            if view.is_string_type:
                if view.infer:
                    m = ~view.numeric_parseable()  # read-string: numbers aren't strings
                else:
                    m = np.ones(view.n, dtype=bool)
            else:
                m = np.zeros(view.n, dtype=bool)
            return m | view.null_np
        vals, ok = view.numeric()
        m = ok.copy()
        if self._lo is not None:
            m &= vals >= self._lo
        if self._hi is not None:
            m &= vals <= self._hi
        return m | view.null_np

    def __repr__(self):
        return f"TypeCheck({self.name!r})"


# name -> (lo, hi) inclusive bounds; None = unbounded. The four "number?" types
# have no bounds at all (core.clj:220).
_SPECS: dict[str, tuple] = {
    "string": (None, None),
    "float": (None, None),
    "double": (None, None),
    "decimal": (None, None),
    "integer": (None, None),
    "long": (-(2**63), 2**63 - 1),
    "int": (-(2**31), 2**31 - 1),
    "short": (-(2**15), 2**15 - 1),
    "byte": (-128, 127),
    "unsignedLong": (0, 2**64 - 1),
    "unsignedInt": (0, 2**32 - 1),
    "unsignedShort": (0, 2**16 - 1),
    "unsignedByte": (0, 255),
    "positiveInteger": (1, None),
    "negativeInteger": (None, -1),
    "nonNegativeInteger": (0, None),
    "nonPositiveInteger": (None, 0),
}

PREDEFINED: dict[str, Constraint] = {name: TypeCheck(name) for name in _SPECS}
