"""Declarative constraint DSL + batch compiler (the schema-compile analog of
the reference, core.clj:257-261 / parser.clj:331-341)."""

from rayval.constraints.base import ColumnView, CompileContext, Constraint  # noqa: F401
from rayval.constraints.combinators import AllOf, AnyOf, Ref, Restriction  # noqa: F401
from rayval.constraints.leaves import (  # noqa: F401
    Enum,
    Fixed,
    Length,
    MaxLength,
    MinLength,
    NotNull,
    Pattern,
    Predicate,
    Range,
)
from rayval.constraints.dsl import constraint_from_spec, profile_from_dict, profile_from_json  # noqa: F401
from rayval.constraints.predefined import PREDEFINED, TypeCheck  # noqa: F401
from rayval.constraints.profile import (  # noqa: F401
    PARTITION_COL,
    BatchValidator,
    Field,
    Profile,
    TableRule,
)
