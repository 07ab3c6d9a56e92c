"""Declarative profile loader — the "schema is data" analog.

The reference's schema IS data (an XSD-subset XML document) compiled to code
(core.clj:257-261).  Here the data form is a plain dict (JSON/YAML-friendly)
compiled to a ``Profile``:

    {
      "name": "images", "kind": "all", "key": "image_id",
      "types": {                          # registry = named simpleType analog
        "sizetype": {"base": "string", "enum": ["small", "medium", "large"]}
      },
      "fields": {
        "image_id": {"pattern": "img-\\\\d{9}", "required": true},
        "w":        {"base": "int", "min": 1, "max": 8192},
        "fmt":      {"enum": ["jpeg", "png", "webp"]},
        "caption":  {"maxLength": 120, "required": true, "default": ""},
        "size":     {"union": [{"base": "integer", "min": 36, "max": 42},
                               {"type": "sizetype"}]},
      },
      "rules": [{"kind": "unique", "column": "phash"},
                {"kind": "referential", "column": "image_id"}]
    }

Spec keys per field/type: ``base`` (predefined-type restriction), ``type``
(registry ref), ``enum``, ``pattern``, ``min``/``max``/``min_exclusive``/
``max_exclusive``, ``length``/``minLength``/``maxLength``, ``union`` (ordered
member list — first-match semantics), ``allOf``; field-only: ``required``,
``default``, ``fixed``.
"""

from __future__ import annotations

import json
from typing import Any, Mapping

from rayval.constraints.combinators import AllOf, AnyOf, Ref, Restriction
from rayval.constraints.leaves import Enum, Length, MaxLength, MinLength, Pattern, Range
from rayval.constraints.profile import Field, Profile, TableRule

_FIELD_ONLY = {"required", "default", "fixed"}


def constraint_from_spec(spec: Mapping[str, Any]):
    """dict -> Constraint (None if the spec has no value checks)."""
    leaves = []
    if "enum" in spec:
        leaves.append(Enum(spec["enum"]))
    if "pattern" in spec:
        leaves.append(Pattern(spec["pattern"]))
    if any(k in spec for k in ("min", "max", "min_exclusive", "max_exclusive")):
        leaves.append(
            Range(
                min=spec.get("min"),
                max=spec.get("max"),
                min_exclusive=spec.get("min_exclusive"),
                max_exclusive=spec.get("max_exclusive"),
            )
        )
    if "length" in spec:
        leaves.append(Length(spec["length"]))
    if "minLength" in spec:
        leaves.append(MinLength(spec["minLength"]))
    if "maxLength" in spec:
        leaves.append(MaxLength(spec["maxLength"]))
    if "union" in spec:
        leaves.append(AnyOf([constraint_from_spec(m) for m in spec["union"]]))
    if "allOf" in spec:
        leaves.append(AllOf([constraint_from_spec(m) for m in spec["allOf"]]))
    if "type" in spec:
        leaves.append(Ref(spec["type"]))

    unknown = set(spec) - _FIELD_ONLY - {
        "enum", "pattern", "min", "max", "min_exclusive", "max_exclusive",
        "length", "minLength", "maxLength", "union", "allOf", "type", "base",
    }
    if unknown:
        raise ValueError(f"unknown constraint spec keys: {sorted(unknown)}")

    if "base" in spec:
        return Restriction(spec["base"], leaves)
    if not leaves:
        return None
    if len(leaves) == 1:
        return leaves[0]
    return AllOf(leaves)


def profile_from_dict(d: Mapping[str, Any]) -> Profile:
    registry = {name: constraint_from_spec(s) for name, s in d.get("types", {}).items()}
    fields = []
    for name, spec in d.get("fields", {}).items():
        fields.append(
            Field(
                name,
                constraint=constraint_from_spec(spec),
                required=bool(spec.get("required", False)),
                default=spec.get("default"),
                fixed=spec.get("fixed"),
            )
        )
    rules = [
        TableRule(r["kind"], r["column"], {k: v for k, v in r.items() if k not in ("kind", "column")})
        for r in d.get("rules", [])
    ]
    return Profile(
        d.get("name", "profile"),
        fields,
        kind=d.get("kind", "all"),
        registry=registry,
        table_rules=rules,
        infer_scalars=bool(d.get("infer_scalars", False)),
        key=d.get("key"),
    )


def profile_from_json(text: str) -> Profile:
    return profile_from_dict(json.loads(text))
