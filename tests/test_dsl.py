"""Declarative (dict/JSON) profile loading + property-based conformance.

The hypothesis tests pin the facet semantics against straightforward scalar
re-implementations of the reference's predicates — any vectorization bug that
diverges from per-value semantics fails here.
"""

import re

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from rayval.constraints import (
    CompileContext,
    Enum,
    MaxLength,
    MinLength,
    Pattern,
    Range,
    profile_from_dict,
    profile_from_json,
)
from rayval.constraints.base import ColumnView

SPEC = {
    "name": "images",
    "kind": "all",
    "key": "image_id",
    "types": {"sizetype": {"base": "string", "enum": ["small", "medium", "large"]}},
    "fields": {
        "image_id": {"pattern": r"img-\d{4}", "required": True},
        "w": {"base": "int", "min": 1, "max": 100},
        "size": {"type": "sizetype"},
        "score": {"union": [{"base": "integer", "min": 0, "max": 9}, {"enum": ["n/a"]}]},
    },
    "rules": [{"kind": "unique", "column": "phash"}],
}


def test_profile_from_dict_end_to_end():
    prof = profile_from_dict(SPEC)
    v = prof.compile()
    t = pa.table(
        {
            "image_id": ["img-0001", "bad", None],
            "w": pa.array([50, 200, 50], type=pa.int32()),
            "size": ["small", "huge", "medium"],
            "score": ["3", "77", "n/a"],
        }
    )
    masks = {k: list(m) for k, m in v.masks(t).items()}
    assert masks["image_id.pattern"] == [True, False, True]  # null passes pattern
    assert masks["image_id.required"] == [True, True, False]
    assert masks["w.range"] == [True, False, True]
    assert masks["size.type"] == [True, False, True]
    assert prof.table_rules[0].constraint_id == "phash.unique"


def test_profile_from_json_roundtrip():
    import json

    prof = profile_from_json(json.dumps(SPEC))
    assert [f.name for f in prof.fields] == ["image_id", "w", "size", "score"]


def test_unknown_spec_key_rejected():
    import pytest

    with pytest.raises(ValueError):
        profile_from_dict({"fields": {"x": {"minimum": 3}}})


# ---------------------------------------------------------- property tests
def _mask(c, values, typ=None):
    return list(c.mask(ColumnView(pa.array(values, type=typ)), CompileContext()))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=32)), max_size=30),
    st.floats(-1e6, 1e6),
    st.floats(-1e6, 1e6),
)
def test_range_matches_scalar_semantics(vals, lo, hi):
    lo, hi = min(lo, hi), max(lo, hi)
    got = _mask(Range(min=lo, max=hi), vals, typ=pa.float64())
    exp = [True if v is None else (lo <= v <= hi) for v in vals]
    assert got == exp


@settings(max_examples=200, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=12)), max_size=30), st.integers(0, 12), st.integers(0, 12))
def test_length_bounds_match_scalar_semantics(vals, lo, hi):
    got_min = _mask(MinLength(lo), vals)
    got_max = _mask(MaxLength(hi), vals)
    assert got_min == [True if v is None else len(v) >= lo for v in vals]
    assert got_max == [True if v is None else len(v) <= hi for v in vals]


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.one_of(st.none(), st.text(alphabet="abc", max_size=6)), max_size=25),
    st.lists(st.text(alphabet="abc", max_size=6), min_size=1, max_size=5),
)
def test_enum_matches_scalar_semantics(vals, members):
    got = _mask(Enum(members), vals)
    assert got == [True if v is None else v in members for v in vals]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(alphabet="ab1", max_size=8)), max_size=25))
def test_pattern_fullmatch_matches_re(vals):
    pat = "[a-b]+1?"
    got = _mask(Pattern(pat), vals)
    assert got == [True if v is None else bool(re.fullmatch(pat, v)) for v in vals]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=50))
def test_union_first_match_index_property(vals):
    from rayval.constraints import AnyOf

    u = AnyOf([Range(min=0, max=999), Range(min=-999, max=-1)])
    view = ColumnView(pa.array(vals, type=pa.int64()))
    idx = list(u.match_index(view, CompileContext()))
    for v, i in zip(vals, idx):
        if 0 <= v <= 999:
            assert i == 0
        elif -999 <= v <= -1:
            assert i == 1
        else:
            assert i == -1
