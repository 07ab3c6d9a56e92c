"""Conformance corpus — every reference golden test (parser_test.clj /
core_test.clj) re-expressed as (tiny Arrow table in → expected mask /
violations / verdict out). See FIXTURES.md F5 for the mapping table.

No Ray needed: these exercise the pure compile+evaluate layer.
"""

import numpy as np
import pyarrow as pa
import pytest

from rayval.constraints import (
    AllOf,
    AnyOf,
    BatchValidator,
    Enum,
    Field,
    Length,
    MaxLength,
    MinLength,
    NotNull,
    Pattern,
    Predicate,
    Profile,
    Range,
    Ref,
    Restriction,
    TypeCheck,
)
from rayval.constraints.base import ColumnView, CompileContext


def run_mask(constraint, values, typ=None, infer=False):
    arr = pa.array(values, type=typ)
    view = ColumnView(arr, infer_scalars=infer)
    return list(constraint.mask(view, CompileContext(infer_scalars=infer)))


# --- enum (parser_test.clj:162-172) ---------------------------------------
def test_enum():
    c = Restriction("string", [Enum(["small", "medium", "large"])])
    assert run_mask(c, ["small", "medium", "large", "asdf"]) == [True, True, True, False]


def test_enum_numeric_members():
    c = Enum([1, 3, 5])
    assert run_mask(c, [1, 2, 3, 5, 6]) == [True, False, True, True, False]


# --- range (parser_test.clj:174-182) --------------------------------------
def test_range_inclusive():
    c = Restriction("integer", [Range(min=36, max=42)])
    assert run_mask(c, [36, 42, 43, 35]) == [True, True, False, False]


def test_range_exclusive():
    c = Range(min_exclusive=0, max_exclusive=10)
    assert run_mask(c, [0, 1, 9, 10]) == [False, True, True, False]


# --- length (parser_test.clj:184-190) -------------------------------------
def test_length_exact():
    c = Length(10)
    assert run_mask(c, ["a" * 10, "b" * 9, "c" * 11]) == [True, False, False]


def test_min_max_length_core_semantics():
    # minLength >= (core.clj:60), maxLength <= (core.clj:61); parser.clj's
    # divergent/buggy directions deliberately not followed (FIXTURES.md pins).
    assert run_mask(MinLength(3), ["ab", "abc", "abcd"]) == [False, True, True]
    assert run_mask(MaxLength(3), ["ab", "abc", "abcd"]) == [True, True, False]


# --- pattern full-match (parser_test.clj:192-198) --------------------------
def test_pattern_fullmatch():
    c = Pattern("[A-Z]{3}")
    assert run_mask(c, ["ABC", "XYZ", "aBC", "ABCD"]) == [True, True, False, False]


# --- predefined type chain (core.clj:220-242) ------------------------------
def test_type_chain_byte():
    c = TypeCheck("byte")
    assert run_mask(c, [0, 127, 128, -129]) == [True, True, False, False]


def test_type_chain_unsigned():
    assert run_mask(TypeCheck("unsignedByte"), [0, 255, 256, -1]) == [True, True, False, False]
    assert run_mask(TypeCheck("positiveInteger"), [1, 0, -5]) == [True, False, False]
    assert run_mask(TypeCheck("nonPositiveInteger"), [0, -5, 1]) == [True, True, False]


def test_number_types_are_all_number_p():
    # reference quirk (core.clj:220): float/double/decimal/integer are the SAME
    # number? predicate — 3.5 passes "integer", and passes "byte" range-wise.
    assert run_mask(TypeCheck("integer"), [3.5, 2.0]) == [True, True]
    assert run_mask(TypeCheck("byte"), [3.5, 200.0]) == [True, False]


def test_string_type_on_typed_column():
    assert run_mask(TypeCheck("string"), ["a", "b"]) == [True, True]
    assert run_mask(TypeCheck("string"), [1, 2]) == [False, False]


def test_string_type_with_inference():
    # read-string semantics (parser.clj:14-22): "123" is a number, not a string
    assert run_mask(TypeCheck("string"), ["abc", "123"], infer=True) == [True, False]
    assert run_mask(TypeCheck("integer"), ["abc", "123"], infer=True) == [False, True]


# --- union, ordered first-match (parser_test.clj:275-302, core.clj:73-78) --
def test_union_first_match():
    u = AnyOf(
        [
            Restriction("integer", [Range(min=36, max=42)]),
            Restriction("string", [Enum(["small", "medium", "large"])]),
        ]
    )
    vals = ["35", "36", "small", "asdf"]
    assert run_mask(u, vals, infer=True) == [False, True, True, False]
    view = ColumnView(pa.array(vals), infer_scalars=True)
    idx = u.match_index(view, CompileContext(infer_scalars=True))
    assert list(idx) == [-1, 0, 1, -1]


def test_union_member_order_preserved():
    # memberTypes before inline anonymous types (core.clj:104-107): a value
    # matching both reports the FIRST member's index.
    u = AnyOf([Range(min=0, max=100), Range(min=50, max=200)])
    view = ColumnView(pa.array([10, 60, 150, 300]))
    idx = u.match_index(view, CompileContext())
    assert list(idx) == [0, 0, 1, -1]


# --- named type / registry / ref (parser_test.clj:200-234, 483-503) --------
def test_registry_named_and_ref():
    reg = {"sizetype": Restriction("string", [Enum(["small", "medium", "large"])])}
    c = Ref("sizetype")
    view = ColumnView(pa.array(["small", "nope"]))
    assert list(c.mask(view, CompileContext(reg))) == [True, False]


def test_registry_shadowing():
    # schema-declared names shadow predefined (merge over predef env,
    # core.clj:128-134)
    reg = {"string": Restriction(TypeCheck("string"), [MaxLength(2)])}
    view = ColumnView(pa.array(["ab", "abc"]))
    assert list(Ref("string").mask(view, CompileContext(reg))) == [True, False]


def test_custom_user_type():
    # user-injected custom type closure (core_test.clj:270)
    c = Predicate(lambda col: np.array([len(s) % 2 == 0 for s in col.to_pylist()]), kind="parity")
    assert run_mask(c, ["ab", "abc"]) == [True, False]


# --- attribute default / fixed / required (parser_test.clj:546-578) --------
def test_attr_default_fixed_required():
    prof = Profile(
        "attrs",
        [
            Field("a", Restriction("integer", [Range(min=0, max=10)]), default=5),
            Field("b", fixed="X"),
            Field("c", required=True),
        ],
        kind="all",
        key="id",
    )
    v = prof.compile()
    t = pa.table(
        {
            "a": pa.array([None, 3, 99], type=pa.int64()),
            "b": pa.array(["X", "Y", None]),
            "c": pa.array(["ok", None, "ok"]),
        }
    )
    masks = v.masks(t)
    assert list(masks["a.range"]) == [True, True, False]  # default filled -> 5 passes
    assert list(masks["b.fixed"]) == [True, False, True]  # null passes fixed (not required)
    assert list(masks["c.required"]) == [True, False, True]


# --- sequence / all / choice (core_test.clj:140-176) -----------------------
def _prof(kind):
    return Profile("p", [Field("x"), Field("y")], kind=kind, key="id")


def test_sequence_ordered_columns():
    v = _prof("sequence").compile()
    ok = pa.schema([("x", pa.int64()), ("y", pa.int64())])
    wrong_order = pa.schema([("y", pa.int64()), ("x", pa.int64())])
    extra = pa.schema([("x", pa.int64()), ("y", pa.int64()), ("z", pa.int64())])
    assert v.schema_violations(ok) == []
    assert "__schema__.sequence" in v.schema_violations(wrong_order)
    # unknown tag -> [false :undefined tag] analog (parser_test.clj:305-317)
    assert "__schema__.sequence" in v.schema_violations(extra)


def test_all_unordered_columns():
    v = _prof("all").compile()
    assert v.schema_violations(pa.schema([("y", pa.int64()), ("x", pa.int64())])) == []
    missing = v.schema_violations(pa.schema([("x", pa.int64())]))
    assert "__schema__.all" in missing and "y.missing" in missing


def test_choice_exactly_one_non_null():
    v = _prof("choice").compile()
    t = pa.table(
        {
            "x": pa.array([1, None, 1, None], type=pa.int64()),
            "y": pa.array([None, 2, 2, None], type=pa.int64()),
        }
    )
    assert list(v.masks(t)["__schema__.choice"]) == [True, True, False, False]


# --- extension / complexContent (core_test.clj:269-321) --------------------
def test_profile_extend():
    base = Profile("base", [Field("firstname", "string"), Field("lastname", "string")], kind="sequence", key="id")
    ext = base.extend([Field("country", "string")])
    v = ext.compile()
    full = pa.schema([("firstname", pa.string()), ("lastname", pa.string()), ("country", pa.string())])
    assert v.schema_violations(full) == []
    partial = pa.schema([("firstname", pa.string()), ("lastname", pa.string())])
    assert "country.missing" in v.schema_violations(partial)


def test_extend_kind_mismatch_rejected():
    base = Profile("base", [Field("a")], kind="sequence")
    with pytest.raises(ValueError):
        base.extend([Field("b")], kind="all")


# --- end-to-end decode analog (core_test.clj:214-246) ----------------------
def test_violations_and_verdict():
    prof = Profile(
        "images",
        [
            Field("image_id", Pattern(r"img-\d{4}"), required=True),
            Field("w", Restriction("int", [Range(min=1, max=4096)])),
            Field("fmt", Enum(["jpeg", "png", "webp"])),
        ],
        kind="all",
        key="image_id",
    )
    v = prof.compile()
    t = pa.table(
        {
            "partition_id": pa.array([0, 0, 1, 1], type=pa.int64()),
            "image_id": pa.array(["img-0001", "img-0002", "bad", "img-0004"]),
            "w": pa.array([100, -5, 200, 300], type=pa.int32()),
            "fmt": pa.array(["png", "jpeg", "webp", "bmp"]),
        }
    )
    viol = v.violations(t)
    got = set(zip(viol["partition_id"].to_pylist(), viol["image_id"].to_pylist(), viol["constraint_id"].to_pylist()))
    assert got == {
        (0, "img-0002", "w.range"),
        (1, "bad", "image_id.pattern"),
        (1, "img-0004", "fmt.enum"),
    }
    assert not v.verdict(t)
    clean = pa.table(
        {
            "partition_id": pa.array([0], type=pa.int64()),
            "image_id": pa.array(["img-0001"]),
            "w": pa.array([10], type=pa.int32()),
            "fmt": pa.array(["png"]),
        }
    )
    assert v.verdict(clean)


def test_allof_flattens_to_separate_ids():
    prof = Profile("p", [Field("s", AllOf([MinLength(2), MaxLength(4)]))], key="id")
    v = prof.compile()
    ids = {c.constraint_id for c in v.checks}
    assert ids == {"s.minLength", "s.maxLength"}


def test_annotate_with_status():
    # with-status analog (parser.clj:384-400, parser_test.clj:474-479):
    # in-band {value, status} structs + row_valid
    from rayval.stages.validate import Annotate

    prof = Profile("t", [Field("w", Range(min=1, max=10)), Field("fmt", Enum(["a", "b"]))], key="id")
    out = Annotate(prof.compile())(
        pa.table({"w": pa.array([5, 50], type=pa.int32()), "fmt": ["a", "z"]})
    )
    rows = out.to_pylist()
    assert rows[0] == {"w": {"value": 5, "status": True}, "fmt": {"value": "a", "status": True}, "row_valid": True}
    assert rows[1]["w"]["status"] is False and rows[1]["fmt"]["status"] is False and rows[1]["row_valid"] is False


def test_nulls_pass_value_constraints():
    assert run_mask(Range(min=0, max=10), [None, 5, 20], typ=pa.int64()) == [True, True, False]
    assert run_mask(Enum(["a"]), [None, "a", "b"]) == [True, True, False]
    assert run_mask(Pattern("a+"), [None, "aa", "b"]) == [True, True, False]
    assert run_mask(NotNull(), [None, "a"]) == [False, True]


def test_nested_struct_fields():
    # nested inline elements (parser_test.clj:434-528): the document tree maps
    # to Arrow struct columns; constraints bind to dotted paths
    prof = Profile(
        "nested",
        [
            Field("id", required=True),
            Field("person.age", Restriction("integer", [Range(min=0, max=150)])),
            Field("person.name.first", MinLength(1)),
        ],
        kind="all",
        key="id",
    )
    v = prof.compile()
    t = pa.table(
        {
            "id": ["a", "b", "c"],
            "person": pa.array(
                [
                    {"age": 30, "name": {"first": "ann", "last": "x"}},
                    {"age": 200, "name": {"first": "bo", "last": "y"}},
                    {"age": 4, "name": {"first": "", "last": "z"}},
                ]
            ),
        }
    )
    masks = v.masks(t)
    assert list(masks["person.age.range"]) == [True, False, True]
    assert list(masks["person.name.first.minLength"]) == [True, True, False]
    assert v.schema_violations(t.schema) == []
    # missing nested path -> structural violation, value checks skipped
    t2 = pa.table({"id": ["a"], "person": pa.array([{"age": 3}])})
    sv = v.schema_violations(t2.schema)
    assert "person.name.first.missing" in sv and "person.age.missing" not in sv


def test_nested_violations_rows():
    prof = Profile(
        "n", [Field("id", required=True), Field("meta.score", Range(min=0, max=1))], key="id"
    )
    v = prof.compile()
    t = pa.table(
        {
            "partition_id": pa.array([0, 0], type=pa.int64()),
            "id": ["r1", "r2"],
            "meta": pa.array([{"score": 0.5}, {"score": 7.0}]),
        }
    )
    viol = v.violations(t, key="id")
    assert viol.to_pylist() == [{"partition_id": 0, "id": "r2", "constraint_id": "meta.score.range"}]
