"""XSD-subset loader conformance — the reference's OWN test schemas
(parser_test.clj:15-159) parsed by rayval.constraints.xsd and their golden
pass/fail tuples (parser_test.clj:162-578, core_test.clj) reproduced through
the compiled Profile.  Value columns are strings with infer_scalars=True so
read-string semantics apply (parser.clj:14-22), or typed columns where the
reference feeds typed values.
"""

import numpy as np
import pyarrow as pa
import pytest

from rayval.constraints.xsd import XsdUnsupported, parse_xsd, profile_from_xsd


def masks_for(profile, table):
    v = profile.compile()
    return v.masks(table), v


def one_col(profile, col, values):
    """Valid-mask for a single-column profile over python values."""
    t = pa.table({col: pa.array([str(x) if x is not None else None for x in values], type=pa.string())})
    v = profile.compile()
    return v.row_valid(t).tolist()


# ---- restriction facets (parser_test.clj:162-198) ---------------------------
def test_enum_restriction():
    p = profile_from_xsd(
        """<schema><element name="e"><simpleType>
             <restriction base="string">
               <enumeration value="small"/><enumeration value="medium"/>
               <enumeration value="large"/>
             </restriction></simpleType></element></schema>"""
    )
    assert one_col(p, "e", ["small", "medium", "large", "asdf"]) == [True, True, True, False]


def test_range_restriction():
    p = profile_from_xsd(
        """<schema><element name="e"><simpleType>
             <restriction base="integer">
               <minInclusive value="36"/><maxInclusive value="42"/>
             </restriction></simpleType></element></schema>"""
    )
    assert one_col(p, "e", [36, 42, 43, 35]) == [True, True, False, False]


def test_length_restriction():
    p = profile_from_xsd(
        """<schema><element name="e"><simpleType>
             <restriction base="string"><length value="10"/></restriction>
           </simpleType></element></schema>"""
    )
    assert one_col(p, "e", ["abcdefghij", "abcdefghi", "abcdefghijk"]) == [True, False, False]


def test_pattern_restriction():
    p = profile_from_xsd(
        """<schema><element name="e"><simpleType>
             <restriction base="string"><pattern value="[A-Z][A-Z][A-Z]"/></restriction>
           </simpleType></element></schema>"""
    )
    assert one_col(p, "e", ["ABC", "XYZ", "aBC"]) == [True, True, False]


# ---- simpleType forms (parser_test.clj:200-234) -----------------------------
def test_named_simple_type_in_schema():
    # parser_test.clj:256-273 (schema with simple type)
    p = profile_from_xsd(
        """<schema>
             <simpleType name="mytype">
               <restriction base="integer">
                 <minInclusive value="36"/><maxInclusive value="42"/>
               </restriction>
             </simpleType>
             <element name="my" type="mytype"/>
           </schema>"""
    )
    assert one_col(p, "my", [36, 35]) == [True, False]


def test_alias_simple_type():
    # parser_test.clj:227-234 (simpleType name=aname type=byte)
    schema = parse_xsd(
        """<schema>
             <simpleType name="aname" type="byte"></simpleType>
             <element name="e" type="aname"/>
           </schema>"""
    )
    p = schema.profile("e")
    assert one_col(p, "e", [0, 127, 128]) == [True, True, False]


def test_schema_with_predefs():
    # parser_test.clj:246-254: separate elements dispatch by tag
    schema = parse_xsd(
        """<schema>
             <element name="abyte" type="byte"/>
             <element name="anint" type="integer"/>
           </schema>"""
    )
    assert one_col(schema.profile("abyte"), "abyte", [0, 128]) == [True, False]
    assert one_col(schema.profile("anint"), "anint", [0, 128]) == [True, True]


# ---- union (parser_test.clj:275-302, core.clj:73-78) ------------------------
UNION_SCHEMA = """<schema>
  <simpleType name="mytype">
    <restriction base="integer">
      <minInclusive value="36"/><maxInclusive value="42"/>
    </restriction>
  </simpleType>
  <simpleType name="myunion">
    <union memberTypes="mytype">
      <simpleType>
        <restriction base="string">
          <enumeration value="small"/><enumeration value="medium"/>
          <enumeration value="large"/>
        </restriction>
      </simpleType>
    </union>
  </simpleType>
  <element name="theunion" type="myunion"/>
</schema>"""


def test_union_golden():
    p = profile_from_xsd(UNION_SCHEMA)
    assert one_col(p, "theunion", [35, 36, "small", "medium", "asdf"]) == [
        False, True, True, True, False,
    ]


def test_union_member_order():
    # memberTypes BEFORE inline anonymous types (core.clj:104-107): the
    # first-match index must point at the named member for 36
    from rayval.constraints.base import ColumnView
    from rayval.constraints.combinators import AnyOf

    schema = parse_xsd(UNION_SCHEMA)
    p = schema.profile("theunion")
    v = p.compile()
    union = schema.types["myunion"]
    assert isinstance(union, AnyOf)
    col = pa.array(["36", "small", "x"], type=pa.string())
    idx = union.match_index(ColumnView(col, infer_scalars=True), v.ctx)
    assert idx.tolist() == [0, 1, -1]


# ---- collections (parser_test.clj:305-355) ----------------------------------
SEQ_SCHEMA = """<schema>
  <element name="udr">
    <complexType>
      <sequence>
        <element name="seq1" type="integer"/>
        <element name="seq2" type="string"/>
      </sequence>
    </complexType>
  </element>
</schema>"""


def test_sequence_order_and_membership():
    p = profile_from_xsd(SEQ_SCHEMA)
    v = p.compile()
    ok = pa.schema([("seq1", pa.int64()), ("seq2", pa.string())])
    wrong_order = pa.schema([("seq2", pa.string()), ("seq1", pa.int64())])
    missing = pa.schema([("seq1", pa.int64())])
    extra = pa.schema([("seq1", pa.int64()), ("seq2", pa.string()), ("seq3", pa.int64())])
    assert v.schema_violations(ok) == []
    assert "__schema__.sequence" in v.schema_violations(wrong_order)
    assert "__schema__.sequence" in v.schema_violations(missing)
    assert "seq2.missing" in v.schema_violations(missing)
    assert "__schema__.sequence" in v.schema_violations(extra)
    # per-value checks still evaluate (parser pipeline validates children
    # even when the structural check fails, parser_test.clj:311-316)
    t = pa.table({"seq1": pa.array(["1", "asdf"]), "seq2": pa.array(["adsf", "2"])})
    m = v.masks(t)
    assert m["seq1.type"].tolist() == [True, False]   # integer: 1 ok, "asdf" not
    assert m["seq2.type"].tolist() == [True, False]   # read-string: "2" IS a number, not a string


def test_all_order_insensitive():
    p = profile_from_xsd(SEQ_SCHEMA.replace("sequence", "all"))
    v = p.compile()
    assert v.schema_violations(pa.schema([("seq2", pa.string()), ("seq1", pa.int64())])) == []
    assert "__schema__.all" in v.schema_violations(pa.schema([("seq1", pa.int64())]))


def test_choice_exactly_one():
    p = profile_from_xsd(SEQ_SCHEMA.replace("sequence", "choice"))
    v = p.compile()
    t = pa.table(
        {
            "seq1": pa.array([1, None, None, 1], type=pa.int64()),
            "seq2": pa.array([None, "asdf", None, "x"], type=pa.string()),
        }
    )
    # golden (parser_test.clj:343-355): one-of -> true, both/none -> false
    assert v.masks(t)["__schema__.choice"].tolist() == [True, True, False, False]


def test_nested_choice_enforced():
    """A <choice> nested under a sequence keeps its exactly-one-non-null
    semantics after flattening to dotted paths (the reference compiles choice
    per complexType, core.clj:150-159) — it must NOT silently become plain
    optional fields."""
    p = profile_from_xsd(
        """<schema>
             <element name="doc">
               <complexType>
                 <sequence>
                   <element name="id" type="string"/>
                   <element name="meta">
                     <complexType>
                       <choice>
                         <element name="a" type="integer"/>
                         <element name="b" type="string"/>
                       </choice>
                     </complexType>
                   </element>
                 </sequence>
               </complexType>
             </element>
           </schema>"""
    )
    assert p.choice_groups == [("meta", ["meta.a", "meta.b"])]
    v = p.compile()
    meta = pa.array(
        [
            {"a": 1, "b": None},    # exactly one -> ok
            {"a": None, "b": "x"},  # exactly one -> ok
            {"a": 2, "b": "y"},     # both -> violation
            {"a": None, "b": None}, # none -> violation
        ],
        type=pa.struct([("a", pa.int64()), ("b", pa.string())]),
    )
    t = pa.table({"id": pa.array(["r1", "r2", "r3", "r4"]), "meta": meta})
    m = v.masks(t)
    assert m["meta.choice"].tolist() == [True, True, False, False]
    viol = v.violations(t, key="id")
    got = set(zip(viol["id"].to_pylist(), viol["constraint_id"].to_pylist()))
    assert ("r3", "meta.choice") in got and ("r4", "meta.choice") in got
    assert ("r1", "meta.choice") not in got


# ---- complexType with attributes (parser_test.clj:358-382, 546-578) ---------
def test_complex_type_with_attributes():
    p = profile_from_xsd(
        """<schema>
             <element name="udr">
               <complexType>
                 <sequence>
                   <element name="seq1" type="string"/>
                 </sequence>
                 <attribute name="country" type="string"/>
                 <attribute name="zip" type="integer"/>
               </complexType>
             </element>
           </schema>"""
    )
    names = [f.name for f in p.fields]
    assert names == ["seq1", "country", "zip"]
    v = p.compile()
    t = pa.table({"seq1": pa.array(["hej"]), "country": pa.array(["usa"]), "zip": pa.array(["13672"])})
    assert bool(v.row_valid(t)[0])


def test_attributes_default_fixed_required():
    # golden test-atttributes-logic (parser_test.clj:560-578)
    p = profile_from_xsd(
        """<schema>
             <element name="udr">
               <complexType>
                 <attribute name="language" type="string" default="SV"/>
                 <attribute name="attr2" type="string" fixed="hej"/>
                 <attribute name="attr3" type="string" use="required"/>
               </complexType>
             </element>
           </schema>"""
    )
    v = p.compile()
    t = pa.table(
        {
            "language": pa.array(["EN", "EN", None, None]),
            "attr2": pa.array(["hej", "afdsa", "hej", "hej1"]),
            "attr3": pa.array(["asdf", None, "asdf", "asdf"]),
        }
    )
    m = v.masks(t)
    assert m["attr2.fixed"].tolist() == [True, False, True, False]
    assert m["attr3.required"].tolist() == [True, False, True, True]
    # default fills nulls BEFORE the check -> language stays valid
    assert m["language.type"].tolist() == [True, True, True, True]


def test_attribute_ref_and_pattern():
    # parser_test.clj:93-106: schema-level named attribute, ref'd
    schema = parse_xsd(
        """<schema>
             <attribute name="code">
               <simpleType>
                 <restriction base="string"><pattern value="[A-Z][A-Z]"/></restriction>
               </simpleType>
             </attribute>
             <complexType name="someComplexType">
               <attribute ref="code"/>
             </complexType>
             <element name="e" type="someComplexType"/>
           </schema>"""
    )
    p = schema.profile("e")
    v = p.compile()
    t = pa.table({"code": pa.array(["AB", "ab", "ABC"])})
    assert v.masks(t)["code.pattern"].tolist() == [True, False, False]


def test_attribute_group():
    # parser_test.clj:79-90
    schema = parse_xsd(
        """<schema>
             <attributeGroup name="personattr">
               <attribute name="attr1" type="string"/>
               <attribute name="attr2" type="integer"/>
             </attributeGroup>
             <complexType name="person">
               <attributeGroup ref="personattr"/>
             </complexType>
             <element name="p" type="person"/>
           </schema>"""
    )
    p = schema.profile("p")
    assert [f.name for f in p.fields] == ["attr1", "attr2"]
    v = p.compile()
    t = pa.table({"attr1": pa.array(["x", "1"]), "attr2": pa.array(["12", "xy"])})
    m = v.masks(t)
    assert m["attr1.type"].tolist() == [True, False]  # read-string: "1" is a number
    assert m["attr2.type"].tolist() == [True, False]


# ---- extension (core_test.clj:269-321, parser_test.clj:533-545) -------------
def test_complex_content_extension():
    schema = parse_xsd(
        """<schema>
             <complexType name="personinfo">
               <sequence>
                 <element name="firstname" type="string"/>
                 <element name="lastname" type="string"/>
               </sequence>
             </complexType>
             <complexType name="fullpersoninfo">
               <complexContent>
                 <extension base="personinfo">
                   <sequence>
                     <element name="address" type="string"/>
                     <element name="city" type="string"/>
                     <element name="country" type="string"/>
                   </sequence>
                 </extension>
               </complexContent>
             </complexType>
             <element name="employee" type="fullpersoninfo"/>
           </schema>"""
    )
    p = schema.profile("employee")
    # base fields first, then extension (content concat, core.clj:193)
    assert [f.name for f in p.fields] == ["firstname", "lastname", "address", "city", "country"]
    assert p.kind == "sequence"


# ---- nested inline elements (parser_test.clj:505-528) -----------------------
def test_nested_complex_inline():
    p = profile_from_xsd(
        """<schema>
             <element name="part1">
               <complexType>
                 <sequence>
                   <element name="nameList">
                     <complexType>
                       <sequence>
                         <element name="name">
                           <simpleType>
                             <union>
                               <simpleType>
                                 <restriction base="string">
                                   <enumeration value="small"/>
                                   <enumeration value="medium"/>
                                   <enumeration value="large"/>
                                 </restriction>
                               </simpleType>
                             </union>
                           </simpleType>
                         </element>
                       </sequence>
                     </complexType>
                   </element>
                 </sequence>
               </complexType>
             </element>
           </schema>"""
    )
    assert [f.name for f in p.fields] == ["nameList.name"]
    v = p.compile()
    t = pa.table(
        {"nameList": pa.array([{"name": "small"}, {"name": "asdf"}],
                              type=pa.struct([("name", pa.string())]))}
    )
    # golden: small -> valid, asdf -> invalid (parser_test.clj:522-527)
    assert v.row_valid(t).tolist() == [True, False]


# ---- element ref (parser_test.clj:483-503) ----------------------------------
def test_element_ref():
    schema = parse_xsd(
        """<schema>
             <element name="theref">
               <complexType>
                 <sequence><element name="seq1" type="positiveInteger"/></sequence>
               </complexType>
             </element>
             <element name="udr">
               <complexType>
                 <all><element ref="theref"/></all>
               </complexType>
             </element>
           </schema>"""
    )
    p = schema.profile("udr")
    assert [f.name for f in p.fields] == ["theref.seq1"]
    v = p.compile()
    t = pa.table(
        {"theref": pa.array([{"seq1": "1"}, {"seq1": "0"}],
                            type=pa.struct([("seq1", pa.string())]))}
    )
    assert v.row_valid(t).tolist() == [True, False]


# ---- the full walking-skeleton schema (parser_test.clj:17-44) ---------------
def test_reference_lead_schema():
    schema = parse_xsd(
        """<schema>
             <simpleType name="stringenum">
               <restriction base="string">
                 <enumeration value="small"/><enumeration value="medium"/>
                 <enumeration value="large"/>
               </restriction>
             </simpleType>
             <simpleType name="intrange">
               <restriction base="integer">
                 <minInclusive value="36"/><maxInclusive value="42"/>
               </restriction>
             </simpleType>
             <simpleType name="theunion">
               <union memberTypes="stringenum intrange"/>
             </simpleType>
             <complexType name="cp">
               <sequence><element name="uniontest" type="theunion"/></sequence>
             </complexType>
             <element name="udr" type="cp"/>
           </schema>"""
    )
    p = schema.profile("udr")
    assert one_col(p, "uniontest", ["small", 36, 43, "x"]) == [True, True, False, False]


# ---- unsupported constructs stay unsupported (README.md:97-102) -------------
def test_unsupported_constructs_raise():
    with pytest.raises(XsdUnsupported):
        parse_xsd(
            """<schema><element name="shoesize"><complexType>
                 <simpleContent><extension base="integer">
                   <attribute name="country" type="string"/>
                 </extension></simpleContent>
               </complexType></element></schema>"""
        )
    with pytest.raises(XsdUnsupported):
        parse_xsd(
            """<schema><group name="custGroup"><sequence>
                 <element name="customer" type="string"/>
               </sequence></group></schema>"""
        )


def test_min_max_occurs_ignored():
    # parsed-but-never-enforced in the reference (parser.clj:323)
    p = profile_from_xsd(
        """<schema><element name="udr"><complexType>
             <sequence minOccurs="0" maxOccurs="3">
               <element name="f1" type="byte" minOccurs="1" maxOccurs="1"/>
             </sequence>
           </complexType></element></schema>"""
    )
    assert one_col(p, "f1", [1, 128]) == [True, False]


def test_with_status_shows_filled_default():
    # golden parser_test.clj:574: missing attr with default -> with-status
    # shows {:value "SV", :status true}
    from rayval.stages.validate import Annotate

    p = profile_from_xsd(
        """<schema><element name="udr"><complexType>
             <attribute name="language" type="string" default="SV"/>
           </complexType></element></schema>"""
    )
    t = pa.table({"language": pa.array(["EN", None])})
    out = Annotate(p.compile())(t)
    assert out["language"].to_pylist() == [
        {"value": "EN", "status": True},
        {"value": "SV", "status": True},
    ]


def test_root_choice_with_complex_member():
    """A ROOT <choice> whose member is itself a complexType: presence counts
    per ELEMENT child, not per flattened leaf — a legitimately-chosen
    two-field member must count 1, not 2 (core.clj:150-159 compiles choice
    over element children)."""
    p = profile_from_xsd(
        """<schema>
             <element name="doc">
               <complexType>
                 <choice>
                   <element name="simple" type="string"/>
                   <element name="nested">
                     <complexType>
                       <sequence>
                         <element name="x" type="string"/>
                         <element name="y" type="string"/>
                       </sequence>
                     </complexType>
                   </element>
                 </choice>
               </complexType>
             </element>
           </schema>"""
    )
    v = p.compile()
    nested = pa.array(
        [
            {"x": "1", "y": "2"},   # chose nested, both fields set -> ok (count 1)
            None,                    # chose simple -> ok
            {"x": "1", "y": "2"},   # BOTH members -> violation
            None,                    # neither -> violation
            {"x": "1", "y": None},  # nested chosen, one field -> still ok at root
        ],
        type=pa.struct([("x", pa.string()), ("y", pa.string())]),
    )
    t = pa.table(
        {"simple": pa.array([None, "s", "s", None, None], type=pa.string()), "nested": nested}
    )
    assert v.masks(t)["__schema__.choice"].tolist() == [True, True, False, False, True]


def test_root_choice_flat_members_unchanged():
    """Flat leaf members keep the original exactly-one semantics."""
    p = profile_from_xsd(
        """<schema>
             <element name="doc">
               <complexType>
                 <choice>
                   <element name="a" type="string"/>
                   <element name="b" type="string"/>
                 </choice>
               </complexType>
             </element>
           </schema>"""
    )
    v = p.compile()
    t = pa.table(
        {"a": pa.array(["x", None, "x", None]), "b": pa.array([None, "y", "y", None])}
    )
    assert v.masks(t)["__schema__.choice"].tolist() == [True, True, False, False]


def test_numeric_looking_default_on_string_column():
    """default=\"5\" scalar-infers to int 5; filling a STRING column must not
    crash Arrow — the default is cast to the column type (and inference
    reads it back as 5)."""
    p = profile_from_xsd(
        """<schema>
             <element name="doc">
               <complexType>
                 <all><element name="id" type="string"/></all>
                 <attribute name="tag" type="string" default="5"/>
               </complexType>
             </element>
           </schema>"""
    )
    v = p.compile()
    t = pa.table({"id": pa.array(["a", "b"]), "tag": pa.array(["x", None])})
    m = v.masks(t)  # the point: no ArrowTypeError — masks evaluate
    # faithful reference semantics: the filled "5" scalar-infers to number 5
    # (parser.clj special-read-string), which then fails the declared string
    # type — row 1 is a type violation, not a crash
    (tag_type_id,) = [k for k in m if k.startswith("tag.")]
    assert m[tag_type_id].tolist() == [True, False]


def test_attribute_group_inside_extension():
    """<attributeGroup ref> under complexContent/extension must compile its
    constraints (it was silently dropped before)."""
    p = profile_from_xsd(
        """<schema>
             <attributeGroup name="g">
               <attribute name="score" use="required">
                 <simpleType><restriction base="integer">
                   <minInclusive value="0"/></restriction></simpleType>
               </attribute>
             </attributeGroup>
             <complexType name="base">
               <all><element name="id" type="string"/></all>
             </complexType>
             <element name="doc">
               <complexType>
                 <complexContent><extension base="base">
                   <attributeGroup ref="g"/>
                 </extension></complexContent>
               </complexType>
             </element>
           </schema>"""
    )
    v = p.compile()
    t = pa.table({"id": pa.array(["a", "b", "c"]),
                  "score": pa.array([1, -5, None], type=pa.int64())})
    m = v.masks(t)
    assert m["score.range"].tolist() == [True, False, True]
    assert m["score.required"].tolist() == [True, True, False]


# ---- generative conformance (seeded; VERDICT r4 item 7) ----------------------
# Random restriction CHAINS and unions compared against an independent
# Python model of the reference's facet semantics (parser.clj facet fns +
# the pinned minLength/maxLength core >=/<= divergence and the
# memberTypes-first union ordering, core.clj:104-107).  Future loader edits
# can't silently drift these without tripping a generated case.

_NUM_FACETS = [
    ("minInclusive", lambda v, b: v >= b),
    ("maxInclusive", lambda v, b: v <= b),
    ("minExclusive", lambda v, b: v > b),
    ("maxExclusive", lambda v, b: v < b),
]
_STR_FACETS = [
    ("length", lambda s, b: len(s) == b),
    ("minLength", lambda s, b: len(s) >= b),  # core >= (divergence pinned)
    ("maxLength", lambda s, b: len(s) <= b),  # core <=
]


def _gen_int_chain(rng):
    """1-3 chained named integer restrictions; returns (xsd text, model fn)."""
    depth = rng.randint(1, 3)
    preds, parts = [], []
    base = "integer"
    for lvl in range(depth):
        chosen = rng.sample(_NUM_FACETS, rng.randint(1, 2))
        facets = ""
        for fname, fn in chosen:
            bound = rng.randint(-40, 40)
            facets += f'<{fname} value="{bound}"/>'
            preds.append((fn, bound))
        name = f"t{lvl}"
        parts.append(
            f'<simpleType name="{name}"><restriction base="{base}">{facets}'
            "</restriction></simpleType>"
        )
        base = name
    xsd = f'<schema>{"".join(parts)}<element name="e" type="{base}"/></schema>'
    return xsd, lambda v: isinstance(v, int) and all(fn(v, b) for fn, b in preds)


def _gen_str_chain(rng):
    depth = rng.randint(1, 2)
    preds, parts = [], []
    base = "string"
    for lvl in range(depth):
        chosen = rng.sample(_STR_FACETS, rng.randint(1, 2))
        facets = ""
        for fname, fn in chosen:
            bound = rng.randint(0, 8)
            facets += f'<{fname} value="{bound}"/>'
            preds.append((fn, bound))
        name = f"s{lvl}"
        parts.append(
            f'<simpleType name="{name}"><restriction base="{base}">{facets}'
            "</restriction></simpleType>"
        )
        base = name
    xsd = f'<schema>{"".join(parts)}<element name="e" type="{base}"/></schema>'
    return xsd, lambda s: all(fn(s, b) for fn, b in preds)


def test_generated_restriction_chains_match_model():
    import random

    rng = random.Random(20260818)
    for _ in range(25):
        xsd, model = _gen_int_chain(rng)
        p = profile_from_xsd(xsd)
        vals = [rng.randint(-45, 45) for _ in range(25)] + ["zz", None]
        got = one_col(p, "e", vals)
        # scalar inference: "36" -> int; "zz" stays str (fails integer base);
        # None passes (nulls pass value constraints, only `required` fails)
        exp = [True if v is None else model(v) for v in vals]
        assert got == exp, (xsd, vals, got, exp)
    for _ in range(25):
        xsd, model = _gen_str_chain(rng)
        p = profile_from_xsd(xsd)
        vals = ["x" * rng.randint(0, 9) for _ in range(20)] + [None]
        got = one_col(p, "e", vals)
        exp = [True if v is None else model(v) for v in vals]
        assert got == exp, (xsd, vals, got, exp)


def test_generated_union_first_match_ordering():
    """Random 2-3 member unions: row validity = any member; match_index =
    FIRST valid member in declaration order (memberTypes before inline
    anonymous members, core.clj:104-107)."""
    import random

    from rayval.constraints.base import ColumnView
    from rayval.constraints.combinators import AnyOf

    rng = random.Random(77)
    for _ in range(15):
        n_named = rng.randint(1, 2)
        n_inline = rng.randint(1, 2)
        member_models, named_parts, inline_parts = [], [], []
        named_names = []
        for i in range(n_named):
            lo = rng.randint(-30, 0)
            hi = lo + rng.randint(0, 25)
            named_names.append(f"n{i}")
            named_parts.append(
                f'<simpleType name="n{i}"><restriction base="integer">'
                f'<minInclusive value="{lo}"/><maxInclusive value="{hi}"/>'
                "</restriction></simpleType>"
            )
            member_models.append(lambda v, lo=lo, hi=hi: isinstance(v, int) and lo <= v <= hi)
        enum_pools = []
        for _j in range(n_inline):
            pool = rng.sample(["aa", "bb", "cc", "dd", "ee"], rng.randint(1, 3))
            enum_pools.append(pool)
            inline_parts.append(
                '<simpleType><restriction base="string">'
                + "".join(f'<enumeration value="{w}"/>' for w in pool)
                + "</restriction></simpleType>"
            )
            member_models.append(lambda v, pool=tuple(pool): isinstance(v, str) and v in pool)
        xsd = (
            "<schema>" + "".join(named_parts)
            + f'<simpleType name="u"><union memberTypes="{" ".join(named_names)}">'
            + "".join(inline_parts) + "</union></simpleType>"
            + '<element name="e" type="u"/></schema>'
        )
        schema = parse_xsd(xsd)
        p = schema.profile("e")
        v = p.compile()
        union = schema.types["u"]
        assert isinstance(union, AnyOf)
        vals = [rng.randint(-35, 30) for _ in range(15)] + ["aa", "bb", "cc", "zz"]
        col = pa.array([str(x) for x in vals], type=pa.string())
        idx = union.match_index(ColumnView(col, infer_scalars=True), v.ctx).tolist()
        exp = []
        for val in vals:
            first = -1
            for mi, m in enumerate(member_models):
                if m(val):
                    first = mi
                    break
            exp.append(first)
        assert idx == exp, (xsd, vals, idx, exp)
        assert one_col(p, "e", vals) == [i >= 0 for i in exp]
