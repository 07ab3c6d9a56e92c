"""XSD-subset loader — the reference's schema dialect, compiled to Profiles.

The reference's schema IS an XML document compiled to a validator closure
(validation-fn-of, core.clj:257-261 / parser.clj:331-341).  This module gives
the engine the same front door: parse the XSD subset with stdlib
``xml.etree`` and compile it into the SAME ``Constraint``/``Profile`` objects
the dict DSL produces — so the reference's own test schemas
(parser_test.clj:15-159) drive the conformance corpus directly.

Supported constructs (the reference's implemented surface, SURVEY.md §2.3):
- ``simpleType``: named/anonymous/alias; ``restriction`` over a base with
  facets enumeration (OR'd), minInclusive/maxInclusive/minExclusive/
  maxExclusive, pattern (full-match), length/minLength/maxLength;
  ``union`` with ``memberTypes`` tried BEFORE inline member types
  (core.clj:104-107), ordered first-match.
- ``complexType``: one collection (``sequence``/``all``/``choice``) and/or
  attributes; ``complexContent``/``extension`` merges base + extension
  (collection kinds must match, core.clj:177-195); ``attributeGroup``
  (named at schema level, ``ref=`` inside complexType).
- ``element``: ``type=`` (predefined / named simple / named complex),
  inline complexType/simpleType, or ``ref=`` to a named element; nested
  complexTypes become dotted-path struct fields.
- ``attribute``: ``type=`` or inline simpleType, ``default=``/``fixed=``/
  ``use="required"`` (core.clj:197-202); schema-level named attributes
  resolvable by ``ref=``.

NOT supported, matching the reference where these are grammar stubs only
(parser.clj:58-61,70,73-74,97,100 and README.md:97-102): ``simpleContent``,
``list``, ``group``, ``include``/``import``/``redefine``/``notation``/
``annotation`` — these raise ``XsdUnsupported``.  ``minOccurs``/``maxOccurs``
are accepted and IGNORED (parsed-but-never-enforced in the reference:
parser.clj:323, tests commented out at parser_test.clj:324-325).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field as dc_field
from typing import Any, Optional, Union

from rayval.constraints.base import Constraint
from rayval.constraints.combinators import AnyOf, Ref, Restriction
from rayval.constraints.leaves import Enum, Length, MaxLength, MinLength, Pattern, Range
from rayval.constraints.profile import Field, Profile


class XsdUnsupported(NotImplementedError):
    """Construct that is a grammar stub in the reference (README.md:97-102)."""


_UNSUPPORTED = {
    "simpleContent", "list", "group", "include", "import", "redefine",
    "notation", "annotation", "anyAttribute", "any",
}
_COLLECTIONS = ("sequence", "all", "choice")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _read_scalar(s: str) -> Any:
    """read-string analog (parser.clj:14-22): numeric text IS a number."""
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        return s


@dataclass
class ElementDecl:
    name: str
    constraint: Any = None          # Constraint | type-name str | None
    complex_ref: Optional[str] = None       # named complexType
    inline: Optional["ComplexType"] = None  # inline complexType
    ref: Optional[str] = None               # element ref=


@dataclass
class ComplexType:
    kind: Optional[str] = None      # sequence | all | choice | None (attrs only)
    elements: list = dc_field(default_factory=list)     # [ElementDecl]
    attributes: list = dc_field(default_factory=list)   # [Field]
    base: Optional[str] = None      # extension base complexType name


class XsdSchema:
    """Parsed schema: the three environment maps of the reference
    (types / attr-groups / elements, fn-of core.clj:11) as dicts."""

    def __init__(self) -> None:
        self.types: dict[str, Constraint] = {}
        self.complex_types: dict[str, ComplexType] = {}
        self.elements: dict[str, ElementDecl] = {}
        self.attributes: dict[str, Field] = {}
        self.attribute_groups: dict[str, list[Field]] = {}

    # -- compile to engine objects --------------------------------------------
    def profile(
        self,
        element_name: str,
        key: Optional[str] = None,
        infer_scalars: bool = True,
    ) -> Profile:
        """Build a Profile for a top-level element — the analog of dispatching
        the compiled schema on the instance's root tag (core.clj:128-134)."""
        decl = self.elements[element_name]
        ct = self._resolve_complex(decl)
        if ct is None:
            # simple-typed element -> single-column profile
            c = self._as_constraint(decl.constraint)
            return Profile(
                element_name,
                [Field(element_name, c)],
                kind="all",
                registry=self.types,
                infer_scalars=infer_scalars,
                key=key,
            )
        fields, kind, groups = self._fields_of(ct, prefix="")
        return Profile(
            element_name,
            fields,
            kind=kind or "all",
            registry=self.types,
            infer_scalars=infer_scalars,
            key=key,
            choice_groups=groups,
        )

    def _resolve_complex(self, decl: ElementDecl) -> Optional[ComplexType]:
        if decl.ref:
            return self._resolve_complex(self.elements[decl.ref])
        if decl.inline is not None:
            return decl.inline
        if decl.complex_ref is not None:
            return self.complex_types[decl.complex_ref]
        if isinstance(decl.constraint, str) and decl.constraint in self.complex_types:
            return self.complex_types[decl.constraint]
        return None

    def _as_constraint(self, c: Any) -> Optional[Constraint]:
        if c is None or isinstance(c, Constraint):
            return c
        return Ref(c)  # named type — resolved against the registry at compile

    def _fields_of(
        self, ct: ComplexType, prefix: str
    ) -> tuple[list[Field], Optional[str], list[tuple[str, list[str]]]]:
        """Flatten a complexType into (dotted-path) Fields; extension merges
        base fields FIRST (content concat order, core.clj:173-195).

        A NESTED complexType with kind="choice" keeps its exactly-one-non-null
        semantics: its element paths are recorded as a per-prefix choice group
        (third return value; the reference compiles choice per complexType,
        core.clj:150-159 — flattening alone would silently drop the check).
        Nested sequence/all collection kinds reduce to struct-field presence
        (``<path>.missing``): Arrow struct field order is part of the type, so
        there is no per-row order to check."""
        fields: list[Field] = []
        groups: list[tuple[str, list[str]]] = []
        kind = ct.kind
        if ct.base is not None:
            base_ct = self.complex_types[ct.base]
            base_fields, base_kind, base_groups = self._fields_of(base_ct, prefix)
            if kind is not None and base_kind is not None and kind != base_kind:
                raise ValueError(
                    f"extension collection kind {kind!r} != base {base_kind!r} (core.clj:177-195)"
                )
            kind = kind or base_kind
            fields.extend(base_fields)
            groups.extend(base_groups)
        for d in ct.elements:
            d = self.elements[d.ref] if d.ref else d
            nested = self._resolve_complex(d)
            path = prefix + d.name
            if nested is None:
                fields.append(Field(path, self._as_constraint(d.constraint)))
            else:
                sub_fields, sub_kind, sub_groups = self._fields_of(nested, prefix=path + ".")
                groups.extend(sub_groups)
                if sub_kind == "choice":
                    groups.append((path, self._element_paths(nested, path + ".")))
                if not sub_fields:
                    fields.append(Field(path))
                fields.extend(sub_fields)
        for a in ct.attributes:
            fields.append(
                Field(prefix + a.name, a.constraint, required=a.required,
                      default=a.default, fixed=a.fixed)
            )
        return fields, kind, groups

    def _element_paths(self, ct: ComplexType, prefix: str) -> list[str]:
        """Dotted paths of a complexType's ELEMENT children (base first) —
        the member set of a nested choice group (attributes are not
        alternatives in a choice)."""
        out: list[str] = []
        if ct.base is not None:
            out.extend(self._element_paths(self.complex_types[ct.base], prefix))
        for d in ct.elements:
            d = self.elements[d.ref] if d.ref else d
            out.append(prefix + d.name)
        return out


def parse_xsd(text: str) -> XsdSchema:
    """Parse a ``<schema>`` document (or a single top-level ``<element>``)."""
    root = ET.fromstring(text)
    schema = XsdSchema()
    tag = _local(root.tag)
    if tag == "schema":
        tops = list(root)
    elif tag in ("element", "simpleType", "complexType", "attribute", "attributeGroup"):
        tops = [root]
    else:
        raise ValueError(f"unexpected root <{tag}>")
    for el in tops:
        t = _local(el.tag)
        if t in _UNSUPPORTED:
            raise XsdUnsupported(f"<{t}> is a grammar stub in the reference (README.md:97-102)")
        if t == "simpleType":
            name = el.get("name")
            c = _parse_simple_type(el)
            if name:
                schema.types[name] = c
        elif t == "complexType":
            name = el.get("name")
            ct = _parse_complex_type(el)
            if name:
                schema.complex_types[name] = ct
        elif t == "element":
            d = _parse_element(el)
            schema.elements[d.name] = d
        elif t == "attribute":
            f = _parse_attribute(el)
            schema.attributes[f.name] = f
        elif t == "attributeGroup":
            name = el.get("name")
            schema.attribute_groups[name] = [
                _parse_attribute(a) for a in el if _local(a.tag) == "attribute"
            ]
        else:
            raise XsdUnsupported(f"unsupported top-level <{t}>")
    _link_refs(schema)
    return schema


def _link_refs(schema: XsdSchema) -> None:
    """Resolve attribute/attributeGroup refs inside complexTypes (late-bound
    env lookup, parser.clj:186-190)."""
    def fix(ct: ComplexType) -> None:
        out = []
        for a in ct.attributes:
            if isinstance(a, tuple):  # ("ref"|"groupref", name)
                kind, name = a
                if kind == "ref":
                    out.append(schema.attributes[name])
                else:
                    out.extend(schema.attribute_groups[name])
            else:
                out.append(a)
        ct.attributes = out
        for d in ct.elements:
            if d.inline is not None:
                fix(d.inline)

    for ct in schema.complex_types.values():
        fix(ct)
    for d in schema.elements.values():
        if d.inline is not None:
            fix(d.inline)


def _parse_simple_type(el: ET.Element) -> Constraint:
    """simpleType: alias (type=), restriction, or union (core.clj:37-41,
    parser.clj:160-175)."""
    alias = el.get("type")
    if alias:
        return Ref(alias)
    for child in el:
        t = _local(child.tag)
        if t == "restriction":
            return _parse_restriction(child)
        if t == "union":
            return _parse_union(child)
        if t in _UNSUPPORTED:
            raise XsdUnsupported(f"<{t}> is a grammar stub in the reference")
    raise ValueError("empty <simpleType>")


def _parse_restriction(el: ET.Element) -> Constraint:
    base = el.get("base")
    facets: list[Constraint] = []
    enum_vals: list[Any] = []
    rng: dict[str, Any] = {}
    for f in el:
        t = _local(f.tag)
        v = f.get("value")
        if t == "enumeration":
            enum_vals.append(_read_scalar(v))
        elif t == "minInclusive":
            rng["min"] = _read_scalar(v)
        elif t == "maxInclusive":
            rng["max"] = _read_scalar(v)
        elif t == "minExclusive":
            rng["min_exclusive"] = _read_scalar(v)
        elif t == "maxExclusive":
            rng["max_exclusive"] = _read_scalar(v)
        elif t == "pattern":
            facets.append(Pattern(v))
        elif t == "length":
            facets.append(Length(int(v)))
        elif t == "minLength":
            facets.append(MinLength(int(v)))
        elif t == "maxLength":
            facets.append(MaxLength(int(v)))
        else:
            raise XsdUnsupported(f"restriction facet <{t}>")
    if enum_vals:
        facets.insert(0, Enum(enum_vals))  # multiple enumerations OR (core.clj:63-71)
    if rng:
        facets.append(Range(**rng))
    return Restriction(base, facets) if base else (facets[0] if len(facets) == 1 else Restriction("string", facets))


def _parse_union(el: ET.Element) -> Constraint:
    members: list[Union[Constraint, str]] = []
    member_types = el.get("memberTypes")
    if member_types:
        members.extend(member_types.split())  # named members FIRST (core.clj:104-107)
    for child in el:
        if _local(child.tag) == "simpleType":
            members.append(_parse_simple_type(child))
    return AnyOf(members)


def _parse_complex_type(el: ET.Element) -> ComplexType:
    ct = ComplexType()
    for child in el:
        t = _local(child.tag)
        if t in _COLLECTIONS:
            if ct.kind is not None:
                raise ValueError("complexType with two collections")
            ct.kind = t
            ct.elements = [_parse_element(e) for e in child if _local(e.tag) == "element"]
        elif t == "attribute":
            ref = child.get("ref")
            ct.attributes.append(("ref", ref) if ref else _parse_attribute(child))
        elif t == "attributeGroup":
            ct.attributes.append(("groupref", child.get("ref")))
        elif t == "complexContent":
            for ext in child:
                if _local(ext.tag) != "extension":
                    raise XsdUnsupported(f"complexContent/<{_local(ext.tag)}>")
                ct.base = ext.get("base")
                for sub in ext:
                    st = _local(sub.tag)
                    if st in _COLLECTIONS:
                        ct.kind = st
                        ct.elements = [
                            _parse_element(e) for e in sub if _local(e.tag) == "element"
                        ]
                    elif st == "attribute":
                        ref = sub.get("ref")
                        ct.attributes.append(("ref", ref) if ref else _parse_attribute(sub))
                    elif st == "attributeGroup":
                        # same handling as the direct complexType path — a
                        # silent fall-through here dropped every constraint
                        # the group declares
                        ct.attributes.append(("groupref", sub.get("ref")))
                    elif st in _UNSUPPORTED:
                        raise XsdUnsupported(f"<{st}> is a grammar stub in the reference")
                    else:
                        raise XsdUnsupported(f"extension child <{st}>")
        elif t in _UNSUPPORTED:
            raise XsdUnsupported(f"<{t}> is a grammar stub in the reference")
        else:
            raise XsdUnsupported(f"complexType child <{t}>")
    return ct


def _parse_element(el: ET.Element) -> ElementDecl:
    ref = el.get("ref")
    if ref:
        return ElementDecl(name=ref, ref=ref)
    name = el.get("name")
    type_ref = el.get("type")
    d = ElementDecl(name=name)
    for child in el:
        t = _local(child.tag)
        if t == "complexType":
            d.inline = _parse_complex_type(child)
        elif t == "simpleType":
            d.constraint = _parse_simple_type(child)
        elif t in _UNSUPPORTED:
            raise XsdUnsupported(f"element child <{t}>")
    if d.inline is None and d.constraint is None and type_ref:
        d.constraint = type_ref  # predefined / named simple / named complex
    return d


def _parse_attribute(el: ET.Element) -> Field:
    name = el.get("name")
    type_ref = el.get("type")
    constraint: Any = type_ref
    for child in el:
        if _local(child.tag) == "simpleType":
            constraint = _parse_simple_type(child)
    default = el.get("default")
    fixed = el.get("fixed")
    return Field(
        name,
        constraint=Ref(constraint) if isinstance(constraint, str) else constraint,
        required=el.get("use") == "required",
        default=_read_scalar(default) if default is not None else None,
        fixed=_read_scalar(fixed) if fixed is not None else None,
    )


def profile_from_xsd(text: str, element: Optional[str] = None, key: Optional[str] = None,
                     infer_scalars: bool = True) -> Profile:
    """One-call convenience: parse + compile the (single or named) top-level
    element into a Profile — the ``validation-fn-of`` analog."""
    schema = parse_xsd(text)
    if element is None:
        if len(schema.elements) != 1:
            raise ValueError(
                f"schema declares {sorted(schema.elements)}; pass element= to pick one"
            )
        element = next(iter(schema.elements))
    return schema.profile(element, key=key, infer_scalars=infer_scalars)
