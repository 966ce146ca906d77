"""Schema-graph compilation / analysis.

Python re-expression of src/Data/Medea/Analysis.hs:123-311 — per-schema
lowering into ``CompiledSchema`` plus the whole-graph checks, performed in
the reference's exact order so the *first* error matches. Driver-side only;
the result is an immutable graph shipped once per validator actor.

TypeNode representation: ``("any",)`` | ``("prim", <jsontype>)`` |
``("custom", <identifier>)`` (Analysis.hs:84-88). The derived Ord on the
reference's TypeNode (Any < Primitive < Custom, Custom by Text) is
load-bearing only for the order custom candidates are *attempted* during
validation — we keep custom names sorted lexicographically for that
(Data/Medea.hs:395-407 via Set iteration order).
"""

from __future__ import annotations

from dataclasses import dataclass

from medea_ray.schema.ast import SchemaSpec, SchemataSpec
from medea_ray.schema.errors import MedeaSchemaError
from medea_ray.schema.parser import PRIM_TYPES, RESERVED

ANY = ("any",)

JSON_TYPES = ("null", "boolean", "number", "string", "array", "object")


def _ident_to_node(ident: str | None) -> tuple:
    # Analysis.hs:241-244 identToNode.
    if ident is None:
        return ANY
    prim = PRIM_TYPES.get(ident)
    if prim is not None:
        return ("prim", prim)
    return ("custom", ident)


@dataclass(frozen=True)
class CompiledSchema:
    """One node of the compiled validator DAG (Analysis.hs:90-101).

    Derived fields (has_any / prim_types / custom_types / string_vals_set)
    are precomputed here once so the per-row kernel does no set algebra.
    """

    name: str
    types_as: frozenset  # NESet TypeNode
    has_any: bool
    prim_types: frozenset  # of jsontype strings
    custom_types: tuple  # sorted identifiers
    min_array_len: int | None
    max_array_len: int | None
    array_kind: str | None  # None | "list" | "tuple"
    element_node: tuple | None  # for "list"
    tuple_nodes: tuple | None  # for "tuple"
    props: dict  # name -> (TypeNode, optional: bool)
    additional_allowed: bool
    additional_node: tuple
    string_vals: tuple
    string_vals_set: frozenset


Schema = dict  # Map Identifier CompiledSchema (Schema.hs:11-14)


def _err(code: str, msg: str):
    raise MedeaSchemaError(code, msg)


def _compile_schema(spec: SchemaSpec) -> CompiledSchema:
    # Analysis.hs:145-197 compileSchema.
    name = spec.name
    if name in RESERVED and name != "$start":
        _err("schema_name_reserved", name)

    min_list_len = spec.array.min_length
    max_list_len = spec.array.max_length
    if (
        min_list_len is not None
        and max_list_len is not None
        and min_list_len > max_list_len
    ):
        _err("minimum_length_greater_than_maximum", name)

    props: dict = {}
    for p in spec.object.properties if spec.object is not None else ():
        if p.name in props:
            _err("multiple_prop_schema_definition", f"{name}: {p.name}")
        props[p.name] = (_ident_to_node(p.schema), p.optional)

    # getArrayTypes (Analysis.hs:283-287): element type wins if both
    # (both-present is already a parse error).
    if spec.array.element_type is not None:
        array_kind: str | None = "list"
        element_node: tuple | None = _ident_to_node(spec.array.element_type)
        tuple_nodes: tuple | None = None
        tuple_len = None
    elif spec.array.tuple_spec is not None:
        array_kind = "tuple"
        element_node = None
        tuple_nodes = tuple(_ident_to_node(i) for i in spec.array.tuple_spec)
        tuple_len = len(tuple_nodes)
    else:
        array_kind = element_node = tuple_nodes = tuple_len = None

    # typesAs defaults to {AnyNode} when no $type lines (Analysis.hs:194-197).
    nodes = [_ident_to_node(i) for i in spec.types]
    if not nodes:
        nodes = [ANY]
    types_as = frozenset(nodes)

    obj = spec.object
    compiled = CompiledSchema(
        name=name,
        types_as=types_as,
        has_any=ANY in types_as,
        prim_types=frozenset(n[1] for n in types_as if n[0] == "prim"),
        custom_types=tuple(sorted(n[1] for n in types_as if n[0] == "custom")),
        # tuple arity becomes both min and max length (Analysis.hs:159-167).
        min_array_len=min_list_len if min_list_len is not None else tuple_len,
        max_array_len=max_list_len if max_list_len is not None else tuple_len,
        array_kind=array_kind,
        element_node=element_node,
        tuple_nodes=tuple_nodes,
        props=props,
        # additionalProps defaults True with no object spec (Analysis.hs:170).
        additional_allowed=True if obj is None else obj.additional_allowed,
        additional_node=_ident_to_node(obj.additional_schema if obj else None),
        string_vals=spec.string_vals,
        string_vals_set=frozenset(spec.string_vals),
    )

    # Spec/type consistency checks (Analysis.hs:174-185, 287-311).
    has_prop_spec = obj is not None
    has_list_spec = (
        array_kind == "list"
        if array_kind is not None
        else (min_list_len is not None or max_list_len is not None)
    )
    has_tuple_spec = array_kind == "tuple"
    has_string_spec = bool(spec.string_vals)
    if has_prop_spec and ("prim", "object") not in types_as:
        _err("property_spec_without_object_type", name)
    if has_list_spec and ("prim", "array") not in types_as:
        _err("list_spec_without_array_type", name)
    if has_tuple_spec and ("prim", "array") not in types_as:
        _err("tuple_spec_without_array_type", name)
    if has_string_spec and ("prim", "string") not in types_as:
        _err("string_spec_without_string_type", name)
    return compiled


def _type_refs(scm: CompiledSchema) -> list:
    return sorted(scm.custom_types)


def _prop_refs(scm: CompiledSchema) -> list:
    refs = [n[1] for n, _opt in scm.props.values() if n[0] == "custom"]
    if scm.additional_node[0] == "custom":
        # The additional-property schema is checked through the property-ref
        # path (Analysis.hs:249-250).
        refs.append(scm.additional_node[1])
    return refs


def _list_refs(scm: CompiledSchema) -> list:
    if scm.array_kind == "list" and scm.element_node[0] == "custom":
        return [scm.element_node[1]]
    return []


def _tuple_refs(scm: CompiledSchema) -> list:
    if scm.array_kind == "tuple":
        return [n[1] for n in scm.tuple_nodes if n[0] == "custom"]
    return []


def compile_schemata(spec: SchemataSpec) -> Schema:
    """compileSchemata (Analysis.hs:123-136): per-schema lowering in file
    order, then the whole-graph checks in the reference's order."""
    m: dict[str, CompiledSchema] = {}
    for s in spec.schemata:
        if s.name in m:
            _err("multiple_schema_definition", s.name)
        m[s.name] = _compile_schema(s)

    # checkStartSchema (Analysis.hs:199-205).
    if "$start" not in m:
        _err("start_schema_missing", "no $start schema")

    # checkDanglingReferences ×4 (Analysis.hs:209-223), schemata visited in
    # sorted-name order to mirror M.toList.
    checks = (
        (_type_refs, "missing_schema_definition"),
        (_prop_refs, "missing_prop_schema_definition"),
        (_list_refs, "missing_list_schema_definition"),
        (_tuple_refs, "missing_tuple_schema_definition"),
    )
    for get_refs, code in checks:
        for name in sorted(m):
            for ref in get_refs(m[name]):
                if ref not in m:
                    _err(code, f"{ref} (referenced from {name})")

    # checkUnusedSchemata (Analysis.hs:225-238).
    referenced: set[str] = set()
    for scm in m.values():
        for get_refs, _ in checks:
            referenced.update(get_refs(scm))
    for name in sorted(m):
        if name != "$start" and name not in referenced:
            _err("isolated_schemata", name)

    # checkAcyclic (Analysis.hs:115-121): the transitive $type relation over
    # custom nodes must be acyclic.
    edges = {name: [c for c in scm.custom_types if c in m] for name, scm in m.items()}
    state: dict[str, int] = {}  # 0=visiting, 1=done

    def visit(n: str):
        st = state.get(n)
        if st == 0:
            _err("self_typing_schema", n)
        if st == 1:
            return
        state[n] = 0
        for nxt in edges[n]:
            visit(nxt)
        state[n] = 1

    for name in sorted(m):
        visit(name)
    return m
