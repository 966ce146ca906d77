"""Specialized boolean fast path compiled from the validator DAG.

``compile_fast(schema_map)`` lowers the compiled Medea DAG into a tree of
small bool-returning closures — one per schema node — evaluated without
path tracking, exception control flow, or annotation branches. Contract:

    fast(obj) is True   =>  validate_obj(schema_map, obj) does not raise
    fast(obj) is False  =>  obj MAY be invalid — the caller re-runs the
                            generic kernel for the authoritative verdict
                            and the exact (path, code, detail) violation.

i.e. the fast path may only under-accept, never over-accept, so the
engine's verdicts and violation rows stay byte-identical to the generic
kernel's (parity is pinned against every reference conformance fixture in
tests/test_validator_conformance.py). It under-accepts in exactly three
places: values whose type is a non-builtin subclass (cannot come out of a
strict JSON parser); values at container depth >= ``kernel.MAX_DEPTH``
(every schema closure threads a depth counter and defers past the bound;
the generic kernel fails structural checks at the SAME bound with
``max_depth_exceeded``, so deep-document verdicts are deterministic and
kernel-independent rather than an artifact of Python stack exhaustion);
and documents whose candidate backtracking exceeds
``kernel.FAST_STEP_BUDGET`` schema-dispatch steps (diamond candidate
sets re-walk subtrees exponentially on deep documents — past the budget
the row defers to the generic kernel, whose failure memo is polynomial).

Validity semantics mirror the reference dispatch
(/root/reference/src/Data/Medea.hs:297-298 ``checkAny <|> checkPrim <|>
checkCustoms``): a value passes a schema iff its JSON type is a primitive
candidate whose specifier accepts it, OR any custom candidate accepts it.
Cycles through ``$element-type`` / property nodes are legal (only the
``$type`` relation is acyclic — Analysis.hs:115-121), so custom-node
references resolve through a forwarding cell instead of eager recursion.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from medea_ray.validate.kernel import FAST_STEP_BUDGET, MAX_DEPTH

__all__ = ["compile_fast"]

_MISS = object()


def compile_fast(schema_map) -> Callable[[Any], bool]:
    """Compile the DAG into one ``check(obj) -> bool`` for ``$start``."""
    done: dict = {}   # name -> final check (callable, or None == always-true)
    cells: dict = {}  # name -> [impl] forwarding cell while under construction
    steps = [0]       # per-document dispatch counter (reset by the entry)

    def ref(name: str):
        """Checker for schema ``name``; cycle-safe via a forwarding cell."""
        got = done.get(name, _MISS)
        if got is not _MISS:
            return got
        cell = cells.get(name)
        if cell is not None:
            def fwd(v, _d=0, _c=cell):
                f = _c[0]
                return True if f is None else f(v, _d)

            return fwd
        _build(name)
        return done[name]

    def node_check(node):
        """Checker for a parentless TypeNode (array element / property
        value — Data/Medea.hs:352-356,378-380). None == always-true."""
        kind = node[0]
        if kind == "any":
            return None
        if kind == "prim":
            t = node[1]
            # exact builtin types only (strict JSON parser output); bool
            # precedes int on purpose — json_type_of parity. Leaf checks
            # take (and ignore) the depth arg for signature uniformity:
            # the generic kernel never depth-fails leaves either.
            if t == "null":
                return lambda v, _d=0: v is None
            if t == "boolean":
                return lambda v, _d=0: v is True or v is False
            if t == "number":
                return lambda v, _d=0: type(v) is int or type(v) is float
            if t == "string":
                return lambda v, _d=0: type(v) is str
            if t == "array":
                return lambda v, _d=0: type(v) is list
            return lambda v, _d=0: type(v) is dict  # object
        return ref(node[1])  # custom

    def _build(name: str) -> None:
        cell: list = [None]
        cells[name] = cell
        try:
            impl = _compile_schema(name)
        finally:
            del cells[name]
        cell[0] = impl
        done[name] = impl

    def _compile_schema(name: str):
        scm = schema_map.get(name)
        if scm is None:
            # generic kernel raises implementation_error — always defer
            return lambda v, _d=0: False
        if scm.has_any:
            return None
        prim = scm.prim_types
        has_null = "null" in prim
        has_bool = "boolean" in prim
        has_num = "number" in prim
        has_str = "string" in prim
        # empty enum accepts any string (Data/Medea.hs:318-328)
        enum = scm.string_vals_set or None

        arr_h = None
        if "array" in prim:
            lo, hi = scm.min_array_len, scm.max_array_len
            kind = scm.array_kind
            if kind == "list":
                el = node_check(scm.element_node)
            elif kind == "tuple":
                els = tuple(node_check(n) for n in scm.tuple_nodes)

            def arr_h(v, _d, lo=lo, hi=hi, kind=kind):
                n = len(v)
                if lo is not None and n < lo:
                    return False
                if hi is not None and n > hi:
                    return False
                if kind == "list":
                    if el is not None:
                        for x in v:
                            if not el(x, _d + 1):
                                return False
                elif kind == "tuple":
                    # tuple arity is lowered to min==max bounds upstream
                    for x, c in zip(v, els):
                        if c is not None and not c(x, _d + 1):
                            return False
                return True

        obj_h = None
        if "object" in prim:
            prop_checks = {k: node_check(nd) for k, (nd, _opt) in scm.props.items()}
            required = tuple(k for k, (_nd, opt) in scm.props.items() if not opt)
            add_ok = scm.additional_allowed
            add_chk = node_check(scm.additional_node) if add_ok else None

            def obj_h(o, _d, get=prop_checks.get):
                for k, v in o.items():
                    c = get(k, _MISS)
                    if c is _MISS:
                        if not add_ok:
                            return False
                        if add_chk is not None and not add_chk(v, _d + 1):
                            return False
                    elif c is not None and not c(v, _d + 1):
                        return False
                for k in required:
                    if k not in o:
                        return False
                return True

        # custom-candidate edges are the acyclic $type relation (C6):
        # eager resolution is safe, and an always-true candidate makes the
        # whole schema always-true
        customs = tuple(ref(c) for c in scm.custom_types)
        if any(c is None for c in customs):
            return None

        def check(v, _d=0):
            steps[0] += 1
            if _d >= MAX_DEPTH or steps[0] > FAST_STEP_BUDGET:
                # deterministic depth bound / backtracking budget: defer —
                # the generic kernel decides (its failure memo makes the
                # exponential candidate re-walk polynomial)
                return False
            if v is None:
                ok = has_null
            elif v is True or v is False:
                ok = has_bool
            else:
                tv = type(v)
                if tv is int or tv is float:
                    ok = has_num
                elif tv is str:
                    ok = has_str and (enum is None or v in enum)
                elif tv is list:
                    ok = arr_h is not None and arr_h(v, _d)
                elif tv is dict:
                    ok = obj_h is not None and obj_h(v, _d)
                else:
                    return False  # non-parser type — defer to generic
            if ok:
                return True
            for c in customs:
                if c(v, _d):
                    return True
            return False

        return check

    start = ref("$start")
    if start is None:
        return lambda v, _d=0: True

    def entry(v, _d=0):
        steps[0] = 0  # reset the per-document step budget
        return start(v, _d)

    return entry
