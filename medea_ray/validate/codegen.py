"""Source-codegen variant of the boolean validation fast path.

``compile_fast_codegen(schema_map)`` lowers the compiled DAG into ONE
exec'd Python source — one function per reachable non-trivial schema,
with property / element / tuple-position checks inlined as expressions
whenever the target schema is *simple* (a primitive type-set plus an
optional string enum: no array/object branches, no custom candidates).
Only genuinely nested structure (object property → object/array schema,
array element → complex schema) costs a function call, so the per-level
closure-call stack of ``fastpath.compile_fast`` collapses to inline type
tests (~1.75× the closure lowering on the flagship flat-object shape,
measured interleaved). Objects with many properties dispatch through a
dict of per-property checkers instead of an if/elif chain (the chain is
O(P) per key — measured 3× slower than dict dispatch at P=50). Custom
candidate dispatch is flattened to an OR over the deduplicated transitive
closure (boolean-identical to the reference's first-success DFS), so
diamond-shaped candidate DAGs evaluate in linear time where a naive
recursion is 2^depth on rejecting documents (the generic kernel stays
polynomial via its per-(container, schema, depth) memo).

The contract is the same as ``fastpath.py``:

    fast(obj) is True   =>  the document is valid under the reference
                            dispatch semantics
    fast(obj) is False  =>  obj MAY be invalid — the caller re-runs the
                            generic kernel for the authoritative verdict

i.e. under-accept only; it never over-accepts a document the reference
semantics reject. The three under-accept classes match fastpath.py:
values whose type is a non-builtin subclass; values at container depth
>= ``kernel.MAX_DEPTH`` (every generated function threads a ``_d`` depth
counter and returns False past the bound, so the generic kernel — which
fails structural checks at the SAME bound deterministically — stays the
authority on deep documents; the verdict never depends on which kernel's
Python stack would have overflowed first); and documents whose candidate
backtracking exceeds ``kernel.FAST_STEP_BUDGET`` dispatch steps (a
diamond candidate set over a deep document re-walks subtrees
exponentially — past the budget the row defers to the generic kernel,
whose failure memo evaluates it in polynomial time).

Reference semantics mirrored (cited, not copied):
- dispatch is ``checkAny <|> checkPrim <|> checkCustoms``
  (/root/reference/src/Data/Medea.hs:297-298); custom candidates are
  tried only after the primitive branch rejects;
- bool is tagged before number (json_type_of parity — a JSON ``true``
  never satisfies ``$number``);
- empty ``$string-values`` enum accepts any string
  (/root/reference/src/Data/Medea.hs:318-328);
- object property pairing with additional-property rules
  (/root/reference/src/Data/Medea.hs:372-391); tuple arity is lowered
  upstream to ``min==max`` array bounds (schema/compile.py C10).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from medea_ray.validate.kernel import FAST_STEP_BUDGET, MAX_DEPTH

__all__ = ["compile_fast_codegen", "generate_source"]

_SIMPLE_PRIMS = frozenset(("null", "boolean", "number", "string"))

_MISS = object()  # absent-key sentinel for the wide-object dict dispatch

# schema "status" values
_MISSING = "missing"
_ALWAYS = "always_true"
_SIMPLE = "simple"
_COMPLEX = "complex"


class _Gen:
    def __init__(self, schema_map):
        self.schema_map = schema_map
        self.status: dict = {}
        self.fname: dict = {}
        self.sname: dict = {}  # name -> selfcheck fn (_s{i})
        self.enums: list = []  # frozensets -> _e{i}
        self.enum_ix: dict = {}  # frozenset -> index
        self._at_cache: dict = {}  # name -> always-true bool (memo)
        self.consts: dict = {}  # extra namespace objects (_pd/_rq dicts)
        self.tail_stmts: list[str] = []  # module-level stmts after all defs
        self.funcs: list[str] = []  # completed function sources
        self._stack: list[list[str]] = []  # per-function line buffers
        self.emitted: set = set()

    @property
    def lines(self) -> list[str]:
        """Line buffer of the function currently being emitted. Nested
        emit_fn calls (property -> complex schema) push their own buffer,
        so function sources never interleave."""
        return self._stack[-1]

    # ---- schema classification -------------------------------------
    def stat(self, name: str) -> str:
        got = self.status.get(name)
        if got is not None:
            return got
        scm = self.schema_map.get(name)
        if scm is None:
            st = _MISSING
        elif self._always_true(name, frozenset()):
            st = _ALWAYS
        elif (
            not scm.custom_types
            and scm.prim_types <= _SIMPLE_PRIMS
        ):
            st = _SIMPLE
        else:
            st = _COMPLEX
        self.status[name] = st
        return st

    def _always_true(self, name: str, visiting: frozenset) -> bool:
        """has_any, or any custom candidate that is itself always-true.

        The $type (custom-candidate) relation is acyclic (compile.py C6,
        Analysis.hs:115-121) so this DFS terminates; the visiting guard
        is pure defense — a revisit counts as not-always-true. Memoized:
        without the cache a diamond-shaped candidate DAG (two candidates
        per schema converging on shared children — legal) is 2^depth."""
        got = self._at_cache.get(name)
        if got is not None:
            return got
        scm = self.schema_map.get(name)
        if scm is None:
            r = False
        elif scm.has_any:
            r = True
        elif name in visiting:
            return False  # defensive cycle cut: do NOT cache partial state
        else:
            v2 = visiting | {name}
            r = any(self._always_true(c, v2) for c in scm.custom_types)
        self._at_cache[name] = r
        return r

    # ---- expression builders ----------------------------------------
    def enum_name(self, vals: frozenset) -> str:
        key = vals  # frozensets hash by value
        ix = self.enum_ix.get(key)
        if ix is None:
            ix = len(self.enums)
            self.enums.append(vals)
            self.enum_ix[key] = ix
        return f"_e{ix}"

    def simple_expr(self, name: str, var: str) -> str:
        """OR-of-primitive-terms expression for a _SIMPLE schema."""
        scm = self.schema_map[name]
        return self.prim_terms_expr(
            scm.prim_types, scm.string_vals_set or None, var
        )

    def prim_terms_expr(self, prims, enum, var: str) -> str:
        terms = []
        if "null" in prims:
            terms.append(f"{var} is None")
        if "boolean" in prims:
            terms.append(f"{var} is True or {var} is False")
        if "number" in prims:
            terms.append(f"type({var}) is int or type({var}) is float")
        if "string" in prims:
            if enum:
                terms.append(
                    f"(type({var}) is str and {var} in {self.enum_name(enum)})"
                )
            else:
                terms.append(f"type({var}) is str")
        if not terms:
            return "False"
        return " or ".join(terms)

    def node_expr(self, node, var: str, depth: str = "_d + 1") -> str | None:
        """Check expression for a parentless TypeNode (None == no check).

        ``depth`` is the Python expression giving VAR's own container
        depth — ``"_d + 1"`` from a function body (var is a child of the
        function's value), ``"_d"`` inside a wide-object checker lambda
        (the lambda receives the child's depth directly).

        Mirrors fastpath.node_check / Data/Medea.hs:352-356,378-380."""
        if node is None or node[0] == "any":
            return None
        if node[0] == "prim":
            t = node[1]
            if t == "array":
                return f"type({var}) is list"
            if t == "object":
                return f"type({var}) is dict"
            return self.prim_terms_expr((t,), None, var)
        # custom
        name = node[1]
        st = self.stat(name)
        if st == _ALWAYS:
            return None
        if st == _MISSING:
            # generic kernel raises implementation_error — always defer
            return "False"
        if st == _SIMPLE:
            return self.simple_expr(name, var)
        self.emit_fn(name)
        return f"{self.fn(name)}({var}, {depth})"

    # ---- function emission -------------------------------------------
    def fn(self, name: str) -> str:
        f = self.fname.get(name)
        if f is None:
            f = f"_f{len(self.fname)}"
            self.fname[name] = f
        return f

    def candidate_closure(self, name: str) -> list[str]:
        """Transitive custom-candidate closure of ``name`` (preorder,
        deduplicated, ``name`` first; dangling candidates skipped — the
        generic kernel is the one that raises ``implementation_error``).

        The boolean dispatch result is an OR of per-schema structural
        acceptance over exactly this set (checkAny <|> checkPrim <|>
        checkCustoms recursion, Data/Medea.hs:297-298, flattened): the
        reference tries candidates depth-first and returns the first
        success, so *which* member accepts changes only errors, never the
        verdict. Iterating the dedup'd closure keeps evaluation linear
        where the naive recursion is 2^depth on diamond-shaped DAGs."""
        out: list[str] = []
        seen: set = set()
        stack = [name]
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            scm = self.schema_map.get(n)
            if scm is None:
                continue
            out.append(n)
            stack.extend(reversed(scm.custom_types))
        return out

    def _emit_selfcheck_body(self, scm) -> None:
        """Prim/array/object structural check of one schema (no candidate
        dispatch) into the current buffer: sets ``ok`` or returns False
        for a non-parser-typed value (defer to the generic kernel)."""
        L = self.lines.append
        prims = scm.prim_types
        L(f"    if v is None:")
        L(f"        ok = {'null' in prims}")
        L(f"    elif v is True or v is False:")
        L(f"        ok = {'boolean' in prims}")
        L(f"    else:")
        L(f"        _t = type(v)")
        L(f"        if _t is int or _t is float:")
        L(f"            ok = {'number' in prims}")
        L(f"        elif _t is str:")
        if "string" in prims:
            enum = scm.string_vals_set or None
            if enum:
                L(f"            ok = v in {self.enum_name(enum)}")
            else:
                L(f"            ok = True")
        else:
            L(f"            ok = False")
        L(f"        elif _t is list:")
        if "array" in prims:
            self._emit_array(scm, "            ")
        else:
            L(f"            ok = False")
        L(f"        elif _t is dict:")
        if "object" in prims:
            self._emit_object(scm, "            ")
        else:
            L(f"            ok = False")
        L(f"        else:")
        L(f"            return False  # non-parser type: defer to generic")

    def emit_selfcheck(self, name: str) -> str:
        """Emit (once) a function running only ``name``'s structural
        check — used for closure members, whose own candidates are
        already in the caller's flattened closure."""
        f = self.sname.get(name)
        if f is not None:
            return f
        f = f"_s{len(self.sname)}"
        self.sname[name] = f
        self._stack.append([])
        L = self.lines.append
        # no depth guard: _s fns are only called from an _f body that
        # already passed its own guard at the same depth — but they DO
        # count against the step budget (each may walk the subtree)
        L(f"def {f}(v, _d=0):")
        L(f"    _S[0] += 1")
        L(f"    if _S[0] > _BUDGET:")
        L(f"        return False")
        self._emit_selfcheck_body(self.schema_map[name])
        L(f"    return ok")
        L("")
        self.funcs.append("\n".join(self._stack.pop()))
        return f

    def emit_fn(self, name: str) -> None:
        if name in self.emitted:
            return
        self.emitted.add(name)
        fn = self.fn(name)
        scm = self.schema_map[name]
        self._stack.append([])
        L = self.lines.append
        L(f"def {fn}(v, _d=0):")
        # deterministic depth bound (kernel.MAX_DEPTH): past it, defer —
        # the generic kernel fails structural checks at the same depth
        # with max_depth_exceeded, so the verdict is kernel-independent.
        # The step budget (kernel.FAST_STEP_BUDGET, reset per document by
        # the compile_fast_codegen entry wrapper) bounds candidate
        # backtracking: a diamond candidate set over a deep document is
        # exponential without it — past the budget the row defers to the
        # generic kernel, whose failure memo is polynomial.
        L(f"    _S[0] += 1")
        L(f"    if _d >= _MAXD or _S[0] > _BUDGET:")
        L(f"        return False")
        self._emit_selfcheck_body(scm)
        L(f"    if ok:")
        L(f"        return True")
        for c in self.candidate_closure(name)[1:]:
            st = self.stat(c)
            if st == _MISSING:
                continue  # candidate can only raise in the generic kernel
            if st == _ALWAYS:
                # unreachable: an always-true closure member makes the
                # whole schema always-true upstream — guard anyway
                L(f"    return True")
                L("")
                self.funcs.append("\n".join(self._stack.pop()))
                return
            if st == _SIMPLE:
                L(f"    if {self.simple_expr(c, 'v')}:")
            else:
                # same value, same depth: candidate dispatch is not descent
                L(f"    if {self.emit_selfcheck(c)}(v, _d):")
            L(f"        return True")
        L(f"    return False")
        L("")
        self.funcs.append("\n".join(self._stack.pop()))

    def _emit_array(self, scm, ind: str) -> None:
        L = self.lines.append
        lo, hi = scm.min_array_len, scm.max_array_len
        bounds = []
        if lo is not None:
            bounds.append(f"_n < {lo}")
        if hi is not None:
            bounds.append(f"_n > {hi}")
        if bounds:
            L(f"{ind}_n = len(v)")
            L(f"{ind}if {' or '.join(bounds)}:")
            L(f"{ind}    ok = False")
            L(f"{ind}else:")
            ind2 = ind + "    "
        else:
            ind2 = ind
        if scm.array_kind == "list":
            el = self.node_expr(scm.element_node, "_y")
            if el is None:
                L(f"{ind2}ok = True")
            else:
                L(f"{ind2}ok = True")
                L(f"{ind2}for _y in v:")
                L(f"{ind2}    if not ({el}):")
                L(f"{ind2}        ok = False")
                L(f"{ind2}        break")
        elif scm.array_kind == "tuple":
            # arity is lowered to min==max bounds upstream (compile.py
            # C10), so positional indexing is in range here
            terms = []
            for i, nd in enumerate(scm.tuple_nodes):
                e = self.node_expr(nd, f"v[{i}]")
                if e is not None:
                    terms.append(f"({e})")
            L(f"{ind2}ok = {' and '.join(terms) if terms else 'True'}")
        else:
            L(f"{ind2}ok = True")

    def node_callable_src(self, node) -> str:
        """Source text for a ``(child_value, child_depth)`` callable
        checking ``node`` (or "None" for no-check) — used by the
        wide-object dict dispatch."""
        expr = self.node_expr(node, "v", "_d")
        if expr is None:
            return "None"
        # a bare complex-schema call compiles to the function itself
        # (same (v, _d) signature as the lambdas)
        if expr.startswith("_f") and expr.endswith("(v, _d)") and expr[2:-7].isdigit():
            return expr[:-7]
        return f"(lambda v, _d: {expr})"

    # properties above this count dispatch through a dict of checkers:
    # the inline if/elif chain is O(P) per document key (measured 3x
    # slower than dict dispatch at P=50), the dict is O(1) + one call
    _WIDE_PROPS = 16

    def _emit_object_wide(self, scm, ind: str) -> None:
        L = self.lines.append
        n = len(self.consts)
        pd, rq, ad = f"_pd{n}", f"_rq{n}", f"_ad{n}"
        self.consts[rq] = tuple(
            k for k, (_nd, opt) in scm.props.items() if not opt
        )
        items = ", ".join(
            f"{k!r}: {self.node_callable_src(nd)}" for k, (nd, _o) in scm.props.items()
        )
        self.tail_stmts.append(f"{pd} = {{{items}}}")
        add_ok = scm.additional_allowed
        add_src = self.node_callable_src(scm.additional_node) if add_ok else "None"
        self.tail_stmts.append(f"{ad} = {add_src}")
        L(f"{ind}ok = True")
        L(f"{ind}for _k, _x in v.items():")
        L(f"{ind}    _c = {pd}.get(_k, _MISS)")
        L(f"{ind}    if _c is _MISS:")
        if not add_ok:
            L(f"{ind}        ok = False")
            L(f"{ind}        break")
        elif add_src != "None":
            L(f"{ind}        if not {ad}(_x, _d + 1):")
            L(f"{ind}            ok = False")
            L(f"{ind}            break")
        else:
            L(f"{ind}        pass")
        L(f"{ind}    elif _c is not None and not _c(_x, _d + 1):")
        L(f"{ind}        ok = False")
        L(f"{ind}        break")
        L(f"{ind}if ok:")
        L(f"{ind}    for _k in {rq}:")
        L(f"{ind}        if _k not in v:")
        L(f"{ind}            ok = False")
        L(f"{ind}            break")

    def _emit_object(self, scm, ind: str) -> None:
        L = self.lines.append
        props = scm.props
        if len(props) > self._WIDE_PROPS:
            self._emit_object_wide(scm, ind)
            return
        add_ok = scm.additional_allowed
        add_expr = self.node_expr(scm.additional_node, "_x") if add_ok else None
        n_required = sum(1 for (_nd, opt) in props.values() if not opt)
        if not props:
            if not add_ok:
                L(f"{ind}ok = len(v) == 0")
            elif add_expr is None:
                L(f"{ind}ok = True")
            else:
                L(f"{ind}ok = True")
                L(f"{ind}for _x in v.values():")
                L(f"{ind}    if not ({add_expr}):")
                L(f"{ind}        ok = False")
                L(f"{ind}        break")
            return
        L(f"{ind}ok = True")
        if n_required:
            L(f"{ind}_r = 0")
        L(f"{ind}for _k, _x in v.items():")
        kw = "if"
        for pname, (nd, opt) in props.items():
            e = self.node_expr(nd, "_x")
            L(f"{ind}    {kw} _k == {pname!r}:")
            body = []
            if not opt:
                body.append(f"{ind}        _r += 1")
            if e is not None:
                body.append(f"{ind}        if not ({e}):")
                body.append(f"{ind}            ok = False")
                body.append(f"{ind}            break")
            if not body:
                body.append(f"{ind}        pass")
            self.lines.extend(body)
            kw = "elif"
        L(f"{ind}    else:")
        if not add_ok:
            L(f"{ind}        ok = False")
            L(f"{ind}        break")
        elif add_expr is not None:
            L(f"{ind}        if not ({add_expr}):")
            L(f"{ind}            ok = False")
            L(f"{ind}            break")
        else:
            L(f"{ind}        pass")
        if n_required:
            L(f"{ind}if ok and _r != {n_required}:")
            L(f"{ind}    ok = False")


def generate_source(schema_map) -> tuple[str, dict, str | None]:
    """Returns (source, namespace, start_fn_name).

    start_fn_name is None when $start is trivially constant; then
    namespace['_const'] holds the constant result."""
    g = _Gen(schema_map)
    st = g.stat("$start")
    ns: dict = {}
    if st == _ALWAYS:
        return "", {"_const": True}, None
    if st == _MISSING:
        # mirror fastpath.ref on a missing schema: always defer
        return "", {"_const": False}, None
    if st == _SIMPLE:
        src_expr = g.simple_expr("$start", "v")
        src = f"def _f_start(v):\n    return bool({src_expr})\n"
        for i, e in enumerate(g.enums):
            ns[f"_e{i}"] = e
        return src, ns, "_f_start"
    g.emit_fn("$start")
    for i, e in enumerate(g.enums):
        ns[f"_e{i}"] = e
    ns.update(g.consts)
    ns["_MISS"] = _MISS
    ns["_MAXD"] = MAX_DEPTH
    ns["_BUDGET"] = FAST_STEP_BUDGET
    ns["_S"] = [0]
    src = "\n".join(g.funcs)
    if g.tail_stmts:
        # dict-dispatch tables reference the generated functions, so they
        # are assigned after every def has executed
        src += "\n" + "\n".join(g.tail_stmts) + "\n"
    return src, ns, g.fn("$start")


def compile_fast_codegen(schema_map) -> Callable[[Any], bool]:
    """Compile the DAG into one ``check(obj) -> bool`` for ``$start``."""
    src, ns, start = generate_source(schema_map)
    if start is None:
        const = ns["_const"]
        return (lambda v: True) if const else (lambda v: False)
    exec(compile(src, "<medea-fastpath-codegen>", "exec"), ns)
    f = ns[start]
    if start == "_f_start":
        # _SIMPLE start: leaf checks only, no recursion — no budget needed
        return f
    steps = ns["_S"]

    def fast(v, _d=0):
        # (v, _d=0) is the calling convention every fast-path callable
        # keeps (fastpath.compile_fast, the generated per-schema fns);
        # f/steps are closed over so a positional second arg stays a depth
        steps[0] = 0  # per-document step budget (see emit_fn guard)
        return f(v, _d)

    return fast
