"""Per-row validation kernel — pure Python, no Ray import.

Re-expression of the reference validator (src/Data/Medea.hs:258-425): a
recursive checker with state ``(candidate TypeNode set, parent schema)``,
started at ``({CustomNode "$start"}, None)`` (Data/Medea.hs:229-232),
dispatching ``checkAny <|> checkPrim <|> checkCustoms``
(Data/Medea.hs:297-298). Pass/fail semantics are identical; two documented
deviations where the reference's behavior is an artifact of its Haskell
encoding (conformance only asserts pass/fail on both):

1. Error choice: the reference's ``Alternative`` instance keeps the first
   branch's error (Data/Medea.hs:278-286), which in practice surfaces
   ``checkAny``'s EmptyError. We report the most specific error instead —
   the primitive-branch error when the value's JSON type was a candidate,
   else the first (sorted-order) custom candidate's error, else
   ``not_one_of_options``.
2. Annotations: the reference's ``checkCustom`` fmaps ``UserDefined name``
   over the *whole* subtree (Data/Medea.hs:401 ``($> ...) <$>``); the
   default ``annotate=True`` ("node") mode annotates only the dispatched
   node itself. ``annotate="subtree"`` reproduces the reference exactly:
   a Cofree-shaped tree ``[label, kind, payload]`` per node, with every
   custom dispatch relabelling its whole subtree — so, since the root
   dispatch is always ``CustomNode $start`` (Data/Medea.hs:231-232), a
   document validated through ``validate_obj`` carries ``("user",
   "$start")`` on every node, which is the reference's observable
   behavior (their own ``validAgainst`` comment calls it "a bit
   useless"). Bare-array/object fast paths descend with the any-set in
   this mode (Data/Medea.hs:329-336): children become ``AnythingF``
   leaves labelled ``any`` before the enclosing relabel.

Violation vocabulary (§2.4 of SURVEY.md; ValidationError at
Data/Medea.hs:173-210): ``not_json, not_one_of_options,
additional_prop_banned, required_prop_missing, out_of_bounds_array_length,
implementation_error`` plus ``max_depth_exceeded``: a structural
array/object check at container depth >= ``MAX_DEPTH`` fails with that
code DETERMINISTICALLY — the verdict on adversarially deep documents is a
fixed engine contract, not an artifact of whichever kernel's Python stack
ran out first (the fast paths defer at the same bound, so fast-vs-generic
parity holds at every depth). A ``RecursionError`` backstop remains for
pathological same-level custom chains.
"""

from __future__ import annotations

import json
import sys

from medea_ray.schema.compile import CompiledSchema, Schema

__all__ = [
    "MAX_DEPTH",
    "MedeaValidationError",
    "ValidatedJSON",
    "json_type_of",
    "loads_json",
    "validate",
    "validate_obj",
]

# Deterministic container-nesting bound: an array/object needing a
# structural check at depth >= MAX_DEPTH is a max_depth_exceeded violation
# (leaves and $any subtrees below it are unaffected — they are never
# walked). 200 covers any real web-page payload by orders of magnitude
# while staying far from Python frame limits for every kernel.
MAX_DEPTH = 200

# Work bound for the bool-only fast paths (codegen/fastpath): candidate
# backtracking re-walks subtrees, and a diamond-shaped candidate set over
# a deep REJECTING document is exponential (2^depth child re-dispatches —
# an adversarial web page could pin a worker). Past this many schema-
# dispatch steps a fast path returns False (defer): the generic kernel —
# polynomial thanks to its (container, schema) failure memo — stays the
# authority. Honest documents sit orders of magnitude below the budget
# (the flagship flat page costs 1 step; a 200-level chain ~10^3).
FAST_STEP_BUDGET = 500_000

# The generic kernel spends several Python frames per container level
# (check_array/_check_node/check_schema_of/check_prim, plus one frame per
# same-level custom-candidate dispatch). Guarantee it can reach MAX_DEPTH
# under deep custom chains without tripping CPython's default 1000-frame
# limit. Raised lazily on the first validate_obj call — NOT at import —
# so host processes that import the package only for driver-side surfaces
# (summarize_run, manifests) keep their own recursion limit; only ever
# raises the limit, never lowers it.
_recursion_headroom_ensured = False


def _ensure_recursion_headroom():
    global _recursion_headroom_ensured
    if not _recursion_headroom_ensured:
        if sys.getrecursionlimit() < 10_000:
            sys.setrecursionlimit(10_000)
        _recursion_headroom_ensured = True


class MedeaValidationError(Exception):
    """A validation failure: (code, schema, path, detail).

    ``path`` is the JSON-pointer-ish location walked from the root (e.g.
    ``$/tags[2]``), ``schema`` the name of the specifying schema — together
    these are the engine's violation row (url, schema_path,
    failed_specifier), per BASELINE.json.
    """

    def __init__(self, code: str, schema: str | None, path: str, detail: str = ""):
        self.code = code
        self.schema = schema
        self.path = path
        self.detail = detail
        super().__init__(f"{code} at {path}" + (f" (schema {schema})" if schema else ""))


def json_type_of(v) -> str:
    # JSONType.hs:30-36 typeOf. bool before int: Python bools are ints.
    if v is None:
        return "null"
    if v is True or v is False:
        return "boolean"
    t = type(v)
    if t is str:
        return "string"
    if t is int or t is float:
        return "number"
    if t is list:
        return "array"
    if t is dict:
        return "object"
    # Subclasses (rare path).
    if isinstance(v, str):
        return "string"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, list):
        return "array"
    if isinstance(v, dict):
        return "object"
    raise MedeaValidationError("implementation_error", None, "$", f"unhandled type {t!r}")


try:  # optional accelerator; strict like Aeson (rejects NaN/Infinity,
    # enforces UTF-8, last duplicate key wins) and ~4x faster than stdlib
    import orjson as _fastjson
except ImportError:  # pragma: no cover - depends on environment
    _fastjson = None


def loads_json(payload):
    """decodeStrict equivalent (Data/Medea.hs:225-227): strict JSON only —
    Aeson rejects NaN/Infinity, so we do too. Raises MedeaValidationError
    ``not_json``."""
    if _fastjson is not None:
        try:
            return _fastjson.loads(payload)
        except (ValueError, TypeError) as e:
            raise MedeaValidationError("not_json", None, "$", str(e)) from None

    def _reject_const(_s):
        raise ValueError("non-standard JSON constant")

    if isinstance(payload, (bytes, bytearray, memoryview)):
        try:
            payload = bytes(payload).decode("utf-8")
        except UnicodeDecodeError:
            raise MedeaValidationError("not_json", None, "$", "invalid utf-8") from None
    try:
        return json.loads(payload, parse_constant=_reject_const)
    except (ValueError, TypeError) as e:
        raise MedeaValidationError("not_json", None, "$", str(e)) from None
    except RecursionError:
        raise MedeaValidationError("not_json", None, "$", "nesting too deep") from None




def _relabel(node: list, label) -> list:
    """``($> label)`` over a subtree-mode annotation tree (the Cofree
    Functor fmap, Data/Medea.hs:401): overwrite every node's label
    in place. Iterative — document depth must not limit relabelling."""
    stack = [node]
    while stack:
        n = stack.pop()
        n[0] = label
        kind = n[1]
        if kind == "array":
            stack.extend(n[2])
        elif kind == "object":
            stack.extend(n[2].values())
    return node


_MEMO_MISS = object()


class _Checker:
    """One validation pass over one document. Holds the schema map and a
    mutable path stack; per-document state is discarded (mirrors the RWST
    state discipline, Data/Medea.hs:260-276)."""

    __slots__ = ("m", "path", "annotate", "subtree", "_fail_memo", "_ok_memo")

    def __init__(self, schema_map: Schema, annotate):
        self.m = schema_map
        # raw segments (str = property name, int = array index); formatted
        # lazily in _pathstr so the hot path never builds path strings
        self.path: list = []
        self.annotate = bool(annotate)
        self.subtree = annotate == "subtree"
        # (id(container), schema_name, depth) -> first MedeaValidationError
        # / success result. Candidate backtracking re-checks the SAME
        # container against the same schema through different parents —
        # without these memos a diamond candidate set over a deep
        # document is exponential (2^depth child re-dispatches, both on
        # rejecting docs via failures and on accepting docs via success
        # re-walks of aborted derivations); those re-checks happen at the
        # SAME depth, so keying on depth preserves the polynomial bound.
        # Depth is in the key because verdicts depend on it through
        # MAX_DEPTH: an ALIASED container (possible only through the
        # public validate_obj API — parsed JSON never aliases) validated
        # at two depths may legitimately pass at one and overflow at the
        # other. For aliased same-depth occurrences only the reported
        # error path/detail may reference the first occurrence; the
        # verdict itself is a function of (value, schema, depth). Success
        # results (None, or the plain-mode tuple tree — immutable) are
        # cached in every mode EXCEPT "subtree", whose list trees are
        # relabelled in place by the enclosing dispatch and must stay
        # per-position.
        self._fail_memo: dict = {}
        self._ok_memo: dict | None = None if annotate == "subtree" else {}

    def _pathstr(self) -> str:
        return "$" + "".join(
            f"[{seg}]" if type(seg) is int else f"/{seg}" for seg in self.path
        )

    def fail(self, code: str, schema: str | None, detail: str = ""):
        raise MedeaValidationError(code, schema, self._pathstr(), detail)

    # checkTypes (Data/Medea.hs:297-298) over a candidate description.
    # For speed the candidate set arrives pre-split when coming from a
    # schema (has_any/prims/customs); ad-hoc singleton nodes use _check_node.
    def check_schema_of(self, v, scm: CompiledSchema, as_name: str):
        """Validate v against schema `as_name` (checkCustom body,
        Data/Medea.hs:398-404): candidates = scm.types_as, parent = name.
        Container results are memoized per (id, schema, depth) — see
        __init__."""
        tv = type(v)
        if not (tv is list or tv is dict or isinstance(v, (list, dict))):
            # isinstance fallback: list/dict SUBCLASSES reach the public
            # validate_obj API too, and skipping the memo for them would
            # leave the exponential-backtracking DoS reachable there
            return self._dispatch(v, scm, as_name)
        key = (id(v), as_name, len(self.path))
        prior = self._fail_memo.get(key)
        if prior is not None:
            raise prior
        ok = self._ok_memo
        if ok is not None:
            hit = ok.get(key, _MEMO_MISS)
            if hit is not _MEMO_MISS:
                return hit
        try:
            r = self._dispatch(v, scm, as_name)
        except MedeaValidationError as e:
            self._fail_memo[key] = e
            raise
        if ok is not None:
            ok[key] = r
        return r

    def _dispatch(self, v, scm: CompiledSchema, as_name: str):
        if scm.has_any:
            return self._ann("any", v)
        err = None
        t = json_type_of(v)
        if t in scm.prim_types:
            try:
                return self.check_prim(v, t, as_name)
            except MedeaValidationError as e:
                err = e
        else:
            err = None  # prim type not even a candidate
        for name in scm.custom_types:
            try:
                sub = self.m[name]
            except KeyError:
                self.fail("implementation_error", name, "unknown schema")
            try:
                r = self.check_schema_of(v, sub, name)
                if self.subtree:
                    return _relabel(r, ("user", name))
                return ("user", name, r) if self.annotate else None
            except MedeaValidationError as e:
                if err is None:
                    err = e
        if err is not None:
            raise err
        self.fail("not_one_of_options", as_name, f"value of type {t}")

    def _check_node(self, v, node: tuple):
        """Validate v against a singleton TypeNode with no parent (array
        elements / object property values: Data/Medea.hs:352-356,378-380)."""
        kind = node[0]
        if kind == "any":
            return self._ann("any", v)
        t = json_type_of(v)
        if kind == "prim":
            if t != node[1]:
                self.fail("not_one_of_options", None, f"expected {node[1]}, got {t}")
            return self.check_prim(v, t, None)
        # custom
        name = node[1]
        try:
            scm = self.m[name]
        except KeyError:
            self.fail("implementation_error", name, "unknown schema")
        r = self.check_schema_of(v, scm, name)
        if self.subtree:
            return _relabel(r, ("user", name))
        return ("user", name, r) if self.annotate else None

    def check_prim(self, v, t: str, parent: str | None):
        # checkPrim (Data/Medea.hs:310-336).
        if t == "null" or t == "boolean" or t == "number":
            if self.subtree:
                return [t, t, v]
            return (t, v) if self.annotate else None
        if t == "string":
            if parent is not None:
                sv = self.m[parent].string_vals_set
                # Data/Medea.hs:318-328: empty enum accepts any string.
                if sv and v not in sv:
                    self.fail("not_one_of_options", parent, f"string {v!r} not in enum")
            if self.subtree:
                return ["string", "string", v]
            return ("string", v) if self.annotate else None
        if t == "array":
            if parent is None:
                # Bare-array fast path (Data/Medea.hs:329-336): children
                # validate against {AnyNode} — unconditionally accepted;
                # subtree mode materializes them as AnySchema AnythingF
                # leaves, exactly the reference's `traverse checkTypes`
                # under the any-set.
                if self.subtree:
                    return ["array", "array", [["any", "anything", el] for el in v]]
                return ("array", v) if self.annotate else None
            return self.check_array(v, parent)
        # object
        if parent is None:
            if self.subtree:
                return [
                    "object",
                    "object",
                    {k: ["any", "anything", val] for k, val in v.items()},
                ]
            return ("object", v) if self.annotate else None
        return self.check_object(v, parent)

    def check_array(self, arr: list, parent: str):
        # checkArray (Data/Medea.hs:339-359).
        if len(self.path) >= MAX_DEPTH:
            self.fail(
                "max_depth_exceeded", parent,
                f"container nesting exceeds {MAX_DEPTH} levels",
            )
        scm = self.m[parent]
        n = len(arr)
        lo, hi = scm.min_array_len, scm.max_array_len
        if (lo is not None and n < lo) or (hi is not None and n > hi):
            self.fail(
                "out_of_bounds_array_length", parent, f"length {n} not in [{lo},{hi}]"
            )
        kind = scm.array_kind
        out = [] if self.annotate else None
        if kind is None:
            # Elements validate against {AnyNode} (pairValsWithTypes).
            if self.subtree:
                out = [["any", "anything", el] for el in arr]
        elif kind == "list":
            node = scm.element_node
            push, pop = self.path.append, self.path.pop
            for i, el in enumerate(arr):
                push(i)
                try:
                    r = self._check_node(el, node)
                finally:
                    pop()
                if out is not None:
                    out.append(r)
        else:  # tuple: element i vs nodes[i]; arity enforced by bounds above
            push, pop = self.path.append, self.path.pop
            for i, (el, node) in enumerate(zip(arr, scm.tuple_nodes)):
                push(i)
                try:
                    r = self._check_node(el, node)
                finally:
                    pop()
                if out is not None:
                    out.append(r)
        if self.subtree:
            return ["array", "array", out]
        return ("array", out if self.annotate else arr) if self.annotate else None

    def check_object(self, obj: dict, parent: str):
        # checkObject + pairPropertySchemaAndVal (Data/Medea.hs:362-391).
        # Phase order mirrors the reference: pair every present property
        # (raising additional_prop_banned), then the required-property
        # check, and only THEN validate property values — so an object
        # with both a banned/missing property and an invalid value reports
        # the structural error. (Within a phase we use document order
        # where the reference has nondeterministic HashMap order — V12.)
        if len(self.path) >= MAX_DEPTH:
            self.fail(
                "max_depth_exceeded", parent,
                f"container nesting exceeds {MAX_DEPTH} levels",
            )
        scm = self.m[parent]
        props = scm.props
        additional_ok = scm.additional_allowed
        additional_node = scm.additional_node
        pairs = []
        for key, val in obj.items():
            spec = props.get(key)
            if spec is not None:
                pairs.append((key, val, spec[0]))
            elif additional_ok:
                pairs.append((key, val, additional_node))
            else:
                self.fail("additional_prop_banned", parent, key)
        for key, (_node, optional) in props.items():
            if not optional and key not in obj:
                self.fail("required_prop_missing", parent, key)
        out = {} if self.annotate else None
        push, pop = self.path.append, self.path.pop
        for key, val, node in pairs:
            push(key)
            try:
                r = self._check_node(val, node)
            finally:
                pop()
            if out is not None:
                out[key] = r
        if self.subtree:
            return ["object", "object", out]
        return ("object", out if self.annotate else obj) if self.annotate else None

    def _ann(self, label: str, v):
        if self.subtree:
            # AnySchema :< AnythingF v (Data/Medea.hs:303-307)
            return [label, "anything", v]
        return (label, v) if self.annotate else None


class ValidatedJSON:
    """Mirror of the reference's ValidatedJSON (Data/Medea.hs:140-170):
    the document plus the annotation tree. ``to_value()`` strips annotations;
    ``valid_against()`` reads the root annotation."""

    __slots__ = ("_value", "_tree")

    def __init__(self, value, tree):
        self._value = value
        self._tree = tree

    def to_value(self):
        return self._value

    def valid_against(self):
        # the root annotation is always the UserDefined '$start' wrapper
        # (Data/Medea.hs:401) — a single check, no descent
        t = self._tree
        if t is None:
            # annotate=False: no tree was built, but this object only
            # exists for a document validate() accepted, and the root
            # dispatch is always CustomNode $start (Data/Medea.hs:229-232)
            return ("user_defined", "$start")
        if isinstance(t, list):  # subtree mode: [label, kind, payload]
            label = t[0]
            if isinstance(label, tuple) and label[0] == "user":
                return ("user_defined", label[1])
            return (label,)
        if isinstance(t, tuple) and t[0] == "user":
            return ("user_defined", t[1])
        return (t[0],) if isinstance(t, tuple) else ("any",)


def validate_obj(schema_map: Schema, obj, annotate=False):
    """Validate an already-parsed JSON value. Returns the annotation tree
    (or None when annotate=False); raises MedeaValidationError.

    ``annotate`` is ``False`` (no tree), ``True`` (dispatched-node
    labels, the engine default) or ``"subtree"`` (reference-exact Cofree
    relabelling — see module docstring deviation 2).

    Start state: candidates {CustomNode $start}, no parent
    (Data/Medea.hs:229-232)."""
    _ensure_recursion_headroom()
    chk = _Checker(schema_map, annotate)
    start = schema_map.get("$start")
    if start is None:
        chk.fail("implementation_error", "$start", "missing start schema")
    try:
        r = chk.check_schema_of(obj, start, "$start")
    except RecursionError:
        # backstop only: container depth is bounded deterministically at
        # MAX_DEPTH above; this catches pathological same-level custom
        # chains so they yield a violation, never kill the worker task
        raise MedeaValidationError(
            "max_depth_exceeded", None, "$", "document nesting exceeds validator depth limit"
        ) from None
    if not annotate:
        return None
    if annotate == "subtree":
        # the root dispatch IS CustomNode $start (Data/Medea.hs:231-232),
        # so its fmap overwrites every inner custom label — reference-exact
        return _relabel(r, ("user", "$start"))
    return ("user", "$start", r)


def validate(schema_map: Schema, payload, annotate=True) -> ValidatedJSON:
    """validate (Data/Medea.hs:225-232): bytes/str → parse JSON → check.
    Returns ValidatedJSON or raises MedeaValidationError. Pass
    ``annotate="subtree"`` for reference-exact whole-subtree annotations."""
    obj = loads_json(payload)
    tree = validate_obj(schema_map, obj, annotate=annotate)
    return ValidatedJSON(obj, tree)
