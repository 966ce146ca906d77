"""Schema inference (constraint suggestion) over a JSON column — the
Deequ-style "suggest constraints, then enforce them" verb, specialized
to Medea's schema-graph language.

Given a Dataset with a JSON string column, two stages:

1. **profile_json** — ONE integer-partial groupby profiles every
   TOP-LEVEL property of every document: per-(property, JSON-type)
   occurrence counts, presence counts (absent vs null stay distinct —
   the reference's ``$optional-property`` semantics, SPEC.md:39-41),
   root-type counts, and string-enum candidates. The exchange carries
   only ``(kind, prop, detail, int64)`` partial rows, pre-aggregated
   per batch; document text never shuffles. Enum candidacy is decided
   by a batching-invariant global rule (distinct string values
   ``<= enum_cap`` and every value ``<= enum_max_len`` bytes) but
   bounded map-side: a batch that locally exceeds either bound emits a
   single over-cap marker instead of values, so a high-cardinality
   property costs one marker row per batch, never its value set. The
   reduced table is re-guarded engine-side (a per-prop count groupby)
   before anything reaches the driver, and a loud ``prop_budget``
   refuses adversarial corpora with unbounded property-name sets.

2. **induce_schema** — renders the profile as a Medea schema graph
   (text), using the same grammar the parser accepts
   (``/root/reference`` TOML-ish layout, SPEC.md:109-144 semantics):
   a ``$start`` object schema enumerating every observed property
   (``$optional-property`` when present-count < object-root count),
   builtin primitive targets (``$string``/``$number``/...) for
   single-type properties, and a named auxiliary schema per property
   that needs a type union ($type permutation, Analysis.hs typesAs),
   a ``$string-values`` enum, observed array-length bounds
   (``$min-length``/``$max-length`` — a 0 bound is omitted because
   the natural-number literal cannot express it, which errs loose),
   or a single observed ``$element-type``. Additional properties stay
   banned (the default), which is sound because every observed
   property is enumerated. This is the full constraint surface the
   Medea language offers (types, enums, optionality,
   additional-props, array bounds, element types, object props).

**Roundtrip guarantee**: every document that contributed to the
profile validates against the induced schema — enums contain every
observed value (or degrade to bare ``$string``), unions contain every
observed type, array bounds span every observed length, element types
are emitted only when a single one was ever observed, nested objects
are typed loose (top-level-only profiling, documented), and
optionality mirrors observed absence.
``infer_schema`` compiles the induced text through the real
parse+compile path (schema/parser.py, schema/compile.py) before
returning it, so the output is a *compiled-valid* Medea graph, not
just plausible text.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

try:  # same fast path as validate/kernel.py
    import orjson as _fastjson
except ImportError:  # pragma: no cover
    _fastjson = None
import json as _json

# Reference JSONType order (src/Data/Medea/JSONType.hs:18-25).
JTYPES = ("null", "boolean", "number", "string", "array", "object")
_PRIM = {t: "$" + t for t in JTYPES}

# Exchange row kinds (the groupby key space). Every kind rides the SAME
# single exchange; the aggregate computes sum/min/max of n per key and
# each kind reads the one that means something for it (type/root/elem
# counts read the sum, array-length bounds read min/max).
_K_TYPE = "type"        # (prop, jtype) -> count (sum)
_K_ROOT = "root"        # ("", jtype)   -> count (sum)
_K_TOTAL = "total"      # ("", "")      -> docs profiled (sum)
_K_INVALID = "invalid"  # ("", "")      -> unparseable docs (on_invalid="skip")
_K_ENUM = "enum"        # (prop, value) -> seen (count meaningless)
_K_OVER = "enumover"    # (prop, "")    -> batch exceeded cap/len
_K_ELEM = "elem"        # (prop, jtype) -> array-element occurrences (sum)
_K_ALEN = "alen"        # (prop, "")    -> batch array-length extreme (min/max)


def _jtype(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):  # before int — bool is an int subclass
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    return "object"


def _bad_strings(v) -> bool:
    """True if any string in the doc cannot encode as strict UTF-8
    (lone surrogates from \\uD800-style escapes). orjson rejects these
    at parse time; the stdlib fallback must match, or the same corpus
    would profile on one machine and crash Arrow on another."""
    if isinstance(v, str):
        try:
            v.encode("utf-8")
            return False
        except UnicodeEncodeError:
            return True
    if isinstance(v, list):
        return any(_bad_strings(x) for x in v)
    if isinstance(v, dict):
        return any(_bad_strings(k) or _bad_strings(x) for k, x in v.items())
    return False


def _reject_const(_s):
    # orjson (and kernel.loads_json on both paths) rejects NaN/Infinity;
    # the stdlib fallback must too, or the roundtrip guarantee breaks on
    # machines without orjson (the doc would profile as a number here but
    # validate as not_json in the kernel).
    raise ValueError("non-standard JSON constant")


def _loads(payload):
    if _fastjson is not None:
        return _fastjson.loads(payload)
    doc = _json.loads(payload, parse_constant=_reject_const)
    if _bad_strings(doc):
        raise ValueError("invalid UTF-8 in JSON strings (lone surrogate)")
    return doc


@dataclass
class PropProfile:
    name: str
    type_counts: dict[str, int] = field(default_factory=dict)
    # sorted observed string values if the property qualifies as an
    # enum under (enum_cap, enum_max_len); None otherwise
    enum_values: list[str] | None = None
    # observed array-length bounds + element-type occurrence counts
    # (populated only when the property was ever an array)
    array_min: int | None = None
    array_max: int | None = None
    elem_type_counts: dict[str, int] = field(default_factory=dict)

    @property
    def present(self) -> int:
        return sum(self.type_counts.values())


@dataclass
class JsonProfile:
    n_docs: int
    n_invalid: int
    root_type_counts: dict[str, int]
    props: dict[str, PropProfile]
    enum_cap: int
    enum_max_len: int

    @property
    def n_object_roots(self) -> int:
        return self.root_type_counts.get("object", 0)


def _profile_partial(col: str, enum_cap: int, enum_max_len: int, on_invalid: str):
    def partial(t: pa.Table) -> pa.Table:
        from medea_ray.engine.arrow_util import as_array, string_buffer_parts

        a = as_array(t.column(col))
        parts = string_buffer_parts(a)
        if parts is None:
            payloads = a.to_pylist()
        else:
            # parse straight off the Arrow buffer (the validate_column
            # lever): orjson takes the zero-copy memoryview slice; the
            # json-module fallback needs bytes
            data, off, nm = parts
            payloads = [
                None
                if (nm is not None and nm[i])
                else (
                    data[off[i] : off[i + 1]]
                    if _fastjson is not None
                    else bytes(data[off[i] : off[i + 1]])
                )
                for i in range(len(a))
            ]
        type_counts: dict[tuple[str, str], int] = {}
        root_counts: dict[str, int] = {}
        enum_vals: dict[str, set] = {}
        enum_over: set = set()
        alen: dict[str, tuple[int, int]] = {}
        elem_counts: dict[tuple[str, str], int] = {}
        n_docs = 0
        n_invalid = 0
        for p in payloads:
            if p is None:
                doc, bad = None, True
            else:
                try:
                    doc = _loads(p)
                    bad = False
                except (ValueError, TypeError):
                    doc, bad = None, True
            if bad:
                if on_invalid == "raise":
                    disp = (
                        p
                        if isinstance(p, (str, type(None)))
                        else bytes(p).decode("utf-8", "replace")
                    )
                    raise ValueError(
                        f"profile_json: unparseable JSON in column {col!r} "
                        f"(pass on_invalid='skip' to count instead): {disp!r:.120}"
                    )
                n_invalid += 1
                continue
            n_docs += 1
            rt = _jtype(doc)
            root_counts[rt] = root_counts.get(rt, 0) + 1
            if rt != "object":
                continue
            for k, v in doc.items():
                jt = _jtype(v)
                key = (k, jt)
                type_counts[key] = type_counts.get(key, 0) + 1
                if jt == "array":
                    lo, hi = alen.get(k, (None, None))
                    n_el = len(v)
                    alen[k] = (
                        n_el if lo is None or n_el < lo else lo,
                        n_el if hi is None or n_el > hi else hi,
                    )
                    for el in v:
                        ek = (k, _jtype(el))
                        elem_counts[ek] = elem_counts.get(ek, 0) + 1
                if jt == "string" and k not in enum_over:
                    if len(v.encode("utf-8", "surrogatepass")) > enum_max_len:
                        enum_over.add(k)
                        enum_vals.pop(k, None)
                        continue
                    s = enum_vals.setdefault(k, set())
                    s.add(v)
                    if len(s) > enum_cap:
                        enum_over.add(k)
                        enum_vals.pop(k, None)

        kinds, props, details, ns = [], [], [], []

        def emit(kind, prop, detail, n):
            kinds.append(kind)
            props.append(prop)
            details.append(detail)
            ns.append(n)

        for (k, jt), n in type_counts.items():
            emit(_K_TYPE, k, jt, n)
        for jt, n in root_counts.items():
            emit(_K_ROOT, "", jt, n)
        emit(_K_TOTAL, "", "", n_docs)
        if n_invalid:
            emit(_K_INVALID, "", "", n_invalid)
        for k, vals in enum_vals.items():
            for v in vals:
                emit(_K_ENUM, k, v, 1)
        for k in enum_over:
            emit(_K_OVER, k, "", 1)
        for (k, jt), n in elem_counts.items():
            emit(_K_ELEM, k, jt, n)
        for k, (lo, hi) in alen.items():
            emit(_K_ALEN, k, "min", lo)
            emit(_K_ALEN, k, "max", hi)
        return pa.table(
            {
                "kind": pa.array(kinds, pa.string()),
                "prop": pa.array(props, pa.large_string()),
                "detail": pa.array(details, pa.large_string()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    return partial


def profile_json(
    ds,
    col: str = "payload",
    *,
    enum_cap: int = 16,
    enum_max_len: int = 128,
    on_invalid: str = "raise",
    prop_budget: int = 100_000,
    batch_size: int = 8192,
) -> JsonProfile:
    """Profile the top-level structure of a JSON string column.

    One map_batches pass (per-batch pre-aggregation) + one
    groupby(kind, prop, detail) of int64 partials; the driver receives
    only the reduced profile, guarded by ``prop_budget`` distinct
    (kind, prop, detail) keys outside the enum space and ``enum_cap``
    values per surviving enum property.
    """
    from ray.data.aggregate import Max, Min, Sum

    if on_invalid not in ("raise", "skip"):
        raise ValueError(f"on_invalid must be 'raise' or 'skip', got {on_invalid!r}")

    reduced = (
        ds.map_batches(
            _profile_partial(col, enum_cap, enum_max_len, on_invalid),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
        .groupby(["kind", "prop", "detail"])
        .aggregate(
            Sum("n", alias_name="n"),
            Min("n", alias_name="n_min"),
            Max("n", alias_name="n_max"),
        )
        .materialize()
    )

    meta = reduced.filter(expr=f"kind != '{_K_ENUM}'")
    n_meta = meta.count()
    if n_meta > prop_budget:
        raise ValueError(
            f"profile_json: {n_meta} distinct (prop, type) profile keys exceed "
            f"prop_budget={prop_budget} — the corpus has an unbounded "
            f"property-name set; profile a projection or raise the budget"
        )
    meta_rows = meta.take_all()

    n_docs = 0
    n_invalid = 0
    root_counts: dict[str, int] = {}
    props: dict[str, PropProfile] = {}
    over: set = set()
    alen_rows = []
    for r in meta_rows:
        kind, prop, detail, n = r["kind"], r["prop"], r["detail"], int(r["n"])
        if kind == _K_TOTAL:
            n_docs = n
        elif kind == _K_INVALID:
            n_invalid = n
        elif kind == _K_ROOT:
            root_counts[detail] = n
        elif kind == _K_OVER:
            over.add(prop)
        elif kind == _K_TYPE:
            pp = props.setdefault(prop, PropProfile(prop))
            pp.type_counts[detail] = n
        elif kind == _K_ELEM:
            pp = props.setdefault(prop, PropProfile(prop))
            pp.elem_type_counts[detail] = n
        elif kind == _K_ALEN:
            alen_rows.append((prop, detail, int(r["n_min"]), int(r["n_max"])))
    for prop, detail, n_min, n_max in alen_rows:
        pp = props.setdefault(prop, PropProfile(prop))
        if detail == "min":
            pp.array_min = n_min  # min over per-batch minima
        else:
            pp.array_max = n_max  # max over per-batch maxima

    # enum guard: per-prop distinct counts on the reduced table (tiny
    # second groupby), values collected only for surviving props
    enum_rows = reduced.filter(expr=f"kind == '{_K_ENUM}'")
    counts = {
        r["prop"]: int(r["count()"])
        for r in enum_rows.groupby("prop").count().take_all()
    }
    keep = {
        p
        for p, c in counts.items()
        if c <= enum_cap and p not in over and p in props
    }
    if keep:
        # filter ENGINE-side before take_all: a clustered high-cardinality
        # prop (every batch locally under the cap, global way over it)
        # can leave millions of (prop, value) rows in the reduced table;
        # only the kept props' rows (<= enum_cap each) may reach the driver
        keep_frozen = frozenset(keep)

        def only_kept(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            mask = _pc.is_in(
                t.column("prop"), value_set=pa.array(sorted(keep_frozen))
            )
            return t.filter(mask)

        vals: dict[str, list[str]] = {p: [] for p in keep}
        for r in enum_rows.map_batches(only_kept, batch_format="pyarrow").take_all():
            vals[r["prop"]].append(r["detail"])
        for p in keep:
            props[p].enum_values = sorted(vals[p])

    return JsonProfile(
        n_docs=n_docs,
        n_invalid=n_invalid,
        root_type_counts=root_counts,
        props=props,
        enum_cap=enum_cap,
        enum_max_len=enum_max_len,
    )


# ---------------------------------------------------------------------------
# Schema rendering


_NAMED_ESCAPES = {
    '"': '\\"',
    "\\": "\\\\",
    "\n": "\\n",
    "\t": "\\t",
    "\r": "\\r",
    "\x00": "\\0",
}
# Characters that must not appear raw inside a quoted literal: the
# quote/backslash themselves plus every codepoint str.splitlines()
# treats as a line break (the file grammar is line-based).
_LINE_BREAKS = "\x0b\x0c\x1c\x1d\x1e\x85\u2028\u2029"


def _quote(s: str) -> str:
    out = ['"']
    for c in s:
        if c in _NAMED_ESCAPES:
            out.append(_NAMED_ESCAPES[c])
        elif c < " " or c in _LINE_BREAKS or c == "\x7f":
            out.append(f"\\u{ord(c):04x}")
        else:
            out.append(c)
    out.append('"')
    return "".join(out)


def _ident_for(prop: str, taken: set) -> str:
    """A parser-legal identifier (<= 32 bytes, no space/control, not
    reserved) derived from the property name; hash-suffixed on
    collision or when the name itself is not identifier-safe."""
    import hashlib

    base = "".join(c if (c.isalnum() or c == "_") else "_" for c in prop)
    base = "p_" + (base or "x")
    if len(base.encode()) > 24:
        base = base.encode()[:24].decode("utf-8", "ignore")
    name = base
    if name in taken or base != "p_" + prop:
        h = hashlib.md5(prop.encode("utf-8", "surrogatepass")).hexdigest()[:6]
        name = f"{base}_{h}"
    while name in taken:  # pathological md5-prefix collision
        name += "x"
    taken.add(name)
    return name


def induce_schema(profile: JsonProfile, *, start_name: str = "$start") -> str:
    """Render the loosest Medea schema graph that accepts every
    profiled document (see module docstring for the guarantee)."""
    if profile.n_docs == 0:
        raise ValueError("induce_schema: empty profile (0 parseable documents)")

    root_types = [t for t in JTYPES if profile.root_type_counts.get(t, 0) > 0]
    has_object_root = "object" in root_types
    n_obj = profile.n_object_roots

    taken: set = set()
    aux_blocks: list[str] = []
    prop_lines: list[str] = []

    for prop in sorted(profile.props):
        pp = profile.props[prop]
        types = [t for t in JTYPES if pp.type_counts.get(t, 0) > 0]
        # array constraints worth writing: observed length bounds (the
        # grammar's natural-number literal cannot express 0, so a 0
        # bound is simply omitted — absent == unbounded, which is the
        # loose direction) and a single observed element type
        is_array = "array" in types
        a_min = pp.array_min if (is_array and (pp.array_min or 0) >= 1) else None
        a_max = pp.array_max if (is_array and (pp.array_max or 0) >= 1) else None
        elem = (
            next(iter(pp.elem_type_counts))
            if is_array and len(pp.elem_type_counts) == 1
            else None
        )
        needs_aux = (
            len(types) > 1
            or pp.enum_values is not None
            or a_min is not None
            or a_max is not None
            or elem is not None
        )
        if needs_aux:
            ident = _ident_for(prop, taken)
            lines = [f"$schema {ident}", "    $type"]
            lines += [f"        {_PRIM[t]}" for t in types]
            if a_min is not None:
                lines.append(f"    $min-length {a_min}")
            if a_max is not None:
                lines.append(f"    $max-length {a_max}")
            if elem is not None:
                lines.append("    $element-type")
                lines.append(f"        {_PRIM[elem]}")
            if pp.enum_values is not None:
                lines.append("    $string-values")
                lines += [f"        {_quote(v)}" for v in pp.enum_values]
            aux_blocks.append("\n".join(lines))
            target = ident
        else:
            target = _PRIM[types[0]]
        prop_lines.append(f'        $property-name {_quote(prop)}')
        prop_lines.append(f"        $property-schema {target}")
        if pp.present < n_obj:
            prop_lines.append("        $optional-property")

    start = [f"$schema {start_name}", "    $type"]
    start += [f"        {_PRIM[t]}" for t in root_types]
    if has_object_root and prop_lines:
        start.append("    $properties")
        start += prop_lines
    return "\n\n".join(["\n".join(start)] + aux_blocks) + "\n"


def infer_schema(
    ds,
    col: str = "payload",
    **profile_kwargs,
):
    """profile + induce + compile-check: returns (schema_text, profile).

    The returned text has already round-tripped through the real
    parse+compile path, so callers can hand it straight to
    ``validate_dataset`` / ``compile_schema``.
    """
    from medea_ray import compile_schema

    profile = profile_json(ds, col, **profile_kwargs)
    text = induce_schema(profile)
    compile_schema(text)  # raises MedeaParseError/MedeaSchemaError on a bug
    return text, profile
