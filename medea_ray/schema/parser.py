"""Line-oriented recursive-descent parser for .medea schema-graph files.

A from-scratch Python re-expression of the reference megaparsec grammar
(src/Data/Medea/Parser/*.hs). Driver-side only — never runs per row.

Grammar notes (all cited against the reference):

- A file is 1+ schema blocks separated by exactly one blank line, then EOF
  (Parser/Spec/Schemata.hs:18-22, ``sepBy1 eol`` + ``eof``).
- Every line is exactly N spaces of indentation (0/4/8), a payload, and a
  newline (Parser/Primitive.hs:171-173 ``parseLine``).
- A schema block is a ``$schema <ident>`` header at column 0 followed by a
  *permutation* (any order, each at most once) of the type / string-values /
  array / object sections (Parser/Spec/Schema.hs:37-45,
  ``runPermutation``/``toPermutationWithDefault`` with every branch in
  ``try``). We model ``try`` with save/restore of the line cursor; a branch
  that fails backtracks silently and the permutation ends when no branch
  matches.
- ``customFailure`` inside a ``try``-wrapped branch (e.g. empty
  ``$string-values``, Parser/Spec/String.hs:40-43; array conflict checks,
  Parser/Spec/Array.hs:44-55) backtracks in the reference too; the overall
  file then fails because the unconsumed lines cannot close the block. We
  reproduce that exactly, but remember the deepest branch failure so the
  final MedeaParseError carries the most specific code.
- Identifiers: 1+ non-separator/non-control chars, ≤32 UTF-8 bytes
  (Parser/Primitive.hs:47-50,179-187). Naturals: digit run whose first char
  is not '0' (Primitive.hs:154-160). Strings: double-quoted with
  Haskell-style escapes (Primitive.hs:166-169); we support the common subset
  ``\\" \\\\ \\n \\t \\r \\uXXXX`` (none of the 105 conformance fixtures uses
  escapes).
"""

from __future__ import annotations

import unicodedata

from medea_ray.schema.ast import (
    ArraySpec,
    ObjectSpec,
    PropertySpec,
    SchemaSpec,
    SchemataSpec,
)
from medea_ray.schema.errors import MedeaParseError

# The 19 reserved identifiers (Parser/Primitive.hs:52-95).
RESERVED = frozenset(
    {
        "$schema",
        "$start",
        "$type",
        "$string-values",
        "$properties",
        "$property-name",
        "$property-schema",
        "$additional-properties-allowed",
        "$additional-property-schema",
        "$optional-property",
        "$min-length",
        "$max-length",
        "$element-type",
        "$tuple",
        "$array",
        "$boolean",
        "$null",
        "$number",
        "$object",
        "$string",
    }
)

# Reserved identifiers naming primitive JSON types (Primitive.hs:136-143).
PRIM_TYPES = {
    "$null": "null",
    "$boolean": "boolean",
    "$number": "number",
    "$object": "object",
    "$array": "array",
    "$string": "string",
}


class _Fail(Exception):
    """Internal backtracking failure (megaparsec ``try`` semantics)."""

    def __init__(self, code: str, msg: str, line_no: int):
        self.code = code
        self.msg = msg
        self.line_no = line_no


def _is_sep_or_control(c: str) -> bool:
    # Primitive.hs:186-187 isSeparatorOrControl = isSeparator || isControl
    # (Unicode Zs/Zl/Zp space categories plus Cc control chars — note '\t'
    # is Cc, so tabs cannot appear inside identifiers).
    return unicodedata.category(c) in ("Zs", "Zl", "Zp", "Cc")


class _Cursor:
    __slots__ = ("lines", "i", "deepest")

    def __init__(self, lines: list[str]):
        self.lines = lines
        self.i = 0
        # deepest failure seen: (line_no, code, msg) — for error reporting.
        self.deepest: tuple[int, str, str] | None = None

    def fail(self, code: str, msg: str):
        if self.deepest is None or self.i >= self.deepest[0]:
            self.deepest = (self.i, code, msg)
        raise _Fail(code, msg, self.i)

    def at_eof(self) -> bool:
        return self.i >= len(self.lines)

    def peek(self) -> str:
        if self.at_eof():
            self.fail("parsing_failed", "unexpected end of input")
        return self.lines[self.i]


# ---------------------------------------------------------------------------
# In-line payload combinators: fn(line, pos, cur) -> (value, new_pos)


def _p_identifier_run(line: str, pos: int, cur: _Cursor):
    start = pos
    n = len(line)
    while pos < n and not _is_sep_or_control(line[pos]):
        pos += 1
    if pos == start:
        cur.fail("parsing_failed", "expected identifier")
    ident = line[start:pos]
    if len(ident.encode("utf-8")) > 32:
        # Primitive.hs:179-184 checkedConstruct
        cur.fail("identifier_too_long", ident)
    return ident, pos


def _p_identifier(line: str, pos: int, cur: _Cursor):
    return _p_identifier_run(line, pos, cur)


def _p_reserved(keyword: str):
    def run(line: str, pos: int, cur: _Cursor):
        ident, pos = _p_identifier_run(line, pos, cur)
        if ident != keyword:
            # Primitive.hs:123-128 parseReserved
            cur.fail("expected_reserved_identifier", f"expected {keyword!r}, got {ident!r}")
        return ident, pos

    return run


def _p_keyval(keyword: str, inner):
    # Primitive.hs:175-176 parseKeyVal: reserved keyword, one space, payload.
    def run(line: str, pos: int, cur: _Cursor):
        _, pos = _p_reserved(keyword)(line, pos, cur)
        if pos >= len(line) or line[pos] != " ":
            cur.fail("parsing_failed", f"expected space after {keyword}")
        return inner(line, pos + 1, cur)

    return run


def _p_natural(line: str, pos: int, cur: _Cursor):
    start = pos
    n = len(line)
    while pos < n and line[pos].isdigit():
        pos += 1
    if pos == start:
        cur.fail("parsing_failed", "expected natural number")
    digits = line[start:pos]
    if digits[0] == "0":
        # Primitive.hs:157-159 — any leading zero (including literal "0").
        cur.fail("leading_zero", digits)
    return int(digits), pos


_ESCAPES = {'"': '"', "\\": "\\", "n": "\n", "t": "\t", "r": "\r", "0": "\0", "'": "'"}


def _p_string(line: str, pos: int, cur: _Cursor):
    # Primitive.hs:166-169: char '"' *> manyTill charLiteral (char '"').
    n = len(line)
    if pos >= n or line[pos] != '"':
        cur.fail("parsing_failed", "expected opening quote")
    pos += 1
    out: list[str] = []
    while True:
        if pos >= n:
            cur.fail("parsing_failed", "unterminated string literal")
        c = line[pos]
        if c == '"':
            return "".join(out), pos + 1
        if c == "\\":
            if pos + 1 >= n:
                cur.fail("parsing_failed", "dangling escape")
            e = line[pos + 1]
            if e == "u" and pos + 5 < n:
                hex4 = line[pos + 2 : pos + 6]
                # int(x, 16) alone accepts whitespace/underscores and, on
                # non-hex, raises a raw ValueError that escapes the
                # MedeaError contract — require exactly four hex digits
                if not all(ch in "0123456789abcdefABCDEF" for ch in hex4):
                    cur.fail("parsing_failed", f"invalid \\u escape \\u{hex4}")
                out.append(chr(int(hex4, 16)))
                pos += 6
                continue
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                pos += 2
                continue
            cur.fail("parsing_failed", f"unsupported escape \\{e}")
        out.append(c)
        pos += 1


# ---------------------------------------------------------------------------
# Line-level parsing


def _line(cur: _Cursor, indent: int, payload):
    """parseLine (Primitive.hs:171-173): exactly `indent` spaces, payload, EOL."""
    raw = cur.peek()
    if len(raw) < indent or raw[:indent] != " " * indent:
        cur.fail("parsing_failed", f"expected {indent}-space indentation")
    val, pos = payload(raw[indent:], 0, cur)
    if pos != len(raw) - indent:
        cur.fail("parsing_failed", f"unexpected trailing content: {raw[indent + pos:]!r}")
    cur.i += 1
    return val


def _try(cur: _Cursor, fn):
    """megaparsec ``try``: run fn; on failure restore cursor, return None."""
    save = cur.i
    try:
        return fn()
    except _Fail:
        cur.i = save
        return None


# ---------------------------------------------------------------------------
# Section parsers (each is one permutation branch, ``try``-wrapped by caller)


def _parse_type_spec(cur: _Cursor) -> tuple[str, ...]:
    # Parser/Spec/Type.hs:30-34: "$type" at 4, then some (1+) idents at 8.
    _line(cur, 4, _p_reserved("$type"))
    types: list[str] = []
    while True:
        ident = _try(cur, lambda: _line(cur, 8, _p_identifier))
        if ident is None:
            break
        types.append(ident)
    if not types:
        cur.fail("parsing_failed", "$type requires at least one identifier line")
    return tuple(types)


def _parse_string_spec(cur: _Cursor) -> tuple[str, ...]:
    # Parser/Spec/String.hs:37-43.
    _line(cur, 4, _p_reserved("$string-values"))
    items: list[str] = []
    while True:
        s = _try(cur, lambda: _line(cur, 8, _p_string))
        if s is None:
            break
        items.append(s)
    if not items:
        cur.fail("empty_string_values_spec", "$string-values requires at least one string")
    return tuple(items)


def _parse_array_spec(cur: _Cursor) -> ArraySpec:
    # Parser/Spec/Array.hs:40-84: inner permutation of min/max/element/tuple,
    # then the conflict checks.
    min_len = max_len = element = None
    tup = None
    remaining = {"min", "max", "elem", "tuple"}
    while remaining:
        matched = None
        if "min" in remaining:
            v = _try(cur, lambda: _line(cur, 4, _p_keyval("$min-length", _p_natural)))
            if v is not None:
                min_len, matched = v, "min"
        if matched is None and "max" in remaining:
            v = _try(cur, lambda: _line(cur, 4, _p_keyval("$max-length", _p_natural)))
            if v is not None:
                max_len, matched = v, "max"
        if matched is None and "elem" in remaining:

            def p_elem():
                # Array.hs:74-78: "$element-type" keyword line at 4, THEN the
                # identifier on its own line at 8 (two-line form; SPEC.md:197-204
                # describes one line but the implementation + every fixture use
                # two — conformance fixtures are ground truth).
                _line(cur, 4, _p_reserved("$element-type"))
                ident = _try(cur, lambda: _line(cur, 8, _p_identifier))
                if ident is None:
                    cur.fail("empty_array_elements", "$element-type requires an element line")
                return ident

            v = _try(cur, p_elem)
            if v is not None:
                element, matched = v, "elem"
        if matched is None and "tuple" in remaining:

            def p_tuple():
                # Array.hs:80-84: 0+ identifier lines (empty tuple = unit).
                _line(cur, 4, _p_reserved("$tuple"))
                idents: list[str] = []
                while True:
                    ident = _try(cur, lambda: _line(cur, 8, _p_identifier))
                    if ident is None:
                        break
                    idents.append(ident)
                return tuple(idents)

            v = _try(cur, p_tuple)
            if v is not None:
                tup, matched = v, "tuple"
        if matched is None:
            break
        remaining.discard(matched)

    # Post-permutation validation (Array.hs:44-55).
    if min_len is None and max_len is None and element is None and tup is None:
        cur.fail("empty_length_array_spec", "array spec requires length, type, or tuple")
    if element is not None and tup is not None:
        cur.fail("conflicting_spec_requirements", "$element-type conflicts with $tuple")
    if (min_len is not None or max_len is not None) and tup is not None:
        cur.fail("conflicting_spec_requirements", "length bounds conflict with $tuple")
    return ArraySpec(min_len, max_len, element, tup)


def _parse_property(cur: _Cursor) -> PropertySpec:
    # Parser/Spec/Property.hs:31-46: name, then optional schema, then
    # optional $optional-property — in that order.
    name = _line(cur, 8, _p_keyval("$property-name", _p_string))
    schema = _try(cur, lambda: _line(cur, 8, _p_keyval("$property-schema", _p_identifier)))
    optional = _try(cur, lambda: _line(cur, 8, _p_reserved("$optional-property"))) is not None
    return PropertySpec(name, schema, optional)


def _parse_object_spec(cur: _Cursor) -> ObjectSpec:
    # Parser/Spec/Object.hs:40-61.
    _line(cur, 4, _p_reserved("$properties"))
    props: list[PropertySpec] = []
    while True:
        p = _try(cur, lambda: _parse_property(cur))
        if p is None:
            break
        props.append(p)
    additional_allowed = (
        _try(cur, lambda: _line(cur, 8, _p_reserved("$additional-properties-allowed"))) is not None
    )
    additional_schema = _try(
        cur, lambda: _line(cur, 8, _p_keyval("$additional-property-schema", _p_identifier))
    )
    if additional_schema is not None and not additional_allowed:
        # Object.hs:50-51.
        cur.fail(
            "conflicting_spec_requirements",
            "$additional-property-schema without $additional-properties-allowed",
        )
    return ObjectSpec(tuple(props), additional_allowed, additional_schema)


def _parse_schema(cur: _Cursor) -> SchemaSpec:
    # Parser/Spec/Schema.hs:37-45: header line, then the 4-way permutation.
    name = _line(cur, 0, _p_keyval("$schema", _p_identifier))
    types: tuple[str, ...] = ()
    string_vals: tuple[str, ...] = ()
    array = ArraySpec()
    obj: ObjectSpec | None = None
    remaining = {"type", "string", "array", "object"}
    while remaining:
        matched = None
        if "type" in remaining:
            v = _try(cur, lambda: _parse_type_spec(cur))
            if v is not None:
                types, matched = v, "type"
        if matched is None and "string" in remaining:
            v = _try(cur, lambda: _parse_string_spec(cur))
            if v is not None:
                string_vals, matched = v, "string"
        if matched is None and "array" in remaining:
            v = _try(cur, lambda: _parse_array_spec(cur))
            if v is not None:
                array, matched = v, "array"
        if matched is None and "object" in remaining:
            v = _try(cur, lambda: _parse_object_spec(cur))
            if v is not None:
                obj, matched = v, "object"
        if matched is None:
            break
        remaining.discard(matched)
    return SchemaSpec(name, types, string_vals, array, obj)


# ---------------------------------------------------------------------------
# Entry point


def parse_specification(source: bytes | str) -> SchemataSpec:
    """Parse a whole .medea file (Parser/Spec/Schemata.hs:18-22).

    Accepts bytes (UTF-8 checked, Loader.hs:125-126) or str. Raises
    MedeaParseError on any failure.
    """
    if isinstance(source, bytes):
        try:
            text = source.decode("utf-8")
        except UnicodeDecodeError:
            raise MedeaParseError("not_utf8", "input is not valid UTF-8") from None
    else:
        text = source

    text = text.replace("\r\n", "\n")
    if text == "":
        raise MedeaParseError("parsing_failed", "empty file")
    if not text.endswith("\n"):
        # Every line, including the last, must end with a newline
        # (parseLine's trailing ``eol``, Primitive.hs:173).
        raise MedeaParseError("parsing_failed", "missing trailing newline")
    lines = text.split("\n")[:-1]

    cur = _Cursor(lines)

    def _raise(fail: _Fail | None = None):
        if cur.deepest is not None:
            line_no, code, msg = cur.deepest
        elif fail is not None:
            line_no, code, msg = fail.line_no, fail.code, fail.msg
        else:
            line_no, code, msg = cur.i, "parsing_failed", "parse error"
        raise MedeaParseError(code, f"line {line_no + 1}: {msg}")

    try:
        schemata = [_parse_schema(cur)]
        # sepBy1 eol: each subsequent schema is introduced by exactly one
        # blank line; once the separator is consumed the schema must parse
        # (megaparsec fails on consumed input inside ``many``).
        while not cur.at_eof() and cur.lines[cur.i] == "":
            cur.i += 1
            schemata.append(_parse_schema(cur))
    except _Fail as f:
        _raise(f)
    if not cur.at_eof():
        if cur.deepest is None or cur.deepest[0] < cur.i:
            cur.deepest = (cur.i, "parsing_failed", f"unexpected content: {cur.lines[cur.i]!r}")
        _raise()
    return SchemataSpec(tuple(schemata))
