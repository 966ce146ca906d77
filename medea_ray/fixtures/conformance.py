"""Per-fixture generators + predicates for the 36 validation schemata.

Seeded port of test/validator-quickcheck/Main.hs:33-212: each conformance
schema gets (a) a document generator matching the reference's QuickCheck
generator and (b) the Haskell predicate re-expressed in Python. The pytest
conformance suite asserts ``predicate(doc) == validates(doc)`` over seeded
samples, and ``generate_corpus`` materializes the valid/invalid JSONL
corpus that the reference's CONFORMANCE.md describes but never shipped
(its conformance/ tree holds no JSON fixtures).
"""

from __future__ import annotations

import json
import os

from medea_ray.fixtures.jsongen import (
    JsonGen,
    ObjGenOpts,
    is_array,
    is_bool,
    is_null,
    is_number,
    is_object,
    is_string,
)


def TRUE(_v):
    return True


def _or(*ps):
    return lambda v: any(p(v) for p in ps)


def has_prop(name, p):
    return lambda obj: name in obj and p(obj[name])


def has_opt_prop(name, p):
    return lambda obj: p(obj[name]) if name in obj else True


def map_pred(specified, p):
    """makeMapPred: every non-specified property satisfies p."""
    return lambda obj: all(p(v) for k, v in obj.items() if k not in specified)


# name -> (make_gen(JsonGen) -> 0-arg callable, predicate)
CASES: dict = {}


def _add_singular(name, pred):
    CASES[name] = (lambda g: (lambda: g.value(5)), pred)


_add_singular("any.medea", TRUE)
_add_singular("null.medea", is_null)
_add_singular("boolean.medea", is_bool)
_add_singular("number.medea", is_number)
_add_singular("string.medea", is_string)
_add_singular("array.medea", is_array)
_add_singular("object.medea", is_object)
_add_singular("nullable-boolean.medea", _or(is_null, is_bool))
_add_singular("nullable-number.medea", _or(is_null, is_number))
_add_singular("nullable-string.medea", _or(is_null, is_string))
_add_singular("nullable-array.medea", _or(is_null, is_array))
_add_singular("nullable-object.medea", _or(is_null, is_object))


def _add_stringvals(name, vals):
    def make_gen(g: JsonGen):
        def gen():
            if g.rng.random() < 0.5:
                return g.rng.choice(vals)
            return g._string()

        return gen

    CASES[name] = (make_gen, lambda v: v in vals)


_add_stringvals("stringVals.medea", ["bar", "baz"])
_add_stringvals(
    "stringVals2.medea", ["accountant", "barber", "bishop", "baker"]
)


def _add_object(name, opts: ObjGenOpts, pred, additional_pred):
    specified = set(opts.props) | set(opts.opt_props)
    full = lambda o: pred(o) and map_pred(specified, additional_pred)(o)
    CASES[name] = (lambda g: (lambda: g.obj(opts)), full)


_add_object(
    "1-property-no-additional-1.medea",
    ObjGenOpts(["foo"], [], 0, 2),
    has_prop("foo", is_bool),
    lambda v: False,
)
_add_object(
    "1-property-no-additional-2.medea",
    ObjGenOpts(["foo"], [], 0, 2),
    has_prop("foo", is_null),
    lambda v: False,
)
_add_object(
    "1-property-no-additional-3.medea",
    ObjGenOpts(["foo"], [], 0, 2),
    has_prop("foo", is_array),
    lambda v: False,
)
_add_object(
    "1-property-additional-1.medea",
    ObjGenOpts(["foo"], [], 0, 3),
    has_prop("foo", is_string),
    TRUE,
)
_add_object(
    "1-property-additional-2.medea",
    ObjGenOpts(["foo"], [], 0, 3),
    has_prop("foo", is_number),
    TRUE,
)
_add_object(
    "1-property-additional-3.medea",
    ObjGenOpts(["foo"], [], 0, 3),
    has_prop("foo", is_object),
    TRUE,
)
_add_object(
    "3-property-no-additional-1.medea",
    ObjGenOpts(["foo", "bar", "bazz"], [], 0, 1),
    lambda o: has_prop("foo", _or(is_number, is_array))(o)
    and has_prop("bazz", _or(is_null, is_bool))(o),
    lambda v: False,
)
_add_object(
    "3-property-no-additional-2.medea",
    ObjGenOpts(["bar", "bazz"], ["foo"], 0, 1),
    lambda o: has_opt_prop("foo", _or(is_number, is_array))(o)
    and has_prop("bazz", _or(is_null, is_bool))(o),
    lambda v: False,
)
_add_object(
    "3-property-additional-allowed-1.medea",
    ObjGenOpts(["foo", "bar", "bazz"], [], 0, 3),
    lambda o: has_prop("foo", is_bool)(o) and has_prop("bazz", is_string)(o),
    TRUE,
)
_add_object(
    "3-property-additional-allowed-2.medea",
    ObjGenOpts(["bar", "bazz"], ["foo"], 0, 3),
    lambda o: has_opt_prop("foo", is_number)(o) and has_prop("bazz", is_null)(o),
    TRUE,
)
_add_object(
    "map-number-bool.medea", ObjGenOpts([], [], 0, 3), TRUE, _or(is_number, is_bool)
)
_add_object(
    "map-with-1-specified.medea",
    ObjGenOpts(["foo"], [], 0, 3),
    has_prop("foo", _or(is_array, is_object)),
    _or(is_number, is_bool),
)
_add_object(
    "map-with-2-specified.medea",
    ObjGenOpts(["foo"], ["bazz"], 0, 3),
    has_prop("foo", _or(is_array, is_object)),
    _or(is_number, is_bool),
)


def _add_list(name, rng, elem_pred, len_pred):
    CASES[name] = (
        lambda g: (lambda: g.array(rng)),
        lambda arr: all(elem_pred(e) for e in arr) and len_pred(len(arr)),
    )


_add_list("list-1.medea", (0, 3), _or(is_number, is_bool, is_object), lambda n: True)
_add_list("list-2.medea", (1, 3), _or(is_number, is_bool, is_object), lambda n: True)
_add_list("list-3.medea", (1, 6), TRUE, lambda n: n >= 2)
_add_list("list-4.medea", (1, 6), TRUE, lambda n: n <= 5)
_add_list("list-5.medea", (1, 6), TRUE, lambda n: 3 <= n <= 5)
_add_list("list-6.medea", (1, 4), _or(is_null, is_bool, is_number), lambda n: 2 <= n <= 3)
_add_list("list-7.medea", (1, 4), _or(is_null, is_bool, is_number), lambda n: 2 <= n <= 3)


def _add_tuple(name, rng, preds):
    CASES[name] = (
        lambda g: (lambda: g.array(rng)),
        lambda arr: len(arr) == len(preds) and all(p(e) for p, e in zip(preds, arr)),
    )


_add_tuple("3-tuple.medea", (3, 4), [_or(is_number, is_array), is_bool, TRUE])
_add_tuple("2-tuple.medea", (1, 3), [_or(is_object, is_null), _or(is_string, is_number)])


def generate_corpus(out_dir: str, n: int = 100, seed: int = 42) -> dict[str, str]:
    """Materialize the valid/invalid JSONL corpus: one
    ``{schema-stem}.jsonl`` per fixture with rows
    ``{"doc": <json>, "expect_valid": bool}``. Deterministic in seed."""
    os.makedirs(out_dir, exist_ok=True)
    out = {}
    for name in sorted(CASES):
        make_gen, pred = CASES[name]
        g = JsonGen(seed)
        gen = make_gen(g)
        stem = name[: -len(".medea")]
        path = os.path.join(out_dir, f"{stem}.jsonl")
        with open(path, "w") as f:
            for _ in range(n):
                doc = gen()
                f.write(
                    json.dumps({"doc": doc, "expect_valid": bool(pred(doc))}) + "\n"
                )
        out[name] = path
    return out
