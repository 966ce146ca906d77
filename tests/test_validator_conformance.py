"""Validator conformance: the 36 schemata in
/root/reference/conformance/validation/, pinned by seeded ports of the
reference QuickCheck properties (test/validator-quickcheck/Main.hs:33-212):
for each fixture, generate N documents with the fixture's generator and
assert ``predicate(doc) == validates(doc)`` — both directions of
``validationSuccess`` / ``validationFail`` (Main.hs:282-291) in one check.
"""

import json

import pytest

from medea_ray import MedeaValidationError, compile_schema, validate
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

VAL_DIR = "/root/reference/conformance/validation"
N_CASES = 300
SEED = 42


def _or(*ps):
    return lambda v: any(p(v) for p in ps)


def _has_prop(name, p):
    # Main.hs hasProperty: object has the property and it satisfies p.
    return lambda obj: name in obj and p(obj[name])


def _has_opt_prop(name, p):
    return lambda obj: p(obj[name]) if name in obj else True


def _map_pred(specified, p):
    # Main.hs makeMapPred: every non-specified property satisfies p.
    return lambda obj: all(p(v) for k, v in obj.items() if k not in specified)


def _validates(graph, doc) -> bool:
    try:
        validate(graph, json.dumps(doc))
        return True
    except MedeaValidationError:
        return False


def _check(path, gen_fn, predicate):
    graph = compile_schema(f"{VAL_DIR}/{path}")
    n_valid = n_invalid = 0
    for i in range(N_CASES):
        doc = gen_fn()
        expected = predicate(doc)
        actual = _validates(graph, doc)
        assert actual == expected, (
            f"{path}: case {i}: expected valid={expected}, got {actual}: {doc!r}"
        )
        n_valid += expected
        n_invalid += not expected
    # Both properties must actually have been exercised (≈ QuickCheck's
    # discard limit guarding against vacuous ==> properties).
    assert n_valid > 0, f"{path}: generator produced no valid docs"
    if predicate is not _TRUE:
        assert n_invalid > 0, f"{path}: generator produced no invalid docs"


def _TRUE(_v):
    return True


# -- singular / nullable fixtures (Main.hs:33-43) ---------------------------
SINGULAR = {
    "any.medea": _TRUE,
    "null.medea": is_null,
    "boolean.medea": is_bool,
    "number.medea": is_number,
    "string.medea": is_string,
    "array.medea": is_array,
    "object.medea": is_object,
    "nullable-boolean.medea": _or(is_null, is_bool),
    "nullable-number.medea": _or(is_null, is_number),
    "nullable-string.medea": _or(is_null, is_string),
    "nullable-array.medea": _or(is_null, is_array),
    "nullable-object.medea": _or(is_null, is_object),
}


@pytest.mark.parametrize("name", sorted(SINGULAR))
def test_singular(name):
    g = JsonGen(SEED)
    _check(name, lambda: g.value(5), SINGULAR[name])


# -- string-enum fixtures (Main.hs:44-46, testStringVals) -------------------
STRINGVALS = {
    "stringVals.medea": ["bar", "baz"],
    "stringVals2.medea": ["accountant", "barber", "bishop", "baker"],
}


@pytest.mark.parametrize("name", sorted(STRINGVALS))
def test_string_vals(name):
    g = JsonGen(SEED)
    vals = STRINGVALS[name]

    def gen():
        if g.rng.random() < 0.5:
            return g.rng.choice(vals)
        return g._string()

    _check(name, gen, lambda v: v in vals)


# -- object fixtures (Main.hs:47-146) ---------------------------------------
OBJECT_CASES = {
    "1-property-no-additional-1.medea": (
        ObjGenOpts(["foo"], [], 0, 2),
        _has_prop("foo", is_bool),
        lambda v: False,
    ),
    "1-property-no-additional-2.medea": (
        ObjGenOpts(["foo"], [], 0, 2),
        _has_prop("foo", is_null),
        lambda v: False,
    ),
    "1-property-no-additional-3.medea": (
        ObjGenOpts(["foo"], [], 0, 2),
        _has_prop("foo", is_array),
        lambda v: False,
    ),
    "1-property-additional-1.medea": (
        ObjGenOpts(["foo"], [], 0, 3),
        _has_prop("foo", is_string),
        _TRUE,
    ),
    "1-property-additional-2.medea": (
        ObjGenOpts(["foo"], [], 0, 3),
        _has_prop("foo", is_number),
        _TRUE,
    ),
    "1-property-additional-3.medea": (
        ObjGenOpts(["foo"], [], 0, 3),
        _has_prop("foo", is_object),
        _TRUE,
    ),
    "3-property-no-additional-1.medea": (
        ObjGenOpts(["foo", "bar", "bazz"], [], 0, 1),
        lambda o: _has_prop("foo", _or(is_number, is_array))(o)
        and _has_prop("bazz", _or(is_null, is_bool))(o),
        lambda v: False,
    ),
    "3-property-no-additional-2.medea": (
        ObjGenOpts(["bar", "bazz"], ["foo"], 0, 1),
        lambda o: _has_opt_prop("foo", _or(is_number, is_array))(o)
        and _has_prop("bazz", _or(is_null, is_bool))(o),
        lambda v: False,
    ),
    "3-property-additional-allowed-1.medea": (
        ObjGenOpts(["foo", "bar", "bazz"], [], 0, 3),
        lambda o: _has_prop("foo", is_bool)(o) and _has_prop("bazz", is_string)(o),
        _TRUE,
    ),
    "3-property-additional-allowed-2.medea": (
        ObjGenOpts(["bar", "bazz"], ["foo"], 0, 3),
        lambda o: _has_opt_prop("foo", is_number)(o) and _has_prop("bazz", is_null)(o),
        _TRUE,
    ),
    "map-number-bool.medea": (
        ObjGenOpts([], [], 0, 3),
        _TRUE,
        _or(is_number, is_bool),
    ),
    "map-with-1-specified.medea": (
        ObjGenOpts(["foo"], [], 0, 3),
        _has_prop("foo", _or(is_array, is_object)),
        _or(is_number, is_bool),
    ),
    "map-with-2-specified.medea": (
        ObjGenOpts(["foo"], ["bazz"], 0, 3),
        _has_prop("foo", _or(is_array, is_object)),
        _or(is_number, is_bool),
    ),
}


@pytest.mark.parametrize("name", sorted(OBJECT_CASES))
def test_object(name):
    opts, pred, additional_pred = OBJECT_CASES[name]
    g = JsonGen(SEED)
    specified = set(opts.props) | set(opts.opt_props)
    full_pred = lambda o: pred(o) and _map_pred(specified, additional_pred)(o)
    _check(name, lambda: g.obj(opts), full_pred)


# -- list fixtures (Main.hs:147-196) ----------------------------------------
LIST_CASES = {
    "list-1.medea": ((0, 3), _or(is_number, is_bool, is_object), lambda n: True),
    "list-2.medea": ((1, 3), _or(is_number, is_bool, is_object), lambda n: True),
    "list-3.medea": ((1, 6), _TRUE, lambda n: n >= 2),
    "list-4.medea": ((1, 6), _TRUE, lambda n: n <= 5),
    "list-5.medea": ((1, 6), _TRUE, lambda n: 3 <= n <= 5),
    "list-6.medea": ((1, 4), _or(is_null, is_bool, is_number), lambda n: 2 <= n <= 3),
    "list-7.medea": ((1, 4), _or(is_null, is_bool, is_number), lambda n: 2 <= n <= 3),
}


@pytest.mark.parametrize("name", sorted(LIST_CASES))
def test_list(name):
    rng, elem_pred, len_pred = LIST_CASES[name]
    g = JsonGen(SEED)
    _check(
        name,
        lambda: g.array(rng),
        lambda arr: all(elem_pred(e) for e in arr) and len_pred(len(arr)),
    )


# -- tuple fixtures (Main.hs:197-212) ---------------------------------------
TUPLE_CASES = {
    "3-tuple.medea": ((3, 4), [_or(is_number, is_array), is_bool, _TRUE]),
    "2-tuple.medea": ((1, 3), [_or(is_object, is_null), _or(is_string, is_number)]),
}


@pytest.mark.parametrize("name", sorted(TUPLE_CASES))
def test_tuple(name):
    rng, preds = TUPLE_CASES[name]
    g = JsonGen(SEED)
    _check(
        name,
        lambda: g.array(rng),
        lambda arr: len(arr) == len(preds)
        and all(p(e) for p, e in zip(preds, arr)),
    )


def test_all_validation_fixtures_covered():
    import os

    on_disk = {f for f in os.listdir(VAL_DIR) if f.endswith(".medea")}
    covered = (
        set(SINGULAR) | set(STRINGVALS) | set(OBJECT_CASES) | set(LIST_CASES) | set(TUPLE_CASES)
    )
    assert on_disk == covered


# -- direct kernel unit checks ---------------------------------------------
def test_not_json():
    graph = compile_schema(f"{VAL_DIR}/any.medea")
    with pytest.raises(MedeaValidationError) as exc:
        validate(graph, b"{not json")
    assert exc.value.code == "not_json"


def test_nan_rejected():
    # Aeson rejects NaN/Infinity; so do we (kernel loads_json).
    graph = compile_schema(f"{VAL_DIR}/any.medea")
    with pytest.raises(MedeaValidationError):
        validate(graph, "NaN")


def test_violation_details():
    graph = compile_schema(f"{VAL_DIR}/map-with-1-specified.medea")
    with pytest.raises(MedeaValidationError) as exc:
        validate(graph, json.dumps({"foo": [1], "other": "a-string"}))
    e = exc.value
    assert e.code == "not_one_of_options"
    assert e.path == "$/other"


def test_annotations_roundtrip():
    graph = compile_schema(f"{VAL_DIR}/2-tuple.medea")
    doc = [{"a": 1}, "x"]
    vj = validate(graph, json.dumps(doc))
    assert vj.to_value() == doc
    assert vj.valid_against() == ("user_defined", "$start")
