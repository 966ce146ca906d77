"""Validator conformance: the 36 schemata in
/root/reference/conformance/validation/, pinned by seeded ports of the
reference QuickCheck properties (test/validator-quickcheck/Main.hs:33-212):
for each fixture, generate N documents with the fixture's generator and
assert ``predicate(doc) == validates(doc)`` — both directions of
``validationSuccess`` / ``validationFail`` (Main.hs:282-291) in one check.
Generators/predicates live in medea_ray.fixtures.conformance (also used to
materialize the committed JSONL corpus in fixtures/validation/)."""

import json
import os

import pytest

from medea_ray import MedeaValidationError, compile_schema, validate
from medea_ray.fixtures.conformance import CASES, TRUE
from medea_ray.fixtures.jsongen import JsonGen

VAL_DIR = "/root/reference/conformance/validation"
CORPUS_DIR = os.path.join(os.path.dirname(__file__), "..", "fixtures", "validation")
N_CASES = 300
SEED = 42


def _validates(graph, doc) -> bool:
    try:
        validate(graph, json.dumps(doc))
        return True
    except MedeaValidationError:
        return False


@pytest.mark.parametrize("name", sorted(CASES))
def test_fixture_properties(name):
    make_gen, predicate = CASES[name]
    gen = make_gen(JsonGen(SEED))
    graph = compile_schema(f"{VAL_DIR}/{name}")
    n_valid = n_invalid = 0
    for i in range(N_CASES):
        doc = gen()
        expected = predicate(doc)
        actual = _validates(graph, doc)
        assert actual == expected, (
            f"{name}: case {i}: expected valid={expected}, got {actual}: {doc!r}"
        )
        n_valid += expected
        n_invalid += not expected
    # both properties must actually have been exercised (≈ QuickCheck's
    # discard limit guarding against vacuous ==> properties)
    assert n_valid > 0, f"{name}: generator produced no valid docs"
    if predicate is not TRUE:
        assert n_invalid > 0, f"{name}: generator produced no invalid docs"


def test_all_validation_fixtures_covered():
    on_disk = {f for f in os.listdir(VAL_DIR) if f.endswith(".medea")}
    assert on_disk == set(CASES)


@pytest.mark.parametrize("name", sorted(CASES))
def test_committed_corpus(name):
    """The materialized JSONL corpus (fixtures/validation/) must agree with
    the kernel row by row."""
    stem = name[: -len(".medea")]
    path = os.path.join(CORPUS_DIR, f"{stem}.jsonl")
    assert os.path.exists(path), "run medea_ray.fixtures.conformance.generate_corpus"
    graph = compile_schema(f"{VAL_DIR}/{name}")
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            assert _validates(graph, rec["doc"]) == rec["expect_valid"], rec


# -- Hypothesis property tests (mirrors validationSuccess/validationFail
# with an independent generator) --------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_json_vals = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(-(10**6), 10**6)
    | st.floats(allow_nan=False, allow_infinity=False)
    | st.text(max_size=8),
    lambda children: st.lists(children, max_size=4)
    | st.dictionaries(st.text(max_size=6), children, max_size=4),
    max_leaves=10,
)


@settings(max_examples=200, deadline=None)
@given(_json_vals)
def test_hypothesis_nullable_number(v):
    graph = compile_schema(f"{VAL_DIR}/nullable-number.medea")
    expected = v is None or (not isinstance(v, bool) and isinstance(v, (int, float)))
    assert _validates(graph, v) == expected


@settings(max_examples=200, deadline=None)
@given(_json_vals)
def test_hypothesis_any_accepts_everything(v):
    graph = compile_schema(f"{VAL_DIR}/any.medea")
    assert _validates(graph, v)


@settings(max_examples=200, deadline=None)
@given(st.dictionaries(st.text(max_size=6), _json_vals, max_size=5))
def test_hypothesis_map_number_bool(obj):
    graph = compile_schema(f"{VAL_DIR}/map-number-bool.medea")
    expected = all(
        isinstance(v, bool) or (not isinstance(v, bool) and isinstance(v, (int, float)))
        for v in obj.values()
    )
    assert _validates(graph, obj) == expected


# -- direct kernel unit checks ----------------------------------------------


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
    # annotate=False builds no tree, but the root dispatch is still always
    # CustomNode $start (Data/Medea.hs:229-232) — valid_against must not
    # misreport ('any',) for the missing tree
    vj2 = validate(graph, json.dumps(doc), annotate=False)
    assert vj2.valid_against() == ("user_defined", "$start")
    assert vj2.to_value() == doc


def test_recursive_schema_via_element_type():
    # cycles through $element-type/properties are LEGAL (only the $type
    # relation must be acyclic, Analysis.hs:115-121); recursion is bounded
    # by document depth
    src = "$schema $start\n    $type\n        $array\n    $element-type\n        $start\n"
    graph = compile_schema(src)
    assert _validates(graph, [[], [[], [[]]]])
    assert not _validates(graph, [[], [1]])


def test_deep_nesting_is_violation_not_crash():
    src = "$schema $start\n    $type\n        $array\n    $element-type\n        $start\n"
    graph = compile_schema(src)
    deep = "[" * 5000 + "]" * 5000
    with pytest.raises(MedeaValidationError) as exc:
        validate(graph, deep)
    assert exc.value.code in ("max_depth_exceeded", "not_json")


def test_structural_errors_reported_before_value_errors():
    # mirror of pairPropertySchemaAndVal phase order (Data/Medea.hs:372-391):
    # banned/missing property errors win over value errors in the same object
    src = (
        "$schema $start\n    $type\n        $object\n    $properties\n"
        "        $property-name \"a\"\n        $property-schema $number\n"
        "        $property-name \"b\"\n        $property-schema $number\n"
    )
    graph = compile_schema(src)
    # invalid value for "a" AND missing required "b" → missing wins
    with pytest.raises(MedeaValidationError) as exc:
        validate(graph, json.dumps({"a": "not-a-number"}))
    assert exc.value.code == "required_prop_missing"
    # invalid value for "a" AND banned extra "z" → banned wins
    with pytest.raises(MedeaValidationError) as exc:
        validate(graph, json.dumps({"a": "not-a-number", "b": 1, "z": 0}))
    assert exc.value.code == "additional_prop_banned"


@pytest.mark.parametrize("name", sorted(CASES))
def test_fastpath_parity_on_fixtures(name):
    """BOTH specialized bool fast paths (validate/fastpath.py closures and
    validate/codegen.py generated source — the engine default) must agree
    with the generic kernel on every conformance fixture's generated
    corpus — in BOTH directions. Over-acceptance would silently corrupt
    engine verdicts (the engine only re-checks fast-path rejections);
    under-acceptance on parser-typed values would erase the speedup."""
    from medea_ray.validate.codegen import compile_fast_codegen
    from medea_ray.validate.fastpath import compile_fast
    from medea_ray.validate.kernel import validate_obj

    make_gen, _predicate = CASES[name]
    gen = make_gen(JsonGen(SEED))
    graph = compile_schema(f"{VAL_DIR}/{name}")
    fast = compile_fast(graph)
    fast_cg = compile_fast_codegen(graph)
    for i in range(N_CASES):
        doc = gen()
        # round-trip through strict JSON so the fast path sees exactly the
        # builtin types the engine's parser produces
        doc = json.loads(json.dumps(doc))
        try:
            validate_obj(graph, doc)
            generic = True
        except MedeaValidationError:
            generic = False
        assert fast(doc) == generic, f"{name}: case {i}: {doc!r}"
        assert fast_cg(doc) == generic, f"{name}: codegen case {i}: {doc!r}"


def test_fastpath_recursive_element_type_cycle():
    """$element-type cycles are legal (Analysis.hs:115-121): both fast-path
    compilers must terminate and agree with the generic kernel."""
    from medea_ray.validate.codegen import compile_fast_codegen
    from medea_ray.validate.fastpath import compile_fast

    src = "$schema $start\n    $type\n        $array\n    $element-type\n        $start\n"
    graph = compile_schema(src)
    for fast in (compile_fast(graph), compile_fast_codegen(graph)):
        assert fast([[], [[], [[]]]]) is True
        assert fast([[], [1]]) is False


# -- subtree annotation fidelity (VERDICT r03 item 6) -------------------------


def _tree_to_value(node):
    """The reference's toValue (Data/Medea.hs:148-156) over a subtree-mode
    annotation tree: AnythingF carries the raw value; ArrayF/ObjectF
    recurse into annotated children."""
    _label, kind, payload = node
    if kind == "array":
        return [_tree_to_value(c) for c in payload]
    if kind == "object":
        return {k: _tree_to_value(c) for k, c in payload.items()}
    return payload  # anything / null / boolean / number / string leaf


def _assert_uniform_start_labels(node):
    stack = [node]
    while stack:
        label, kind, payload = stack.pop()
        assert label == ("user", "$start"), f"non-start label {label!r}"
        if kind == "array":
            stack.extend(payload)
        elif kind == "object":
            stack.extend(payload.values())


@pytest.mark.parametrize("name", sorted(CASES))
def test_subtree_annotation_parity(name):
    """annotate="subtree" must reproduce the reference's Cofree semantics
    (Data/Medea.hs:401 `($> UserDefined name) <$> checkTypes v`): the root
    dispatch is always CustomNode $start (Data/Medea.hs:231-232), so its
    fmap overwrites EVERY inner label — a valid document's whole tree
    carries UserDefined "$start", the structure mirrors the document
    (toValue round-trip), and the annotation mode never changes
    acceptance."""
    from medea_ray.validate.kernel import validate_obj

    make_gen, predicate = CASES[name]
    gen = make_gen(JsonGen(SEED))
    graph = compile_schema(f"{VAL_DIR}/{name}")
    checked = 0
    for _ in range(N_CASES):
        if checked >= 25:
            break
        doc = json.loads(json.dumps(gen()))
        node_ok = _validates(graph, doc)
        try:
            tree = validate_obj(graph, doc, annotate="subtree")
            subtree_ok = True
        except MedeaValidationError:
            subtree_ok = False
        assert subtree_ok == node_ok, f"{name}: mode changed verdict: {doc!r}"
        if not subtree_ok:
            continue
        checked += 1
        _assert_uniform_start_labels(tree)
        assert _tree_to_value(tree) == doc, f"{name}: structure mismatch: {doc!r}"
    assert checked > 0, f"{name}: no valid docs exercised"


def test_subtree_annotation_via_validate():
    graph = compile_schema(f"{VAL_DIR}/2-tuple.medea")
    doc = [{"a": 1}, "x"]
    vj = validate(graph, json.dumps(doc), annotate="subtree")
    assert vj.to_value() == doc
    assert vj.valid_against() == ("user_defined", "$start")


# hypothesis differential: arbitrary JSON docs (independent of the fixture
# generators) against every fixture schema — the fast path must agree with
# the generic kernel in BOTH directions on parser-representable values
# (its only sanctioned under-accepts are non-builtin subclasses,
# recursion-depth edges, and documents past kernel.FAST_STEP_BUDGET
# dispatch steps — none of which hypothesis' builtin strategies produce
# at max_leaves=10)

import functools


@functools.lru_cache(maxsize=None)
def _fixture_graph_and_fast(name):
    from medea_ray.validate.codegen import compile_fast_codegen
    from medea_ray.validate.fastpath import compile_fast

    graph = compile_schema(f"{VAL_DIR}/{name}")
    return graph, compile_fast(graph), compile_fast_codegen(graph)


@settings(max_examples=300, deadline=None)
@given(st.sampled_from(sorted(CASES)), _json_vals)
def test_fastpath_differential_hypothesis(name, v):
    from medea_ray.validate.kernel import validate_obj

    graph, fast, fast_cg = _fixture_graph_and_fast(name)
    v = json.loads(json.dumps(v))  # exactly the parser's builtin types
    try:
        validate_obj(graph, v)
        generic = True
    except MedeaValidationError:
        generic = False
    assert fast(v) == generic, f"{name}: fast!=generic for {v!r}"
    assert fast_cg(v) == generic, f"{name}: codegen!=generic for {v!r}"
