"""Unit tests for the source-codegen fast path (validate/codegen.py) on
schema shapes beyond the conformance fixtures: tuples, additional-property
schemas, $any tops, enum-only tops, custom-candidate chains, non-ASCII
enums, and the deep-document defer path through ValidatorKernel.

The heavy parity nets live in test_validator_conformance.py (fixture
corpus + hypothesis differential, both compilers); this file pins the
generator's structural edges directly."""

import json

import pytest

from medea_ray import compile_schema
from medea_ray.schema.errors import MedeaError
from medea_ray.validate.codegen import compile_fast_codegen, generate_source
from medea_ray.validate.kernel import MedeaValidationError, validate_obj


def _agree(graph, docs):
    fast = compile_fast_codegen(graph)
    for doc in docs:
        doc = json.loads(json.dumps(doc))
        try:
            validate_obj(graph, doc)
            generic = True
        except MedeaValidationError:
            generic = False
        assert fast(doc) == generic, f"{doc!r}: fast={fast(doc)} generic={generic}"


def test_any_start_is_constant_true():
    # a schema with no $type section is the "any" node (Analysis.hs:241-244)
    graph = compile_schema("$schema $start\n")
    src, ns, start = generate_source(graph)
    assert start is None and ns["_const"] is True
    fast = compile_fast_codegen(graph)
    assert fast({"x": [1, None]}) is True and fast(None) is True


def test_simple_enum_start_compiles_to_expression():
    src_schema = (
        "$schema $start\n    $type\n        $string\n        $null\n"
        '    $string-values\n        "a"\n        "b"\n'
    )
    graph = compile_schema(src_schema)
    src, _ns, start = generate_source(graph)
    assert start == "_f_start" and "def _f_start" in src
    _agree(graph, ["a", "b", "c", None, 1, True, [], {}])


def test_tuple_spec_positions_unrolled():
    src_schema = (
        "$schema $start\n    $type\n        $array\n    $tuple\n"
        "        $number\n        $string\n"
    )
    graph = compile_schema(src_schema)
    _agree(
        graph,
        [[1, "x"], ["x", 1], [1], [1, "x", 2], [], [1.5, ""], [True, "x"], [1, None]],
    )


def test_additional_property_schema_checked():
    src_schema = (
        "$schema $start\n    $type\n        $object\n    $properties\n"
        '        $property-name "a"\n        $property-schema $number\n'
        "        $additional-properties-allowed\n"
        "        $additional-property-schema $string\n"
    )
    graph = compile_schema(src_schema)
    _agree(
        graph,
        [
            {"a": 1},
            {"a": 1, "z": "ok"},
            {"a": 1, "z": 2},
            {"a": "bad"},
            {"z": "only"},
            {},
        ],
    )


def test_custom_candidate_chain_and_union():
    src_schema = (
        "$schema $start\n    $type\n        $number\n        other\n\n"
        "$schema other\n    $type\n        $string\n"
        '    $string-values\n        "yes"\n'
    )
    graph = compile_schema(src_schema)
    _agree(graph, [1, 1.5, "yes", "no", None, True, [], {}])


def test_custom_any_candidate_makes_schema_constant_true():
    src_schema = (
        "$schema $start\n    $type\n        $number\n        wild\n\n"
        "$schema wild\n"
    )
    graph = compile_schema(src_schema)
    src, ns, start = generate_source(graph)
    assert start is None and ns["_const"] is True


def test_non_ascii_and_quote_heavy_names_and_enums():
    src_schema = (
        "$schema $start\n    $type\n        $object\n    $properties\n"
        '        $property-name "é\'k"\n        $property-schema tag\n\n'
        "$schema tag\n    $type\n        $string\n"
        '    $string-values\n        "naïve"\n        "\'q\'"\n'
    )
    graph = compile_schema(src_schema)
    _agree(
        graph,
        [
            {"é'k": "naïve"},
            {"é'k": "'q'"},
            {"é'k": "plain"},
            {"other": "naïve"},
            {},
        ],
    )


def test_deep_document_defers_to_generic_max_depth():
    """A document deep enough to exhaust the generated functions' own
    recursion must surface as the generic kernel's max_depth_exceeded
    violation, never a crash (same defer contract as fastpath.py)."""
    from medea_ray.engine.pipeline import ValidatorKernel

    src_schema = "$schema $start\n    $type\n        $array\n    $element-type\n        $start\n"
    kernel = ValidatorKernel(src_schema, "payload", "id")
    deep = "[" * 5000 + "]" * 5000
    valid, violations = kernel.validate_payloads([deep, "[]"])
    assert valid == [False, True]
    assert violations[0][2] in ("max_depth_exceeded", "not_json")


_RECURSIVE_SCHEMA = (
    "$schema $start\n    $type\n        $array\n        $string\n"
    "    $element-type\n        $start\n"
)


def _nest(depth, leaf="x"):
    v = leaf
    for _ in range(depth):
        v = [v]
    return v


def test_depth_verdict_is_deterministic_across_kernels():
    """The verdict on deep documents is the fixed MAX_DEPTH contract, not
    an artifact of whichever kernel's Python stack ran out first: the
    generic kernel fails structural checks at container depth >= MAX_DEPTH
    deterministically, and BOTH fast paths defer at the same bound —
    neither may accept a document the generic kernel rejects, at any
    depth (the old stack-based defer had a window around ~300-900 where
    the 1-frame-per-level codegen path accepted documents the
    ~4-frames-per-level generic kernel could no longer walk)."""
    from medea_ray.validate.fastpath import compile_fast
    from medea_ray.validate.kernel import MAX_DEPTH

    graph = compile_schema(_RECURSIVE_SCHEMA)
    fasts = {"codegen": compile_fast_codegen(graph), "closure": compile_fast(graph)}
    for depth in (0, 1, 50, MAX_DEPTH - 1, MAX_DEPTH, MAX_DEPTH + 1,
                  MAX_DEPTH + 50, 300, 400, 900, 1500):
        obj = _nest(depth)
        try:
            validate_obj(graph, obj)
            generic_ok, code = True, None
        except MedeaValidationError as e:
            generic_ok, code = False, e.code
        # the contract itself: <= MAX_DEPTH container levels valid,
        # deeper is max_depth_exceeded — deterministically
        assert generic_ok == (depth <= MAX_DEPTH), (depth, code)
        if not generic_ok:
            assert code == "max_depth_exceeded", (depth, code)
        for name, fast in fasts.items():
            got = fast(obj)
            # under-accept only: True must imply the generic kernel accepts
            assert not (got and not generic_ok), (name, depth)
            # and well below the bound the fast paths actually accept
            if depth < MAX_DEPTH - 1:
                assert got is True, (name, depth)


_DIAMOND_SCHEMA = (
    "$schema $start\n    $type\n        a\n        b\n\n"
    "$schema a\n    $type\n        $array\n    $element-type\n        $start\n\n"
    "$schema b\n    $type\n        $array\n    $element-type\n        $start\n"
)


def test_diamond_candidates_deep_doc_is_polynomial():
    """An adversarial (schema, document) pair must never pin a worker:
    two custom candidates that each recurse into array elements re-walk
    every subtree per parent attempt, so a 40-deep rejecting document
    used to cost 2^40 dispatches in ALL three kernels (found by an
    extended fuzz run — seed 303 hung). The generic kernel now memoizes
    per-(container, schema) results; the fast paths defer past
    FAST_STEP_BUDGET dispatch steps. Everything below must finish in
    well under a second; without the fix none of it terminates."""
    import time

    from medea_ray.engine.pipeline import ValidatorKernel
    from medea_ray.validate.fastpath import compile_fast

    graph = compile_schema(_DIAMOND_SCHEMA)
    fast_cg = compile_fast_codegen(graph)
    fast_cl = compile_fast(graph)
    reject = _nest(60, 1)       # int leaf: rejects at the bottom of 60 arrays
    accept = _nest(60, [])      # empty-array leaf: accepts
    t0 = time.time()
    with pytest.raises(MedeaValidationError) as exc:
        validate_obj(graph, reject)
    assert exc.value.code == "not_one_of_options"
    assert validate_obj(graph, accept) is None
    # annotate=True caches immutable tuple trees; subtree stays exact
    with pytest.raises(MedeaValidationError):
        validate_obj(graph, reject, annotate=True)
    assert validate_obj(graph, accept, annotate="subtree") is not None
    # fast paths: bounded defer on the rejecting doc (False, budget), and
    # a genuine accept on the accepting doc (one pass, no backtracking)
    assert fast_cg(reject) is False and fast_cl(reject) is False
    assert fast_cg(accept) is True and fast_cl(accept) is True
    # end-to-end: the engine verdict survives the adversarial batch
    kernel = ValidatorKernel(_DIAMOND_SCHEMA, "payload", "id")
    valid, violations = kernel.validate_payloads(
        [json.dumps(reject), json.dumps(accept)]
    )
    assert valid == [False, True]
    assert violations[0][2] == "not_one_of_options"
    assert time.time() - t0 < 30  # seconds, not heat death


def _random_schema_text(rng):
    """Random-but-grammatical schema source: random prim subsets, enums,
    list/tuple arrays with bounds, object property tables with
    optional/additional knobs, custom candidates restricted to
    later-indexed schemas (the $type relation must be acyclic, C6) while
    element/property refs may point anywhere (cycles legal)."""
    prim_idents = ["$null", "$boolean", "$number", "$string", "$object", "$array"]
    enum_pool = ["en", "de", "naïve", "x y", ""]
    names = ["$start"] + [f"s{i}" for i in range(1, rng.randint(1, 4))]
    blocks = []
    for i, nm in enumerate(names):
        lines = [f"$schema {nm}"]
        if i > 0 and rng.random() < 0.08:
            blocks.append("\n".join(lines))  # "any" schema: no $type section
            continue
        prims = [p for p in prim_idents if rng.random() < 0.45]
        customs = [c for c in names[i + 1 :] if rng.random() < 0.5]
        if prims or customs:
            lines.append("    $type")
            lines.extend(f"        {t}" for t in prims + customs)
        if "$string" in prims and rng.random() < 0.6:
            lines.append("    $string-values")
            lines.extend(
                f'        "{v}"' for v in rng.sample(enum_pool, rng.randint(1, 3))
            )
        if "$array" in prims and rng.random() < 0.8:
            if rng.random() < 0.5:
                if rng.random() < 0.5:
                    # naturals reject a leading zero, so 0 is ungrammatical
                    lines.append(f"    $min-length {rng.randint(1, 2)}")
                if rng.random() < 0.5:
                    lines.append(f"    $max-length {rng.randint(2, 5)}")
                if rng.random() < 0.7:
                    lines.append("    $element-type")
                    lines.append(f"        {rng.choice(prim_idents[:4] + names)}")
            else:
                lines.append("    $tuple")
                lines.extend(
                    f"        {rng.choice(prim_idents + names)}"
                    for _ in range(rng.randint(1, 3))
                )
        if "$object" in prims and rng.random() < 0.9:
            lines.append("    $properties")
            # ~1 in 8 property tables is wide (>16 props) so the codegen
            # dict-dispatch object path sees random structure too
            n_props = rng.randint(0, 3) if rng.random() < 0.875 else rng.randint(17, 22)
            for j in range(n_props):
                lines.append(
                    f'        $property-name "{rng.choice(["a", "b", "cé", "d d"])}{j}"'
                )
                if rng.random() < 0.8:
                    lines.append(
                        f"        $property-schema {rng.choice(prim_idents + names)}"
                    )
                if rng.random() < 0.4:
                    lines.append("        $optional-property")
            if rng.random() < 0.5:
                lines.append("        $additional-properties-allowed")
                if rng.random() < 0.5:
                    lines.append(
                        f"        $additional-property-schema {rng.choice(prim_idents + names)}"
                    )
        blocks.append("\n".join(lines))
    return "\n\n".join(blocks) + "\n"


def test_random_schema_deep_doc_directional():
    """Scaled-down version of the out-of-band fuzz that found the
    exponential-backtracking hang: random schema graphs x documents
    wrapped to depths around MAX_DEPTH. Directional contract only (deep
    docs may defer): neither fast path may accept a document the generic
    kernel rejects, and everything must terminate — the memo/budget
    bounds, not luck, guarantee it."""
    from random import Random

    from medea_ray.fixtures.jsongen import JsonGen
    from medea_ray.validate.fastpath import compile_fast
    from medea_ray.validate.kernel import MAX_DEPTH

    rng = Random(20260819)
    jg = JsonGen(11)

    def wrap_deep(doc, depth):
        for _ in range(depth):
            doc = [doc] if rng.random() < 0.7 else {"a0": doc}
        return doc

    n_compiled = 0
    for _ in range(100):
        src = _random_schema_text(rng)
        try:
            graph = compile_schema(src)
        except MedeaError:
            continue
        n_compiled += 1
        fast = compile_fast(graph)
        fast_cg = compile_fast_codegen(graph)
        for depth in (MAX_DEPTH - 1, MAX_DEPTH, MAX_DEPTH + 37):
            doc = wrap_deep(jg.value(1), depth)
            try:
                validate_obj(graph, doc)
                generic = True
            except MedeaValidationError:
                generic = False
            for name, f in (("closure", fast), ("codegen", fast_cg)):
                assert not (f(doc) and not generic), (name, depth, src[:80])
    assert n_compiled >= 25, f"only {n_compiled}/100 random schemata compiled"


def test_random_schema_differential():
    """Both fast-path compilers vs the generic kernel over random schema
    GRAPHS (not just random documents against fixed fixtures): the
    compiler pair must agree with the generic verdict on every
    parser-typed doc, for every schema the reference grammar accepts."""
    from random import Random

    from medea_ray.fixtures.jsongen import JsonGen
    from medea_ray.validate.fastpath import compile_fast

    rng = Random(20260818)
    jg = JsonGen(7)
    archetypes = [
        None, True, False, 0, 1, -2.5, "", "en", "de", "naïve", "x y",
        [], ["en"], ["en", "de", "en"], [1, "en"], [None], [[]],
        {}, {"a0": 1}, {"a0": "en", "b1": None}, {"cé0": []},
        {"a0": {"a0": 1}}, {"zz": True},
        # wide docs for the >16-property dict-dispatch object path
        {f"a{j}": 1 for j in range(20)},
        {f"{n}{j}": v for j, (n, v) in enumerate(
            zip(["a", "b", "cé", "d d"] * 6, [1, "en", None, True] * 6)
        )},
    ]
    n_compiled = 0
    for _ in range(120):
        src = _random_schema_text(rng)
        try:
            graph = compile_schema(src)
        except MedeaError:
            continue  # random text tripped a parse/compile check — expected
        n_compiled += 1
        fast = compile_fast(graph)
        fast_cg = compile_fast_codegen(graph)
        docs = archetypes + [jg.value(3) for _ in range(40)]
        for doc in docs:
            doc = json.loads(json.dumps(doc))
            try:
                validate_obj(graph, doc)
                generic = True
            except MedeaValidationError:
                generic = False
            assert fast(doc) == generic, f"closure!=generic: {src!r} {doc!r}"
            assert fast_cg(doc) == generic, f"codegen!=generic: {src!r} {doc!r}"
    # the generator must actually exercise the compilers, not just the
    # compile-error paths
    assert n_compiled >= 30, f"only {n_compiled}/120 random schemata compiled"


def test_kernel_uses_codegen_fastpath():
    from medea_ray.engine.pipeline import ValidatorKernel
    from medea_ray.fixtures.gen import flagship_schema_text

    kernel = ValidatorKernel(flagship_schema_text(), "payload", "url")
    # the budget-reset entry wrapper closes over the generated function
    cells = [
        c.cell_contents
        for c in (kernel.fast.__closure__ or ())
        if callable(c.cell_contents)
    ]
    inner = cells[0] if cells else kernel.fast
    assert inner.__code__.co_filename == "<medea-fastpath-codegen>"


def test_wide_object_dict_dispatch():
    """Objects past the property-count threshold compile to dict dispatch
    (the if/elif chain is O(P) per key) with identical semantics."""
    n_props = 40
    prop_lines = []
    for j in range(n_props):
        prop_lines.append(f'        $property-name "p{j}"')
        prop_lines.append("        $property-schema $number")
        if j % 3 == 0:
            prop_lines.append("        $optional-property")
    src_schema = (
        "$schema $start\n    $type\n        $object\n    $properties\n"
        + "\n".join(prop_lines)
        + "\n"
    )
    graph = compile_schema(src_schema)
    src, _ns, _start = generate_source(graph)
    assert "_pd0" in src and "_rq0" in src
    full = {f"p{j}": j for j in range(n_props)}
    missing_req = dict(full)
    del missing_req["p1"]  # required (1 % 3 != 0)
    missing_opt = dict(full)
    del missing_opt["p0"]  # optional
    bad_type = dict(full, p7="nope")
    extra = dict(full, zz=1)
    _agree(graph, [full, missing_req, missing_opt, bad_type, extra, {}])


def _diamond_schema(depth: int) -> str:
    """d_i -> {x_i, y_i} -> d_(i+1): 2^depth root-to-leaf paths, one DAG."""
    blocks = []
    for i in range(depth):
        name = "$start" if i == 0 else f"d{i}"
        if i == depth - 1:
            blocks.append(f"$schema {name}\n    $type\n        $number")
        else:
            blocks.append(
                f"$schema {name}\n    $type\n        x{i}\n        y{i}"
            )
            blocks.append(f"$schema x{i}\n    $type\n        $string\n        d{i + 1}")
            blocks.append(f"$schema y{i}\n    $type\n        $boolean\n        d{i + 1}")
    return "\n\n".join(blocks) + "\n"


def test_always_true_diamond_dag_compiles_fast():
    """A diamond-shaped custom-candidate DAG (two candidates per schema
    converging on shared children — legal under C6 acyclicity) must
    compile in linear time: the always-true walk is memoized. The compiled
    checker must also EVALUATE rejecting docs in linear time (candidate
    dispatch is flattened to an OR over the dedup'd closure), where the
    generic kernel's DFS is 2^depth — so parity vs the generic kernel is
    pinned at a small depth and only the codegen path runs at depth 25."""
    import time

    graph = compile_schema(_diamond_schema(25))
    t0 = time.perf_counter()
    fast = compile_fast_codegen(graph)
    compile_s = time.perf_counter() - t0
    assert compile_s < 1.0, f"diamond DAG compile took {compile_s:.2f}s"
    t0 = time.perf_counter()
    assert fast(1) is True and fast("x") is True and fast(True) is True
    assert fast(None) is False and fast([]) is False and fast({}) is False
    eval_s = time.perf_counter() - t0
    assert eval_s < 1.0, f"diamond DAG eval took {eval_s:.2f}s"
    # parity vs the (exponential-on-reject) generic kernel at depth 8
    _agree(compile_schema(_diamond_schema(8)), [1, "x", True, None, [], {}])


def test_diamond_subclass_containers_polynomial():
    """list/dict SUBCLASSES reach the public validate_obj API (parsed JSON
    never produces them, arbitrary Python objects do) and used to bypass
    the (id, schema, depth) memo — leaving the exponential-backtracking
    DoS reachable there: 40 subclass levels never terminated."""
    import time

    class L(list):
        pass

    graph = compile_schema(_DIAMOND_SCHEMA)
    reject = 1
    accept = L()
    for _ in range(40):
        reject = L([reject])
        accept = L([accept])
    t0 = time.time()
    with pytest.raises(MedeaValidationError) as exc:
        validate_obj(graph, reject)
    assert exc.value.code == "not_one_of_options"
    assert validate_obj(graph, accept) is None
    assert time.time() - t0 < 10


def test_aliased_container_verdict_is_depth_exact():
    """The memo key includes depth: an ALIASED container validated at two
    depths may pass at one and overflow MAX_DEPTH at the other, and a
    depth-blind ok-memo hit used to ACCEPT the whole document in plain /
    node-annotate modes while subtree mode (no ok-memo) rejected — the
    verdict must not depend on annotate mode."""
    rec = (
        "$schema $start\n    $type\n        $array\n"
        "    $element-type\n        $start\n"
    )
    graph = compile_schema(rec)
    shared = _nest(150, [])          # valid at depth 1 (bottom at 151)
    doc = [shared, _nest(60, shared)]  # aliased at depth 61 (bottom at 211)
    for mode in (False, True, "subtree"):
        with pytest.raises(MedeaValidationError) as exc:
            validate_obj(graph, doc, annotate=mode)
        assert exc.value.code == "max_depth_exceeded", mode
    # and the aliased-but-in-bounds variant accepts in every mode
    ok_doc = [shared, [shared]]
    for mode in (False, True, "subtree"):
        validate_obj(graph, ok_doc, annotate=mode)


def test_codegen_entry_keeps_depth_calling_convention():
    """Every fast-path callable takes (v, _d=0); the codegen entry wrapper
    used to bind its implementation objects as the optional params, so a
    positional second arg crashed."""
    graph = compile_schema(_DIAMOND_SCHEMA)
    fast = compile_fast_codegen(graph)
    assert fast(_nest(5, []), 0) is True
    assert fast(_nest(5, 1), 0) is False


def test_validate_column_buffer_path_matches_pylist():
    """validate_column (zero-copy Arrow-buffer parse, round 5) must be
    verdict- and violation-identical to validate_payloads across every
    input layout: plain/large string, nulls, chunked, sliced (non-zero
    offset), empty, and a non-string fallback column."""
    import pyarrow as pa

    from medea_ray.engine.pipeline import ValidatorKernel

    schema = open("/root/repo/medea_ray/fixtures/pages.medea").read()
    k = ValidatorKernel(schema, "payload", "url")
    rows = [
        '{"url":"https://a.example.com/x","lang":"en","meta":{"len":3},"tags":["t"]}',
        '{"url":"https://a.example.com/y","lang":"en","meta":{"len":"oops"},"tags":[]}',
        None,
        "not json at all",
        '{"url":"https://a.example.com/z","lang":"de","meta":{"len":0},"tags":[]}',
        "",
        '{"extra": true}',
        "üñïçødé",  # multibyte non-JSON
    ]
    expected = k.validate_payloads(rows)
    layouts = {
        "string": pa.array(rows, pa.string()),
        "large": pa.array(rows, pa.large_string()),
        "chunked": pa.chunked_array(
            [pa.array(rows[:3], pa.string()), pa.array(rows[3:], pa.string())]
        ),
        "sliced": pa.array(["skip0", "skip1"] + rows, pa.string()).slice(2),
    }
    for name, col in layouts.items():
        got = k.validate_column(col)
        assert got == expected, name
    assert k.validate_column(pa.array([], pa.string())) == ([], [])
    # all-null blocks degrade to Arrow null type -> list fallback path
    assert k.validate_column(pa.array([None, None])) == k.validate_payloads(
        [None, None]
    )
