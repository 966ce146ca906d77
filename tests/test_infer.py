"""Schema inference (engine/infer.py): profile exactness, batching
invariance, enum bounds, grammar-safe rendering, and the roundtrip
guarantee (every profiled doc validates against the induced schema)."""

import json

import pytest

from medea_ray import compile_schema, validate
from medea_ray.engine import infer


def _ds(docs, batch_size=None):
    import ray.data as rd

    items = [{"payload": None if d is None else json.dumps(d)} for d in docs]
    ds = rd.from_items(items)
    return ds


def _profile(docs, **kw):
    return infer.profile_json(_ds(docs), "payload", **kw)


def _all_valid(docs, schema_text):
    scm = compile_schema(schema_text)
    for d in docs:
        v = validate(scm, json.dumps(d).encode())
        assert v is not None
    return True


CORPUS = (
    [{"a": 1, "b": "x", "c": [1, 2]} for _ in range(5)]
    + [{"a": None, "b": "y"} for _ in range(3)]
    + [{"a": 2.5, "b": "x", "d": {"k": 1}} for _ in range(2)]
)


def test_profile_counts_hand_checked(ray_session):
    p = _profile(CORPUS)
    assert p.n_docs == 10
    assert p.n_invalid == 0
    assert p.root_type_counts == {"object": 10}
    a = p.props["a"]
    assert a.type_counts == {"number": 7, "null": 3}
    assert a.present == 10
    b = p.props["b"]
    assert b.type_counts == {"string": 10}
    assert b.enum_values == ["x", "y"]
    assert p.props["c"].type_counts == {"array": 5}
    assert p.props["d"].type_counts == {"object": 2}
    assert p.props["d"].present == 2  # optional (absent in 8 docs)


def test_profile_batching_invariant(ray_session):
    # one prop with per-doc-unique values (over-cap only globally when
    # batches are tiny), one enum prop — identical profile either way
    docs = [{"u": f"v{i}", "lang": ["en", "de"][i % 2]} for i in range(60)]
    p1 = infer.profile_json(_ds(docs), "payload", batch_size=1)
    p2 = infer.profile_json(_ds(docs), "payload", batch_size=4096)
    for p in (p1, p2):
        assert p.props["u"].enum_values is None  # 60 distinct > cap 16
        assert p.props["lang"].enum_values == ["de", "en"]
        assert p.props["u"].type_counts == {"string": 60}
    assert p1.props.keys() == p2.props.keys()


def test_enum_cap_and_value_length(ray_session):
    docs = [{"many": f"m{i}", "long": "x" * 300, "ok": "good"} for i in range(17)]
    p = _profile(docs)
    assert p.props["many"].enum_values is None   # 17 distinct > 16
    assert p.props["long"].enum_values is None   # value > 128 bytes
    assert p.props["ok"].enum_values == ["good"]


def test_induced_schema_roundtrip_and_rejection(ray_session):
    text, prof = infer.infer_schema(_ds(CORPUS), "payload")
    assert _all_valid(CORPUS, text)
    scm = compile_schema(text)
    # unknown property -> additional_prop_banned
    from medea_ray.validate.kernel import MedeaValidationError

    with pytest.raises(MedeaValidationError):
        validate(scm, b'{"a": 1, "b": "x", "zzz": true}')
    # enum miss -> invalid
    with pytest.raises(MedeaValidationError):
        validate(scm, b'{"a": 1, "b": "not-in-enum"}')
    # missing required prop -> invalid (b is present in all 10 docs)
    with pytest.raises(MedeaValidationError):
        validate(scm, b'{"a": 1}')
    # optional prop absent -> valid
    validate(scm, b'{"a": null, "b": "y"}')


def test_optional_vs_null_distinct(ray_session):
    docs = [{"p": None}, {"p": None}, {}]
    text, prof = infer.infer_schema(_ds(docs), "payload")
    pp = prof.props["p"]
    assert pp.type_counts == {"null": 2}
    assert pp.present == 2 < prof.n_object_roots
    scm = compile_schema(text)
    validate(scm, b'{"p": null}')
    validate(scm, b"{}")
    from medea_ray.validate.kernel import MedeaValidationError

    with pytest.raises(MedeaValidationError):
        validate(scm, b'{"p": 1}')  # null-only union


def test_non_object_roots(ray_session):
    docs = [{"k": 1}, {"k": 2}, "bare string", 42]
    text, prof = infer.infer_schema(_ds(docs), "payload")
    assert prof.root_type_counts == {"object": 2, "string": 1, "number": 1}
    # k present in BOTH object docs -> required (relative to object roots)
    assert prof.props["k"].present == prof.n_object_roots
    scm = compile_schema(text)
    validate(scm, b'"another string"')
    validate(scm, b"7")
    validate(scm, b'{"k": 3}')
    from medea_ray.validate.kernel import MedeaValidationError

    with pytest.raises(MedeaValidationError):
        validate(scm, b"true")  # boolean root never observed


def test_weird_property_names_and_values(ray_session):
    docs = [
        {
            "has space": "a\"b",
            "x" * 40: "tab\tnl\nquote\"end",
            "प्रकार": "πξ",
            "$reserved": "v",
        }
    ] * 2
    text, prof = infer.infer_schema(_ds(docs), "payload")
    assert _all_valid(docs, text)
    scm = compile_schema(text)
    from medea_ray.validate.kernel import MedeaValidationError

    with pytest.raises(MedeaValidationError):
        validate(scm, json.dumps({**docs[0], "has space": "not-enum"}).encode())


def test_invalid_json_raise_and_skip(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"payload": '{"a": 1}'}, {"payload": "{oops"}])
    with pytest.raises(Exception, match="unparseable JSON"):
        infer.profile_json(ds, "payload")
    p = infer.profile_json(
        rd.from_items([{"payload": '{"a": 1}'}, {"payload": "{oops"}, {"payload": None}]),
        "payload",
        on_invalid="skip",
    )
    assert p.n_docs == 1 and p.n_invalid == 2


def test_stdlib_fallback_rejects_lone_surrogates(monkeypatch):
    # orjson rejects \uD800 at parse time; the stdlib fallback must agree
    # or the same corpus would profile on one machine and crash Arrow on
    # another (review finding, tenth pass). Unit-level: the fallback
    # only engages when orjson is absent, which no Ray worker here is.
    monkeypatch.setattr(infer, "_fastjson", None)
    assert infer._loads('{"k": "fine"}') == {"k": "fine"}
    with pytest.raises(ValueError, match="lone surrogate"):
        infer._loads('{"k": "\\ud800"}')
    with pytest.raises(ValueError, match="lone surrogate"):
        infer._loads('{"a": [{"\\udfff": 1}]}')  # nested + in a key


def test_stdlib_fallback_rejects_nonstandard_constants(monkeypatch):
    # orjson AND kernel.loads_json (both paths) reject NaN/Infinity; the
    # stdlib fallback must agree or a NaN doc would profile as a number
    # here but validate as not_json in the kernel, breaking the induced
    # schema's roundtrip guarantee on machines without orjson.
    monkeypatch.setattr(infer, "_fastjson", None)
    for payload in ('{"a": NaN}', '{"a": Infinity}', '{"a": -Infinity}', "[NaN]"):
        with pytest.raises(ValueError, match="constant"):
            infer._loads(payload)
    assert infer._loads('{"a": 1.5}') == {"a": 1.5}


def test_surrogate_payload_counts_invalid(ray_session):
    # end-to-end (orjson path): the surrogate doc counts under
    # on_invalid="skip" instead of crashing the profile
    import ray.data as rd

    ds = rd.from_items(
        [{"payload": '{"k": "\\ud800"}'}, {"payload": '{"k": "fine"}'}]
    )
    p = infer.profile_json(ds, "payload", on_invalid="skip")
    assert p.n_docs == 1 and p.n_invalid == 1
    assert p.props["k"].enum_values == ["fine"]


def test_empty_profile_raises(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"payload": "nope"}])
    p = infer.profile_json(ds, "payload", on_invalid="skip")
    with pytest.raises(ValueError, match="empty profile"):
        infer.induce_schema(p)


def test_multi_type_union_schema(ray_session):
    docs = [{"v": 1}, {"v": "s"}, {"v": [1]}, {"v": {"x": 1}}, {"v": True}, {"v": None}]
    text, prof = infer.infer_schema(_ds(docs), "payload")
    assert sorted(prof.props["v"].type_counts) == sorted(
        ["number", "string", "array", "object", "boolean", "null"]
    )
    assert _all_valid(docs, text)


def test_array_bounds_and_element_type(ray_session):
    docs = [{"t": ["a"]}, {"t": ["a", "b", "c"]}, {"t": ["x", "y"]}]
    text, prof = infer.infer_schema(_ds(docs), "payload")
    pp = prof.props["t"]
    assert (pp.array_min, pp.array_max) == (1, 3)
    assert pp.elem_type_counts == {"string": 6}
    assert "$min-length 1" in text and "$max-length 3" in text
    assert "$element-type" in text
    assert _all_valid(docs, text)
    scm = compile_schema(text)
    from medea_ray.validate.kernel import MedeaValidationError

    with pytest.raises(MedeaValidationError):
        validate(scm, b'{"t": []}')  # below observed min
    with pytest.raises(MedeaValidationError):
        validate(scm, b'{"t": ["a","b","c","d"]}')  # above observed max
    with pytest.raises(MedeaValidationError):
        validate(scm, b'{"t": [1]}')  # element type never observed


def test_array_bounds_batching_invariant(ray_session):
    docs = [{"t": list(range(i % 5))} for i in range(40)]  # lengths 0..4
    p1 = infer.profile_json(_ds(docs), "payload", batch_size=1)
    p2 = infer.profile_json(_ds(docs), "payload", batch_size=4096)
    for p in (p1, p2):
        assert (p.props["t"].array_min, p.props["t"].array_max) == (0, 4)
        # 8 cycles of lengths 0+1+2+3+4 = 80 element occurrences
        assert p.props["t"].elem_type_counts == {"number": 80}


def test_empty_arrays_stay_loose(ray_session):
    # all arrays empty: 0 bounds are unwritable naturals -> omitted,
    # no element type -> bare $array accepts anything
    docs = [{"t": []}, {"t": []}]
    text, prof = infer.infer_schema(_ds(docs), "payload")
    assert "$min-length" not in text and "$max-length" not in text
    assert "$element-type" not in text
    scm = compile_schema(text)
    validate(scm, b'{"t": [1, "mixed", null]}')


def test_mixed_element_types_no_element_constraint(ray_session):
    docs = [{"t": ["a", 1]}, {"t": [True]}]
    text, prof = infer.infer_schema(_ds(docs), "payload")
    assert "$element-type" not in text
    assert _all_valid(docs, text)


def test_min_zero_max_written(ray_session):
    docs = [{"t": []}, {"t": ["a", "b"]}]
    text, prof = infer.infer_schema(_ds(docs), "payload")
    assert "$min-length" not in text  # 0 unwritable -> loose
    assert "$max-length 2" in text
    assert _all_valid(docs, text)


def test_identifier_collision_resolved(ray_session):
    # both sanitize to p_a_b -> hash suffixes must disambiguate; force
    # aux schemas via multi-type values
    docs = [{"a b": 1, "a_b": "x"}, {"a b": "y", "a_b": 2}]
    text, prof = infer.infer_schema(_ds(docs), "payload")
    assert _all_valid(docs, text)
