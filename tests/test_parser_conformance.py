"""Parser conformance: the reference's 42 parser fixtures
(/root/reference/conformance/parser/{fail,pass}), mirroring
test/parser/Main.hs:9-28 — fail fixtures must raise a parse error, pass
fixtures must parse (some intentionally fail the later build step)."""

import os

import pytest

from medea_ray import MedeaParseError, parse_specification

FAIL_DIR = "/root/reference/conformance/parser/fail"
PASS_DIR = "/root/reference/conformance/parser/pass"


def _fixtures(d):
    return sorted(f for f in os.listdir(d) if f.endswith(".medea"))


@pytest.mark.parametrize("name", _fixtures(FAIL_DIR))
def test_parser_fail(name):
    with open(os.path.join(FAIL_DIR, name), "rb") as f:
        data = f.read()
    with pytest.raises(MedeaParseError):
        parse_specification(data)


@pytest.mark.parametrize("name", _fixtures(PASS_DIR))
def test_parser_pass(name):
    with open(os.path.join(PASS_DIR, name), "rb") as f:
        data = f.read()
    spec = parse_specification(data)
    assert len(spec.schemata) >= 1


@pytest.mark.parametrize("esc", ["ZZZZ", " 123", "12_3", "+123", "00g0"])
def test_invalid_unicode_escape_is_parse_error(esc):
    """A malformed \\uXXXX must raise MedeaParseError (int(x, 16) accepted
    whitespace/underscore forms and raised raw ValueError on others,
    escaping the MedeaError contract every caller relies on)."""
    src = (
        "$schema $start\n"
        "    $type\n"
        "        $string\n"
        "    $string-values\n"
        f'        "a\\u{esc}b"\n'
    )
    with pytest.raises(MedeaParseError):
        parse_specification(src)


def test_valid_unicode_escape_still_parses():
    src = (
        "$schema $start\n"
        "    $type\n"
        "        $string\n"
        "    $string-values\n"
        '        "a\\u0041b"\n'
    )
    parse_specification(src)  # A = 'A'


def test_compile_schema_accepts_bare_name_pathlike(tmp_path):
    """A PathLike is unambiguously a path — even a bare name with no
    separator or .medea suffix must be opened, not parsed as schema
    text."""
    from pathlib import Path

    from medea_ray import compile_schema

    p = tmp_path / "myschema"  # no suffix, no sep in the name itself
    p.write_text("$schema $start\n    $type\n        $string\n")
    import os
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        compile_schema(Path("myschema"))  # relative bare-name PathLike
    finally:
        os.chdir(cwd)
