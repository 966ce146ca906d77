"""WARC source + HTML->text extraction: round-trips, tolerance on
untrusted bytes, Ray Data composition down to the validation pipeline's
pages shape."""

import random
from datetime import datetime, timezone

import pyarrow as pa
import pytest

from medea_ray.engine.htmltext import HtmlExtractor, add_extracted_text, extract_text
from medea_ray.engine.warc import (
    iter_warc_records,
    make_warc,
    parse_http_response,
    read_warc,
    warc_records_to_table,
)


def _records(n=5):
    return [
        {
            "url": f"https://example.org/p/{i}",
            "date": datetime(2026, 3, 1, 12, 0, i, tzinfo=timezone.utc),
            "html": f"<html><body><p>doc {i} &amp; more</p></body></html>".encode(),
            "status": 200 if i % 2 == 0 else 404,
        }
        for i in range(n)
    ]


# -- WARC writer / walker ----------------------------------------------------


@pytest.mark.parametrize("gz", [True, False])
def test_warc_roundtrip(gz):
    recs = _records()
    data = make_warc(recs, gzip_members=gz)
    got = [
        (h, b) for h, b in iter_warc_records(data) if h.get("warc-type") == "response"
    ]
    assert [h["warc-target-uri"] for h, _ in got] == [r["url"] for r in recs]
    for (h, block), r in zip(got, recs):
        status, payload = parse_http_response(block)
        assert status == r["status"]
        assert payload == r["html"]
        assert h["warc-date"] == r["date"].strftime("%Y-%m-%dT%H:%M:%SZ")


def test_warc_deterministic_bytes():
    recs = _records()
    assert make_warc(recs) == make_warc(recs)


def test_warcinfo_record_present_and_skipped_by_table():
    data = make_warc(_records(2))
    kinds = [h["warc-type"] for h, _ in iter_warc_records(data)]
    assert kinds[0] == "warcinfo" and kinds.count("response") == 2
    tbl = warc_records_to_table(data, "x.warc.gz")
    assert tbl.num_rows == 2
    assert tbl.column("warc_path").to_pylist() == ["x.warc.gz"] * 2
    assert tbl.column("http_status").to_pylist() == [200, 404]
    ts = tbl.column("warc_ts").to_pylist()
    assert ts[0] == datetime(2026, 3, 1, 12, 0, 0)


def test_warc_truncation_yields_complete_prefix():
    recs = _records(4)
    plain = make_warc(recs, gzip_members=False)
    # cut mid-way through the last record's body
    cut = plain[: len(plain) - 40]
    got = [h for h, _ in iter_warc_records(cut) if h.get("warc-type") == "response"]
    assert 0 < len(got) < 4

    gzdata = make_warc(recs, gzip_members=True)
    cut = gzdata[: len(gzdata) - 25]
    got = [h for h, _ in iter_warc_records(cut) if h.get("warc-type") == "response"]
    assert len(got) < 4  # truncated member dropped, prefix kept


def test_warc_fuzz_never_raises():
    rng = random.Random(42)
    recs = _records(3)
    for gz in (True, False):
        base = bytearray(make_warc(recs, gzip_members=gz))
        for trial in range(30):
            data = bytearray(base)
            for _ in range(rng.randint(1, 8)):
                data[rng.randrange(len(data))] = rng.randrange(256)
            list(iter_warc_records(bytes(data)))  # must not raise
        for k in (0, 1, 7, len(base) // 2, len(base) - 1):
            list(iter_warc_records(bytes(base[:k])))
    list(iter_warc_records(b""))
    list(iter_warc_records(b"\x1f\x8bgarbage"))
    list(iter_warc_records(b"WARC/1.0\r\nContent-Length: nope\r\n\r\n"))


def test_http_response_edge_cases():
    assert parse_http_response(b"no http head") == (None, b"no http head")
    assert parse_http_response(b"HTTP/1.1 OK\r\n\r\nbody") == (None, b"body")
    assert parse_http_response(b"HTTP/1.1 301 Moved\r\nLocation: x\r\n\r\n") == (301, b"")


# -- HTML extraction ---------------------------------------------------------


def test_extract_text_exact():
    html = (
        b"<html><head><title>A &amp; B</title>"
        b"<script>var x = '<p>not text</p>';</script>"
        b"<style>p { color: red }</style></head>"
        b"<body><!-- comment --><h1>Head</h1>"
        b"<p>first   para</p><p>second &#x41;&#66;</p>"
        b'<a href="/x">link one</a> and <a href="/y">two</a>'
        b"<noscript>hidden</noscript></body></html>"
    )
    r = extract_text(html)
    assert r["title"] == "A & B"
    assert r["n_links"] == 2
    assert r["text"] == "Head\nfirst para\nsecond AB\nlink one and two"


def test_extract_text_charsets_and_none():
    assert extract_text(None) == {"text": None, "title": None, "n_links": None}
    latin = '<meta charset="iso-8859-1"><p>caf\xe9</p>'.encode("latin-1")
    assert extract_text(latin)["text"] == "café"
    utf8 = '<meta charset="utf-8"><p>café</p>'.encode("utf-8")
    assert extract_text(utf8)["text"] == "café"
    # undeclared non-utf8 bytes degrade to U+FFFD, deterministically
    raw = b"<p>caf\xe9</p>"
    assert extract_text(raw)["text"] == "caf�"


def test_extract_text_is_pure_and_tolerant():
    rng = random.Random(7)
    for _ in range(40):
        blob = bytes(rng.randrange(256) for _ in range(rng.randint(0, 300)))
        a, b = extract_text(blob), extract_text(blob)
        assert a == b  # byte-identical output per payload — the invariant
    # pathological markup
    for s in (b"<", b"<a href", b"<script>never closed", b"</p></p></script>",
              b"<title>t<p>x", b"&#xZZ; &unknown; &amp"):
        extract_text(s)


def test_extractor_batch_stage():
    tbl = pa.table(
        {
            "url": ["u1", "u2", "u3"],
            "html": pa.array(
                [b"<p>one</p>", None, b"<a href='/'>z</a>"], pa.large_binary()
            ),
        }
    )
    out = HtmlExtractor()(tbl)
    assert out.column("ext_text").to_pylist() == ["one", None, "z"]
    assert out.column("ext_n_links").to_pylist() == [0, None, 1]
    assert out.schema.field("ext_text").type == pa.large_string()


# -- Ray composition ---------------------------------------------------------


def test_read_warc_to_extracted_pages(ray_session, tmp_path):
    recs = _records(8)
    shard_a, shard_b = recs[:5], recs[5:]
    (tmp_path / "a.warc.gz").write_bytes(make_warc(shard_a))
    (tmp_path / "b.warc.gz").write_bytes(make_warc(shard_b))
    ds = read_warc([str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc.gz")])
    ds = add_extracted_text(ds, concurrency=(1, 2), batch_size=4)
    rows = sorted(ds.take_all(), key=lambda r: r["url"])
    assert [r["url"] for r in rows] == [r["url"] for r in recs]
    for row, rec in zip(rows, recs):
        assert row["html"] == rec["html"]
        assert row["ext_text"].startswith("doc ")
        assert "&" in row["ext_text"]  # entity decoded back to the literal
        assert row["warc_ts"] == rec["date"].replace(tzinfo=None)


def test_read_warc_on_corrupt_skip(ray_session, tmp_path):
    (tmp_path / "good.warc.gz").write_bytes(make_warc(_records(3)))
    (tmp_path / "bad.warc.gz").write_bytes(b"\x00\x01 not a warc at all")
    ds = read_warc(
        [str(tmp_path / "good.warc.gz"), str(tmp_path / "bad.warc.gz")],
        on_corrupt="skip",
    )
    assert ds.count() == 3
    with pytest.raises(ValueError):
        read_warc([str(tmp_path / "good.warc.gz")], on_corrupt="nope")


def test_warc_pages_validate_like_parquet_pages(ray_session, tmp_path):
    """End-to-end: WARC -> extract -> the JSON-payload validation kernel
    sees the same verdicts as the direct path (pages-schema parity)."""
    from medea_ray import compile_schema, validate

    schema = compile_schema("$schema $start\n    $type\n        $string\n")
    recs = _records(6)
    (tmp_path / "c.warc.gz").write_bytes(make_warc(recs))
    ds = add_extracted_text(read_warc([str(tmp_path / "c.warc.gz")]),
                            concurrency=(1, 2), batch_size=4)
    import json

    rows = ds.take_all()
    assert len(rows) == 6
    for row in rows:
        payload = json.dumps(row["ext_text"])
        vj = validate(schema, payload)  # raises MedeaValidationError if invalid
        assert "$start" in vj.valid_against()


# -- round-4 review regressions ----------------------------------------------


def test_gunzip_members_chunked_semantics():
    """_gunzip_members is chunk-fed (linear, never re-feeds the tail);
    semantics pinned at a tiny chunk so member boundaries straddle chunks:
    full decode == member concat, a corrupt member contributes nothing
    (complete prefix kept), a truncated final member keeps its decoded
    prefix."""
    import gzip
    import io

    from medea_ray.engine.warc import _gunzip_members

    def member(payload: bytes) -> bytes:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(payload)
        return buf.getvalue()

    payloads = [f"member-{i}-".encode() * (i % 7 + 1) for i in range(50)]
    members = [member(p) for p in payloads]
    stream = b"".join(members)
    for chunk in (16, 64, 1 << 20):
        assert _gunzip_members(stream, _chunk=chunk) == b"".join(payloads)

    # corrupt the deflate body of member 3: members 0-2 survive intact,
    # the corrupt member contributes nothing, the walk stops there
    bad = bytearray(stream)
    off = sum(len(m) for m in members[:3]) + 12
    bad[off] ^= 0xFF
    bad[off + 1] ^= 0xFF
    got = _gunzip_members(bytes(bad), _chunk=16)
    assert got.startswith(b"".join(payloads[:3]))
    assert b"member-4-" not in got

    # truncated final member: every complete member survives
    cut = stream[: sum(len(m) for m in members[:5]) + 10]
    got = _gunzip_members(cut, _chunk=16)
    assert got.startswith(b"".join(payloads[:5]))


def test_extract_text_cp1252_smart_quotes():
    # WHATWG: every latin-1 label decodes as windows-1252 — 0x93/0x94/0x97
    # are curly quotes and em-dash on the legacy web, not C1 controls
    for label in ("windows-1252", "iso-8859-1", "latin1"):
        raw = f'<meta charset="{label}"><p>\x93hi\x94 \x97 ok</p>'.encode("latin-1")
        assert extract_text(raw)["text"] == "“hi” — ok"


def test_n_links_excludes_skip_regions():
    html = (
        b'<noscript><a href="/x">fallback</a></noscript>'
        b'<script>var a = \'<a href="/y">\';</script>'
        b'<template><a href="/t"/></template>'
        b'<a href="/real">real</a>'
    )
    r = extract_text(html)
    assert r["n_links"] == 1
    assert r["text"] == "real"
