"""URL parsing / canonicalization (engine/url.py)."""

import pyarrow as pa

from medea_ray.engine import url as U


def parse_one(u):
    return U.parse_urls(pa.array([u], pa.string())).to_pylist()[0]


def test_canonical_rules():
    r = parse_one("HTTP://User@Host.Example.COM.:80/p?b=2&a=1&a=0&#Frag")
    assert r["url_ok"]
    assert r["host"] == "host.example.com"
    assert r["canonical_url"] == "http://host.example.com/p?a=0&a=1&b=2"
    assert r["n_params"] == 3
    assert r["port"] == ""  # default port stripped

    r = parse_one("https://h.example.co.uk:443")
    assert r["canonical_url"] == "https://h.example.co.uk/"  # empty path -> /
    assert r["registrable_domain"] == "example.co.uk"

    r = parse_one("http://h.com:8443/x")
    assert r["port"] == "8443"
    assert r["canonical_url"] == "http://h.com:8443/x"

    # http with https's default port is NOT a default -> kept
    r = parse_one("http://h.com:443/x")
    assert r["canonical_url"] == "http://h.com:443/x"


def test_registrable_domain_heuristic():
    assert parse_one("http://a.b.c.example.com/")["registrable_domain"] == "example.com"
    assert parse_one("http://www.example.co.uk/")["registrable_domain"] == "example.co.uk"
    # 2-char TLD with a NON-registry second level: two labels only
    assert parse_one("http://sub.example.io/")["registrable_domain"] == "example.io"
    assert parse_one("http://localhost/")["registrable_domain"] == "localhost"


def test_invalid_and_null_urls():
    t = U.parse_urls(pa.array(["notaurl", None, "://nope", ""], pa.string()))
    assert t.column("url_ok").to_pylist() == [False] * 4
    assert t.column("canonical_url").to_pylist() == [None] * 4


def test_query_sort_is_bytewise_and_duplicate_preserving():
    r = parse_one("http://h.com/?z=1&a=2&a=2&A=3")
    # bytewise: 'A' (0x41) < 'a' (0x61); duplicates kept
    assert r["canonical_url"] == "http://h.com/?A=3&a=2&a=2&z=1"
    assert r["n_params"] == 4


def test_add_url_columns_distributed(ray_session):
    import ray.data as rd

    urls = [f"HTTPS://Host{i % 3}.Example.COM:443/p/{i}#x" for i in range(200)]
    ds = rd.from_arrow(
        pa.table({"id": list(range(200)), "url": urls})
    ).repartition(5)
    out = U.add_url_columns(ds, "url").to_pandas().sort_values("id")
    assert out["url_ok"].all()
    assert (
        out["canonical_url"]
        == [f"https://host{i % 3}.example.com/p/{i}" for i in range(200)]
    ).all()
    assert (out["registrable_domain"] == "example.com").all()
