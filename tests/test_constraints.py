"""Key/FD discovery (engine/constraints.py): exact distinct-tuple
counts vs DuckDB, framing injectivity, prescreen soundness, batching
invariance."""

import duckdb
import pytest

from medea_ray.engine import constraints

SF = "/root/testdata/sf0.001"


def _read(table, cols):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/{table}.parquet", columns=cols)


def _duck_distinct(table, cols):
    expr = ", ".join(cols)
    (n,) = duckdb.sql(
        f"SELECT count(*) FROM (SELECT DISTINCT {expr} FROM '{SF}/{table}.parquet')"
    ).fetchone()
    return int(n)


def test_distinct_counts_vs_duckdb(ray_session):
    sets = [["o_orderstatus"], ["o_custkey"], ["o_orderkey"],
            ["o_orderstatus", "o_custkey"]]
    ds = _read("orders", ["o_orderkey", "o_custkey", "o_orderstatus"])
    got = constraints.distinct_counts(ds, sets)
    exp = [_duck_distinct("orders", cs) for cs in sets]
    assert got == exp


def test_distinct_counts_with_nulls_vs_duckdb(ray_session):
    # documents.n_chars is nullable; DISTINCT treats NULL as one value —
    # the same convention distinct_counts pins
    sets = [["lang"], ["n_chars"], ["lang", "n_chars"], ["source", "lang"]]
    ds = _read("documents", ["lang", "n_chars", "source"])
    got = constraints.distinct_counts(ds, sets)
    exp = [_duck_distinct("documents", cs) for cs in sets]
    assert got == exp


def test_framing_injective(ray_session):
    import ray.data as rd

    rows = [
        {"a": "x|y", "b": None},
        {"a": "x", "b": "y"},          # concat would collide with row 0
        {"a": "", "b": "xy"},
        {"a": None, "b": "N"},         # null vs the literal string "N"
        {"a": "N", "b": None},
        {"a": "V1:x", "b": ""},        # value that looks like a frame
        {"a": None, "b": None},
    ]
    ds = rd.from_items(rows)
    (n,) = constraints.distinct_counts(ds, [["a", "b"]])
    assert n == 7
    # and single columns: a has {x|y, x, "", None, N, V1:x} = 6
    assert constraints.distinct_counts(ds, [["a"]]) == [6]


def test_batching_invariance(ray_session):
    ds = _read("documents", ["lang", "source"])
    a = constraints.distinct_counts(ds, [["lang", "source"]], batch_size=7)
    b = constraints.distinct_counts(ds, [["lang", "source"]], batch_size=8192)
    assert a == b


def test_fd_holds_vs_duckdb(ray_session):
    ds = _read("orders", ["o_orderkey", "o_custkey", "o_orderstatus"])
    # orderkey is a key, so orderkey -> anything holds
    assert constraints.fd_holds(ds, ["o_orderkey"], ["o_custkey"]) is True
    # custkey does not determine orderkey (customers repeat)
    assert constraints.fd_holds(ds, ["o_custkey"], ["o_orderkey"]) is False
    # rhs subset of lhs is trivially true, no pass needed
    assert constraints.fd_holds(ds, ["o_custkey", "o_orderkey"], ["o_custkey"]) is True


def test_suggest_keys_exact_and_prescreen(ray_session):
    ds = _read("documents", ["doc_id", "lang", "source"])
    sets = [["doc_id"], ["lang"], ["source"], ["lang", "source"]]
    exact = constraints.suggest_keys(ds, sets)
    assert exact[("doc_id",)]["is_key"] is True
    assert exact[("lang",)]["is_key"] is False
    assert exact[("lang", "source")]["is_key"] is False
    # prescreen agrees on every verdict and screens the low-cardinality
    # singles without an exact count
    pre = constraints.suggest_keys(ds, sets, prescreen=True)
    for cs in sets:
        assert pre[tuple(cs)]["is_key"] == exact[tuple(cs)]["is_key"]
    assert pre[("lang",)]["screened"] is True
    assert pre[("lang",)]["distinct"] is None
    assert pre[("doc_id",)]["screened"] is False
    assert pre[("doc_id",)]["distinct"] == exact[("doc_id",)]["distinct"]


def test_discover_fds(ray_session):
    ds = _read("orders", ["o_orderkey", "o_custkey", "o_orderstatus"])
    fds = {(f["lhs"], f["rhs"]): f["holds"] for f in constraints.discover_fds(
        ds, ["o_orderkey", "o_custkey", "o_orderstatus"]
    )}
    assert len(fds) == 6  # every ordered pair
    assert fds[("o_orderkey", "o_custkey")] is True
    assert fds[("o_orderkey", "o_orderstatus")] is True
    assert fds[("o_custkey", "o_orderkey")] is False
    assert fds[("o_orderstatus", "o_orderkey")] is False
    # verify each verdict against DuckDB's definition directly
    for (lhs, rhs), holds in fds.items():
        exp = _duck_distinct("orders", [lhs]) == _duck_distinct("orders", [lhs, rhs])
        assert holds == exp, (lhs, rhs)


def test_empty_set_raises(ray_session):
    ds = _read("documents", ["lang"])
    with pytest.raises(ValueError, match="empty column set"):
        constraints.distinct_counts(ds, [[]])


def test_binary_column_distinct(ray_session):
    import ray.data as rd
    import pyarrow as pa

    t = pa.table({"b": pa.array([b"\x00", b"\x00", b"\x01", None], pa.binary())})
    ds = rd.from_arrow(t)
    assert constraints.distinct_counts(ds, [["b"]]) == [3]
