"""Referential-integrity checks: broadcast anti-join, with planted orphans
and the clean testdata FK."""

import duckdb
import pytest

from medea_ray.engine.referential import orphan_rows, referential_check

SF = "/root/testdata/sf0.001"


def test_clean_fk_vs_duckdb(ray_session):
    import ray.data as rd

    orders = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"])
    customer = rd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    r = referential_check(orders, "o_custkey", customer, "c_custkey")
    (exp,) = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/orders.parquet' "
        f"WHERE o_custkey NOT IN (SELECT c_custkey FROM '{SF}/customer.parquet')"
    ).fetchone()
    assert r["n_orphans"] == exp


def test_planted_orphans(ray_session):
    import ray.data as rd

    fact = rd.from_items(
        [{"fk": 1}, {"fk": 2}, {"fk": 99}, {"fk": None}, {"fk": 98}, {"fk": 1}]
    )
    dim = rd.from_items([{"pk": 1}, {"pk": 2}, {"pk": 3}])
    orphans = orphan_rows(fact, "fk", dim, "pk", concurrency=2).take_all()
    assert sorted(o["fk"] for o in orphans) == [98, 99]  # nulls are not orphans
    r = referential_check(fact, "fk", dim, "pk", concurrency=2)
    assert r["n_orphans"] == 2


def test_bucketed_fallback_matches_broadcast(ray_session):
    """A referenced side over the broadcast budget is checked in hash-bucket
    passes; the orphan count must equal the single-broadcast answer and the
    DuckDB oracle."""
    import ray.data as rd

    orders = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"])
    customer = rd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    (exp,) = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/orders.parquet' "
        f"WHERE o_custkey NOT IN (SELECT c_custkey FROM '{SF}/customer.parquet')"
    ).fetchone()
    # explicit buckets
    r = referential_check(orders, "o_custkey", customer, "c_custkey", n_buckets=3)
    assert r["n_orphans"] == exp
    # a budget below the keyset estimate forces n_buckets > 1 automatically
    n_keys = customer.count()
    r2 = referential_check(
        orders, "o_custkey", customer, "c_custkey",
        broadcast_budget_bytes=n_keys * 32 // 3 + 1,
    )
    assert r2["n_orphans"] == exp


def test_bucketed_planted_orphans_int_and_string(ray_session):
    import ray.data as rd

    fact = rd.from_items(
        [{"fk": 1}, {"fk": 2}, {"fk": 99}, {"fk": None}, {"fk": 98}, {"fk": 1}]
    )
    dim = rd.from_items([{"pk": 1}, {"pk": 2}, {"pk": 3}])
    got = orphan_rows(fact, "fk", dim, "pk", concurrency=2, n_buckets=4).take_all()
    assert sorted(o["fk"] for o in got) == [98, 99]

    sfact = rd.from_items(
        [{"fk": "a"}, {"fk": "b"}, {"fk": "zz"}, {"fk": None}, {"fk": "yy"}]
    )
    sdim = rd.from_items([{"pk": "a"}, {"pk": "b"}, {"pk": "c"}])
    got = orphan_rows(sfact, "fk", sdim, "pk", concurrency=2, n_buckets=4).take_all()
    assert sorted(o["fk"] for o in got) == ["yy", "zz"]
