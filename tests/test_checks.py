"""Declarative check suite (engine/checks.py): verdict exactness vs
DuckDB-computed metrics, family pass sharing, suite ordering, and the
failure directions of every check kind."""

import duckdb
import numpy as np
import pytest

from medea_ray.engine import checks as ck

SF = "/root/testdata/sf0.001"


def _read(table, cols):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/{table}.parquet", columns=cols)


def test_stats_family_verdicts(ray_session):
    ds = _read("documents", ["doc_id", "n_chars", "lang"])
    (lo, hi, n) = duckdb.sql(
        f"SELECT min(n_chars), max(n_chars), count(*) FROM '{SF}/documents.parquet'"
    ).fetchone()
    out = ck.run_checks(
        ds,
        [
            ck.not_null("doc_id"),
            ck.in_range("n_chars", min=lo, max=hi),         # exact bounds -> pass
            ck.in_range("n_chars", max=hi - 1),             # just too tight -> fail
            ck.row_count(min_rows=n, max_rows=n),
            ck.row_count(max_rows=n - 1),                   # fail
        ],
    )
    assert list(out["passed"]) == [True, True, False, True, False]
    # suite order preserved
    assert list(out["check"])[0] == "not_null(doc_id)"


def test_not_null_fraction_exact(ray_session):
    import ray.data as rd

    ds = rd.from_items(
        [{"v": 1}] * 3 + [{"v": None}] * 2 + [{"v": 7}] * 5
    )
    out = ck.run_checks(
        ds,
        [
            ck.not_null("v"),                      # 0.2 null frac -> fail
            ck.not_null("v", max_null_frac=0.2),   # boundary -> pass
            ck.not_null("v", max_null_frac=0.19),  # just under -> fail
            ck.in_range("v", min=1, max=7),        # nulls ignored -> pass
        ],
    )
    assert list(out["passed"]) == [False, True, False, True]
    assert out.iloc[0]["value"] == pytest.approx(0.2)


def test_unique_family_vs_duckdb(ray_session):
    ds = _read("orders", ["o_orderkey", "o_custkey", "o_orderstatus"])
    (n,) = duckdb.sql(f"SELECT count(*) FROM '{SF}/orders.parquet'").fetchone()
    (d_cust,) = duckdb.sql(
        f"SELECT count(DISTINCT o_custkey) FROM '{SF}/orders.parquet'"
    ).fetchone()
    out = ck.run_checks(
        ds,
        [
            ck.unique("o_orderkey"),
            ck.unique("o_custkey"),
            ck.unique("o_custkey", "o_orderstatus"),
        ],
    )
    assert out.iloc[0]["passed"] and out.iloc[0]["value"] == 0
    assert not out.iloc[1]["passed"]
    assert out.iloc[1]["value"] == n - d_cust  # exact duplicate count


def test_accepted_values_vs_duckdb(ray_session):
    ds = _read("documents", ["lang"])
    langs = [r[0] for r in duckdb.sql(
        f"SELECT DISTINCT lang FROM '{SF}/documents.parquet' WHERE lang IS NOT NULL"
    ).fetchall()]
    (n_not_en_de,) = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/documents.parquet' "
        f"WHERE lang IS NOT NULL AND lang NOT IN ('en', 'de')"
    ).fetchone()
    out = ck.run_checks(
        ds,
        [
            ck.accepted_values("lang", langs),          # pass
            ck.accepted_values("lang", ["en", "de"]),   # fail, exact count
        ],
    )
    assert out.iloc[0]["passed"] and out.iloc[0]["value"] == 0
    assert not out.iloc[1]["passed"]
    assert out.iloc[1]["value"] == n_not_en_de


def test_referential_check(ray_session):
    orders = _read("orders", ["o_orderkey", "o_custkey"])
    customers = _read("customer", ["c_custkey"])
    out = ck.run_checks(
        orders,
        [ck.referential("o_custkey", customers, "c_custkey")],
    )
    assert out.iloc[0]["passed"] and out.iloc[0]["value"] == 0


def test_max_psi_directions(ray_session):
    from medea_ray.engine.queries import DRIFT_BINS

    ds = _read("events", ["ts", "value"])
    out = ck.run_checks(
        ds,
        [
            ck.max_psi("value", "ts", threshold=10.0, numeric_bins=DRIFT_BINS),
            ck.max_psi("value", "ts", threshold=-1.0, numeric_bins=DRIFT_BINS),
        ],
    )
    assert out.iloc[0]["passed"] is True or bool(out.iloc[0]["passed"])
    assert not out.iloc[1]["passed"]
    assert out.iloc[0]["value"] == out.iloc[1]["value"] >= 0.0


def test_matches_schema_fraction(ray_session):
    from medea_ray.engine.queries import _docs_with_payload
    from medea_ray.fixtures.gen import flagship_schema_text

    ds = _docs_with_payload(SF)
    out = ck.run_checks(
        ds,
        [
            ck.matches_schema("payload", flagship_schema_text(), "doc_id",
                              max_invalid_frac=0.06),
            ck.matches_schema("payload", flagship_schema_text(), "doc_id"),
        ],
    )
    # 5% seeded defects: 25 of 500
    assert out.iloc[0]["value"] == pytest.approx(0.05)
    assert out.iloc[0]["passed"] and not out.iloc[1]["passed"]


def test_constructor_validation(ray_session):
    with pytest.raises(ValueError):
        ck.in_range("x")
    with pytest.raises(ValueError):
        ck.unique()
    with pytest.raises(ValueError):
        ck.accepted_values("x", [])
    with pytest.raises(ValueError):
        ck.row_count()


def test_unknown_kind_raises(ray_session):
    ds = _read("documents", ["lang"])
    with pytest.raises(ValueError, match="unknown check kind"):
        ck.run_checks(ds, [ck.Check("bogus", "lang")])


def test_suite_columns_projection_set(ray_session):
    import ray.data as rd

    suite = [
        ck.not_null("url"),
        ck.in_range("n", min=0),
        ck.unique("url", "lang"),
        ck.accepted_values("lang", ["en"]),
        ck.row_count(min_rows=1),
        ck.max_psi("n", "ts", 0.2),
        ck.referential("cust", rd.from_items([{"pk": 1}]), "pk"),
    ]
    assert ck.suite_columns(suite) == ["cust", "lang", "n", "ts", "url"]
    # unknown kind → None (callers must read everything)
    assert ck.suite_columns([ck.Check("bogus", "x")]) is None
    # pure row_count suite touches no named columns
    assert ck.suite_columns([ck.row_count(min_rows=1)]) == []


def test_suggest_suite_passes_on_itself(ray_session):
    ds = _read("documents", ["doc_id", "lang", "n_chars", "source"])
    suite = ck.suggest_suite(ds, ["doc_id", "lang", "n_chars", "source"])
    names = {c.name for c in suite}
    assert "unique(doc_id)" in names
    assert "in_range(doc_id)" in names
    assert "accepted_values(lang)" in names  # low-cardinality string
    # source has 20 distinct values > the 16 enum cap: no value check
    assert "accepted_values(source)" not in names
    # the suggestion guarantee: every suggested check passes on the
    # data it was derived from
    out = ck.run_checks(_read("documents", ["doc_id", "lang", "n_chars", "source"]), suite)
    assert out["passed"].all(), out[~out["passed"]].to_string()


def test_suggest_suite_catches_drifted_data(ray_session):
    import ray.data as rd

    base = [{"id": i, "lang": ["en", "de"][i % 2], "score": 10 + i % 5}
            for i in range(50)]
    suite = ck.suggest_suite(rd.from_items(base), ["id", "lang", "score"])
    # tomorrow's partition: a dup id, a new lang, an out-of-range score
    drifted = base + [{"id": 0, "lang": "zz", "score": 99}]
    out = ck.run_checks(rd.from_items(drifted), suite)
    failed = set(out[~out["passed"]]["check"])
    assert "unique(id)" in failed
    assert "accepted_values(lang)" in failed
    assert "in_range(score)" in failed
    # and the unaffected checks still pass
    assert "not_null(id)" not in failed


def test_suggest_suite_range_slack(ray_session):
    import ray.data as rd

    base = [{"v": float(i)} for i in range(11)]  # 0..10
    suite = ck.suggest_suite(rd.from_items(base), ["v"], range_slack=0.1)
    rng = [c for c in suite if c.kind == "in_range"][0]
    assert rng.params == (-1.0, 11.0)  # widened by 10% of span each side


def test_suggest_suite_skips_nullable_not_null(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"v": 1}, {"v": None}, {"v": 3}])
    suite = ck.suggest_suite(ds, ["v"])
    kinds = {c.name for c in suite}
    assert "not_null(v)" not in kinds
    assert "in_range(v)" in kinds  # bounds from non-null values
    out = ck.run_checks(rd.from_items([{"v": 2}, {"v": None}]), suite)
    assert out["passed"].all()


def test_suggest_suite_drops_oversized_enum_values(ray_session):
    import ray.data as rd

    big = "x" * 4096
    ds = rd.from_items(
        [{"k": ["a", "b", big][i % 3], "ok": ["u", "v"][i % 2]} for i in range(30)]
    )
    suite = ck.suggest_suite(ds, ["k", "ok"])
    names = {c.name for c in suite}
    # k has only 3 distinct values but one is >128 bytes: no value check
    assert "accepted_values(k)" not in names
    assert "accepted_values(ok)" in names


def test_suggest_suite_empty_raises(ray_session):
    import ray.data as rd
    import pyarrow as pa

    ds = rd.from_arrow(pa.table({"v": pa.array([], pa.int64())}))
    with pytest.raises(ValueError, match="empty dataset"):
        ck.suggest_suite(ds, ["v"])


def test_max_psi_single_pass_memo(ray_session, monkeypatch):
    from medea_ray.engine import drift
    from medea_ray.engine.queries import DRIFT_BINS

    calls = []
    real = drift.drift_report

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(drift, "drift_report", counting)
    ds = _read("events", ["ts", "value"])
    out = ck.run_checks(
        ds,
        [
            ck.max_psi("value", "ts", threshold=10.0, numeric_bins=DRIFT_BINS),
            ck.max_psi("value", "ts", threshold=0.0, numeric_bins=DRIFT_BINS),
        ],
    )
    assert len(calls) == 1  # identical (col, ts, bins) -> one report
    assert out.iloc[0]["value"] == out.iloc[1]["value"]


def test_mixed_suite_order_and_shapes(ray_session):
    ds = _read("documents", ["doc_id", "lang", "n_chars"])
    suite = [
        ck.unique("doc_id"),
        ck.not_null("lang"),
        ck.row_count(min_rows=1),
        ck.accepted_values("lang", ["en", "de", "fr", "es", "hi", "zh"]),
    ]
    out = ck.run_checks(ds, suite)
    assert list(out["check"]) == [c.name for c in suite]
    assert set(out.columns) == {"check", "target", "metric", "value",
                                "threshold", "passed"}
