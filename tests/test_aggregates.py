"""Stats sketches, uniqueness, and drift vs exact oracles (duckdb / numpy)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from medea_ray.engine.drift import drift_report, ks_binned, psi
from medea_ray.engine.stats import (
    HLL,
    TDigest,
    approx_distinct,
    column_stats,
    hash_column,
    quantiles,
)
from medea_ray.engine.uniqueness import (
    duplicates,
    duplicates_hashed,
    group_count,
    salted_group_count,
)
from medea_ray.fixtures.gen import write_pages

N_ROWS = 4000


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("agg_pages")
    write_pages(str(d), N_ROWS, rows_per_file=1000)
    return str(d)


@pytest.fixture(scope="module")
def pages_ds(ray_session, pages_dir):
    import ray.data as rd

    return rd.read_parquet(pages_dir)


def _duck(pages_dir, sql):
    return duckdb.sql(
        sql.replace("PAGES", f"read_parquet('{pages_dir}/*.parquet')")
    ).fetchall()


# -- unit-level sketch checks ----------------------------------------------


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(0)
    values = rng.integers(0, 50_000, size=200_000)
    true = len(np.unique(values))
    import pandas as pd

    h_all = HLL()
    h_all.add_hashes(pd.util.hash_array(values))
    assert abs(h_all.estimate() - true) / true < 0.03

    # merge of shards == single sketch (register-max is exact)
    parts = np.array_split(values, 7)
    merged = HLL()
    for p in parts:
        h = HLL()
        h.add_hashes(pd.util.hash_array(p))
        merged.merge(h)
    assert merged.estimate() == h_all.estimate()


def test_tdigest_accuracy_and_merge():
    rng = np.random.default_rng(1)
    values = np.concatenate([rng.lognormal(3, 1, 100_000), rng.normal(500, 5, 10_000)])
    td = TDigest()
    for chunk in np.array_split(values, 13):
        td.add(chunk)
    for q in (0.05, 0.5, 0.95, 0.99):
        exact = np.quantile(values, q)
        got = td.quantile(q)
        assert abs(got - exact) / max(abs(exact), 1) < 0.03, (q, got, exact)

    shards = [TDigest() for _ in range(4)]
    for i, chunk in enumerate(np.array_split(values, 4)):
        shards[i].add(chunk)
    merged = shards[0]
    for s in shards[1:]:
        merged.merge(s)
    assert abs(merged.quantile(0.5) - np.quantile(values, 0.5)) / np.quantile(values, 0.5) < 0.03


def test_psi_ks_closed_form():
    a = {"x": 500, "y": 500}
    assert psi(a, a) == pytest.approx(0.0)
    b = {"x": 900, "y": 100}
    # closed form: (0.9-0.5)ln(0.9/0.5) + (0.1-0.5)ln(0.1/0.5)
    assert psi(a, b) == pytest.approx(0.4 * np.log(1.8) - 0.4 * np.log(0.2), rel=1e-9)
    r = {"0": 10, "1": 10, "2": 10}
    c = {"0": 30, "1": 0, "2": 0}
    assert ks_binned(r, c) == pytest.approx(2 / 3)


# -- dataset-level aggregates vs duckdb ------------------------------------


def test_column_stats_vs_duckdb(pages_ds, pages_dir):
    stats = column_stats(pages_ds, ["lang", "text"])
    (n, n_lang_null, n_text_null) = _duck(
        pages_dir,
        "SELECT count(*), sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END),"
        " sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) FROM PAGES",
    )[0]
    assert stats["lang"]["n"] == n == N_ROWS
    assert stats["lang"]["n_null"] == n_lang_null
    assert stats["text"]["n_null"] == n_text_null
    assert stats["lang"]["min"] == "de" and stats["lang"]["max"] == "zh"


def test_hll_vs_exact(pages_ds, pages_dir):
    est = approx_distinct(pages_ds, "url")
    (true,) = _duck(pages_dir, "SELECT count(DISTINCT url) FROM PAGES")[0]
    assert abs(est - true) / true < 0.05


def test_tdigest_vs_duckdb(pages_ds, pages_dir):
    import pyarrow.compute as pc

    lens = pages_ds.map_batches(
        lambda t: t.append_column("text_len", pc.utf8_length(pc.fill_null(t.column("text"), ""))),
        batch_format="pyarrow",
    )
    qs = quantiles(lens, "text_len", (0.5, 0.95))
    rows = _duck(
        pages_dir,
        "SELECT quantile_cont(length(coalesce(text,'')), 0.5),"
        " quantile_cont(length(coalesce(text,'')), 0.95) FROM PAGES",
    )[0]
    assert abs(qs["p50"] - rows[0]) / rows[0] < 0.05
    assert abs(qs["p95"] - rows[1]) / rows[1] < 0.05


def test_duplicates_vs_duckdb(pages_ds, pages_dir):
    got = {r["url"]: r["n"] for r in duplicates(pages_ds, "url").take_all()}
    exp = dict(
        _duck(pages_dir, "SELECT url, count(*) FROM PAGES GROUP BY url HAVING count(*)>1")
    )
    assert got == exp
    assert len(got) > 0  # generator plants 1% duplicates

    salted = {r["url"]: r["n"] for r in salted_group_count(pages_ds, "url").take_all()}
    full = dict(_duck(pages_dir, "SELECT url, count(*) FROM PAGES GROUP BY url"))
    assert salted == full


def test_duplicates_hashed_matches_string_shuffle(pages_ds, pages_dir):
    got = {r["url"]: r["n"] for r in duplicates_hashed(pages_ds, "url").take_all()}
    exp = dict(
        _duck(pages_dir, "SELECT url, count(*) FROM PAGES GROUP BY url HAVING count(*)>1")
    )
    assert got == exp
    assert len(got) > 0


def test_duplicates_hashed_filters_collision_false_positives(pages_ds, pages_dir):
    # A deliberately coarse 8-bucket hash makes every digest collide with
    # ~N/8 other keys: phase 2 emits a huge candidate set full of false
    # positives, and the phase-3 exact per-key recount must still produce
    # exactly the true duplicate set.
    import polars as pl

    def coarse(col):
        return pl.from_arrow(pa.table({"k": col}))["k"].hash(seed=0).to_numpy() % 8

    got = {
        r["url"]: r["n"]
        for r in duplicates_hashed(pages_ds, "url", _hash_fn=coarse).take_all()
    }
    exp = dict(
        _duck(pages_dir, "SELECT url, count(*) FROM PAGES GROUP BY url HAVING count(*)>1")
    )
    assert got == exp


def test_duplicates_hashed_empty_and_budget_fallback(ray_session):
    import ray.data as rd

    # no duplicates at all -> typed empty (key, n) result
    ds = rd.from_arrow(pa.table({"k": [f"u{i}" for i in range(100)]}))
    out = duplicates_hashed(ds, "k")
    assert out.count() == 0
    assert set(out.schema().names) == {"k", "n"}

    # candidate set over budget -> falls back to the exact string shuffle
    dup = rd.from_arrow(pa.table({"k": ["a", "a", "b", "b", "c"]}))
    got = {r["k"]: r["n"] for r in duplicates_hashed(dup, "k", candidate_budget=1).take_all()}
    assert got == {"a": 2, "b": 2}


def test_duplicates_hashed_int_and_null_keys(ray_session):
    import ray.data as rd

    # non-string keys hash fine; null keys all share one digest and come
    # out as one group, matching the string-shuffle path
    t = pa.table({"k": pa.array([7, 7, None, None, 3, 8], pa.int64())})
    ds = rd.from_arrow(t)
    got = {r["k"]: r["n"] for r in duplicates_hashed(ds, "k").take_all()}
    exp = {r["k"]: r["n"] for r in duplicates(ds, "k").take_all()}
    assert got == exp == {7: 2, None: 2}


def test_group_count_total(pages_ds):
    total = sum(r["n"] for r in group_count(pages_ds, "lang").take_all())
    # nulls are dropped by the in-batch group_by? No: Arrow group_by keeps
    # null groups — total must cover every row.
    assert total == N_ROWS


def test_drift_detects_day7(pages_ds):
    rep = drift_report(pages_ds, "lang")
    assert len(rep) == 8
    by_bucket = {r["bucket"]: r for r in rep}
    drifted = by_bucket["2024-01-08"]  # day index 7
    others = [r for b, r in by_bucket.items() if b not in ("2024-01-01", "2024-01-08")]
    assert drifted["psi"] > 0.25
    assert all(r["psi"] < 0.1 for r in others)


def test_numeric_drift_text_len(pages_ds):
    import pyarrow.compute as pc

    lens = pages_ds.map_batches(
        lambda t: t.select(["warc_ts"]).append_column(
            "text_len", pc.utf8_length(pc.fill_null(t.column("text"), ""))
        ),
        batch_format="pyarrow",
    )
    bins = np.array([0, 50, 100, 150, 200, 300, 400, 600, 900, 1500, 2500])
    rep = drift_report(lens, "text_len", numeric_bins=bins)
    by_bucket = {r["bucket"]: r for r in rep}
    assert by_bucket["2024-01-08"]["ks"] > 0.3
    # non-drifted days differ only by sampling noise (~500 rows/day here)
    assert all(
        r["ks"] < 0.12
        for b, r in by_bucket.items()
        if b not in ("2024-01-01", "2024-01-08")
    )


def test_salted_count_on_skewed_hosts(pages_ds, pages_dir):
    # the generator's Zipf(1.2) hosts make host0 a genuinely hot key
    # (~15-20% of all rows) — the salted 3-stage plan must still produce
    # exact counts (FP-Hadoop-style partial/final split, PAPERS.md)
    import pyarrow as pa
    import pyarrow.compute as pc

    def add_host(t: pa.Table) -> pa.Table:
        host = pc.extract_regex(t.column("url"), r"https://(?P<host>[^/]+)/")
        return pa.table({"host": pc.struct_field(host, "host")})

    hosts = pages_ds.map_batches(add_host, batch_format="pyarrow")
    got = {r["host"]: r["n"] for r in salted_group_count(hosts, "host", n_salts=8).take_all()}
    exp = dict(
        _duck(
            pages_dir,
            "SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS host, count(*) FROM PAGES GROUP BY 1",
        )
    )
    assert got == exp
    # skew really is present: the hottest host dominates
    assert max(exp.values()) > 10 * sorted(exp.values())[len(exp) // 2]


def test_empty_dataset_edges(ray_session):
    # empty inputs must yield empty-but-well-formed results, not crashes
    import ray.data as rd

    from medea_ray.engine.stats import sketch_summary
    from medea_ray.engine.drift import drift_report

    empty = rd.from_items([{"warc_ts": None, "v": 1.0}]).filter(lambda r: False)
    assert sketch_summary(empty, stats_cols=["v"]) in ({}, {"v": {"n": 0, "n_null": 0, "min": None, "max": None, "sum": 0.0}})
    assert drift_report(empty, "v", ts_col="warc_ts") == []


def test_sketch_summary_single_pass_combined(pages_ds):
    from medea_ray.engine.stats import sketch_summary

    s = sketch_summary(
        pages_ds, stats_cols=["lang"], hll_cols=["url"], tdigest_cols=[]
    )
    assert s["lang"]["n"] == N_ROWS
    assert s["url"]["approx_distinct"] > 0.9 * N_ROWS * 0.98


def test_union_then_groupby(ray_session, pages_dir):
    # union of two dataset slices flows through the same aggregate engine
    import ray.data as rd

    a = rd.read_parquet(pages_dir, columns=["lang"]).limit(1000)
    b = rd.read_parquet(pages_dir, columns=["lang"]).limit(1000)
    u = a.union(b)
    total = sum(r["n"] for r in group_count(u, "lang").take_all())
    assert total == 2000


# -- grouped sketches (stats.grouped_sketch_summary) -------------------------


def test_grouped_sketch_matches_per_group_exact(ray_session):
    import numpy as np
    import ray.data as rd

    from medea_ray.engine.stats import grouped_sketch_summary

    rng = np.random.default_rng(7)
    items = [
        {"g": ["a", "b", "c"][i % 3], "x": float(rng.normal(100 * (i % 3 + 1), 10))}
        for i in range(6000)
    ]
    ds = rd.from_items(items, override_num_blocks=8)  # multi-block: merge path
    out = grouped_sketch_summary(
        ds, "g", stats_cols=["x"], tdigest_cols=["x"], quantile_qs=(0.5,)
    )
    assert set(out) == {"a", "b", "c"}
    for g in "abc":
        vals = np.array([r["x"] for r in items if r["g"] == g])
        assert out[g]["x"]["n"] == len(vals)
        assert out[g]["x"]["min"] == vals.min()
        assert abs(out[g]["x"]["p50"] - np.quantile(vals, 0.5)) < 0.05 * abs(
            np.quantile(vals, 0.5)
        ) + 2


def test_grouped_sketch_drops_null_groups(ray_session):
    import ray.data as rd

    from medea_ray.engine.stats import grouped_sketch_summary

    ds = rd.from_items([{"g": "a", "x": 1.0}, {"g": None, "x": 2.0}])
    out = grouped_sketch_summary(ds, "g", stats_cols=["x"])
    assert set(out) == {"a"}
    assert out["a"]["x"]["n"] == 1


def test_drift_drops_null_timestamps(ray_session):
    """Rows with a null warc_ts have no partition: they are dropped, never
    turned into a None bucket key that breaks the driver-side sort."""
    import ray.data as rd

    from datetime import datetime

    rows = []
    for d in (1, 2):
        for i in range(20):
            rows.append({"warc_ts": datetime(2024, 1, d), "lang": "en" if i % 2 else "de"})
    rows.append({"warc_ts": None, "lang": "zz"})
    rep = drift_report(rd.from_items(rows), "lang")
    assert [r["bucket"] for r in rep] == ["2024-01-01", "2024-01-02"]
    assert all(r["n"] == 20 for r in rep)


def test_salted_count_correct_on_key_sorted_input(ray_session):
    """Key-sorted input (the case where a positional salt degenerates —
    the hot key leads every batch): counts must still be exact."""
    import ray.data as rd

    rows = [{"k": "hot"}] * 500 + [{"k": f"cold{i}"} for i in range(50)]
    ds = rd.from_items(rows).repartition(10)
    got = {r["k"]: r["n"] for r in salted_group_count(ds, "k", n_salts=8,
                                                      batch_size=32).take_all()}
    assert got["hot"] == 500
    assert all(got[f"cold{i}"] == 1 for i in range(50))


def test_hll_rank_exact_vs_bit_length():
    """The vectorized leading-zero count must be bit-identical to the
    definitional bit_length loop, including the half-ulp-below-power-of-two
    band where float64 log2 rounds the rank off by one."""
    import numpy as np

    p = 14
    rng = np.random.default_rng(1)
    h = rng.integers(0, 2**64, 50000, dtype=np.uint64)
    adv = (np.arange(1, 500, dtype=np.uint64) << np.uint64(p)) ^ np.uint64(2**64 - 512)
    h = np.concatenate([h, adv])
    sk = HLL(p)
    sk.add_hashes(h)
    regs = np.zeros(1 << p, np.uint8)
    for x in h.tolist():
        idx = x >> (64 - p)
        rest = ((x << p) & (2**64 - 1)) | (1 << (p - 1))
        regs[idx] = max(regs[idx], 64 - rest.bit_length() + 1)
    assert np.array_equal(sk.registers, regs)


def test_sketch_summary_empty_dataset(ray_session):
    """Empty input → zeroed summary (n=0, approx_distinct=0, NaN
    quantiles), not a KeyError."""
    import math

    import ray.data as rd

    from medea_ray.engine.stats import approx_distinct, column_stats, sketch_summary

    ds = rd.range(10).filter(expr="id > 100")
    s = sketch_summary(ds, stats_cols=["id"], hll_cols=["id"], tdigest_cols=["id"])
    assert s["id"]["n"] == 0 and s["id"]["min"] is None
    assert s["id"]["approx_distinct"] == 0.0
    assert math.isnan(s["id"]["p50"])
    assert approx_distinct(ds, "id") == 0.0
    assert column_stats(ds, ["id"])["id"]["n"] == 0


def test_stats_integer_sums_exact_past_2_53(ray_session):
    """Integer sums accumulate as Python ints — totals beyond float64's
    2^53 integer range must stay exact (DuckDB HUGEINT SUM parity)."""
    import ray.data as rd

    from medea_ray.engine.stats import column_stats

    big = (1 << 60) + 1
    ds = rd.from_items([{"v": big}] * 9).repartition(3)
    got = column_stats(ds, ["v"])["v"]["sum"]
    assert isinstance(got, int)
    assert got == 9 * big  # float accumulation would drop the +1s


def test_hll_guard_exchange_carries_digests_only(ray_session):
    """VERDICT r03 item 2: hll_distinct_guard's exact side must never ship
    the text column through the groupby exchange — the map-side projection
    reduces rows to md5 digests before the shuffle, and its COUNT matches
    the exact distinct count."""
    import ray.data as rd

    from medea_ray.engine.queries import _text_digests_only

    ds = rd.from_items(
        [{"text": t} for t in ["a", "b", "a", None, "c", "b", "d"]]
    ).repartition(3)
    digests = _text_digests_only(ds)
    # the ONLY column entering the exchange is the 16-byte digest
    assert digests.schema().names == ["content_md5"]
    assert group_count(digests, "content_md5").count() == 4


def test_sketch_summary_tree_combine_exact(ray_session):
    """VERDICT r03 item 4: with >max_driver_states partials the map_batches
    tree-combine must engage (fan-in merge levels) and produce the same
    exact stats / HLL estimate as the flat driver merge — basic stats and
    HLL merges are associative+commutative, so the fan-in grouping cannot
    change them."""
    import numpy as np
    import ray.data as rd

    from medea_ray.engine.stats import sketch_summary

    n = 4096
    vals = np.arange(n, dtype=np.int64)
    ds = rd.from_items([{"v": int(x)} for x in vals]).repartition(1024)
    # batch_size=4 -> ~1024 partial states, far above max_driver_states=8:
    # forces at least two 16-way merge levels
    tree = sketch_summary(
        ds, stats_cols=["v"], hll_cols=["v"], tdigest_cols=["v"],
        batch_size=4, combine_fanin=16, max_driver_states=8,
    )
    flat = sketch_summary(
        ds, stats_cols=["v"], hll_cols=["v"], tdigest_cols=["v"],
        batch_size=4, max_driver_states=1 << 30,
    )
    assert tree["v"]["n"] == flat["v"]["n"] == n
    assert tree["v"]["min"] == 0 and tree["v"]["max"] == n - 1
    assert tree["v"]["sum"] == flat["v"]["sum"] == int(vals.sum())
    # HLL register-max merge is order-free: estimates must match exactly
    assert tree["v"]["approx_distinct"] == flat["v"]["approx_distinct"]
    # t-digest is approximate; the tree must stay within its usual tolerance
    assert abs(tree["v"]["p50"] - n / 2) <= 0.02 * n


# -- Misra-Gries heavy hitters (E6c) -----------------------------------------


def _zipf_values(n, n_distinct, seed):
    rng = np.random.default_rng(seed)
    w = 1.0 / np.arange(1, n_distinct + 1) ** 1.3
    return rng.choice(
        [f"v{i:04d}" for i in range(n_distinct)], size=n, p=w / w.sum()
    )


def test_misra_gries_exact_when_small():
    from collections import Counter

    from medea_ray.engine.stats import MisraGries

    vals = _zipf_values(5000, 40, 1)
    mg = MisraGries(64)  # distinct <= k: no trim ever fires
    for chunk in np.array_split(vals, 7):
        mg.add_counts(dict(Counter(chunk.tolist())))
    assert mg.err == 0 and mg.n == 5000
    assert dict(mg.items()) == dict(Counter(vals.tolist()))


def test_misra_gries_bounds_and_coverage():
    from collections import Counter

    from medea_ray.engine.stats import MisraGries

    vals = _zipf_values(40000, 1000, 2)
    exact = Counter(vals.tolist())
    mg = MisraGries(32)
    for chunk in np.array_split(vals, 13):
        mg.add_counts(dict(Counter(chunk.tolist())))
    assert mg.n == 40000
    assert mg.err <= mg.n // 33  # err <= n/(k+1)
    for v, est in mg.items():
        assert exact[v] - mg.err <= est <= exact[v]
    # anything heavier than err must survive the trims
    kept = dict(mg.items())
    for v, c in exact.items():
        if c > mg.err:
            assert v in kept, (v, c, mg.err)


def test_misra_gries_merge_preserves_bounds():
    from collections import Counter

    from medea_ray.engine.stats import MisraGries

    vals = _zipf_values(30000, 500, 3)
    exact = Counter(vals.tolist())
    parts = []
    for chunk in np.array_split(vals, 10):
        mg = MisraGries(32)
        mg.add_counts(dict(Counter(chunk.tolist())))
        parts.append(mg)
    acc = parts[0]
    for p in parts[1:]:
        acc.merge(p)
    assert acc.n == 30000
    assert acc.err <= acc.n // 33
    for v, est in acc.items():
        assert exact[v] - acc.err <= est <= exact[v]
    with pytest.raises(ValueError):
        acc.merge(MisraGries(16))


def test_heavy_hitters_distributed_vs_exact(ray_session):
    import ray.data as rd
    from collections import Counter

    from medea_ray.engine.stats import heavy_hitters

    vals = _zipf_values(60000, 800, 4)
    exact = Counter(vals.tolist())
    ds = rd.from_arrow(pa.table({"v": pa.array(vals)})).repartition(8)
    sk = heavy_hitters(ds, "v", k=48, batch_size=4096, max_driver_states=4)
    assert sk["n"] == 60000
    assert sk["err"] <= sk["n"] // 49
    est = dict(sk["items"])
    assert len(est) <= 48
    for v, e in est.items():
        assert exact[v] - sk["err"] <= e <= exact[v]
    for v, c in exact.items():
        if c > sk["err"]:
            assert v in est


def test_heavy_hitters_empty_and_nulls(ray_session):
    import ray.data as rd

    from medea_ray.engine.stats import heavy_hitters

    empty = rd.from_arrow(pa.table({"v": pa.array([], pa.string())}))
    sk = heavy_hitters(empty, "v", k=8)
    assert sk["items"] == [] and sk["n"] == 0 and sk["err"] == 0
    withnull = rd.from_arrow(
        pa.table({"v": pa.array(["a", None, "a", "b", None])})
    )
    sk = heavy_hitters(withnull, "v", k=8)
    assert dict(sk["items"]) == {"a": 2, "b": 1}
    assert sk["n"] == 3  # nulls are absence, not weight
