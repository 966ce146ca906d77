"""Broadcast lookup-join operator: left/inner semantics, null FKs,
duplicate-key resolution, chained joins vs the DuckDB oracle."""

import duckdb
import pytest

from medea_ray.engine.join import broadcast_join

SF = "/root/testdata/sf0.001"


def test_left_join_semantics(ray_session):
    import ray.data as rd

    fact = rd.from_items(
        [{"fk": 1, "x": 10}, {"fk": 2, "x": 20}, {"fk": 9, "x": 90}, {"fk": None, "x": 0}]
    )
    dim = rd.from_items([{"pk": 1, "name": "a"}, {"pk": 2, "name": "b"}])
    out = sorted(
        broadcast_join(fact, "fk", dim, "pk", ["name"], concurrency=2).take_all(),
        key=lambda r: r["x"],
    )
    assert [r["name"] for r in out] == [None, "a", "b", None]  # x=0,10,20,90
    assert len(out) == 4  # left keeps unmatched + null FK rows


def test_inner_join_drops_unmatched(ray_session):
    import ray.data as rd

    fact = rd.from_items([{"fk": 1}, {"fk": 9}, {"fk": None}])
    dim = rd.from_items([{"pk": 1, "name": "a"}])
    out = broadcast_join(fact, "fk", dim, "pk", ["name"], how="inner", concurrency=2).take_all()
    assert [(r["fk"], r["name"]) for r in out] == [(1, "a")]


def test_duplicate_dim_keys_first_wins(ray_session):
    import ray.data as rd

    fact = rd.from_items([{"fk": 1}])
    dim = rd.from_items([{"pk": 1, "name": "first"}, {"pk": 1, "name": "second"}])
    out = broadcast_join(fact, "fk", dim, "pk", ["name"], concurrency=2).take_all()
    assert out[0]["name"] == "first"


def test_name_collision_gets_suffix(ray_session):
    import ray.data as rd

    fact = rd.from_items([{"fk": 1, "name": "fact-name"}])
    dim = rd.from_items([{"pk": 1, "name": "dim-name"}])
    out = broadcast_join(fact, "fk", dim, "pk", ["name"], concurrency=2).take_all()
    assert out[0]["name"] == "fact-name"
    assert out[0]["name_dim"] == "dim-name"


def test_null_dim_key_never_matches(ray_session):
    """SQL join semantics: a null FK matches nothing, even when the
    dimension side contains a null key row."""
    import ray.data as rd

    fact = rd.from_items([{"fk": None, "x": 1}, {"fk": 1, "x": 2}])
    dim = rd.from_items([{"pk": None, "name": "junk"}, {"pk": 1, "name": "a"}])
    left = sorted(
        broadcast_join(fact, "fk", dim, "pk", ["name"], concurrency=2).take_all(),
        key=lambda r: r["x"],
    )
    assert [r["name"] for r in left] == [None, "a"]
    inner = broadcast_join(
        fact, "fk", dim, "pk", ["name"], how="inner", concurrency=2
    ).take_all()
    assert [(r["fk"], r["name"]) for r in inner] == [(1, "a")]


def test_empty_dim_raises(ray_session):
    import ray.data as rd

    fact = rd.from_items([{"fk": 1}])
    dim = rd.from_items([{"pk": 1}]).filter(lambda r: False)
    with pytest.raises(ValueError, match="dimension side is empty"):
        broadcast_join(fact, "fk", dim, "pk", [], concurrency=2)


def test_chained_joins_vs_duckdb(ray_session):
    from medea_ray.engine.queries import orders_by_nation

    got = {
        (r["n_name"], r["n"], r["sum_cents"]) for r in orders_by_nation(SF).take_all()
    }
    exp = set(
        duckdb.sql(
            f"""SELECT n.n_name, count(*),
                       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                FROM '{SF}/orders.parquet' o
                JOIN '{SF}/customer.parquet' c ON o.o_custkey = c.c_custkey
                JOIN '{SF}/nation.parquet' n ON c.c_nationkey = n.n_nationkey
                GROUP BY n.n_name"""
        ).fetchall()
    )
    assert got == exp


# -- shuffle_join (large×large, Ray native hash join) ------------------------


def _sj(l_items, r_items, join_type, **kw):
    import ray.data as rd

    from medea_ray.engine.join import shuffle_join

    return shuffle_join(
        rd.from_items(l_items), rd.from_items(r_items),
        on="k", join_type=join_type, num_partitions=4, **kw
    ).take_all()


def test_shuffle_join_inner_null_keys_never_match(ray_session):
    out = _sj(
        [{"k": 1, "a": 10}, {"k": None, "a": 30}],
        [{"k": 1, "b": 100}, {"k": 1, "b": 101}, {"k": None, "b": 400}],
        "inner",
    )
    assert sorted((r["k"], r["a"], r["b"]) for r in out) == [(1, 10, 100), (1, 10, 101)]


def test_shuffle_join_anti_is_not_exists(ray_session):
    # NOT EXISTS semantics: a null-key left row has no match, so it STAYS
    out = _sj(
        [{"k": 1, "a": 1}, {"k": 2, "a": 2}, {"k": None, "a": 3}],
        [{"k": 1, "b": 9}],
        "left_anti",
    )
    assert sorted((r["k"] or 0, r["a"]) for r in out) == [(0, 3), (2, 2)]


def test_shuffle_join_semi_no_duplication(ray_session):
    out = _sj(
        [{"k": 1, "a": 1}],
        [{"k": 1, "b": 9}, {"k": 1, "b": 10}],
        "left_semi",
    )
    assert [(r["k"], r["a"]) for r in out] == [(1, 1)]


def test_shuffle_join_invalid_type_raises(ray_session):
    import ray.data as rd

    from medea_ray.engine.join import shuffle_join

    with pytest.raises(ValueError, match="join_type"):
        shuffle_join(rd.from_items([{"k": 1}]), rd.from_items([{"k": 1}]),
                     on="k", join_type="cross")


def test_shuffle_join_vs_duckdb(ray_session):
    from medea_ray.engine.queries import orders_lineitem_join

    got = orders_lineitem_join(SF).to_pandas()
    exp = duckdb.sql(
        f"""SELECT o.o_orderkey, o.o_custkey, l.l_linenumber, l.l_quantity
            FROM '{SF}/orders.parquet' o
            JOIN '{SF}/lineitem.parquet' l ON o.o_orderkey = l.l_orderkey"""
    ).df()
    # (o_orderkey, l_linenumber) is NOT unique in the synthetic testdata:
    # sort by every column, like the driver's canonicalization
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    exp = exp[cols].sort_values(cols).reset_index(drop=True)
    assert got.shape == exp.shape
    assert (got.to_numpy() == exp.to_numpy()).all()


# -- salted (skew-resistant) join ---------------------------------------------


def _skewed_sides():
    import ray.data as rd

    # hot key 1: 4000 left rows; keys 2..21: 50 rows each
    left = rd.from_items(
        [{"k": 1, "lv": i} for i in range(4000)]
        + [{"k": 2 + (i % 20), "lv": 10_000 + i} for i in range(1000)]
        + [{"k": 999, "lv": -1}, {"k": None, "lv": -2}]  # unmatched + null key
    )
    right = rd.from_items(
        [{"k": k, "rv": k * 100 + j} for k in range(1, 22) for j in range(2)]
    )
    return left, right


def _pairs(ds, cols):
    rows = [tuple(r[c] for c in cols) for r in ds.take_all()]
    return sorted(rows, key=lambda t: tuple((v is None, v or 0) for v in t))


def test_salted_join_matches_unsalted(ray_session):
    from medea_ray.engine.join import salted_join, shuffle_join

    left, right = _skewed_sides()
    for jt in ("inner", "left_outer", "left_semi", "left_anti"):
        exp = _pairs(shuffle_join(left, right, on="k", join_type=jt, num_partitions=8),
                     ["k", "lv"])
        got = _pairs(salted_join(left, right, on="k", n_salts=8, join_type=jt,
                                 num_partitions=8), ["k", "lv"])
        assert got == exp, jt


def test_salted_join_spreads_hot_key(ray_session):
    """The salted key space splits the planted hot key's rows ~evenly: no
    (key, salt) partition holds much more than |L_hot| / n_salts — the
    bounded per-partition peak the docstring promises. Uses the real
    _SaltLeft stage (per-actor running offset; a per-batch restart at salt
    0 measured 1.6× skew on small blocks)."""
    from medea_ray.engine.join import SALT_COL, _SaltLeft

    left, _ = _skewed_sides()
    n_salts = 8
    salted = left.map_batches(
        _SaltLeft, fn_constructor_kwargs=dict(n_salts=n_salts),
        batch_format="pyarrow", concurrency=2, num_cpus=1,
    )
    counts = {}
    for r in salted.take_all():
        if r["k"] == 1:
            counts[r[SALT_COL]] = counts.get(r[SALT_COL], 0) + 1
    assert len(counts) == n_salts
    # 2 actors, each stream balanced to within 1 round of n_salts
    assert max(counts.values()) <= (4000 // n_salts) + 2 * n_salts


def test_salted_join_rejects_right_preserving_types(ray_session):
    from medea_ray.engine.join import salted_join

    left, right = _skewed_sides()
    for jt in ("right_outer", "full_outer", "right_semi", "right_anti"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(left, right, on="k", join_type=jt)
    with pytest.raises(ValueError, match="n_salts"):
        salted_join(left, right, on="k", n_salts=1)


# ---------------------------------------------------------------------------
# range_join: banded large×large interval join


def _range_pairs(out_ds, id_col="id", label_col="bucket"):
    return sorted((r[id_col], r[label_col]) for r in out_ds.take_all())


@pytest.mark.parametrize("band_width,seed", [
    (4.0, 7),      # intervals span several bands (the intended regime)
    (0.7, 11),     # pathological: heavy replication, dozens of bands/interval
    (1000.0, 13),  # pathological: everything lands in 1-2 bands (near-cartesian)
    (37.3, 17),    # non-round width, bounds never align with band edges
])
def test_range_join_matches_bruteforce(ray_session, band_width, seed):
    """Seeded random values × random intervals at widths from
    heavy-replication to near-single-band — the result must equal the
    brute-force O(n·m) pair set regardless of banding choice."""
    import numpy as np
    import ray.data as rd

    from medea_ray.engine.join import range_join

    rng = np.random.default_rng(seed)
    vals = np.round(rng.uniform(-50, 150, 400), 3)
    left = rd.from_items([{"id": i, "v": float(v)} for i, v in enumerate(vals)],
                         override_num_blocks=5)
    ivs = []
    for j in range(30):
        lo = float(np.round(rng.uniform(-60, 140), 3))
        hi = float(np.round(lo + rng.uniform(0.5, 40), 3))
        ivs.append({"bucket": f"b{j}", "lo": lo, "hi": hi})
    right = rd.from_items(ivs, override_num_blocks=3)

    got = _range_pairs(
        range_join(left, "v", right, "lo", "hi", band_width=band_width,
                   num_partitions=8)
    )
    exp = sorted(
        (i, iv["bucket"])
        for i, v in enumerate(vals)
        for iv in ivs
        if iv["lo"] <= v < iv["hi"]
    )
    assert got == exp


def test_range_join_half_open_band_edges(ray_session):
    """v == lo matches, v == hi does not — including when the bounds sit
    exactly on band boundaries (the ceil(hi/w)-1 edge case)."""
    import ray.data as rd

    from medea_ray.engine.join import range_join

    left = rd.from_items(
        [{"id": i, "v": v} for i, v in enumerate([0.0, 5.0, 9.999, 10.0, 15.0, 20.0, -10.0, -0.001])]
    )
    right = rd.from_items([
        {"bucket": "exact", "lo": 10.0, "hi": 20.0},   # both bounds on band edges (w=5)
        {"bucket": "neg", "lo": -10.0, "hi": 0.0},
    ])
    got = _range_pairs(range_join(left, "v", right, "lo", "hi", band_width=5.0))
    assert got == [(3, "exact"), (4, "exact"), (6, "neg"), (7, "neg")]


def test_range_join_nulls_and_empty_intervals(ray_session):
    import ray.data as rd

    from medea_ray.engine.join import range_join

    left = rd.from_items([{"id": 0, "v": 1.0}, {"id": 1, "v": None}])
    right = rd.from_items([
        {"bucket": "ok", "lo": 0.0, "hi": 2.0},
        {"bucket": "null_lo", "lo": None, "hi": 2.0},
        {"bucket": "null_hi", "lo": 0.0, "hi": None},
        {"bucket": "empty", "lo": 2.0, "hi": 2.0},
        {"bucket": "inverted", "lo": 3.0, "hi": 1.0},
    ])
    got = _range_pairs(range_join(left, "v", right, "lo", "hi", band_width=1.0))
    assert got == [(0, "ok")]


def test_range_join_overlapping_intervals_multi_match(ray_session):
    """A value inside several (overlapping) intervals emits one row per
    interval — same semantics the broadcast interval_join proves."""
    import ray.data as rd

    from medea_ray.engine.join import range_join

    left = rd.from_items([{"id": 0, "v": 150.0}])
    right = rd.from_items([
        {"bucket": "mid", "lo": 50.0, "hi": 200.0},
        {"bucket": "burst", "lo": 100.0, "hi": 300.0},
        {"bucket": "high", "lo": 200.0, "hi": 1000.0},
    ])
    got = _range_pairs(range_join(left, "v", right, "lo", "hi", band_width=100.0))
    assert got == [(0, "burst"), (0, "mid")]


def test_range_join_equals_broadcast_interval_join(ray_session):
    """Scale path == tiny-table path on the real events table (sf0.001)."""
    import pyarrow as pa
    import ray.data as rd

    from medea_ray.engine import window
    from medea_ray.engine.join import range_join
    from medea_ray.engine.queries import VALUE_RANGES

    events = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "value"])
    broadcast = window.interval_join(events, "value", VALUE_RANGES, label_name="bucket")
    exp = sorted((r["event_id"], r["bucket"]) for r in
                 broadcast.select_columns(["event_id", "bucket"]).take_all())

    ranges = rd.from_arrow(pa.table({
        "bucket": [lab for lab, _, _ in VALUE_RANGES],
        "lo": [lo for _, lo, _ in VALUE_RANGES],
        "hi": [hi for _, _, hi in VALUE_RANGES],
    }))
    events2 = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "value"])
    banded = range_join(events2, "value", ranges, "lo", "hi",
                        band_width=100.0, num_partitions=4)
    got = sorted((r["event_id"], r["bucket"]) for r in
                 banded.select_columns(["event_id", "bucket"]).take_all())
    assert got == exp and len(got) > 0


def test_range_join_oversized_interval_raises(ray_session):
    import ray.data as rd

    from medea_ray.engine.join import range_join

    left = rd.from_items([{"id": 0, "v": 1.0}])
    right = rd.from_items([{"bucket": "huge", "lo": 0.0, "hi": 1e6}])
    out = range_join(left, "v", right, "lo", "hi", band_width=1.0,
                     max_bands_per_interval=100)
    with pytest.raises(Exception, match="max_bands_per_interval"):
        out.take_all()


def test_range_join_rejects_bad_args(ray_session):
    import ray.data as rd

    from medea_ray.engine.join import range_join

    left = rd.from_items([{"id": 0, "v": 1.0}])
    right = rd.from_items([{"bucket": "b", "lo": 0.0, "hi": 2.0}])
    with pytest.raises(ValueError, match="join_type"):
        range_join(left, "v", right, "lo", "hi", band_width=1.0, join_type="left_outer")
    with pytest.raises(ValueError, match="band_width"):
        range_join(left, "v", right, "lo", "hi", band_width=0.0)


def test_range_join_colliding_column_names(ray_session):
    """A left column that shares a name with the right's bound column must
    not be mistaken for the bound after the join's collision suffixing:
    the exact filter reads the bounds through reserved internal columns,
    so left-side 'lo'/'hi' data can be anything."""
    import ray.data as rd

    from medea_ray.engine.join import range_join

    # left's own 'lo' says 1e9 — filtering on it instead of the interval's
    # lo would drop every pair; left's 'hi' says -1e9 — same, mirrored
    left = rd.from_items([
        {"id": 0, "v": 5.0, "lo": 1e9, "hi": -1e9},
        {"id": 1, "v": 25.0, "lo": 1e9, "hi": -1e9},
    ])
    right = rd.from_items([{"bucket": "b0", "lo": 0.0, "hi": 10.0}])
    got = _range_pairs(range_join(left, "v", right, "lo", "hi", band_width=4.0))
    assert got == [(0, "b0")]


def test_range_join_float_ulp_band_edge(ray_session):
    """v one ulp below an hi that sits exactly on a band boundary: v/w can
    round UP to the integral quotient, banding the row one past
    ceil(hi/w)-1 — the guard band must still surface the pair."""
    import math

    import ray.data as rd

    from medea_ray.engine.join import range_join

    w = 0.1  # not a binary fraction: quotients round
    hi = 3.0  # hi / w = 30.000000000000004 → ceil-1 = 29; v/w may round to 30
    v = math.nextafter(hi, -math.inf)
    left = rd.from_items([{"id": 0, "v": v}, {"id": 1, "v": hi}])
    right = rd.from_items([{"bucket": "edge", "lo": 0.0, "hi": hi}])
    got = _range_pairs(range_join(left, "v", right, "lo", "hi", band_width=w))
    assert got == [(0, "edge")]  # v < hi matches; v == hi (id 1) does not
