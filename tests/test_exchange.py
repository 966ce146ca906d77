"""Shared adaptive bucketed reduce (engine/exchange.py)."""

import numpy as np
import pyarrow as pa
import pytest

from medea_ray.engine.exchange import bucketed_group_agg


def _mk(rows, schema=None):
    import ray.data as rd

    cols = {k: [r.get(k) for r in rows] for k in rows[0]}
    return rd.from_arrow(pa.table(cols, schema=schema))


def _collect(ds):
    return sorted(
        tuple(r.values()) for r in (dict(x) for x in ds.take_all())
    )


def test_sum_min_multi_key(ray_session):
    rows = [
        {"k": "a", "g": 1, "v": 5},
        {"k": "a", "g": 1, "v": 3},
        {"k": "a", "g": 2, "v": 1},
        {"k": "b", "g": 1, "v": 7},
        {"k": None, "g": 1, "v": 9},
        {"k": None, "g": 1, "v": 1},
    ]
    out = bucketed_group_agg(
        _mk(rows), ["k", "g"], [("v", "sum", "s"), ("v", "min", "m")]
    ).to_pandas()
    got = {
        (r["k"], r["g"]): (r["s"], r["m"])
        for r in out.to_dict("records")
    }
    assert got == {
        ("a", 1): (8, 3),
        ("a", 2): (1, 1),
        ("b", 1): (7, 7),
        (None, 1): (10, 1),  # null keys keep their own group
    }


@pytest.mark.parametrize("force_bucketed", [False, True])
def test_generic_and_bucketed_branches_agree(ray_session, force_bucketed):
    rng = np.random.default_rng(7)
    n = 5000
    keys = [f"k{int(i)}" for i in rng.integers(0, 900, n)]
    vals = rng.integers(-100, 100, n).astype(np.int64)
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    ).repartition(7)
    kw = {"small_threshold": 0 if force_bucketed else 1 << 18}
    out = bucketed_group_agg(
        ds, ["k"], [("v", "sum", "s"), ("v", "max", "mx")], **kw
    ).to_pandas()
    import collections

    ref_s = collections.defaultdict(int)
    ref_m: dict = {}
    for k, v in zip(keys, vals):
        ref_s[k] += int(v)
        ref_m[k] = max(ref_m.get(k, -1000), int(v))
    got = {r["k"]: (r["s"], r["mx"]) for r in out.to_dict("records")}
    assert got == {k: (ref_s[k], ref_m[k]) for k in ref_s}


def test_integer_bucket_key_and_count(ray_session):
    rows = [
        {"h": 5, "c": 2},
        {"h": 5, "c": 1},
        {"h": -3, "c": 4},  # negative ints bucket via two's complement
        {"h": None, "c": 1},
    ]
    out = bucketed_group_agg(
        _mk(rows), ["h"], [("c", "sum", "n")], small_threshold=0
    ).to_pandas()
    # pandas floats a nullable int key column: normalize
    got = {
        (None if r["h"] != r["h"] else int(r["h"])): r["n"]
        for r in out.to_dict("records")
    }
    assert got == {5: 3, -3: 4, None: 1}
    # a count agg always takes the bucketed branch (non-null semantics)
    out2 = bucketed_group_agg(
        _mk(rows), ["h"], [("c", "count", "n")]
    ).to_pandas()
    got2 = {
        (None if r["h"] != r["h"] else int(r["h"])): r["n"]
        for r in out2.to_dict("records")
    }
    assert got2 == {5: 2, -3: 1, None: 1}


def test_validation(ray_session):
    ds = _mk([{"k": "a", "v": 1}])
    with pytest.raises(ValueError, match="power of two"):
        bucketed_group_agg(ds, ["k"], [("v", "sum", "s")], n_buckets=3)
    with pytest.raises(ValueError, match="unsupported agg"):
        bucketed_group_agg(ds, ["k"], [("v", "mean", "s")])
    with pytest.raises(ValueError, match="at least one key"):
        bucketed_group_agg(ds, [], [("v", "sum", "s")])
    with pytest.raises(ValueError, match="bucket_key"):
        bucketed_group_agg(ds, ["k"], [("v", "sum", "s")], bucket_key="v")


def test_layout_invariance(ray_session):
    rows = [{"k": f"k{i % 17}", "v": i} for i in range(300)]
    a = _collect(
        bucketed_group_agg(_mk(rows), ["k"], [("v", "sum", "s")],
                           small_threshold=0, n_buckets=4)
    )
    b = _collect(
        bucketed_group_agg(
            _mk(rows).repartition(11), ["k"], [("v", "sum", "s")],
            small_threshold=0, n_buckets=64,
        )
    )
    c = _collect(
        bucketed_group_agg(_mk(rows).repartition(3), ["k"], [("v", "sum", "s")])
    )
    assert a == b == c
