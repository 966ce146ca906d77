"""engine/graph.py — distributed connected components (large-star/small-star)
and the near-dup clustering compositions built on it."""

import numpy as np
import pandas as pd
import pytest


def _uf_components(edges):
    """Driver-side union-find reference: {node: min id of its component}."""
    parent = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        for n in (a, b):
            parent.setdefault(n, n)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _cc_df(edges, **kwargs):
    import ray.data as rd

    from medea_ray.engine.graph import connected_components

    df = pd.DataFrame(edges, columns=["id_a", "id_b"])
    out = connected_components(rd.from_pandas(df), "id_a", "id_b", **kwargs)
    got = out.to_pandas().sort_values("node").reset_index(drop=True)
    return got


def test_two_components(ray_session):
    got = _cc_df([(1, 2), (2, 3), (10, 11)])
    assert dict(zip(got["node"], got["cluster"])) == {
        1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
    }


def test_chain_collapses_to_min(ray_session):
    # a 24-node path with shuffled orientations — worst case for naive
    # label propagation, a few rounds for the star phases
    rng = np.random.default_rng(7)
    edges = []
    for i in range(23):
        a, b = (i, i + 1) if rng.random() < 0.5 else (i + 1, i)
        edges.append((a + 100, b + 100))
    got = _cc_df(edges)
    assert set(got["cluster"]) == {100}
    assert set(got["node"]) == set(range(100, 124))


def test_duplicate_reversed_and_self_edges(ray_session):
    got = _cc_df([(5, 6), (6, 5), (5, 6), (7, 7), (6, 8)])
    # the self-loop node 7 has no real edge -> absent from the labels
    assert dict(zip(got["node"], got["cluster"])) == {5: 5, 6: 5, 8: 5}


def test_null_endpoints_dropped(ray_session):
    import ray.data as rd

    from medea_ray.engine.graph import connected_components

    df = pd.DataFrame(
        {"id_a": [1, None, 3], "id_b": [2, 5, None]}, dtype="Int64"
    )
    out = connected_components(rd.from_pandas(df), "id_a", "id_b").to_pandas()
    assert dict(zip(out["node"], out["cluster"])) == {1: 1, 2: 1}


def test_string_ids(ray_session):
    got = _cc_df([("beta", "alpha"), ("beta", "gamma"), ("zeta", "eta")])
    assert dict(zip(got["node"], got["cluster"])) == {
        "alpha": "alpha", "beta": "alpha", "gamma": "alpha",
        "eta": "eta", "zeta": "eta",
    }


def test_empty_edges(ray_session):
    import ray.data as rd

    from medea_ray.engine.graph import connected_components

    out = connected_components(
        rd.from_pandas(pd.DataFrame({"id_a": [], "id_b": []})), "id_a", "id_b"
    )
    assert out.count() == 0
    assert out.schema().names == ["node", "cluster"]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_graph_matches_union_find(ray_session, seed):
    rng = np.random.default_rng(seed)
    n, m = 60, 70
    edges = [tuple(int(x) for x in rng.integers(0, n, 2)) for _ in range(m)]
    edges = [e for e in edges if e[0] != e[1]]
    got = _cc_df(edges)
    exp = _uf_components(edges)
    assert dict(zip(got["node"], got["cluster"])) == exp


def test_max_rounds_raises_loudly(ray_session):
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc_df([(1, 2), (2, 3)], max_rounds=0)


def test_max_component_raises_loudly(ray_session):
    with pytest.raises(Exception, match="max_component"):
        # star of degree 9 over a cap of 4 — the size guard must fire,
        # never silently drop edges (that would split the component)
        _cc_df([(0, i) for i in range(1, 10)], max_component=4)


def test_dedup_near_keeps_one_per_cluster(ray_session):
    import ray.data as rd

    from medea_ray.engine.dedup import dedup_near

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the band plays on through the long summer night"
    )
    rows = []
    # two planted near-dup clusters (suffix variants) + singletons + null
    for i in range(4):
        rows.append({"id": 100 + i, "text": base + f" variant {i}"})
    other = (
        "pack my box with five dozen liquor jugs said the sphinx of "
        "black quartz while judging my vow across the frozen river"
    )
    for i in range(3):
        rows.append({"id": 200 + i, "text": other + f" copy {i}"})
    rows.append({"id": 300, "text": "completely unrelated tiny text"})
    rows.append({"id": 301, "text": "another standalone document body"})
    rows.append({"id": 302, "text": None})
    ds = rd.from_pandas(pd.DataFrame(rows))
    kept = sorted(
        r["id"]
        for r in dedup_near(
            ds, "id", threshold=0.5, verify="exact", concurrency=(1, 2)
        ).take_all()
    )
    assert kept == [100, 200, 300, 301, 302]


def test_near_dup_clusters_query_matches_union_find(ray_session):
    """The registered query's clusters == union-find over the verified
    pair set it is defined from (the DuckDB oracle re-derives both from
    scratch; this pins Ray-side internal consistency)."""
    from medea_ray.engine import queries as q

    sf = "/root/testdata/sf0.001"
    pairs = q.minhash_verified_pairs(sf)
    got = q.near_dup_clusters(sf)
    exp = _uf_components(list(zip(pairs["id_a"], pairs["id_b"])))
    assert dict(zip(got["doc_id"], got["cluster_id"])) == exp
    assert (got["doc_id"] == sorted(got["doc_id"])).all()
