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


# -- vectorized (sort-partitioned) path -------------------------------------
#
# Kernel-level: each segmented kernel, applied to one sorted block, must
# (a) pass through EXACTLY the raw rows of the block's first/last groups
# (pending=True), and (b) emit for every interior group exactly what the
# exact per-group kernel emits. No Ray needed; the end-to-end dispatch
# (incl. boundary groups resolving through the exact pass across blocks)
# is covered once below.


def _split_pending(out):
    import pyarrow.compute as pc

    pend = out.filter(out.column("pending")).drop_columns(["pending"])
    done = out.filter(pc.invert(out.column("pending"))).drop_columns(["pending"])
    return pend, done


def _rows(t):
    return sorted(zip(t.column("u").to_pylist(), t.column("v").to_pylist()))


def _exact_emissions(block, group_fn):
    groups = {}
    for i, u in enumerate(block.column("u").to_pylist()):
        groups.setdefault(u, []).append(i)
    out = []
    for idxs in groups.values():
        out.extend(_rows(group_fn(block.take(idxs), 1 << 22)))
    return sorted(out)


def _sorted_block(pairs):
    import pyarrow as pa

    t = pa.table({
        "u": [a for a, _ in pairs],
        "v": [b for _, b in pairs],
    })
    return t.sort_by("u")


@pytest.mark.parametrize("seed", [21, 22, 23])
@pytest.mark.parametrize("kernel", ["large", "small", "label"])
def test_segmented_kernels_match_exact_groups(kernel, seed):
    import pyarrow.compute as pc

    from medea_ray.engine import graph as G

    rng = np.random.default_rng(seed)
    pairs = {tuple(int(x) for x in rng.integers(0, 25, 2)) for _ in range(80)}
    pairs = [p for p in pairs if p[0] != p[1]]
    if kernel == "large":
        # large-star input: both orientations of each edge
        pairs = pairs + [(b, a) for a, b in pairs]
        seg_fn, group_fn = G._seg_large, G._large_star_group
    elif kernel == "small":
        # small-star input: oriented to the larger endpoint
        pairs = [(max(p), min(p)) for p in pairs]
        seg_fn, group_fn = G._seg_small, G._small_star_group
    else:
        pairs = pairs + [(b, a) for a, b in pairs]
        seg_fn = G._seg_label

        def group_fn(t, mc):
            import pyarrow as pa

            u, nbrs = G._group_neighbors(t, mc)
            m = min(pc.min(nbrs).as_py(), u)
            return pa.table({"u": pa.array([u], nbrs.type),
                             "v": pa.array([m], nbrs.type)})

    block = _sorted_block(pairs)
    first = block.column("u")[0].as_py()
    last = block.column("u")[block.num_rows - 1].as_py()
    pend, done = _split_pending(seg_fn(block, 1 << 22))

    # (a) boundary passthrough: exactly the raw first/last-group rows
    exp_pend = [p for p in pairs if p[0] in (first, last)]
    assert _rows(pend) == sorted(exp_pend)

    # (b) interior emissions match the exact kernel group by group
    interior = block.filter(
        pc.and_(pc.not_equal(block.column("u"), first),
                pc.not_equal(block.column("u"), last))
    )
    assert _rows(done) == _exact_emissions(interior, group_fn)


def test_segmented_kernels_string_ids():
    from medea_ray.engine import graph as G

    pairs = [("b", "a"), ("c", "a"), ("d", "c"), ("e", "b"), ("f", "e"), ("f", "a")]
    both = pairs + [(b, a) for a, b in pairs]
    block = _sorted_block(both)
    pend, done = _split_pending(G._seg_large(block, 1 << 22))
    assert len(pend) + len(done) > 0  # kernels run on strings at all
    # every emission's v is a real node id (never null / mistyped)
    assert all(isinstance(v, str) for _, v in _rows(done))


def test_segmented_kernels_empty_block():
    """Ray's sort emits empty blocks when partitions outnumber distinct
    keys; every segmented kernel must pass them through, not IndexError
    on u[0]."""
    import pyarrow as pa

    from medea_ray.engine import graph as G

    empty = pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    for fn in (G._seg_large, G._seg_small, G._seg_label):
        out = fn(empty, 4)
        assert out.num_rows == 0
        assert "pending" in out.column_names


def test_segmented_guard_fires():
    from medea_ray.engine import graph as G

    # interior star of degree 9, padded so it is not a boundary group
    pairs = [(-5, -6)] + [(0, i) for i in range(1, 10)] + [(99, 98)]
    block = _sorted_block(pairs)
    with pytest.raises(RuntimeError, match="max_component"):
        G._seg_large(block, 4)


def test_vectorized_path_end_to_end(ray_session):
    """Dispatch forced to the vectorized path over many small blocks, so
    groups straddle block boundaries and resolve through the exact pass —
    must match union-find. One dense cluster + pairs converges in few
    rounds (the near-dup shape), keeping the per-round barrier cost
    bounded in this 4-cpu test session."""
    import ray.data as rd

    from medea_ray.engine.graph import connected_components

    clique = [(i, j) for i in range(10) for j in range(i + 1, 10)]
    extra = [(100, 101), (101, 102), (200, 201)]
    edges = clique + extra
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["id_a", "id_b"])).repartition(8)
    out = connected_components(ds, "id_a", "id_b", vectorized_threshold=0)
    got = out.to_pandas().sort_values("node")
    assert dict(zip(got["node"], got["cluster"])) == _uf_components(edges)
