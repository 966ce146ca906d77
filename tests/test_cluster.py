"""engine/cluster.py — distributed k-means: determinism (integer-grid
partials equal the driver reference bit-for-bit across block splits),
recovery of planted blobs, empty-cluster handling, validation."""

import numpy as np
import pandas as pd
import pytest

from medea_ray.engine import cluster


def _blob_ds(seed=7, n_per=40, d=8, centers=((0.0, 5.0), (5.0, 0.0))):
    """Two well-separated blobs in the first two dims; returns
    (Dataset, DataFrame)."""
    import ray.data as rd

    rng = np.random.default_rng(seed)
    rows = []
    for ci, (a, b) in enumerate(centers):
        base = np.zeros(d)
        base[0], base[1] = a, b
        for i in range(n_per):
            v = base + rng.normal(0, 0.3, d)
            rows.append({"vec_id": ci * n_per + i,
                         "embedding": v.astype(np.float32).tolist()})
    df = pd.DataFrame(rows)
    return rd.from_pandas(df).repartition(6), df


def test_fit_matches_reference_bitwise(ray_session):
    ds, df = _blob_ds()
    cent, hist = cluster.fit(ds, k=3, n_iters=4)
    ids = df["vec_id"].to_numpy(np.int64)
    mat = np.asarray(df["embedding"].tolist(), np.float64)
    rcent, rhist, _ = cluster.fit_reference(mat, ids, 3, 4)
    assert np.array_equal(cent, rcent)
    for (s, c), (rs, rc) in zip(hist, rhist):
        assert np.array_equal(s, rs) and np.array_equal(c, rc)


def test_assign_recovers_planted_blobs(ray_session):
    ds, df = _blob_ds()
    cent, _ = cluster.fit(ds, k=2, n_iters=6)
    lab = {r["vec_id"]: r["cluster"]
           for r in cluster.assign(ds, cent).take_all()}
    # each blob lands in exactly one cluster
    a = {lab[i] for i in range(40)}
    b = {lab[i] for i in range(40, 80)}
    assert len(a) == 1 and len(b) == 1 and a != b
    # margins are comfortably positive on separated blobs
    margins = [r["margin"] for r in cluster.assign(ds, cent).take_all()]
    assert min(margins) > 1e-6


def test_block_split_invariance(ray_session):
    """The integer-grid partials make fit independent of how Ray splits
    blocks — 1 block vs 12 blocks must agree bit-for-bit."""
    ds, _ = _blob_ds(seed=11)
    c1, h1 = cluster.fit(ds.repartition(1), k=4, n_iters=3)
    c2, h2 = cluster.fit(ds.repartition(12), k=4, n_iters=3)
    assert np.array_equal(c1, c2)
    for (s1, n1), (s2, n2) in zip(h1, h2):
        assert np.array_equal(s1, s2) and np.array_equal(n1, n2)


def test_empty_cluster_keeps_centroid(ray_session):
    """Two identical seed vectors: one of the two clones empties on the
    first assignment and must keep its centroid (never NaN)."""
    import ray.data as rd

    rows = [
        {"vec_id": 0, "embedding": [0.0, 0.0]},
        {"vec_id": 1, "embedding": [0.0, 0.0]},
        {"vec_id": 2, "embedding": [5.0, 5.0]},
        {"vec_id": 3, "embedding": [5.1, 5.0]},
    ]
    ds = rd.from_pandas(pd.DataFrame(rows))
    cent, hist = cluster.fit(ds, k=3, n_iters=2)
    assert np.isfinite(cent).all()
    assert (hist[-1][1] == 0).any()  # an empty cluster really occurred


def test_k_exceeds_rows_raises(ray_session):
    ds, _ = _blob_ds(n_per=2)
    with pytest.raises(ValueError, match="exceeds"):
        cluster.fit(ds, k=10, n_iters=1)


def test_null_vector_raises(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"vec_id": [0, 1], "embedding": [[1.0, 2.0], None]})
    ds = rd.from_pandas(df)
    with pytest.raises(Exception, match="null"):
        cluster.fit(ds, k=1, n_iters=1)


def test_single_cluster_margin_inf(ray_session):
    ds, _ = _blob_ds(n_per=3)
    cent, _ = cluster.fit(ds, k=1, n_iters=1)
    margins = [r["margin"] for r in cluster.assign(ds, cent).take_all()]
    assert all(np.isinf(m) for m in margins)


def test_quantize_half_away_from_zero():
    m = np.array([[0.0000005, -0.0000005, 1.25, -1.25]])
    q = cluster.quantize(m, quant=1_000_000)
    assert q.tolist() == [[1, -1, 1_250_000, -1_250_000]]
