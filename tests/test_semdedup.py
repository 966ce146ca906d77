"""engine/semdedup.py — SemDeDup-style semantic dedup: distributed ==
driver reference bit-for-bit across block splits, planted near-dup
recovery, keep rule (farthest from centroid survives), cap passthrough
(never drops data), centroid reuse."""

import numpy as np
import pandas as pd

from medea_ray.engine import cluster, semdedup


def _planted_ds(seed=11, n_per=30, d=8, dup_every=5):
    """Two separated blobs whose members have spread-out DIRECTIONS
    (noise comparable to the base, so non-twin cosines stay well below
    any dedup threshold); every ``dup_every``-th row gets a
    near-identical twin (tiny perturbation → cosine ~1). Returns
    (Dataset, DataFrame, twin_pairs)."""
    import ray.data as rd

    rng = np.random.default_rng(seed)
    rows, twins = [], []
    vid = 0
    for a, b in ((0.0, 60.0), (60.0, 0.0)):
        base = np.zeros(d)
        base[0], base[1] = a, b
        for i in range(n_per):
            v = base + rng.normal(0, 15.0, d)
            rows.append({"vec_id": vid, "embedding": v.astype(np.float32).tolist()})
            orig = vid
            vid += 1
            if i % dup_every == 0:
                w = v + rng.normal(0, 1e-3, d)
                rows.append({"vec_id": vid, "embedding": w.astype(np.float32).tolist()})
                twins.append((orig, vid))
                vid += 1
    df = pd.DataFrame(rows)
    return rd.from_pandas(df).repartition(7), df, twins


def _run(ds, df, **kw):
    got = pd.DataFrame(semdedup.semantic_dedup(ds, **kw).take_all())
    ids = df["vec_id"].to_numpy(np.int64)
    mat = np.asarray(df["embedding"].tolist(), np.float64)
    ref, tm, om = semdedup.semantic_dedup_reference(
        ids, mat,
        kw.get("k", 8), kw.get("n_iters", 4), kw.get("threshold", 0.95),
    )
    return got, ref, tm, om


def test_matches_reference_bitwise(ray_session):
    ds, df, _ = _planted_ds()
    got, ref, tm, om = _run(ds, df, k=4, threshold=0.95)
    assert len(got) == len(ref)
    for r in got.itertuples():
        surv = None if pd.isna(r.survivor_id) else int(r.survivor_id)
        assert ref[r.vec_id] == (r.cluster, r.keep, surv)
    assert tm > 1e-6 and om > 1e-9


def test_block_split_invariance(ray_session):
    import ray.data as rd

    _, df, _ = _planted_ds()
    outs = []
    for parts in (1, 13):
        ds = rd.from_pandas(df).repartition(parts)
        got = pd.DataFrame(
            semdedup.semantic_dedup(ds, k=4, threshold=0.95).take_all()
        ).sort_values("vec_id").reset_index(drop=True)
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_planted_twins_are_deduped(ray_session):
    # threshold 0.99 sits between the max non-twin cosine (0.979) and
    # the min twin cosine (0.9999998) of the planted corpus
    ds, df, twins = _planted_ds()
    got, _, _, _ = _run(ds, df, k=2, threshold=0.99)
    keep = dict(zip(got["vec_id"], got["keep"]))
    surv = dict(zip(got["vec_id"], got["survivor_id"]))
    for a, b in twins:
        # exactly one of each twin pair survives, the other points at a
        # kept row (its twin, unless an even nearer neighbour shadowed it)
        assert keep[a] != keep[b]
        dropped = a if not keep[a] else b
        assert keep[int(surv[dropped])]


def test_keep_rule_farthest_from_centroid(ray_session):
    import ray.data as rd

    # one tight cluster of three near-identical vectors + anchor noise;
    # the survivor must be the member with the LOWEST centroid cosine
    d = 6
    base = np.zeros(d)
    base[0] = 4.0
    rows = []
    for i, eps in enumerate((0.0, 0.01, 0.02)):
        v = base.copy()
        v[1] = eps
        rows.append({"vec_id": i, "embedding": v.astype(np.float32).tolist()})
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df)
    cent, _ = cluster.fit(ds, k=1, n_iters=2)
    got = pd.DataFrame(
        semdedup.semantic_dedup(ds, k=1, n_iters=2, threshold=0.9).take_all()
    )
    kept = got.loc[got["keep"], "vec_id"].tolist()
    assert len(kept) == 1
    mat = np.asarray(df["embedding"].tolist(), np.float64)
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    c = cent[0] / np.linalg.norm(cent[0])
    assert kept[0] == int(np.argmin(m @ c))


def test_cap_passes_rows_through_kept(ray_session):
    # (the cap warning fires inside the map_groups worker, so there is
    # no caplog assertion — behavior is the contract)
    ds, df, _ = _planted_ds()
    got = pd.DataFrame(
        semdedup.semantic_dedup(
            ds, k=2, threshold=0.95, max_cluster_size=10
        ).take_all()
    )
    # every input row appears exactly once — the cap never loses data
    assert sorted(got["vec_id"]) == sorted(df["vec_id"])
    # overflow rows are kept with null survivor and NaN margins
    over = got[got["max_cos_to_kept"].isna() & got["thr_margin"].isna()]
    assert len(over) > 0 and bool(over["keep"].all())
    assert over["survivor_id"].isna().all()


def test_centroid_reuse_short_circuits_fit(ray_session):
    ds, df, _ = _planted_ds()
    cent, _ = cluster.fit(ds, k=4, n_iters=4)
    a = pd.DataFrame(
        semdedup.semantic_dedup(ds, k=4, threshold=0.95).take_all()
    ).sort_values("vec_id").reset_index(drop=True)
    b = pd.DataFrame(
        semdedup.semantic_dedup(ds, centroids=cent, threshold=0.95).take_all()
    ).sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_no_drops_below_threshold(ray_session):
    # with a threshold above every pairwise cosine nothing is dropped
    ds, df, _ = _planted_ds()
    got, _, _, _ = _run(ds, df, k=4, threshold=1.5)
    assert bool(got["keep"].all())
    assert got["survivor_id"].isna().all()


def test_margins_false_same_sets_nan_margins(ray_session):
    ds, df, _ = _planted_ds()
    a = pd.DataFrame(
        semdedup.semantic_dedup(ds, k=4, threshold=0.99).take_all()
    ).sort_values("vec_id").reset_index(drop=True)
    b = pd.DataFrame(
        semdedup.semantic_dedup(
            ds, k=4, threshold=0.99, margins=False
        ).take_all()
    ).sort_values("vec_id").reset_index(drop=True)
    cols = ["vec_id", "cluster", "keep", "survivor_id", "max_cos_to_kept"]
    pd.testing.assert_frame_equal(a[cols], b[cols])
    assert b["thr_margin"].isna().all() and b["order_margin"].isna().all()
