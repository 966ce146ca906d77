"""Embedding-based benchmark decontamination (engine/similarity.py
semantic_decontaminate)."""

import numpy as np
import pyarrow as pa
import pytest

from medea_ray.engine import similarity


def _mk(ids, vecs):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(
            [None if v is None else [float(x) for x in v] for v in vecs],
            pa.list_(pa.float32()),
        ),
    }))


def _corpus(seed=3, n=80, d=8):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    bench = vecs[:5] + rng.normal(scale=1e-3, size=(5, d)).astype(np.float32)
    return vecs, bench


def test_flags_vs_duckdb(ray_session):
    """DuckDB recomputes every corpus row's max cosine against the
    benchmark side from scratch; flags must agree exactly (vectors are
    random Gaussians, so similarities sit far from the threshold)."""
    import duckdb

    vecs, bench = _corpus()
    got = (
        similarity.semantic_decontaminate(
            _mk(range(len(vecs)), vecs).repartition(5),
            _mk(range(len(bench)), bench),
            threshold=0.98, mode="stats", batch_size=16,
        )
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("c", pa.table({
        "vec_id": list(range(len(vecs))),
        "embedding": [[float(x) for x in v] for v in vecs],
    }))
    con.register("b", pa.table({
        "embedding": [[float(x) for x in v] for v in bench],
    }))
    oracle = con.execute(
        """
        SELECT c.vec_id,
               max(list_cosine_similarity(c.embedding, b.embedding)) >= 0.98
               AS contaminated
        FROM c CROSS JOIN b GROUP BY c.vec_id ORDER BY c.vec_id
        """
    ).fetch_df()
    assert got["contaminated"].tolist() == oracle["contaminated"].tolist()
    # the 5 near-copies of benchmark rows are flagged; most others not
    assert got["contaminated"][:5].all()
    assert got["contaminated"].sum() < len(vecs)


def test_drop_is_complement_of_stats(ray_session):
    vecs, bench = _corpus(seed=11)
    corpus = _mk(range(len(vecs)), vecs)
    stats = similarity.semantic_decontaminate(
        corpus, _mk(range(len(bench)), bench), threshold=0.98, mode="stats"
    ).to_pandas()
    bad = set(stats[stats["contaminated"]]["vec_id"])
    kept = similarity.semantic_decontaminate(
        _mk(range(len(vecs)), vecs).repartition(4),
        _mk(range(len(bench)), bench), threshold=0.98,
    ).to_pandas()
    assert set(kept["vec_id"]) == set(range(len(vecs))) - bad
    assert bad  # non-vacuous


def test_null_vectors_never_match(ray_session):
    vecs, bench = _corpus(seed=5, n=6)
    ids = [0, 1, 2, 3, 4, 5, 9]
    rows = list(vecs) + [None]
    got = similarity.semantic_decontaminate(
        _mk(ids, rows), _mk(range(len(bench)), bench),
        threshold=0.98, mode="stats",
    ).to_pandas().sort_values("vec_id")
    assert not bool(got[got["vec_id"] == 9]["contaminated"].iloc[0])
    kept_ds = similarity.semantic_decontaminate(
        _mk(ids, rows), _mk(range(len(bench)), bench), threshold=0.98
    )
    # to_pandas would try a TensorArray cast on the ragged (null) vector
    # column; read through Arrow batches
    kept_ids = set()
    for b in kept_ds.iter_batches(batch_format="pyarrow"):
        kept_ids.update(b.column("vec_id").to_pylist())
    assert 9 in kept_ids  # null vector kept in drop mode


def test_empty_bench_and_bad_args(ray_session):
    vecs, _ = _corpus(n=6)
    corpus = _mk(range(len(vecs)), vecs)
    got = similarity.semantic_decontaminate(
        corpus, _mk([], []), threshold=0.5, mode="stats"
    ).to_pandas()
    assert not got["contaminated"].any()
    with pytest.raises(ValueError, match="mode must be"):
        similarity.semantic_decontaminate(corpus, _mk([], []), mode="bogus")
    with pytest.raises(ValueError, match="bench_budget_rows"):
        similarity.semantic_decontaminate(
            corpus, corpus, bench_budget_rows=2
        ).to_pandas()


def test_layout_invariance(ray_session):
    vecs, bench = _corpus(seed=7)
    flags = []
    for blocks in (1, 7):
        got = similarity.semantic_decontaminate(
            _mk(range(len(vecs)), vecs).repartition(blocks),
            _mk(range(len(bench)), bench), threshold=0.98, mode="stats",
            batch_size=8,
        ).to_pandas().sort_values("vec_id")
        flags.append(got["contaminated"].tolist())
    assert flags[0] == flags[1]


def test_nan_bench_vector_raises_loudly(ray_session):
    vecs, _ = _corpus(n=6)
    bad_bench = [[1.0, float("nan")] + [0.0] * 6]
    with pytest.raises(Exception, match="NaN"):
        similarity.semantic_decontaminate(
            _mk(range(len(vecs)), vecs), _mk([0], bad_bench), threshold=0.5
        ).to_pandas()


def test_nan_corpus_vector_kept_and_null_cosine(ray_session):
    # a NaN element in a CORPUS vector behaves like a null vector: never
    # contaminated, kept in drop mode, NULL max_cosine in stats (the
    # -2.0 sentinel must not leak)
    vecs, bench = _corpus(seed=2, n=6)
    rows = list(vecs) + [[float("nan")] + [0.0] * 7]
    ids = list(range(6)) + [99]
    stats = similarity.semantic_decontaminate(
        _mk(ids, rows), _mk(range(len(bench)), bench),
        threshold=0.98, mode="stats",
    ).to_pandas().sort_values("vec_id").reset_index(drop=True)
    row99 = stats[stats["vec_id"] == 99].iloc[0]
    assert not bool(row99["contaminated"])
    assert row99["max_cosine"] != row99["max_cosine"]  # NULL -> NaN in pandas
    # finite rows carry real cosines in [-1, 1]
    finite = stats[stats["vec_id"] != 99]["max_cosine"]
    assert ((finite >= -1.0) & (finite <= 1.0)).all()
    kept_ds = similarity.semantic_decontaminate(
        _mk(ids, rows), _mk(range(len(bench)), bench), threshold=0.98
    )
    kept_ids = set()
    for b in kept_ds.iter_batches(batch_format="pyarrow"):
        kept_ids.update(b.column("vec_id").to_pylist())
    assert 99 in kept_ids
