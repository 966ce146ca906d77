"""N-gram benchmark decontamination (engine/decontam.py, GPT-3 appendix
C style): corpus docs sharing ANY word n-gram with the benchmark side
are contaminated."""

import numpy as np
import pyarrow as pa
import pytest

from medea_ray.engine import decontam


def _mk(texts, ids=None):
    import ray.data as rd

    ids = ids if ids is not None else list(range(len(texts)))
    return rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))


def naive_stats(corpus, bench, n):
    bench_grams = set()
    for t in bench:
        w = (t or "").split(" ")
        for i in range(len(w) - n + 1):
            bench_grams.add(" ".join(w[i : i + n]))
    out = []
    for t in corpus:
        w = (t or "").split(" ")
        grams = [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]
        hits = sum(1 for g in grams if g in bench_grams)
        out.append((len(grams), hits))
    return out


def _corpus_and_bench(seed=7, n_corpus=150, n_bench=12):
    rng = np.random.default_rng(seed)
    vocab = ["w%d" % i for i in range(60)]
    bench = [
        " ".join(rng.choice(vocab, size=int(rng.integers(6, 15))))
        for _ in range(n_bench)
    ]
    corpus = []
    for i in range(n_corpus):
        words = list(rng.choice(vocab, size=int(rng.integers(2, 30))))
        if i % 9 == 4:  # plant a benchmark passage mid-doc (partial overlap)
            b = bench[i % n_bench].split(" ")
            pos = len(words) // 2
            words = words[:pos] + b + words[pos:]
        corpus.append(" ".join(words))
    return corpus, bench


@pytest.mark.parametrize("match", ["string", "hashed"])
def test_stats_vs_naive(ray_session, match):
    corpus, bench = _corpus_and_bench()
    n = 5
    got = (
        decontam.contamination_stats(
            _mk(corpus).repartition(6), _mk(bench), n=n, match=match,
            batch_size=32,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = naive_stats(corpus, bench, n)
    assert got["n_grams"].tolist() == [r[0] for r in ref]
    assert got["n_hits"].tolist() == [r[1] for r in ref]
    assert got["contaminated"].tolist() == [r[1] > 0 for r in ref]
    # non-vacuous: the planted docs are flagged
    assert got["contaminated"].sum() >= 150 // 9


def test_stats_vs_duckdb(ray_session):
    """Full lockstep: DuckDB recomputes the benchmark gram set AND the
    per-doc hit counts from scratch via string_split + list slicing."""
    import duckdb

    corpus, bench = _corpus_and_bench(seed=13)
    n = 4
    got = (
        decontam.contamination_stats(
            _mk(corpus).repartition(5), _mk(bench), n=n, batch_size=64
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("corpus", pa.table({"doc_id": list(range(len(corpus))), "text": corpus}))
    con.register("bench", pa.table({"text": bench}))
    oracle = con.execute(
        f"""
        WITH cw AS (
          SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w FROM corpus
        ),
        bw AS (SELECT string_split(coalesce(text, ''), ' ') AS w FROM bench),
        bg AS (
          SELECT DISTINCT array_to_string(list_slice(w, i, i+{n - 1}), ' ') AS g
          FROM (SELECT w, unnest(generate_series(1, len(w) - {n} + 1)) AS i FROM bw)
        ),
        cg AS (
          SELECT doc_id, array_to_string(list_slice(w, i, i+{n - 1}), ' ') AS g
          FROM (SELECT doc_id, w,
                  unnest(generate_series(1, len(w) - {n} + 1)) AS i FROM cw)
        )
        SELECT cw.doc_id,
               greatest(len(cw.w) - {n} + 1, 0) AS n_grams,
               coalesce(h.n_hits, 0) AS n_hits
        FROM cw LEFT JOIN (
          SELECT cg.doc_id, count(*) AS n_hits
          FROM cg JOIN bg USING (g) GROUP BY cg.doc_id
        ) h USING (doc_id)
        ORDER BY cw.doc_id
        """
    ).fetch_df()
    assert got["n_grams"].tolist() == oracle["n_grams"].tolist()
    assert got["n_hits"].tolist() == oracle["n_hits"].tolist()
    assert int(got["contaminated"].sum()) > 0  # non-vacuous


def test_cross_block_and_short_null_docs(ray_session):
    bench = ["b1 b2 b3 b4 b5"]
    corpus = [
        "x1 b1 b2 b3 b4 b5 x2",  # contaminated (gram mid-doc)
        "b1 b2 b3 b4",           # 4 words < n=5: 0 grams, clean
        None,                     # null: 0 grams, clean
        "",                       # empty: 1 word, clean
        "b5 b4 b3 b2 b1",        # reversed: not the same gram
    ]
    got = (
        decontam.contamination_stats(
            _mk(corpus).repartition(5), _mk(bench), n=5, batch_size=1
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["contaminated"].tolist() == [True, False, False, False, False]
    assert got["n_grams"].tolist() == [3, 0, 0, 0, 1]
    assert got["n_hits"].tolist() == [1, 0, 0, 0, 0]


def test_decontaminate_drops_exactly_contaminated(ray_session):
    corpus, bench = _corpus_and_bench(seed=3)
    n = 5
    stats = (
        decontam.contamination_stats(_mk(corpus), _mk(bench), n=n)
        .to_pandas()
        .sort_values("doc_id")
    )
    bad = set(stats[stats["contaminated"]]["doc_id"])
    assert bad  # non-vacuous
    kept = (
        decontam.decontaminate_ngrams(_mk(corpus).repartition(4), _mk(bench), n=n)
        .to_pandas()
    )
    assert set(kept["doc_id"]) == set(range(len(corpus))) - bad
    # surviving rows keep their full text unchanged
    for _, r in kept.iterrows():
        assert r["text"] == corpus[r["doc_id"]]


def test_hashed_matches_string_no_collision(ray_session):
    bench = ["c1 c2 c3"]
    corpus = ["c1 c2 c3 tail", "other words here"]
    got_s = (
        decontam.contamination_stats(_mk(corpus), _mk(bench), n=3, match="string")
        .to_pandas().sort_values("doc_id")
    )
    got_h = (
        decontam.contamination_stats(_mk(corpus), _mk(bench), n=3, match="hashed")
        .to_pandas().sort_values("doc_id")
    )
    assert got_s["contaminated"].tolist() == [True, False]
    assert got_h["n_hits"].tolist() == got_s["n_hits"].tolist()


def test_hashed_collision_direction_forced():
    """A 64-bit collision may only ADD contamination (an innocent doc
    flagged), never clear a genuinely contaminated one. Simulated by
    injecting a corpus-only gram's hash into the probe's value set —
    exactly the post-collision state — and calling the probe kernel
    directly (no Ray actors, so no cross-process monkeypatching)."""
    import numpy as np

    from medea_ray.engine.uniqueness import _hash64

    grams = pa.array(["c1 c2 c3", "x1 x2 x3"], pa.string())  # bench + collided
    vs = np.unique(np.asarray(_hash64(grams)).view(np.int64))
    probe = decontam._GramProbe(vs, "text", "doc_id", 3, "hashed")
    t = pa.table({
        "doc_id": [0, 1, 2],
        "text": ["c1 c2 c3 tail",      # genuinely contaminated
                 "pre x1 x2 x3 post",  # innocent, collided -> extra flag
                 "clean words only here"],
    })
    out = probe(t)
    assert out.column("contaminated").to_pylist() == [True, True, False]
    # the dangerous regression (membership logic flip) would clear row 0
    assert out.column("n_hits").to_pylist()[0] == 1


def test_all_null_text_block_probe(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"doc_id": 0, "text": None}, {"doc_id": 1, "text": None}])
    got = decontam.contamination_stats(
        ds, _mk(["b1 b2 b3"]), n=3
    ).to_pandas().sort_values("doc_id")
    assert got["n_grams"].tolist() == [0, 0]
    assert got["contaminated"].tolist() == [False, False]


def test_budget_raises_loudly(ray_session):
    corpus, bench = _corpus_and_bench()
    with pytest.raises(ValueError, match="budget_bytes"):
        decontam.contamination_stats(
            _mk(corpus), _mk(bench), n=3, budget_bytes=16
        ).to_pandas()


def test_bad_args(ray_session):
    corpus, bench = _corpus_and_bench()
    with pytest.raises(ValueError, match="n must be"):
        decontam.contamination_stats(_mk(corpus), _mk(bench), n=0).to_pandas()
    with pytest.raises(ValueError, match="match must be"):
        decontam.contamination_stats(
            _mk(corpus), _mk(bench), n=3, match="bogus"
        ).to_pandas()
