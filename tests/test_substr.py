"""ExactSubstr-style duplicated-span removal (engine/substr.py)."""

import numpy as np
import pyarrow as pa
import pytest

from medea_ray.engine import substr


def naive_mask(texts, k, min_count=2):
    """Reference: corpus-wide gram counting + span union, per doc."""
    docs = [(t or "").split(" ") for t in texts]
    counts = {}
    for words in docs:
        for i in range(len(words) - k + 1):
            g = " ".join(words[i : i + k])
            counts[g] = counts.get(g, 0) + 1
    out = []
    for words in docs:
        covered = set()
        for i in range(len(words) - k + 1):
            if counts[" ".join(words[i : i + k])] >= min_count:
                covered.update(range(i, i + k))
        clean = " ".join(w for j, w in enumerate(words) if j not in covered)
        out.append((len(words), len(covered), clean))
    return out


def run_mask(ray_session, texts, k, n_blocks=5, **kw):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    ).repartition(n_blocks)
    got = (
        substr.mask_dup_spans(ds, "text", id_col="doc_id", k=k, batch_size=32, **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return got


def test_cross_doc_and_within_doc_duplicates(ray_session):
    boiler = "the quick brown fox jumps over the lazy dog now"
    rng = np.random.default_rng(11)
    vocab = ["w%d" % i for i in range(40)]
    texts = []
    for i in range(120):
        words = list(rng.choice(vocab, size=int(rng.integers(3, 25))))
        if i % 7 == 3:
            words += boiler.split(" ")  # cross-doc duplicated tail
        if i % 11 == 5:
            words += ["r1", "r2", "r3", "r4", "r5"] * 2  # within-doc repeat
        texts.append(" ".join(words))
    k = 5
    ref = naive_mask(texts, k)
    got = run_mask(ray_session, texts, k)
    assert got["n_words"].tolist() == [r[0] for r in ref]
    assert got["n_covered"].tolist() == [r[1] for r in ref]
    assert got["clean_text"].tolist() == [r[2] for r in ref]
    # non-vacuous: planted docs actually lost their boilerplate
    assert sum(1 for r in ref if r[1] > 0) >= 120 // 7


def test_cross_block_duplicates_found(ray_session):
    # the two copies of the gram live in DIFFERENT blocks — the global
    # groupby must still see count 2
    texts = ["a b c d e unique%d" % i for i in range(40)]
    texts[0] = "x1 x2 x3 x4 x5"
    texts[39] = "pre x1 x2 x3 x4 x5 post"
    got = run_mask(ray_session, texts, 5, n_blocks=8)
    assert got.loc[0, "clean_text"] == ""
    assert got.loc[39, "clean_text"] == "pre post"
    # "a b c d e" occurs 40x -> covered everywhere
    assert (got.loc[1:38, "n_covered"] == 5).all()


def test_short_null_empty_docs(ray_session):
    texts = ["", None, "one two", "z1 z2 z3 z4 z5", "z1 z2 z3 z4 z5"]
    got = run_mask(ray_session, texts, 5)
    assert got["clean_text"].tolist() == ["", "", "one two", "", ""]
    assert got["n_covered"].tolist() == [0, 0, 0, 5, 5]
    # '' splits to [''] -> one word, matching string_split semantics
    assert got["n_words"].tolist() == [1, 1, 2, 5, 5]


def test_budget_raises_loudly(ray_session):
    texts = ["dup dup dup dup dup dup"] * 4
    with pytest.raises(ValueError, match="max_dup_grams"):
        run_mask(ray_session, texts, 2, max_dup_grams=0)


def test_duplicated_grams_counts(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"text": ["p q r s", "z p q r", "p q x y"]})
    ).repartition(3)
    out = {
        r["gram"]: r["n"]
        for b in substr.duplicated_grams(ds, "text", k=2).iter_batches(
            batch_format="pyarrow"
        )
        for r in b.to_pylist()
    }
    assert out == {"p q": 3, "q r": 2}


def test_hashed_exchange_equals_string(ray_session):
    import ray.data as rd

    texts = ["a b c d e unique%d" % i for i in range(60)]
    texts[7] = "x1 x2 x3 x4 x5 mid y1"
    texts[41] = "pre x1 x2 x3 x4 x5 post"
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(6)

    def collect(exchange, **kw):
        return {
            r["gram"]: r["n"]
            for b in substr.duplicated_grams(
                ds, "text", k=5, exchange=exchange, **kw
            ).iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()
        }

    assert collect("hashed") == collect("string")
    # forced collisions: every gram maps to ONE digest — the exact
    # phase-2 recount must still drop the non-duplicated grams
    const_hash = lambda grams: np.zeros(len(grams), np.uint64)
    assert collect("hashed", _hash_fn=const_hash) == collect("string")
    # budget exceeded -> loud fallback to the exact string exchange
    assert collect("hashed", candidate_budget=0, _hash_fn=const_hash) == collect("string")


def test_mask_dup_spans_hashed_exchange(ray_session):
    texts = ["z1 z2 z3 z4 z5"] * 3 + ["solo w%d x y z q" % i for i in range(20)]
    got_h = run_mask(ray_session, texts, 5, exchange="hashed")
    got_s = run_mask(ray_session, texts, 5, exchange="string")
    assert got_h["clean_text"].tolist() == got_s["clean_text"].tolist()
    assert got_h.loc[0, "clean_text"] == ""
