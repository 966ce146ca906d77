"""TF-IDF top-keyword extraction (engine/tfidf.py): integer-only
ranking semantics, naive-reference parity across block layouts, and
loud-failure contracts."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from medea_ray.engine import tfidf


def make_ds(rows, parts=1):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array(rows, pa.string()),
        }
    )
    return ray.data.from_arrow(t).repartition(parts).materialize()


def collect(ds):
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    if not batches:
        return {}
    t = pa.concat_tables(batches)
    return {r["doc_id"]: (r["top_token"], r["tf"], r["df"]) for r in t.to_pylist()}


def naive(rows):
    docs = [(r or "").split() for r in rows]
    df: dict = {}
    for toks in docs:
        for tok in set(toks):
            df[tok] = df.get(tok, 0) + 1
    out = {}
    for i, toks in enumerate(docs):
        if not toks:
            continue
        tf: dict = {}
        for tok in toks:
            tf[tok] = tf.get(tok, 0) + 1
        win = min(tf, key=lambda k: (-tf[k], df[k], k))
        out[i] = (win, tf[win], df[win])
    return out


def test_hand_checked(ray_session):
    rows = [
        "apple apple banana",       # apple tf=2
        "banana cherry banana",     # banana tf=2
        "apple banana cherry",      # tf all 1 -> df tie apple/cherry (2) -> token
    ]
    got = collect(tfidf.top_keywords(make_ds(rows)))
    assert got[0] == ("apple", 2, 2)
    assert got[1] == ("banana", 2, 3)
    assert got[2] == ("apple", 1, 2)


def test_tf_and_df_and_token_tiebreaks(ray_session):
    rows = [
        "x y",        # tf tie, df tie (both df=1 in this doc... see below)
        "a b a b",    # tf tie at 2; df: a=2, b=1 -> b wins (smaller df)
        "a",          # makes df[a]=2
    ]
    got = collect(tfidf.top_keywords(make_ds(rows)))
    assert got[1] == ("b", 2, 1)
    # doc 0: tf tie, df tie -> bytewise smaller token
    assert got[0] == ("x", 1, 1)


def test_matches_naive_reference_across_layouts(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"w{j}" for j in range(30)]
    rows = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 60)).tolist())
        for _ in range(120)
    ] + ["", None]
    want = naive(rows)
    for parts in (1, 5):
        got = collect(tfidf.top_keywords(make_ds(rows, parts)))
        assert got == want, parts


def test_empty_docs_emit_no_row(ray_session):
    got = collect(tfidf.top_keywords(make_ds(["a b", "", None])))
    assert set(got) == {0}


def test_unicode_bytewise_tiebreak(ray_session):
    # é (c3 a9) sorts after z (7a) bytewise — both Arrow and DuckDB
    got = collect(tfidf.top_keywords(make_ds(["z é", "z é"])))
    assert got[0][0] == "z"


def test_vocab_budget_raises(ray_session):
    with pytest.raises(ValueError, match="vocab_budget|budget"):
        tfidf.top_keywords(make_ds(["a b c d e f"]), vocab_budget=3)


def test_df_ceiling_suppresses_ubiquitous_tokens(ray_session):
    # 'the' appears in all 4 docs (df=4); ceiling 0.5 -> limit 2
    rows = [
        "the the the cat",   # without ceiling 'the' wins; with it: cat
        "the dog dog",
        "the fish",
        "the cat",
    ]
    got = collect(tfidf.top_keywords(make_ds(rows), max_df_frac=0.5))
    assert got[0] == ("cat", 1, 2)
    assert got[1] == ("dog", 2, 1)
    # unthresholded default keeps 'the'
    got_all = collect(tfidf.top_keywords(make_ds(rows)))
    assert got_all[0][0] == "the"


def test_all_tokens_over_ceiling_emit_no_row(ray_session):
    rows = ["the", "the", "the cat"]
    got = collect(tfidf.top_keywords(make_ds(rows), max_df_frac=0.5))
    # 'the' df=3 > floor(0.5*3)=1; 'cat' df=1 <= 1
    assert set(got) == {2}
    assert got[2] == ("cat", 1, 1)


def test_empty_candidate_vocab_yields_no_rows(ray_session):
    # n_docs=1, limit = floor(0.5*1) = 0 -> every token over the ceiling
    got = collect(tfidf.top_keywords(make_ds(["the cat"]), max_df_frac=0.5))
    assert got == {}


def test_max_df_frac_validation(ray_session):
    with pytest.raises(ValueError, match="max_df_frac"):
        tfidf.top_keywords(make_ds(["a"]), max_df_frac=0.0)
    with pytest.raises(ValueError, match="max_df_frac"):
        tfidf.top_keywords(make_ds(["a"]), max_df_frac=1.5)
