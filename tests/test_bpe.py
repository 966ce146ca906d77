"""Distributed BPE tokenizer training/encoding (engine/bpe.py)."""

import numpy as np
import pyarrow as pa
import pytest

from medea_ray.engine import bpe
from medea_ray.engine.bpe import EOW


def _mk(texts, ids=None):
    import ray.data as rd

    ids = ids if ids is not None else list(range(len(texts)))
    return rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))


def naive_train(wc, num_merges):
    """Reference trainer: recount every pair from scratch each
    iteration; (count desc, pair asc) choice; stop below count 2."""
    words = [(list(w) + [EOW], c) for w, c in wc if w]
    merges = []
    for _ in range(num_merges):
        counts = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        cands = [(c, p) for p, c in counts.items() if c >= 2]
        if not cands:
            break
        best_c = max(c for c, _ in cands)
        best = min(p for c, p in cands if c == best_c)
        merges.append(best)
        a, b = best
        nxt = []
        for syms, c in words:
            merged, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            nxt.append((merged, c))
        words = nxt
    return merges


def naive_encode(word, merges):
    """Sequential application of merges in training order — must equal
    the rank-greedy encode loop."""
    syms = list(word) + [EOW]
    for a, b in merges:
        merged, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                merged.append(a + b)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        syms = merged
    # positional strip, mirroring encode_word: the marker only ever
    # lives in the last symbol
    if syms and syms[-1] == EOW:
        syms = syms[:-1]
    elif syms and syms[-1].endswith(EOW):
        syms = syms[:-1] + [syms[-1][: -len(EOW)]]
    return [s for s in syms if s]


SENNRICH = (
    "low low low low low lower lower newest newest newest "
    "newest newest newest widest widest widest"
)


def test_classic_corpus_first_merges(ray_session):
    model = bpe.train_bpe(_mk([SENNRICH]), num_merges=10, min_count=1)
    # highest-count pair: ('e','s') ties ('s','t') and ('st','</w>')-chain
    # at 9 each — lexicographic tie-break picks ('e','s') first, then
    # ('es','t'), then ('est','</w>') (Sennrich Fig.1 order)
    assert model.merges[:3] == [("e", "s"), ("es", "t"), ("est", EOW)]
    # 'lowest' decomposes using learned units
    assert model.encode_word("newest")[-1].endswith("est") or \
        "est" in "".join(model.encode_word("newest"))


def test_trainer_vs_naive_reference(ray_session):
    rng = np.random.default_rng(5)
    alpha = list("abcdef")
    texts = [
        " ".join(
            "".join(rng.choice(alpha, size=int(rng.integers(1, 8))))
            for _ in range(int(rng.integers(1, 20)))
        )
        for _ in range(80)
    ]
    model = bpe.train_bpe(_mk(texts).repartition(5), num_merges=40, min_count=1)
    # reference word counts
    wc = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    ref = naive_train(sorted(wc.items()), 40)
    assert model.merges == ref
    assert len(model.merges) == 40  # non-vacuous: corpus supports 40 merges


def test_layout_invariance(ray_session):
    rng = np.random.default_rng(9)
    texts = [
        " ".join(rng.choice(["aa", "ab", "abc", "bca", "ca"], size=10))
        for _ in range(60)
    ]
    m1 = bpe.train_bpe(_mk(texts).repartition(1), num_merges=15, min_count=1)
    m2 = bpe.train_bpe(_mk(texts).repartition(7), num_merges=15, min_count=1)
    assert m1.merges == m2.merges


def test_word_counts_vs_duckdb(ray_session):
    import duckdb

    texts = ["a b b c", "", None, "b  c", "a a a"]
    got = (
        bpe.word_counts(_mk(texts), "text")
        .to_pandas()
        .sort_values("word")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("c", pa.table({"text": texts}))
    oracle = con.execute(
        """
        SELECT w AS word, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(coalesce(text, ''), ' ')) AS w FROM c)
        WHERE w != '' GROUP BY 1 ORDER BY 1
        """
    ).fetch_df()
    assert got["word"].tolist() == oracle["word"].tolist()
    assert got["n"].tolist() == oracle["n"].tolist()


def test_min_count_applied_before_collection(ray_session):
    texts = ["rare common common", "common common"]
    wc = bpe.word_counts(_mk(texts), "text", min_count=2).to_pandas()
    assert set(wc["word"]) == {"common"}


def test_budget_raises_loudly(ray_session):
    texts = ["a b c d e f g h"]
    with pytest.raises(ValueError, match="max_words"):
        bpe.train_bpe(_mk(texts), num_merges=5, min_count=1, max_words=3)


def test_encode_matches_sequential_merges(ray_session):
    texts = [SENNRICH, "low lowest widest newest slowest"]
    model = bpe.train_bpe(_mk(texts), num_merges=25, min_count=1)
    for w in ["low", "lower", "lowest", "newest", "widest", "slowest", "zzz", ""]:
        assert model.encode_word(w) == naive_encode(w, model.merges), w
    # round-trip: concatenated tokens reproduce the word
    for w in ["low", "newest", "unseen"]:
        assert "".join(model.encode_word(w)) == w


def test_literal_eow_marker_in_text_round_trips(ray_session):
    # adversarial web text containing the literal "</w>" marker string:
    # positional stripping must preserve it (review finding, this pass)
    texts = ["a</w> a</w> a</w> b</w>x b</w>x </w> </w>"]
    model = bpe.train_bpe(_mk(texts), num_merges=20, min_count=1)
    for w in ["a</w>", "b</w>x", "</w>", "x</w></w>", "</w>y"]:
        assert "".join(model.encode_word(w)) == w, w
    got = bpe.token_stats(_mk(texts), model).to_pandas()
    # 7 words, each at least one token
    assert got.loc[0, "n_words"] == 7
    assert got.loc[0, "n_tokens"] >= 7


def test_all_null_text_block(ray_session):
    # an all-null block degrades the column to Arrow null type; the
    # split kernels must coalesce instead of crashing (review finding)
    import ray.data as rd

    ds = rd.from_items([{"doc_id": 0, "text": None}, {"doc_id": 1, "text": None}])
    assert bpe.word_counts(ds, "text").count() == 0
    model = bpe.BpeModel(merges=[], n_words_table=0)
    got = bpe.token_stats(ds, model).to_pandas()
    assert got["n_tokens"].tolist() == [0, 0]
    assert got["n_words"].tolist() == [0, 0]


def test_token_stats_stage(ray_session):
    texts = [SENNRICH, "low newest", "", None, "zz  yy"]
    model = bpe.train_bpe(_mk(texts[:2]), num_merges=10, min_count=1)
    got = (
        bpe.token_stats(_mk(texts).repartition(4), model, batch_size=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp_tokens = []
    exp_words = []
    for t in texts:
        ws = [w for w in (t or "").split(" ") if w]
        exp_words.append(len(ws))
        exp_tokens.append(sum(len(model.encode_word(w)) for w in ws))
    assert got["n_words"].tolist() == exp_words
    assert got["n_tokens"].tolist() == exp_tokens
    # merges compress: fewer tokens than characters for trained words
    assert got.loc[0, "n_tokens"] < sum(len(w) for w in texts[0].split(" "))


from hypothesis import given, settings
from hypothesis import strategies as st

# words never contain the split separator; everything else (including
# the literal EOW marker chars < / w >) is fair game
_word = st.text(
    alphabet=st.characters(blacklist_characters=" ", blacklist_categories=("Cs",)),
    min_size=0, max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_word, min_size=1, max_size=30), st.integers(0, 30))
def test_encode_round_trip_property(words, num_merges):
    """For ANY trained model and ANY word (seen or unseen, including
    marker-like text), concatenating encode_word's tokens reproduces
    the word exactly, and every token is non-empty."""
    wc = {}
    for w in words:
        if w:
            wc[w] = wc.get(w, 0) + 2  # count 2 so pairs are mergeable
    model = bpe.BpeModel(
        merges=bpe._train_from_counts(sorted(wc.items()), num_merges),
        n_words_table=len(wc),
    )
    for w in words + ["", "</w>", "x</w>", "</w></w>"]:
        toks = model.encode_word(w)
        assert "".join(toks) == w, (w, toks)
        assert all(toks), (w, toks)


@settings(max_examples=50, deadline=None)
@given(st.lists(_word, min_size=1, max_size=20), st.integers(1, 25))
def test_incremental_trainer_equals_naive_property(words, num_merges):
    """The heap/incremental trainer must equal the recount-from-scratch
    reference for arbitrary word tables (pins the lazy-heap argmax and
    zero-deletion bookkeeping)."""
    wc = {}
    for w in words:
        if w:
            wc[w] = wc.get(w, 0) + 1
    table = sorted(wc.items())
    assert bpe._train_from_counts(table, num_merges) == naive_train(table, num_merges)
