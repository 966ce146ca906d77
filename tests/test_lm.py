"""engine/lm.py — unigram LM training (exact integer counts, block-split
invariant), add-one scoring math, OOV accounting, vocab trim/budget."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from medea_ray.engine import lm

DOCS = [
    "the cat sat on the mat",
    "the dog ate the bone",
    "a cat and a dog",
    None,
    "unique tokens appear once",
]


def _ds(texts, parts=3):
    import ray.data as rd

    df = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    )
    return rd.from_pandas(df).repartition(parts)


def _exact_counts(texts):
    c = Counter()
    for t in texts:
        if t is not None:
            c.update(t.split())
    return dict(c)


def test_train_counts_exact(ray_session):
    model = lm.train_unigram(_ds(DOCS), "text")
    assert model.counts == _exact_counts(DOCS)
    assert model.total == sum(model.counts.values())
    assert model.vocab_size == len(model.counts)


def test_train_block_split_invariant(ray_session):
    a = lm.train_unigram(_ds(DOCS, parts=1), "text")
    b = lm.train_unigram(_ds(DOCS, parts=5), "text")
    assert a.counts == b.counts


def test_logprob_closed_form():
    model = lm.UnigramLM({"a": 3, "b": 1})
    denom = 4 + 2 + 1  # total + V + 1
    got = model.avg_logprob(["a", "b", "zzz"])
    want = (
        math.log(4 / denom) + math.log(2 / denom) + math.log(1 / denom)
    ) / 3
    assert got == pytest.approx(want, rel=0, abs=0)
    assert model.token_evidence(["a", "b", "zzz"]) == (3, 1, 4)


def test_score_stage_evidence_and_perplexity(ray_session):
    model = lm.train_unigram(_ds(DOCS), "text")
    out = pd.DataFrame(
        lm.score(_ds(DOCS), model, id_col="doc_id").take_all()
    ).sort_values("doc_id").reset_index(drop=True)
    counts = _exact_counts(DOCS)
    for r in out.itertuples():
        text = DOCS[r.doc_id]
        toks = [] if text is None else text.split()
        assert r.n_tokens == len(toks)
        assert r.n_oov == sum(1 for t in toks if t not in counts)
        assert r.sum_tok_count == sum(counts.get(t, 0) for t in toks)
        if toks:
            assert r.perplexity == pytest.approx(math.exp(-r.avg_logprob))
        else:
            assert math.isnan(r.avg_logprob) and math.isnan(r.perplexity)


def test_oov_scores_below_in_vocab(ray_session):
    model = lm.train_unigram(_ds(DOCS), "text")
    common = model.avg_logprob(["the", "the"])
    oov = model.avg_logprob(["zzzz", "qqqq"])
    assert oov < common


def test_max_vocab_trim_deterministic():
    counts = {"b": 5, "a": 5, "c": 9, "d": 1}
    keep = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [k for k, _ in keep] == ["c", "a", "b"]  # ties broken by token


def test_max_vocab_applied(ray_session):
    model = lm.train_unigram(_ds(DOCS), "text", max_vocab=3)
    assert model.vocab_size == 3
    full = _exact_counts(DOCS)
    top = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert model.counts == dict(top)


def test_vocab_budget_is_loud(ray_session):
    with pytest.raises(ValueError, match="driver budget"):
        lm.train_unigram(_ds(DOCS), "text", vocab_budget=2)


def test_empty_corpus_model_all_oov(ray_session):
    model = lm.train_unigram(_ds([None, None]), "text")
    assert model.vocab_size == 0 and model.total == 0
    assert model.token_evidence(["x"]) == (1, 1, 0)
    assert model.avg_logprob(["x"]) == math.log(1 / 1)
