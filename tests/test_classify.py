"""Multinomial Naive Bayes (engine/classify.py): distributed train
bit-equality vs a driver reference, block-split invariance, scoring
semantics, and loud-failure contracts."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray

from medea_ray.engine import classify


def driver_model(rows):
    counts: dict = {}
    docs: dict = {}
    for text, label in rows:
        docs[label] = docs.get(label, 0) + 1
        d = counts.setdefault(label, {})
        for tok in (text or "").split():
            d[tok] = d.get(tok, 0) + 1
    return classify.NaiveBayesModel(counts, docs)


ROWS = [
    ("good clean prose with words", "hi"),
    ("more good prose here today", "hi"),
    ("spam spam buy now spam", "lo"),
    ("buy buy spam cheap now", "lo"),
    ("good words again prose clean", "hi"),
]


def make_ds(rows, parts=1):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": [r[0] for r in rows],
            "label": [r[1] for r in rows],
        }
    )
    return ray.data.from_arrow(t).repartition(parts)


def test_train_matches_driver_reference_across_layouts(ray_session):
    want = driver_model(ROWS)
    for parts in (1, 3, 5):
        m = classify.train_nb(make_ds(ROWS, parts))
        assert m.labels == want.labels
        assert m.doc_counts == want.doc_counts
        assert m.counts == want.counts
        assert m.totals == want.totals
        assert m.vocab == want.vocab


def test_classify_matches_reference_scorer(ray_session):
    m = classify.train_nb(make_ds(ROWS))
    ds = make_ds(ROWS + [("unseen tokens only here", "hi")], parts=2)
    out = pa.concat_tables(
        classify.classify(ds, m).iter_batches(batch_format="pyarrow")
    ).to_pylist()
    by_id = {r["doc_id"]: r for r in out}
    texts = [r[0] for r in ROWS] + ["unseen tokens only here"]
    for i, text in enumerate(texts):
        toks = text.split()
        lps = {l: m.doc_log_posterior(toks, l) for l in m.labels}
        want = min(
            m.labels, key=lambda l: (-lps[l], l)
        )  # argmax, smallest label on tie
        r = by_id[i]
        assert r["pred_label"] == want, (i, lps)
        assert r["n_tokens"] == len(toks)
        assert r["margin"] == pytest.approx(
            abs(lps[m.labels[0]] - lps[m.labels[1]])
        )


def test_evidence_integers(ray_session):
    m = classify.train_nb(make_ds(ROWS))
    ds = make_ds([("spam zzz good", "x")])
    (r,) = pa.concat_tables(
        classify.classify(ds, m).iter_batches(batch_format="pyarrow")
    ).to_pylist()
    # zzz is OOV; spam count: lo=4, hi=0; good: hi=3, lo=0
    assert r["n_tokens"] == 3 and r["n_oov"] == 1
    assert r["sum_cnt_lo"] == 4 and r["sum_cnt_hi"] == 3


def test_exact_tie_resolves_to_smallest_label(ray_session):
    sym = [("a b", "c0"), ("a b", "c1")]
    m = classify.train_nb(make_ds(sym))
    (r,) = pa.concat_tables(
        classify.classify(make_ds([("a", "x")]), m).iter_batches(
            batch_format="pyarrow"
        )
    ).to_pylist()
    assert r["pred_label"] == "c0"
    assert r["margin"] == 0.0


def test_null_and_nonstring_labels_raise(ray_session):
    t = pa.table(
        {"doc_id": [0], "text": ["x"], "label": pa.array([None], pa.string())}
    )
    with pytest.raises(Exception, match="null 'label'"):
        classify.train_nb(ray.data.from_arrow(t))
    t2 = pa.table({"doc_id": [0], "text": ["x"], "label": pa.array([1], pa.int64())})
    with pytest.raises(Exception, match="must be string"):
        classify.train_nb(ray.data.from_arrow(t2))
    t3 = pa.table({"doc_id": [0], "text": ["x"], "label": ["a\x00b"]})
    with pytest.raises(Exception, match="NUL"):
        classify.train_nb(ray.data.from_arrow(t3))


def test_empty_training_raises():
    with pytest.raises(ValueError, match="no training documents"):
        classify.NaiveBayesModel({}, {})


def test_null_text_rows_count_as_labeled_docs(ray_session):
    rows = [("w x", "a"), (None, "a"), ("y z", "b")]
    m = classify.train_nb(make_ds(rows))
    assert m.doc_counts == {"a": 2, "b": 1}
    assert m.totals == {"a": 2, "b": 2}


def test_priors_affect_prediction(ray_session):
    # identical token evidence, skewed priors -> majority class wins
    rows = [("t", "maj")] * 9 + [("t", "min")]
    m = classify.train_nb(make_ds(rows))
    (r,) = pa.concat_tables(
        classify.classify(make_ds([("t", "x")]), m).iter_batches(
            batch_format="pyarrow"
        )
    ).to_pylist()
    assert r["pred_label"] == "maj"
    want = math.log(0.9) - math.log(0.1)
    assert r["margin"] == pytest.approx(want)
