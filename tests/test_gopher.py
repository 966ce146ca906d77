"""Gopher repetition/quality signals (engine/gopher.py)."""

import numpy as np
import pyarrow as pa
import pytest

from medea_ray.engine import gopher


def naive_repetition(text, top_ns=gopher.TOP_NS, dup_ns=gopher.DUP_NS):
    """Per-doc reference: dict counting + explicit span union."""
    words = (text or "").split(" ")
    out = {"n_words": len(words)}
    for n in top_ns:
        best = 0
        counts = {}
        for i in range(len(words) - n + 1):
            g = " ".join(words[i : i + n])
            counts[g] = counts.get(g, 0) + 1
        for g, c in counts.items():
            best = max(best, c * len(g))
        out[f"top{n}_chars"] = best
    for n in dup_ns:
        counts = {}
        for i in range(len(words) - n + 1):
            g = tuple(words[i : i + n])
            counts[g] = counts.get(g, 0) + 1
        covered = set()
        for i in range(len(words) - n + 1):
            if counts[tuple(words[i : i + n])] >= 2:
                covered.update(range(i, i + n))
        out[f"dup{n}_chars"] = sum(len(words[j]) for j in covered)
    return out


def check_batch(texts):
    got = gopher.repetition_kernel(pa.array(texts, pa.string()))
    for row, text in enumerate(texts):
        want = naive_repetition(text)
        for k, v in want.items():
            assert got[k][row] == v, (k, row, text, got[k][row], v)


def test_kernel_matches_naive_on_random_word_soup():
    rng = np.random.default_rng(7)
    vocab = ["a", "bb", "ccc", "dd", "e", "spark", "xx"]
    texts = []
    for _ in range(60):
        n = int(rng.integers(0, 40))
        words = list(rng.choice(vocab, size=n))
        # plant runs / repeats so dup5..10 are non-vacuous
        if rng.random() < 0.5 and n > 0:
            words += ["r1", "r2", "r3"] * int(rng.integers(2, 6))
        texts.append(" ".join(words))
    check_batch(texts)


def test_kernel_edges():
    check_batch(["", "one", "a a a a a a a a a a a a", "x y", None and ""])
    # null text counts as ''
    got = gopher.repetition_kernel(pa.array([None, "a a a"], pa.string()))
    assert got["n_words"][0] == 1  # ''.split(' ') == ['']
    assert got["top2_chars"][1] == 2 * 3  # "a a" twice, len 3


def test_kernel_hand_computed():
    # "p q p q p q" : top2 "p q" count 3 len 3 -> 9; "q p" count 2 -> 6
    got = gopher.repetition_kernel(
        pa.array(["p q p q p q"], pa.string()), top_ns=(2,), dup_ns=(3,)
    )
    assert got["top2_chars"][0] == 9
    # 3-grams: "p q p" x2, "q p q" x2 -> all 6 words covered, chars=6
    assert got["dup3_chars"][0] == 6


def test_dup_line_stats():
    texts = pa.array(
        ["a\nbb\na\na\nccc", "x\ny", "", None, "s\ns\ns"], pa.string()
    )
    got = gopher.dup_line_stats(texts)
    assert got["n_lines"].tolist() == [5, 2, 1, 1, 3]
    assert got["dup_lines"].tolist() == [2, 0, 0, 0, 2]
    assert got["dup_line_chars"].tolist() == [2, 0, 0, 0, 2]


def test_repetition_stats_distributed_equals_kernel(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    vocab = ["w%d" % i for i in range(9)]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(1, 30))))
        + (" spam ham eggs" * 4 if i % 3 == 0 else "")
        for i in range(400)
    ]
    ids = list(range(400))
    ds = rd.from_arrow(
        pa.table({"doc_id": ids, "text": texts})
    ).repartition(7)
    out = (
        gopher.repetition_stats(ds, "text", id_col="doc_id", batch_size=64)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = gopher.repetition_kernel(pa.array(texts, pa.string()))
    for k, v in ref.items():
        assert out[k].to_numpy().tolist() == v.tolist(), k
    assert (out["n_text_chars"] == [len(t) for t in texts]).all()


def test_flag_repetitive(ray_session):
    import ray.data as rd

    texts = ["spam ham " * 50, " ".join("w%d" % i for i in range(60)), ""]
    ds = rd.from_arrow(pa.table({"doc_id": [0, 1, 2], "text": texts}))
    out = (
        gopher.flag_repetitive(
            gopher.repetition_stats(ds, "text", id_col="doc_id")
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["repetitive"].tolist() == [True, False, False]


def test_kernel_sliced_chunked_input():
    texts = pa.chunked_array(
        [pa.array(["a a a a", "b c"], pa.string()), pa.array(["a a"], pa.string())]
    )
    got = gopher.repetition_kernel(texts, top_ns=(2,), dup_ns=(2,))
    assert got["top2_chars"].tolist() == [9, 3, 3]
    assert got["dup2_chars"].tolist() == [4, 0, 0]


def test_kernel_rejects_unigrams():
    with pytest.raises(ValueError, match=">= 2"):
        gopher.repetition_kernel(pa.array(["a a"], pa.string()), top_ns=(1, 2))
    with pytest.raises(ValueError, match=">= 2"):
        gopher.repetition_kernel(pa.array(["a a"], pa.string()), top_ns=(), dup_ns=())
