"""Composed pretraining corpus-prep pipeline (engine/pretrain.py)."""

import pyarrow as pa
import pytest

from medea_ray.engine import pretrain

GOOD_LINE = "alpha beta gamma delta epsilon zeta."
# long enough that any single n-gram stays far below the Gopher char
# fractions (those thresholds assume real documents, not snippets)
GOOD = "\n".join(
    [
        GOOD_LINE,
        "one two three four five six.",
        "seven eight nine ten eleven twelve more.",
        "red orange yellow green blue indigo violet done.",
        "north south east west upward downward sideways still.",
        "apple pear plum peach cherry grape melon fruit.",
        "stone brick glass steel timber copper iron metal.",
        "river lake ocean pond stream creek delta water.",
    ]
)


def _mk(rows):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "url": [r[0] for r in rows],
        "lang": [r[1] for r in rows],
        "text": [r[2] for r in rows],
    }))


def _corpus():
    rows = []
    # 8 clean docs, distinct texts (unique last line), alternating lang
    for i in range(8):
        rows.append((f"u{i:02d}", "en" if i % 2 else "de",
                     GOOD + f"\nunique tail line number {i} end."))
    # c4 victim: only one valid line (min_lines=3)
    rows.append(("u10", "en", GOOD_LINE))
    # gopher victim: c4-valid but massively repetitive
    spam = "\n".join(["spam spam spam spam spam spam."] * 10)
    rows.append(("u11", "en", spam))
    # dedup pair: identical text, two urls -> min-url survivor
    rows.append(("u12", "de", GOOD + "\nshared duplicate body here now."))
    rows.append(("u13", "de", GOOD + "\nshared duplicate body here now."))
    # decontam victim: clean doc embedding the benchmark passage
    rows.append(("u14", "en", GOOD + "\nleaked question text from bench suite."))
    return rows


BENCH = [("b0", "en", "leaked question text from bench suite.")]


def run(rows, n_blocks=1, **kw):
    args = dict(target_rows=10_000, temperature=1.0, ngram_n=5,
                bpe_merges=5, bpe_min_count=1, batch_size=4)
    args.update(kw)
    corpus, report = pretrain.prepare_corpus(
        _mk(rows).repartition(n_blocks), _mk(BENCH), **args
    )
    return corpus.to_pandas().sort_values("url").reset_index(drop=True), report


def test_stage_accounting_exact(ray_session):
    got, rep = run(_corpus(), n_blocks=3)
    assert rep["n_input"] == 13
    assert rep["n_after_c4"] == 12        # u10 dropped (one valid line)
    assert rep["n_after_gopher"] == 11    # u11 dropped (repetitive)
    assert rep["n_after_dedup"] == 10     # u13 dropped (u12 survives)
    assert rep["n_after_decontam"] == 9   # u14 dropped (bench 5-gram)
    assert rep["n_after_mixture"] == 9    # target >> corpus: keep-all
    assert rep["n_merges"] == 5
    assert rep["n_tokens"] >= rep["n_words"] > 0
    assert set(got["url"]) == {f"u{i:02d}" for i in range(8)} | {"u12"}
    # cleaned text: lines re-joined, content preserved for clean docs
    assert got.loc[0, "text"].startswith(GOOD_LINE)


def test_layout_invariance(ray_session):
    g1, r1 = run(_corpus(), n_blocks=1)
    g2, r2 = run(_corpus(), n_blocks=7)
    assert r1 == r2
    assert g1["url"].tolist() == g2["url"].tolist()
    assert g1["text"].tolist() == g2["text"].tolist()


def test_mixture_stage_downsamples(ray_session):
    # small target: the en/de mix must shrink below the survivor count
    _, rep = run(_corpus(), target_rows=4)
    assert rep["n_after_decontam"] == 9
    assert rep["n_after_mixture"] < 9
    assert rep["n_tokens"] > 0 or rep["n_after_mixture"] == 0
