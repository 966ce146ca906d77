"""C4-style line cleaning (engine/c4.py): pinned rules, edge cases,
and the Dataset wrapper."""

import pyarrow as pa
import pytest
import ray

from medea_ray.engine import c4


def run(texts, **kw):
    return c4.clean_batch(pa.array(texts, pa.string()), **kw).to_pylist()


def test_line_rules_hand_checked():
    doc = "\n".join(
        [
            "one two three four five.",      # kept: 5 words, terminal .
            "one two three four five",       # dropped: no terminal punct
            "too short line.",               # dropped: 3 words
            'quoted line with five words"',  # kept: terminal "
            "bang line with five words!",    # kept
            "ask line with five words?",     # kept
        ]
    )
    (r,) = run([doc])
    assert r["n_lines"] == 6
    assert r["n_kept_lines"] == 4
    assert r["kept"] is True
    assert r["clean_text"].split("\n") == [
        "one two three four five.",
        'quoted line with five words"',
        "bang line with five words!",
        "ask line with five words?",
    ]


def test_doc_level_tells_drop_the_doc():
    good = "\n".join(["a b c d e."] * 3)
    assert run([good])[0]["kept"] is True
    assert run([good + "\nsome Lorem Ipsum here."])[0]["kept"] is False
    assert run([good + "\ncode with a { brace."])[0]["kept"] is False
    # tells drop the doc but kept lines are still reported/rejoined
    r = run([good + "\nsome lorem ipsum tell here."])[0]
    assert r["n_kept_lines"] == 4 and r["kept"] is False


def test_min_lines_threshold():
    two = "\n".join(["a b c d e."] * 2)
    assert run([two])[0]["kept"] is False
    assert run([two], min_lines=2)[0]["kept"] is True


def test_null_and_empty_text():
    out = c4.clean_batch(pa.array([None, ""], pa.string())).to_pylist()
    for r in out:
        assert r["n_lines"] == 1 and r["n_kept_lines"] == 0
        assert r["kept"] is False and r["clean_text"] == ""


def test_word_count_is_split_arity():
    # "a  b c." splits on single spaces to ['a', '', 'b', 'c.'] = 4
    # words — the DuckDB len(string_split(...)) lockstep definition
    r = run(["a  b c."], min_words_per_line=4)[0]
    assert r["n_kept_lines"] == 1


def test_dataset_wrapper_drops_payload_and_keeps_id(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array([7, 8], pa.int64()),
            "text": ["x y z w v.\n" * 3, "no punct here at all"],
        }
    )
    out = pa.concat_tables(
        c4.c4_line_clean(ray.data.from_arrow(t), id_col="doc_id")
        .iter_batches(batch_format="pyarrow")
    )
    assert out.column_names == [
        "doc_id", "n_lines", "n_kept_lines", "kept", "clean_text"
    ]
    by_id = {r["doc_id"]: r for r in out.to_pylist()}
    assert by_id[7]["kept"] is True and by_id[7]["n_kept_lines"] == 3
    assert by_id[8]["kept"] is False


def test_param_validation():
    with pytest.raises(ValueError, match="min_words_per_line"):
        c4.c4_line_clean(None, min_words_per_line=0)
