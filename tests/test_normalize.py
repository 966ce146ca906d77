"""CCNet-style normalization (engine/normalize.py): pinned chain
semantics, per-flag behavior, DuckDB sql_replay lockstep, and the
Dataset wrapper."""

import duckdb
import pyarrow as pa
import pytest
import ray

from medea_ray.engine import normalize as N


def run(texts, **kw):
    return N.normalize_array(pa.array(texts, pa.string()), **kw).to_pylist()


TRICKY = [
    "“Héllo—Wörld” …123",
    "İstanbul ΣΙΓΜΑΣ",
    "tab\tnew\nline\x07bell\x1fctl",
    "a’b′c  multi   space ",
    "ﬁ ligature ½ № pass-through",
    "ВЕРХНИЙ РЕГИСТР Ёё",
    "NBSP here 42",
    "«guillemets» „low” ‚s‚",
    "",
    "   ",
    None,
    "MiXeD 987 café  end",
    "fullwidth１２３ digits stay",
]


def test_chain_hand_checked():
    out = run(TRICKY)
    assert out[0] == '"hello-world" ...000'
    assert out[1] == "istanbul σιγμασ"
    # \x07 and \x1f stripped, \t and \n collapse to single spaces
    assert out[2] == "tab new linebellctl"
    assert out[3] == "a'b'c multi space"
    # ligature / fraction / numero have no pinned ASCII reading: unchanged
    assert out[4] == "ﬁ ligature ½ № pass-through"
    assert out[5] == (
        "верхнии "
        "регистр ее"
    )
    assert out[6] == "nbsp here 00"
    assert out[7] == '"guillemets" "low" \'s\''
    assert out[8] == "" and out[9] == "" and out[10] is None
    assert out[11] == "mixed 000 cafe end"
    # RE2 [0-9] is ASCII-only (documented divergence from cc_net's \d)
    assert out[12] == "fullwidth１２３ digits stay"


def test_flags_individually():
    t = ["A\x07b “q” 5  é "]
    assert run(t) == ['ab "q" 0 e']
    # \x07 survives when not stripped (it is not RE2 \s)
    assert run(t, strip_nonprint=False) == ['a\x07b "q" 0 e']
    # punct off: curly quotes survive
    assert run(t, punct=False) == ["ab “q” 0 e"]
    assert run(t, lowercase=False) == ['Ab "q" 0 e']
    assert run(t, strip_accents=False) == ['ab "q" 0 é']
    assert run(t, digits_zero=False) == ['ab "q" 5 e']
    # collapse off: double/trailing spaces kept, digits still replaced
    assert run(t, collapse_ws=False) == ['ab "q" 0  e ']


def test_sql_replay_lockstep_all_flag_combos():
    """normalize_array and sql_replay are generated from the same table;
    this differential proves the DuckDB rendering matches the Arrow
    kernels byte-for-byte on the tricky corpus, for the default chain
    and for each single-flag-off variant."""
    con = duckdb.connect()
    combos = [{}] + [
        {f: False}
        for f in (
            "strip_nonprint",
            "punct",
            "lowercase",
            "strip_accents",
            "digits_zero",
            "collapse_ws",
        )
    ]
    for flags in combos:
        expr = N.sql_replay("?", **flags)
        got = run(TRICKY, **flags)
        for t, a in zip(TRICKY, got):
            d = con.execute(f"select {expr}", [t]).fetchone()[0]
            assert a == d, (flags, t, a, d)


def test_sql_replay_rejects_unknown_flag():
    with pytest.raises(ValueError, match="unknown normalize flags"):
        N.sql_replay("x", nope=True)


def test_dataset_wrapper(ray_session):
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(TRICKY[:8])]
    )
    out = N.normalize_text(ds, "text").take_all()
    assert [r["norm_text"] for r in sorted(out, key=lambda r: r["doc_id"])] == run(
        TRICKY[:8]
    )
    # original column preserved alongside
    assert {"doc_id", "text", "norm_text"} <= set(out[0].keys())


def test_out_col_clash_raises(ray_session):
    ds = ray.data.from_items([{"text": "x"}])
    with pytest.raises(ValueError, match="out_col"):
        N.normalize_text(ds, "text", out_col="text")
