"""Sequence packing (engine/pack.py): exactness vs a naive reference,
block-layout invariance, boundary math, and loud-failure contracts."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from medea_ray.engine import pack


def naive_pack(ids, n_tokens, seq_len):
    """Driver-side reference: sort by id, global cumsum, chunk."""
    order = np.argsort(ids, kind="stable")
    ids = np.asarray(ids, np.int64)[order]
    n = np.asarray(n_tokens, np.int64)[order]
    ends = np.cumsum(n)
    starts = ends - n
    seq_first = starts // seq_len
    seq_last = np.where(n > 0, (ends - 1) // seq_len, seq_first)
    return {
        int(i): (int(s), int(e), int(f), int(l))
        for i, s, e, f, l in zip(ids, starts, ends, seq_first, seq_last)
    }


def as_map(ds):
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    return {
        int(r["doc_id"]): (
            int(r["tok_start"]), int(r["tok_end"]),
            int(r["seq_first"]), int(r["seq_last"]),
        )
        for r in t.to_pylist()
    }


def test_matches_naive_reference_text_tokens():
    rng = np.random.default_rng(7)
    ids = rng.permutation(200).astype(np.int64)
    texts = [" ".join(f"w{j}" for j in range(rng.integers(1, 40))) for _ in ids]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": ids, "text": texts})
    ).repartition(7)
    got = as_map(pack.pack_sequences(ds, seq_len=64, bucket_width=32))
    n = [t.count(" ") + 1 for t in texts]
    want = naive_pack(ids, n, 64)
    assert got == want


def test_block_layout_invariance():
    ids = np.arange(150, dtype=np.int64)
    toks = (ids % 17 + 1).astype(np.int64)
    t = pa.table({"doc_id": ids, "n": toks})
    outs = []
    for parts in (1, 4, 13):
        ds = ray.data.from_arrow(t).repartition(parts)
        outs.append(
            as_map(pack.pack_sequences(ds, tokens_col="n", seq_len=32,
                                       bucket_width=40))
        )
    assert outs[0] == outs[1] == outs[2] == naive_pack(ids, toks, 32)


def test_boundary_math_hand_checked():
    # docs of 3,5,4 tokens, seq_len=4:
    # doc0 [0,3) seq 0-0; doc1 [3,8) seq 0-1; doc2 [8,12) seq 2-2
    ds = ray.data.from_arrow(
        pa.table({"doc_id": [0, 1, 2], "n": [3, 5, 4]})
    )
    got = as_map(pack.pack_sequences(ds, tokens_col="n", seq_len=4))
    assert got == {0: (0, 3, 0, 0), 1: (3, 8, 0, 1), 2: (8, 12, 2, 2)}


def test_zero_token_doc_occupies_empty_interval():
    ds = ray.data.from_arrow(
        pa.table({"doc_id": [0, 1, 2], "n": [4, 0, 2]})
    )
    got = as_map(pack.pack_sequences(ds, tokens_col="n", seq_len=4))
    assert got[1] == (4, 4, 1, 1)
    assert got[2] == (4, 6, 1, 1)


def test_empty_and_null_text_count_one_token():
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["", None], pa.string())})
    )
    got = as_map(pack.pack_sequences(ds, seq_len=8))
    assert got == {0: (0, 1, 0, 0), 1: (1, 2, 0, 0)}


def test_null_id_raises():
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1, None], pa.int64()),
                  "text": ["a", "b"]})
    )
    with pytest.raises(Exception, match="null 'doc_id'"):
        pack.pack_sequences(ds, seq_len=8).materialize()


def test_duplicate_id_raises():
    ds = ray.data.from_arrow(
        pa.table({"doc_id": [3, 3], "n": [1, 2]})
    )
    with pytest.raises(Exception, match="duplicate"):
        pack.pack_sequences(ds, tokens_col="n", seq_len=8).materialize()


def test_bucket_row_budget_raises():
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(10)), "n": [1] * 10})
    )
    with pytest.raises(ValueError, match="max_bucket_rows"):
        pack.pack_sequences(ds, tokens_col="n", seq_len=8,
                            bucket_width=100, max_bucket_rows=5)


def test_param_validation():
    ds = ray.data.from_arrow(pa.table({"doc_id": [0], "n": [1]}))
    with pytest.raises(ValueError, match="seq_len"):
        pack.pack_sequences(ds, tokens_col="n", seq_len=0)
    with pytest.raises(Exception, match="negative"):
        pack.pack_sequences(
            ray.data.from_arrow(pa.table({"doc_id": [0], "n": [-1]})),
            tokens_col="n", seq_len=4,
        ).materialize()
