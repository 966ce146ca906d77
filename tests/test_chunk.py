"""Overlapping document chunking (engine/chunk.py): window geometry,
coverage, byte-exact rejoin, and validation."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from medea_ray.engine import chunk


def run(texts, C, O, parts=1):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(parts)
    out = pa.concat_tables(
        chunk.chunk_docs(ds, chunk_tokens=C, overlap=O).iter_batches(
            batch_format="pyarrow"
        )
    )
    res: dict = {}
    for r in out.to_pylist():
        res.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["n_chunk_tokens"], r["chunk_text"])
        )
    return {k: sorted(v) for k, v in res.items()}


def naive(texts, C, O):
    S = C - O
    res = {}
    for i, txt in enumerate(texts):
        words = (txt or "").split(" ")
        n = len(words)
        K = 1 if n <= C else 1 + -(-(n - C) // S)
        res[i] = [
            (k, min(k * S + C, n) - k * S,
             " ".join(words[k * S: min(k * S + C, n)]))
            for k in range(K)
        ]
    return res


def test_hand_checked_windows(ray_session):
    txt = " ".join(f"w{j}" for j in range(10))
    got = run([txt], C=4, O=1)  # S=3 -> starts 0,3,6 -> [0,4),[3,7),[6,10)
    assert got[0] == [
        (0, 4, "w0 w1 w2 w3"),
        (1, 4, "w3 w4 w5 w6"),
        (2, 4, "w6 w7 w8 w9"),
    ]


def test_matches_naive_across_layouts(ray_session):
    rng = np.random.default_rng(3)
    texts = [
        " ".join(f"t{rng.integers(40)}" for _ in range(rng.integers(1, 50)))
        for _ in range(80)
    ] + ["", None]
    want = naive(texts, 8, 3)
    for parts in (1, 4):
        assert run(texts, C=8, O=3, parts=parts) == want


def test_short_and_empty_docs_one_chunk(ray_session):
    got = run(["a b", "", None], C=8, O=2)
    assert got[0] == [(0, 2, "a b")]
    assert got[1] == [(0, 1, "")]
    assert got[2] == [(0, 1, "")]


def test_every_token_covered_and_no_empty_chunks(ray_session):
    for n in (1, 7, 8, 9, 15, 16, 17):
        txt = " ".join(str(j) for j in range(n))
        (chunks,) = run([txt], C=8, O=2).values()
        covered = set()
        for k, sz, _ in chunks:
            assert sz >= 1
            covered.update(range(k * 6, k * 6 + sz))
        assert covered == set(range(n)), n


def test_zero_overlap_partitions_exactly(ray_session):
    txt = " ".join(str(j) for j in range(10))
    (chunks,) = run([txt], C=4, O=0).values()
    assert [c[1] for c in chunks] == [4, 4, 2]
    assert " ".join(c[2] for c in chunks) == txt


def test_param_validation():
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk.chunk_docs(None, chunk_tokens=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk.chunk_docs(None, chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError, match="overlap"):
        chunk.chunk_docs(None, chunk_tokens=4, overlap=-1)

# retired round 5 from the 50-slot driver registry (its slot holds
# key_fd_profile); the DuckDB lockstep that used to run in the driver
# sweep lives on here, byte-exact per chunk row
DOC_CHUNKS_SQL = """
    WITH d AS (
      SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS ws
      FROM documents WHERE doc_id IS NOT NULL
    ), k AS (
      SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n,
             unnest(generate_series(0,
               CAST(CASE WHEN len(ws) <= 64 THEN 0
                         ELSE (len(ws) - 64 + 47) // 48 END AS BIGINT)))
               AS ck
      FROM d
    )
    SELECT doc_id,
           CAST(ck AS BIGINT) AS chunk_id,
           CAST(least(ck*48 + 64, n) - ck*48 AS BIGINT) AS n_chunk_tokens,
           COALESCE(array_to_string(ws[ck*48 + 1 : ck*48 + 64], ' '), '')
             AS chunk_text
    FROM k
"""


def test_doc_chunks_duckdb_lockstep(ray_session):
    import duckdb

    from medea_ray.engine import queries as q

    sf = "/root/testdata/sf0.001"
    got = (
        q.doc_chunks(sf)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    exp = (
        con.execute(DOC_CHUNKS_SQL)
        .df()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in ["doc_id", "chunk_id", "n_chunk_tokens", "chunk_text"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
