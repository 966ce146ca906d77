"""Corpus-wide paragraph dedup (engine/paradedup.py): keep-first
semantics, block-layout invariance, guards."""

import pyarrow as pa
import pytest
import ray
import ray.data as rd

from medea_ray.engine import paradedup


def run(rows, n_blocks=3, **kw):
    ds = rd.from_items(rows).repartition(n_blocks)
    out = paradedup.dedup_paragraphs(ds, **kw).take_all()
    return {r["doc_id"]: r for r in out}


ROWS = [
    {"doc_id": 3, "text": "unique three\nSHARED LINE\nend3"},
    {"doc_id": 1, "text": "unique one\nSHARED LINE\nSHARED LINE\nend1"},
    {"doc_id": 2, "text": "unique two\nSHARED LINE\n\nend2"},
    {"doc_id": 4, "text": None},
    {"doc_id": 5, "text": ""},
]


def test_keep_first_semantics(ray_session):
    out = run(ROWS)
    # doc 1 owns SHARED LINE (min rank): keeps its FIRST instance only
    assert out[1]["clean_text"] == "unique one\nSHARED LINE\nend1"
    assert out[1]["n_paras"] == 4 and out[1]["n_kept_paras"] == 3
    # every other instance drops; blank line is exempt (len < min_chars)
    assert out[2]["clean_text"] == "unique two\n\nend2"
    assert out[3]["clean_text"] == "unique three\nend3"
    # null text stays null, empty text is one empty always-kept paragraph
    assert out[4]["clean_text"] is None and out[4]["n_paras"] == 0
    assert out[5]["clean_text"] == "" and out[5]["n_paras"] == 1


def test_block_layout_invariance(ray_session):
    a = run(ROWS, n_blocks=1)
    b = run(ROWS, n_blocks=5)
    assert a == b


def test_batch_local_min_not_first_seen(ray_session):
    # one block, higher-id doc FIRST within the batch: the combiner must
    # keep the batch-local min rank, not the first-seen rank
    rows = [
        {"doc_id": 9, "text": "DUP PARA\nx9"},
        {"doc_id": 2, "text": "DUP PARA\nx2"},
    ]
    out = run(rows, n_blocks=1)
    assert out[2]["clean_text"] == "DUP PARA\nx2"
    assert out[9]["clean_text"] == "x9"


def test_min_chars_exempts_short_lines(ray_session):
    rows = [
        {"doc_id": 1, "text": "ab\nlong shared paragraph"},
        {"doc_id": 2, "text": "ab\nlong shared paragraph"},
    ]
    out = run(rows, min_chars=5)
    # 'ab' is too short to be a candidate: kept in both docs
    assert out[1]["clean_text"] == "ab\nlong shared paragraph"
    assert out[2]["clean_text"] == "ab"


def test_custom_separator(ray_session):
    rows = [
        {"doc_id": 1, "text": "keep one\n\nSHARED BLOCK\nline2"},
        {"doc_id": 2, "text": "SHARED BLOCK\nline2\n\nkeep two"},
    ]
    out = run(rows, sep="\n\n")
    assert out[1]["clean_text"] == "keep one\n\nSHARED BLOCK\nline2"
    assert out[2]["clean_text"] == "keep two"


def test_duplicate_doc_ids_tie_keeps_both(ray_session):
    # exact rank ties (same doc_id, same idx) keep both instances —
    # documented deterministic under-dedup; id uniqueness is the
    # caller's contract
    rows = [
        {"doc_id": 7, "text": "TIED PARA"},
        {"doc_id": 7, "text": "TIED PARA"},
        {"doc_id": 8, "text": "TIED PARA"},
    ]
    out = paradedup.dedup_paragraphs(
        rd.from_items(rows).repartition(2), min_chars=1
    ).take_all()
    kept = sorted((r["doc_id"], r["clean_text"]) for r in out)
    assert kept == [(7, "TIED PARA"), (7, "TIED PARA"), (8, "")]


def test_id_overflow_raises(ray_session):
    rows = [{"doc_id": 1 << 50, "text": "x"}]
    with pytest.raises(Exception, match="pack a rank"):
        run(rows, n_blocks=1)


def test_negative_id_raises(ray_session):
    with pytest.raises(Exception, match="pack a rank"):
        run([{"doc_id": -1, "text": "x"}], n_blocks=1)


def test_too_many_paragraphs_raises(ray_session):
    rows = [{"doc_id": 1, "text": "a\nb\nc\nd\ne"}]
    with pytest.raises(Exception, match="raise idx_bits"):
        run(rows, n_blocks=1, idx_bits=2)


def test_owner_budget_raises_loudly(ray_session):
    rows = [
        {"doc_id": 1, "text": "DUP"},
        {"doc_id": 2, "text": "DUP"},
    ]
    with pytest.raises(ValueError, match="owner_budget_rows"):
        run(rows, n_blocks=1, owner_budget_rows=0)


def test_owners_table(ray_session):
    ds = rd.from_items(ROWS).repartition(2)
    owners = {
        r["md5"]: (r["owner_rank"], r["n"])
        for r in paradedup.duplicated_paragraph_owners(ds).take_all()
    }
    import hashlib

    h = hashlib.md5(b"SHARED LINE").hexdigest()
    # owner = doc 1, idx 1 -> rank 1*2^20 + 1; 4 instances corpus-wide
    assert owners == {h: ((1 << 20) + 1, 4)}


def test_owner_map_cached_per_process(ray_session):
    # ray.get of a dict re-deserializes on every call; the rejoin stage
    # must pay that once per worker process, not once per batch (review
    # finding, this pass). Identity check: the second lookup returns the
    # SAME object; a new ref evicts the old entry (bounded cache).
    import ray

    ref1 = ray.put({"a": 1})
    m1 = paradedup._cached_owner_map(ref1)
    assert paradedup._cached_owner_map(ref1) is m1
    ref2 = ray.put({"b": 2})
    m2 = paradedup._cached_owner_map(ref2)
    assert m2 == {"b": 2}
    assert len(paradedup._OWNER_CACHE) == 1  # old map evicted


def test_large_string_text_column(ray_session):
    """Parquet readers emit large_string for big text columns; both
    passes must handle it (binary_join only has a list<string> kernel —
    regression found by the sf0.1 bench fixture)."""
    import pyarrow as pa
    import ray.data as rd

    from medea_ray.engine import paradedup

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(
            ["dup line\nuniq a", "dup line\nuniq b", None], pa.large_string()
        ),
    })
    out = (
        paradedup.dedup_paragraphs(rd.from_arrow(t), "text", "doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["clean_text"].tolist()[:2] == ["dup line\nuniq a", "uniq b"]
    assert out["clean_text"].isna().tolist() == [False, False, True]
    assert out["n_kept_paras"].tolist() == [2, 1, 0]
