"""Domain-mixture sampling (engine/sampling.py mixture family)."""

import hashlib

import pyarrow as pa
import pytest

from medea_ray.engine import sampling


def _mk(rows):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": [r[0] for r in rows],
        "source": [r[1] for r in rows],
    }))


def _pref(v, k=6):
    return hashlib.md5(str(v).encode()).hexdigest()[:k]


def test_rates_hand_checked():
    counts = {"web": 1000, "books": 10}
    # explicit weights: half the 100-row target from each source
    th = sampling.mixture_rates(counts, target_rows=100,
                                weights={"web": 1, "books": 1})
    # books: take 50 >= 10 rows -> keep-all sentinel
    assert th["books"] == "g"
    # web: rate 50/1000 = 0.05 -> floor(0.05 * 16^6) in hex
    assert th["web"] == format(int(0.05 * 16**6), "x").rjust(6, "0")
    plan = sampling.mixture_plan(counts, th)
    assert plan["books"] == 10
    assert plan["web"] == 1000 * int(th["web"], 16) // 16**6


def test_temperature_flattens():
    counts = {"en": 90000, "sw": 100}
    t1 = sampling.mixture_rates(counts, target_rows=1000, temperature=1.0)
    t5 = sampling.mixture_rates(counts, target_rows=1000, temperature=0.5)
    p1 = sampling.mixture_plan(counts, t1)
    p5 = sampling.mixture_plan(counts, t5)
    # tau<1 shifts share toward the low-resource source
    assert p5["sw"] > p1["sw"]
    assert p5["en"] < p1["en"]
    # tau=0 -> equal target shares (sw capped at its 100 rows)
    t0 = sampling.mixture_rates(counts, target_rows=1000, temperature=0.0)
    assert t0["sw"] == "g"


def test_bad_args():
    counts = {"a": 10}
    with pytest.raises(ValueError, match="exactly one"):
        sampling.mixture_rates(counts, target_rows=5)
    with pytest.raises(ValueError, match="exactly one"):
        sampling.mixture_rates(counts, target_rows=5, weights={"a": 1},
                               temperature=1.0)
    with pytest.raises(ValueError, match="absent"):
        sampling.mixture_rates(counts, target_rows=5, weights={"typo": 1})
    with pytest.raises(ValueError, match=">= 0"):
        sampling.mixture_rates(counts, target_rows=5, weights={"a": -1})
    with pytest.raises(ValueError, match="empty"):
        sampling.mixture_rates({}, target_rows=5, temperature=1.0)


def test_mixture_sample_vs_duckdb(ray_session):
    """Lockstep: DuckDB recomputes counts, thresholds (driven by the
    same closed form) and the md5-prefix filter from scratch."""
    import duckdb

    rows = [(i, ["web", "web", "web", "books", "wiki"][i % 5]) for i in range(500)]
    rows += [(None, "web"), (900, None)]  # null id / null source: dropped
    ds = _mk(rows).repartition(4)
    got = (
        sampling.mixture_sample(
            ds, "doc_id", "source", target_rows=150,
            weights={"web": 2, "books": 1, "wiki": 1},
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    counts = {"web": 300, "books": 100, "wiki": 100}
    th = sampling.mixture_rates(counts, target_rows=150,
                                weights={"web": 2, "books": 1, "wiki": 1})
    con = duckdb.connect()
    con.register("c", pa.table({
        "doc_id": [r[0] for r in rows], "source": [r[1] for r in rows]
    }))
    cases = " ".join(
        f"WHEN source = '{s}' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) < '{t}'"
        for s, t in th.items()
    )
    oracle = con.execute(
        f"""
        SELECT doc_id, source FROM c
        WHERE doc_id IS NOT NULL AND source IS NOT NULL
          AND (CASE {cases} ELSE FALSE END)
        ORDER BY doc_id
        """
    ).fetch_df()
    assert got["doc_id"].tolist() == oracle["doc_id"].tolist()
    assert got["source"].tolist() == oracle["source"].tolist()
    assert 0 < len(got) < 500  # non-vacuous both ways


def test_mixture_sample_layout_invariant(ray_session):
    rows = [(i, "ab"[i % 2]) for i in range(300)]
    kept1 = set(
        sampling.mixture_sample(_mk(rows).repartition(1), "doc_id", "source",
                                target_rows=100, temperature=0.7)
        .to_pandas()["doc_id"]
    )
    kept2 = set(
        sampling.mixture_sample(_mk(rows).repartition(9), "doc_id", "source",
                                target_rows=100, temperature=0.7)
        .to_pandas()["doc_id"]
    )
    assert kept1 == kept2 and kept1


def test_expected_take_accuracy(ray_session):
    # md5 prefixes are uniform: realized take within a loose band of the
    # planned expectation
    rows = [(i, "web") for i in range(4000)] + [(i + 4000, "books") for i in range(200)]
    got = sampling.mixture_sample(
        _mk(rows), "doc_id", "source", target_rows=1000,
        weights={"web": 4, "books": 1},
    ).to_pandas()
    by = got.groupby("source").size()
    assert by.get("books", 0) == 200  # capped: keep-all
    assert 600 <= by.get("web", 0) <= 1000  # expect ~800


def test_score_weighted_sample_vs_duckdb(ray_session):
    """Exact integer cross-multiplication rule replayed in SQL: keep iff
    int(md5(id)[:6], 16) * denom < num * 16^6."""
    import duckdb
    import ray.data as rd

    rows = [{"doc_id": i, "score": i % 11, "den": 10} for i in range(400)]
    rows += [{"doc_id": None, "score": 5, "den": 10},
             {"doc_id": 900, "score": None, "den": 10},
             {"doc_id": 901, "score": 5, "den": None},
             {"doc_id": 902, "score": 5, "den": 0},
             {"doc_id": 903, "score": 0, "den": 10},   # never kept
             {"doc_id": 904, "score": 99, "den": 10}]  # always kept
    ds = rd.from_items(rows).repartition(4)
    got = (
        sampling.score_weighted_sample(ds, "doc_id", "score", "den")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("c", pa.table({
        "doc_id": [r["doc_id"] for r in rows],
        "score": [r["score"] for r in rows],
        "den": [r["den"] for r in rows],
    }))
    oracle = con.execute(
        """
        SELECT doc_id FROM c
        WHERE doc_id IS NOT NULL AND score IS NOT NULL
          AND den IS NOT NULL AND den > 0
          AND CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
              * den < score * 16777216
        ORDER BY doc_id
        """
    ).fetch_df()
    assert got["doc_id"].tolist() == oracle["doc_id"].tolist()
    ids = set(got["doc_id"])
    assert 903 not in ids and 904 in ids
    assert 0 < len(got) < len(rows)  # non-vacuous both directions


def test_score_weighted_sample_rate_band(ray_session):
    import ray.data as rd

    # constant denom: score 3/10 -> ~30% survival, score 9/10 -> ~90%
    rows = [{"doc_id": i, "score": 3} for i in range(2000)]
    rows += [{"doc_id": i + 10_000, "score": 9} for i in range(2000)]
    got = sampling.score_weighted_sample(
        rd.from_items(rows), "doc_id", "score", denom=10
    ).to_pandas()
    lo = (got["doc_id"] < 10_000).sum()
    hi = (got["doc_id"] >= 10_000).sum()
    assert 450 <= lo <= 750       # ~600 expected
    assert 1650 <= hi <= 1950     # ~1800 expected


def test_score_weighted_sample_bad_args(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"doc_id": 1, "score": 1}])
    with pytest.raises(ValueError, match="exactly one"):
        sampling.score_weighted_sample(ds, "doc_id", "score")
    with pytest.raises(ValueError, match="exactly one"):
        sampling.score_weighted_sample(ds, "doc_id", "score", "den", denom=10)
    with pytest.raises(ValueError, match="denom must be"):
        sampling.score_weighted_sample(ds, "doc_id", "score", denom=0)


def test_prefix_len_validated(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"doc_id": 1, "score": 1, "source": "a"}])
    with pytest.raises(ValueError, match="prefix_len"):
        sampling.score_weighted_sample(ds, "doc_id", "score", denom=10,
                                       prefix_len=40)
    with pytest.raises(ValueError, match="prefix_len"):
        sampling.score_weighted_sample(ds, "doc_id", "score", denom=10,
                                       prefix_len=0)
    with pytest.raises(ValueError, match="prefix_len"):
        sampling.mixture_rates({"a": 1}, target_rows=1, temperature=1.0,
                               prefix_len=0)
