"""Dedup family, text analysis, similarity search, multimodal plumbing —
over the driver testdata tables (documents / embeddings) and the synthetic
pages table."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from medea_ray.engine.dedup import (
    exact_dup_groups,
    dedup_exact,
    jaccard,
    minhash_candidate_groups,
    simhash64,
    simhash_candidates,
)
from medea_ray.engine.multimodal import MediaFeatureExtractor, extract_media_features
from medea_ray.engine.similarity import embedding_near_dup, knn_bruteforce, knn_lsh
from medea_ray.engine.text import (
    add_text_features,
    add_token_counts,
    detect_lang,
    fingerprint64,
    token_count_ws,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/embeddings.parquet")


# -- exact dedup -------------------------------------------------------------


def test_exact_dup_groups_vs_duckdb(docs_ds):
    got = {
        (r["content_md5"], r["n"], r["keep_id"])
        for r in exact_dup_groups(docs_ds, "doc_id").take_all()
    }
    exp = set(
        duckdb.sql(
            f"SELECT md5(text), count(*), min(doc_id) FROM '{SF}/documents.parquet' "
            "GROUP BY 1 HAVING count(*) > 1"
        ).fetchall()
    )
    assert got == exp


def test_dedup_exact_keeps_one_per_text(docs_ds):
    kept = dedup_exact(docs_ds, "doc_id").to_pandas()
    (n_distinct,) = duckdb.sql(
        f"SELECT count(DISTINCT text) FROM '{SF}/documents.parquet'"
    ).fetchone()
    assert len(kept) == n_distinct
    # survivors are the min doc_id of each group
    exp_ids = {
        r[0]
        for r in duckdb.sql(
            f"SELECT min(doc_id) FROM '{SF}/documents.parquet' GROUP BY text"
        ).fetchall()
    }
    assert set(kept["doc_id"]) == exp_ids


# -- near-dup ---------------------------------------------------------------


def _near_dup_corpus(ray_session):
    import ray.data as rd

    base = pq.read_table(f"{SF}/documents.parquet").to_pylist()[:100]
    rows = []
    for r in base:
        rows.append({"doc_id": r["doc_id"] * 10, "text": r["text"]})
        words = r["text"].split()
        if len(words) > 10:
            # near-duplicate: drop one word in the middle
            mutated = " ".join(words[: len(words) // 2] + words[len(words) // 2 + 1 :])
            rows.append({"doc_id": r["doc_id"] * 10 + 1, "text": mutated})
    return rd.from_items(rows), rows


def test_minhash_lsh_finds_near_dups(ray_session):
    ds, rows = _near_dup_corpus(ray_session)
    cand = minhash_candidate_groups(ds, "doc_id", concurrency=2).to_pandas()
    pairs = set()
    for ids in cand["ids"]:
        for a in ids:
            for b in ids:
                if a < b:
                    pairs.add((a, b))
    planted = {
        (r["doc_id"] - 1, r["doc_id"]) for r in rows if r["doc_id"] % 10 == 1
    }
    recall = len(pairs & planted) / len(planted)
    assert recall > 0.9, (recall, len(planted))
    # verify stage: planted pairs really are high-jaccard
    by_id = {r["doc_id"]: r["text"] for r in rows}
    for a, b in list(planted)[:10]:
        assert jaccard(by_id[a], by_id[b]) > 0.5


def test_near_dup_pairs_verified(ray_session):
    from medea_ray.engine.dedup import near_dup_pairs

    ds, rows = _near_dup_corpus(ray_session)
    pairs = near_dup_pairs(ds, "doc_id", threshold=0.5, concurrency=2)
    found = {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    planted = {(r["doc_id"] - 1, r["doc_id"]) for r in rows if r["doc_id"] % 10 == 1}
    # verified pairs must include most planted near-dups and every reported
    # jaccard must clear the threshold
    assert len(found & planted) / len(planted) > 0.85
    assert (pairs["jaccard"] >= 0.5).all()


def test_near_dup_pairs_estimate_mode(ray_session):
    """Signature-only verification (constant shuffle volume per row):
    recall on planted near-dups stays high and the minhash-agreement
    estimate tracks exact Jaccard within the k=64 sampling error."""
    from medea_ray.engine.dedup import near_dup_pairs

    ds, rows = _near_dup_corpus(ray_session)
    est = near_dup_pairs(ds, "doc_id", threshold=0.5, concurrency=2, verify="estimate")
    found = {(int(a), int(b)): j for a, b, j in zip(est["id_a"], est["id_b"], est["jaccard"])}
    planted = {(r["doc_id"] - 1, r["doc_id"]) for r in rows if r["doc_id"] % 10 == 1}
    assert len(set(found) & planted) / len(planted) > 0.85
    by_id = {r["doc_id"]: r["text"] for r in rows}
    for (a, b), j_est in list(found.items())[:20]:
        j_exact = jaccard(by_id[a], by_id[b])
        assert abs(j_est - j_exact) < 0.25, (a, b, j_est, j_exact)


def test_near_dup_pairs_no_self_pairs_on_duplicate_ids(ray_session):
    """Duplicate id rows (e.g. a re-ingested file) must not report a row
    as a near-duplicate of itself in either verify mode."""
    import ray.data as rd

    from medea_ray.engine.dedup import near_dup_pairs

    text = "a page that appears twice under the same id after a partial re-ingest run"
    rows = [{"doc_id": 1, "text": text}, {"doc_id": 1, "text": text},
            {"doc_id": 2, "text": text}]
    ds = rd.from_items(rows)
    for mode in ("exact", "estimate"):
        pairs = near_dup_pairs(ds, "doc_id", threshold=0.5, concurrency=2, verify=mode)
        assert (pairs["id_a"] != pairs["id_b"]).all(), mode
        assert set(zip(pairs["id_a"], pairs["id_b"])) == {(1, 2)}, mode


def test_knn_ivf_recall(ray_session):
    import ray.data as rd

    from medea_ray.engine.similarity import knn_ivf

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    rng = np.random.default_rng(7)
    queries = rng.standard_normal((3, 64)).astype(np.float32)
    got = knn_ivf(emb, queries, k=10, n_cells=16, n_probe=8).to_pandas()
    exp = _oracle_topk(queries, 10)
    recalls = []
    for qi in range(3):
        ids = set(got[got["query_id"] == qi]["vec_id"].tolist())
        recalls.append(len(ids & set(exp[qi])) / 10)
    assert np.mean(recalls) >= 0.6, recalls


def test_simhash_properties():
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy cat again and again today"
    c = "completely different content about ray data streaming execution"
    ha, hb, hc = simhash64(a), simhash64(b), simhash64(c)
    assert bin(ha ^ hb).count("1") < bin(ha ^ hc).count("1")
    assert simhash64(a) == ha  # deterministic


def test_simhash64_matches_reference_loop():
    """The vectorized kernel must be bit-identical to the definitional
    per-word ±1 accumulation (the round-1 implementation)."""
    import re

    from medea_ray.engine.dedup import hash_bytes

    word_re = re.compile(r"\w+", re.UNICODE)

    def reference(text):
        acc = np.zeros(64, dtype=np.int64)
        for w in word_re.findall(text.lower()):
            h = hash_bytes(w.encode())
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        out = 0
        for i in range(64):
            if acc[i] > 0:
                out |= 1 << i
        return out

    docs = pq.read_table(f"{SF}/documents.parquet").column("text").to_pylist()[:50]
    docs += ["", "one", "a a a b", "Ünïcôde wörds ünïcôde", "x " * 500]
    for t in docs:
        assert simhash64(t) == reference(t), t[:40]


def test_degenerate_bucket_is_capped(ray_session):
    """10k identical docs land in ONE band bucket per band; collection and
    verification must stay bounded (truncate + dropped count), not collect
    the whole corpus into one reducer."""
    import ray.data as rd

    from medea_ray.engine.dedup import near_dup_pairs

    text = "the same boilerplate paragraph repeated on every single page of this site"
    ds = rd.from_items([{"doc_id": i, "text": text} for i in range(10_000)])
    cand = minhash_candidate_groups(
        ds, "doc_id", max_bucket_size=128, concurrency=2
    ).to_pandas()
    assert len(cand) == 16  # one bucket per band
    assert (cand["n"] == 10_000).all()
    assert cand["ids"].map(len).eq(128).all()
    assert (cand["dropped"] == 10_000 - 128).all()
    # ids kept are the smallest — deterministic across runs/cluster sizes
    assert sorted(cand["ids"].iloc[0].tolist()) == list(range(128))

    pairs = near_dup_pairs(
        ds, "doc_id", threshold=0.9, max_bucket_size=64, concurrency=2
    )
    # verified pairs bounded by the cap: C(64,2) among the smallest ids
    assert len(pairs) == 64 * 63 // 2
    assert pairs["id_a"].max() < 64 and pairs["id_b"].max() < 64


def test_simhash_candidates(ray_session):
    ds, rows = _near_dup_corpus(ray_session)
    cand = simhash_candidates(ds, "doc_id").to_pandas()
    pairs = set()
    for ids in cand["ids"]:
        for a in ids:
            for b in ids:
                if a < b:
                    pairs.add((a, b))
    planted = {(r["doc_id"] - 1, r["doc_id"]) for r in rows if r["doc_id"] % 10 == 1}
    assert len(pairs & planted) / len(planted) > 0.8


# -- text analysis ----------------------------------------------------------


def test_token_counts_vs_duckdb(docs_ds):
    got = add_token_counts(docs_ds, id_col="doc_id").to_pandas()
    exp = duckdb.sql(
        f"SELECT doc_id, len(regexp_extract_all(text, '\\S+')) AS n_tokens "
        f"FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).df()
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert (got["n_tokens"].to_numpy() == exp["n_tokens"].to_numpy()).all()


def test_word_stats_vs_duckdb(ray_session):
    """doc_word_stats callable (retired from the 50-slot registry round 4
    for schema_infer_profile) stays pinned against the same DuckDB replay
    its oracle used."""
    from medea_ray.engine import queries as q

    got = (
        q.doc_word_stats(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        "SELECT doc_id, "
        " CASE WHEN text IS NULL THEN 0 "
        "  ELSE len(regexp_extract_all(lower(text), '[a-z0-9_]+')) END AS n_words, "
        " CASE WHEN text IS NULL THEN 0 "
        "  ELSE len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9_]+'))) END "
        "  AS n_distinct_words "
        f"FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).df()
    assert (got["n_words"].to_numpy() == exp["n_words"].to_numpy()).all()
    assert (
        got["n_distinct_words"].to_numpy() == exp["n_distinct_words"].to_numpy()
    ).all()


def test_redact_pii_rules_and_flags(ray_session):
    """redact_pii: sequential RE2 redaction, flags on the ORIGINAL text,
    nulls pass through, out_col copies instead of replacing, and the
    rules stay in byte-lockstep with DuckDB regexp_replace(...,'g') —
    the contract the docs_pii_redacted driver oracle hash-pins at scale."""
    import ray.data as rd

    from medea_ray.engine.text import DEFAULT_PII_RULES, redact_pii

    texts = [
        "mail alice.smith+x@sub.mail.example.com now",
        "server 10.42.0.255 and 1.2.3.4 up",
        "call 555-0123 or 555-01 ok",
        "edge a@b.co 999.999.999.999 x555-0123y",
        "no pii here",
        None,
        "",
    ]
    ds = rd.from_arrow(pa.table({"i": list(range(len(texts))), "text": texts}))
    got = redact_pii(ds, "text").to_pandas().sort_values("i")
    red = got["text"].tolist()
    assert red[0] == "mail <EMAIL> now"
    assert red[1] == "server <IP> and <IP> up"
    assert red[2] == "call <PHONE> or <PHONE> ok"
    # \b: no match inside x...y; bare a@b.co matches the email rule
    assert red[3] == "edge <EMAIL> <IP> x555-0123y"
    assert red[4] == "no pii here" and red[6] == ""
    assert red[5] is None and got["pii_found"].tolist()[5] is None
    assert got["pii_found"].tolist()[:5] == [True, True, True, True, False]

    # DuckDB lockstep on the same rows (the oracle's other half)
    expr = "t"
    for _n, pat, rep in DEFAULT_PII_RULES:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    vals = ",".join(f"('{t}')" for t in texts if t is not None)
    sql = duckdb.sql(f"SELECT {expr} FROM (VALUES {vals}) v(t)").fetchall()
    assert [r[0] for r in sql] == [r for r in red if r is not None]

    # out_col keeps the original column; flag_col=None emits no flag
    got2 = redact_pii(
        ds, "text", out_col="clean", flag_col=None
    ).to_pandas().sort_values("i")
    assert got2["text"].tolist()[0] == texts[0]
    assert got2["clean"].tolist()[0] == "mail <EMAIL> now"
    assert "pii_found" not in got2.columns


def test_detect_lang_heuristic():
    assert detect_lang("the cat sat on the mat and it is a good day for the") == "en"
    assert detect_lang("der Hund ist nicht zu Hause und die Katze ist mit den") == "de"
    assert detect_lang("这是一个中文句子，包含很多汉字字符，用于测试语言识别") == "zh"
    assert detect_lang("") is None


def test_text_features_columns(docs_ds):
    out = add_text_features(docs_ds, concurrency=2).to_pandas().head(50)
    for col in (
        "lang_pred",
        "n_tokens_ws",
        "n_tokens_bpe",
        "fingerprint",
        "q_len",
        "q_alpha_ratio",
        "q_stopword_ratio",
        "q_repetition",
    ):
        assert col in out.columns
    assert (out["n_tokens_bpe"] >= out["n_tokens_ws"]).all()
    assert (out["q_len"] == out["text"].str.len()).all()


def test_fingerprint_stability():
    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    assert fingerprint64(t) == fingerprint64(t)
    assert fingerprint64(t) != fingerprint64("totally different words entirely here now")
    # robustness: appending past the window keeps the leading windows' mins
    assert fingerprint64(t) == fingerprint64(t) & ((1 << 63) - 1)
    assert token_count_ws("a  b\nc") == 3


# -- similarity search ------------------------------------------------------


def _oracle_topk(queries, k):
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float32)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    q = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = m @ q.T
    out = {}
    for qi in range(q.shape[0]):
        order = sorted(
            zip(-sims[:, qi], emb["vec_id"].to_numpy()), key=lambda t: (t[0], t[1])
        )[:k]
        out[qi] = [int(v) for _, v in order]
    return out


def test_knn_bruteforce_exact(emb_ds):
    rng = np.random.default_rng(7)
    queries = rng.standard_normal((3, 64)).astype(np.float32)
    got = knn_bruteforce(emb_ds, queries, k=10).to_pandas()
    exp = _oracle_topk(queries, 10)
    for qi in range(3):
        ids = got[got["query_id"] == qi].sort_values("rank")["vec_id"].tolist()
        assert ids == exp[qi]


def test_knn_lsh_recall(emb_ds):
    rng = np.random.default_rng(7)
    queries = rng.standard_normal((3, 64)).astype(np.float32)
    got = knn_lsh(emb_ds, queries, k=10, n_bits=6, n_tables=8).to_pandas()
    exp = _oracle_topk(queries, 10)
    recalls = []
    for qi in range(3):
        ids = set(got[got["query_id"] == qi]["vec_id"].tolist())
        recalls.append(len(ids & set(exp[qi])) / 10)
    assert np.mean(recalls) >= 0.5, recalls


def test_knn_lsh_empty_candidate_blocks(ray_session):
    """Regression (round-1 CORRECTNESS red row): when the LSH candidate
    filter empties some/all blocks, the pinned output schema must keep
    concat_tables working instead of inferring null types."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    rows = [
        {"vec_id": i, "embedding": rng.standard_normal(64).astype(np.float32).tolist()}
        for i in range(64)
    ]
    # many tiny blocks so most blocks contain zero candidates
    ds = rd.from_items(rows).repartition(16)
    queries = rng.standard_normal((2, 64)).astype(np.float32)
    # high n_bits → almost no bucket collisions → empty candidate blocks
    got = knn_lsh(ds, queries, k=5, n_bits=16, n_tables=1).to_pandas()
    assert set(got.columns) == {"query_id", "vec_id", "cosine", "rank"}
    assert len(got) <= 10  # possibly zero rows — the point is: no crash
    # moderate n_bits: some blocks empty, some not — concat must still work
    got2 = knn_lsh(ds, queries, k=5, n_bits=4, n_tables=2).to_pandas()
    assert (got2.groupby("query_id").size() <= 5).all()


def test_embedding_near_dup_bucket_cap(ray_session):
    """A degenerate bucket (many identical vectors) is truncated to
    max_bucket_size — bounded pairwise work, never a silent cap."""
    import ray.data as rd

    rng = np.random.default_rng(5)
    v = rng.standard_normal(32).astype(np.float32).tolist()
    rows = [{"vec_id": i, "embedding": v} for i in range(600)]
    ds = rd.from_items(rows)
    pairs = embedding_near_dup(
        ds, threshold=0.999, n_bits=4, n_tables=2, max_bucket_size=64
    ).to_pandas()
    found = {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    # kept ids are the smallest 64 → all C(64,2) pairs among them, no more
    assert found == {(a, b) for a in range(64) for b in range(a + 1, 64)}


def test_embedding_near_dup_self(ray_session):
    import ray.data as rd

    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pylist()[:50]
    rows = list(emb)
    for r in emb[:10]:  # plant exact duplicates
        rows.append({"vec_id": r["vec_id"] + 10_000, "embedding": r["embedding"], "label": r["label"]})
    ds = rd.from_items(rows)
    pairs = embedding_near_dup(ds, threshold=0.999).to_pandas()
    found = {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    planted = {(r["vec_id"], r["vec_id"] + 10_000) for r in emb[:10]}
    assert planted <= found


# -- multimodal plumbing ----------------------------------------------------


def test_media_feature_extraction(ray_session, tmp_path):
    import ray.data as rd

    from medea_ray.fixtures.gen import write_pages

    d = str(tmp_path / "pages")
    write_pages(d, 500, rows_per_file=500)
    ds = rd.read_parquet(d, columns=["url", "html"])
    out = extract_media_features(ds, payload_col="html", decoder="fake",
                                 batch_size=64, concurrency=2)
    # consume as Arrow: Ray's to_pandas() tensor-casts list columns with
    # nulls, which is exactly what we avoid by keeping plain Arrow lists
    import pyarrow as pa

    df = pa.concat_tables(out.iter_batches(batch_format="pyarrow")).to_pandas()
    assert len(df) == 500
    assert "html" not in df.columns  # binary dropped after extraction
    ok = df[df["media_ok"]]
    assert len(ok) > 400
    assert ok["media_feature"].map(len).eq(8).all()
    assert ok["media_width"].between(64, 255).all()


def test_real_decoder_is_gated():
    with pytest.raises(NotImplementedError):
        MediaFeatureExtractor(decoder="pil")


# -- deterministic sampling / train-test split (engine/sampling.py) ----------


def test_hash_sample_deterministic_and_rate(ray_session):
    import ray.data as rd

    from medea_ray.engine.sampling import hash_sample

    ds = rd.range(4000)
    a = sorted(r["id"] for r in hash_sample(ds, "id", "40").take_all())
    b = sorted(r["id"] for r in hash_sample(ds, "id", "40").take_all())
    assert a == b                    # same rows every run
    assert 0.20 < len(a) / 4000 < 0.30  # ~25% (md5 is uniform)


def test_hash_sample_null_ids_never_sampled(ray_session):
    import ray.data as rd

    from medea_ray.engine.sampling import hash_sample

    ds = rd.from_items([{"id": None}, {"id": 1}, {"id": 2}])
    out = hash_sample(ds, "id", "ff")  # ~100% of non-null ids
    assert sorted(r["id"] for r in out.take_all()) == [1, 2]


def test_hash_sample_bad_threshold_raises(ray_session):
    import ray.data as rd

    from medea_ray.engine.sampling import hash_sample

    with pytest.raises(ValueError):
        hash_sample(rd.range(1), "id", "xyz")


def test_train_test_split_disjoint_exhaustive_stable(ray_session):
    import ray.data as rd

    from medea_ray.engine.sampling import train_test_split

    ds = rd.range(2000)
    out = train_test_split(ds, "id", "2").take_all()
    assert len(out) == 2000
    splits = {r["id"]: r["split"] for r in out}
    assert set(splits.values()) == {"train", "test"}
    n_test = sum(1 for s in splits.values() if s == "test")
    assert 0.08 < n_test / 2000 < 0.18  # ~12.5%
    # a row's split never depends on which rows ride along
    sub = train_test_split(rd.range(100), "id", "2").take_all()
    for r in sub:
        assert splits[r["id"]] == r["split"]


def test_train_test_split_matches_duckdb(ray_session):
    import duckdb

    import ray.data as rd

    from medea_ray.engine.sampling import train_test_split

    got = sorted(
        (r["id"], r["split"])
        for r in train_test_split(rd.range(500), "id", "2").take_all()
    )
    exp = duckdb.sql("""
        SELECT i, CASE WHEN substr(md5(CAST(i AS VARCHAR)), 1, 1) < '2'
                       THEN 'test' ELSE 'train' END
        FROM range(500) t(i) ORDER BY i
    """).fetchall()
    assert got == [(a, b) for a, b in exp]


# -- benchmark decontamination (engine/decontam.py) --------------------------


def _corpus():
    import ray.data as rd

    return rd.from_items([
        {"id": 1, "text": "the quick brown fox"},
        {"id": 2, "text": "benchmark question one"},
        {"id": 3, "text": None},
        {"id": 4, "text": "unrelated document"},
    ])


def _banned():
    import ray.data as rd

    return rd.from_items([{"text": "benchmark question one"}, {"text": None}])


def test_decontaminate_drop_keeps_nulls(ray_session):
    from medea_ray.engine.decontam import decontaminate

    out = decontaminate(_corpus(), "text", _banned(), concurrency=2).take_all()
    assert sorted(r["id"] for r in out) == [1, 3, 4]  # null text kept


def test_decontaminate_tag_mode(ray_session):
    from medea_ray.engine.decontam import decontaminate

    out = decontaminate(_corpus(), "text", _banned(), mode="tag",
                        concurrency=2).take_all()
    by = {r["id"]: r["contaminated"] for r in out}
    assert by == {1: False, 2: True, 3: False, 4: False}


def test_decontaminate_prefix_matching(ray_session):
    import ray.data as rd

    from medea_ray.engine.decontam import decontaminate

    corpus = rd.from_items([
        {"id": 1, "text": "benchmark question one -- site boilerplate"},
        {"id": 2, "text": "something else entirely"},
    ])
    out = decontaminate(corpus, "text", _banned(), prefix_len=10,
                        concurrency=2).take_all()
    assert [r["id"] for r in out] == [2]  # prefix collision drops id=1


def test_decontaminate_bad_mode_raises(ray_session):
    from medea_ray.engine.decontam import decontaminate

    with pytest.raises(ValueError, match="mode"):
        decontaminate(_corpus(), "text", _banned(), mode="quarantine")


def test_stratified_sample_rates_and_default(ray_session):
    import ray.data as rd

    from medea_ray.engine.sampling import stratified_hash_sample

    items = [{"id": i, "s": ["a", "b", "c"][i % 3]} for i in range(3000)]
    out = stratified_hash_sample(
        rd.from_items(items), "id", "s", {"a": "8", "b": "2"},
        default_threshold_hex="0",
    ).take_all()
    by = {}
    for r in out:
        by.setdefault(r["s"], 0)
        by[r["s"]] += 1
    assert 0.40 < by["a"] / 1000 < 0.60      # ~50%
    assert 0.07 < by["b"] / 1000 < 0.19      # ~12.5%
    assert "c" not in by                      # default "0" drops all


def test_stratified_sample_mismatched_lengths_raise(ray_session):
    import ray.data as rd

    from medea_ray.engine.sampling import stratified_hash_sample

    with pytest.raises(ValueError, match="prefix length"):
        stratified_hash_sample(rd.range(1), "id", "id", {"a": "80", "b": "2"})


def test_dedup_exact_keeps_null_text_rows(ray_session):
    """Null texts have no content to compare: every null row survives and
    distinct non-null texts keep exactly their min-id survivor."""
    import ray.data as rd

    ds = rd.from_items([
        {"doc_id": 1, "text": "same"},
        {"doc_id": 2, "text": "same"},
        {"doc_id": 3, "text": None},
        {"doc_id": 4, "text": None},
        {"doc_id": 5, "text": "other"},
    ])
    kept = dedup_exact(ds, "doc_id").to_pandas()
    assert sorted(kept["doc_id"]) == [1, 3, 4, 5]


def test_dedup_exact_duplicated_survivor_id_never_destroys_text(ray_session):
    """If the min-id survivor's id value is itself duplicated in the
    group, the id-based anti-filter must not drop the survivor: every row
    sharing the survivor's id is kept (documented safe degradation for a
    non-unique id_col), and no text ever vanishes from the corpus."""
    import ray.data as rd

    ds = rd.from_items([
        {"doc_id": 7, "text": "a"},
        {"doc_id": 7, "text": "a"},   # duplicate of the survivor id itself
        {"doc_id": 9, "text": "a"},   # true non-survivor
        {"doc_id": 3, "text": "b"},
    ])
    kept = dedup_exact(ds, "doc_id").to_pandas()
    assert set(kept["text"]) == {"a", "b"}          # nothing destroyed
    assert sorted(kept["doc_id"]) == [3, 7, 7]      # id-9 dup dropped


def test_near_dup_pairs_auto_selects_by_text_length(ray_session, caplog):
    """verify='auto' (the default) picks exact for short snippets and the
    constant-shuffle-volume estimate for web-page-scale text, logging the
    decision."""
    import logging

    import ray.data as rd

    from medea_ray.engine.dedup import near_dup_pairs

    short = rd.from_items(
        [{"doc_id": i, "text": f"short snippet number {i} with a few words"}
         for i in range(8)]
    )
    long_rows = [{"doc_id": i, "text": ("web page boilerplate " * 200) + str(i)}
                 for i in range(8)]
    long = rd.from_items(long_rows)
    with caplog.at_level(logging.INFO, logger="medea_ray.engine.dedup"):
        near_dup_pairs(short, "doc_id", threshold=0.9, concurrency=2)
        assert "-> exact verification" in caplog.text
        caplog.clear()
        near_dup_pairs(long, "doc_id", threshold=0.99, concurrency=2)
        assert "-> estimate verification" in caplog.text


def test_builtin_codecs_roundtrip_exact():
    """Pure-Python BMP/PPM/WAV codecs: geometry and mean features decode
    exactly from the deterministic generators, including BMP's 4-byte row
    padding and WAV's chunk alignment."""
    from medea_ray.engine.multimodal import (
        builtin_decode, make_bmp, make_media_blob, make_ppm, make_wav, media_dims)

    for w, h in [(1, 1), (5, 3), (13, 11)]:
        for make, fmt in ((make_bmp, "bmp"), (make_ppm, "ppm")):
            blob = make(w, h, seed=w * 31 + h)
            d = builtin_decode(blob)
            assert (d["ok"], d["format"], d["width"], d["height"]) == (True, fmt, w, h)
            assert len(d["feature"]) == 3 and all(0.0 <= f <= 1.0 for f in d["feature"])
    d = builtin_decode(make_wav(16, n_channels=2, sample_rate=44100, seed=3))
    assert (d["format"], d["width"], d["height"]) == ("wav", 16, 2)
    assert d["feature"][0] == 44100.0 and d["feature"][1] == 16.0

    # mean-RGB is exact: a PPM whose pixels are all one value
    import numpy as np
    header = b"P6\n2 2\n255\n"
    d = builtin_decode(header + bytes([128] * 12))
    assert d["ok"] and abs(d["feature"][0] - 128 / 255) < 1e-12

    # every fixture blob decodes to its media_dims contract
    for i in range(80):
        kind, w, h = media_dims(i)
        d = builtin_decode(make_media_blob(i))
        assert (d["ok"], d["format"], d["width"], d["height"]) == (True, kind, w, h), i


def test_png_codec_full_decode():
    """PNG is a REAL compressed-format decode: zlib inflate + scanline
    unfilter. The stored-block fixture layout (oracle arithmetic), real
    compression at level 9, Sub/Up encoder filters, and a hand-built
    Average/Paeth stream must all reproduce the canonical pixels."""
    import struct
    import zlib

    import numpy as np

    from medea_ray.engine.multimodal import _png_chunk, builtin_decode, make_png

    # stored-deflate fixture size is exactly the oracle's arithmetic
    for w, h in [(1, 1), (4, 3), (16, 13)]:
        p = make_png(w, h, seed=w * 7 + h)
        assert len(p) == 68 + h * (1 + 3 * w)
        d = builtin_decode(p)
        assert (d["ok"], d["format"], d["width"], d["height"]) == (True, "png", w, h)
        assert len(d["feature"]) == 3 and all(0.0 <= f <= 1.0 for f in d["feature"])

    # really-compressed + filtered variants decode to identical features
    # across gray / RGB / RGBA
    for color_type, n_feat in ((0, 1), (2, 3), (6, 4)):
        base = builtin_decode(make_png(9, 7, seed=5, color_type=color_type))
        assert len(base["feature"]) == n_feat
        for filter_type in (0, 1, 2):
            v = builtin_decode(
                make_png(9, 7, seed=5, level=9, filter_type=filter_type,
                         color_type=color_type))
            assert v["ok"] and np.allclose(v["feature"], base["feature"]), (
                color_type, filter_type)

    # Average (3) and Paeth (4) via a hand-filtered stream
    w, h, ch = 4, 3, 3
    px = ((np.arange(ch * w * h, dtype=np.int64) * 37 + 5) % 256).astype(np.uint8)
    grid = px.reshape(h, ch * w).astype(np.int64)
    rows, prev = [], np.zeros(ch * w, np.int64)
    for y, f in enumerate([3, 4, 4]):
        cur, filt = grid[y], np.zeros(ch * w, np.int64)
        for x in range(ch * w):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 3:
                pred = (a + b) // 2
            else:
                pp = a + b - c
                pa_, pb_, pc_ = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
            filt[x] = (cur[x] - pred) % 256
        rows.append(bytes([f]) + filt.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"".join(rows), 6))
            + _png_chunk(b"IEND", b""))
    d = builtin_decode(blob)
    expected = grid.reshape(h * w, ch).astype(np.float64).mean(axis=0) / 255.0
    assert d["ok"] and np.allclose(d["feature"], expected)


def test_gif_lzw_codec_roundtrip():
    """Full GIF LZW: variable-width codes growing 9→12 bits, clear/end
    codes, KwKwK self-reference, and table reset before the 4096-entry
    ceiling — round-trips byte streams of every shape."""
    import numpy as np

    from medea_ray.engine.multimodal import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(7)
    cases = [
        bytes([1]),
        bytes([0] * 500),                     # runs → KwKwK codes
        bytes([5, 5, 5, 5, 5, 5]),            # classic KwKwK minimal case
        bytes(range(256)) * 8,                # width growth past 512/1024
        rng.integers(0, 256, 30000, dtype=np.uint8).tobytes(),  # table reset
        (np.arange(20000) % 256).astype(np.uint8).tobytes(),
    ]
    for data in cases:
        assert _lzw_decode(_lzw_encode(data), 8) == data
    # it really compresses: the 20k ramp shrinks >4x
    ramp = cases[-1]
    assert len(_lzw_encode(ramp)) < len(ramp) // 4
    # truncated stream (no end code) is rejected, not mis-decoded
    enc = _lzw_encode(bytes(range(100)))
    assert _lzw_decode(enc[: len(enc) // 2], 8) is None


def test_gif_container_and_frame_sampler(ray_session):
    import numpy as np
    import ray.data as rd

    from medea_ray.engine.multimodal import (
        builtin_decode, decode_gif_frames, gif_frame_pixels, make_gif,
        sample_frames)

    # multi-frame round-trip: every frame decodes to the canonical pixels
    for w, h, nfr, seed in [(15, 13, 1, 0), (15, 13, 5, 3), (7, 4, 7, 99), (1, 1, 2, 1)]:
        g = decode_gif_frames(make_gif(w, h, nfr, seed))
        assert (g["width"], g["height"], len(g["frames"])) == (w, h, nfr)
        for f in range(nfr):
            expect = gif_frame_pixels(w, h, f, seed).reshape(h, w)
            assert np.array_equal(g["frames"][f], expect)
            assert np.array_equal(g["palettes"][f][g["frames"][f], 0], expect)

    # builtin_decode sniffs GIF and reports frame count in the feature
    d = builtin_decode(make_gif(15, 13, 4, 2))
    assert d["ok"] and d["format"] == "gif" and d["feature"][0] == 4.0

    # malformed GIFs are row verdicts, not crashes
    good = make_gif(6, 5, 2, 1)
    for p in [b"GIF89a", good[:20], good[:-1], good[:200], b"GIF89a" + b"\x00" * 20]:
        assert builtin_decode(p)["ok"] is False

    # zero-area frames fail at the generator boundary with a named error,
    # not a KeyError from inside the LZW bit packer
    for bad_w, bad_h in [(0, 5), (6, 0), (0, 0)]:
        with pytest.raises(ValueError, match="zero-area"):
            make_gif(bad_w, bad_h, 1, 0)

    # frame-sample stage: every 2nd frame, typed stats, nulls tolerated
    rows = [{"doc_id": i, "blob": make_gif(15, 13, 2 + i % 5, seed=i)}
            for i in range(20)]
    rows.append({"doc_id": 20, "blob": b"not a gif"})
    ds = rd.from_items(rows)
    out = sample_frames(ds, payload_col="blob", every=2, concurrency=(1, 2))
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert not df.loc[20, "frames_ok"]
    ok = df[df["frames_ok"]]
    assert len(ok) == 20
    assert (ok["n_frames"] == 2 + ok["doc_id"] % 5).all()
    assert (ok["n_sampled"] == (ok["n_frames"] + 1) // 2).all()
    for i in range(5):
        g = decode_gif_frames(rows[i]["blob"])
        px = sum(int(p[gr, 0].astype(np.int64).sum())
                 for gr, p in zip(g["frames"][::2], g["palettes"][::2]))
        assert int(df.loc[i, "px_sum"]) == px


def test_frame_sampler_handles_mjpeg_avi(ray_session):
    """The frame-sampling stage dispatches on container magic: a mixed
    GIF + MJPEG-AVI column samples both, with AVI px_sum equal to the
    decoded red-channel sum of every 2nd frame."""
    import numpy as np
    import ray.data as rd

    from medea_ray.engine.multimodal import (
        decode_avi_frames, make_avi_mjpeg, make_gif, sample_frames)

    rows = [{"doc_id": i, "blob": make_avi_mjpeg(12, 10, n_frames=2 + i % 3, seed=i)}
            for i in range(6)]
    rows += [{"doc_id": 6 + j, "blob": make_gif(15, 13, 3, seed=j)} for j in range(2)]
    out = sample_frames(rd.from_items(rows), payload_col="blob", every=2,
                        concurrency=(1, 2))
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert df["frames_ok"].all()
    avi = df[df["doc_id"] < 6]
    assert (avi["n_frames"] == 2 + avi["doc_id"] % 3).all()
    assert (avi["n_sampled"] == (avi["n_frames"] + 1) // 2).all()
    assert (avi["frame_width"] == 12).all() and (avi["frame_height"] == 10).all()
    for i in range(6):
        d = decode_avi_frames(rows[i]["blob"])
        px = sum(int(f[:, :, 0].astype(np.int64).sum()) for f in d["frames"][::2])
        assert int(df.loc[i, "px_sum"]) == px


def test_jpeg_codec_roundtrip_fidelity():
    """Baseline JPEG in pure numpy: full entropy pipeline both ways.
    Lossy, so the contract is exact geometry + bounded RMSE — plus the
    structural cases: odd (non-multiple-of-8) sizes, grayscale, 1×1,
    restart markers, and a constant image decoding exactly."""
    import numpy as np

    from medea_ray.engine.jpeg import decode_jpeg, encode_jpeg, jpeg_fixture_image

    for (w, h), seed in [((16, 16), 0), ((8, 8), 1), ((24, 17), 2), ((1, 1), 3),
                         ((9, 5), 4), ((64, 48), 5)]:
        img = jpeg_fixture_image(w, h, seed)
        d = decode_jpeg(encode_jpeg(img))
        assert d is not None and (d["width"], d["height"]) == (w, h)
        err = d["pixels"].astype(np.float64) - img.astype(np.float64)
        assert float(np.sqrt((err ** 2).mean())) < 6.0, (w, h)

    # grayscale single-component scan
    g = jpeg_fixture_image(20, 12, 7)[:, :, 0]
    d = decode_jpeg(encode_jpeg(g))
    err = d["pixels"][:, :, 0].astype(np.float64) - g.astype(np.float64)
    assert float(np.sqrt((err ** 2).mean())) < 6.0
    assert np.array_equal(d["pixels"][:, :, 0], d["pixels"][:, :, 1])

    # restart markers reset DC prediction and resync byte alignment
    img = jpeg_fixture_image(40, 24, 9)
    d = decode_jpeg(encode_jpeg(img, restart_interval=3))
    err = d["pixels"].astype(np.float64) - img.astype(np.float64)
    assert float(np.sqrt((err ** 2).mean())) < 6.0

    # constant image is DC-only and decodes exactly
    const = np.full((16, 16, 3), 77, np.uint8)
    d = decode_jpeg(encode_jpeg(const))
    assert int(np.abs(d["pixels"].astype(np.int64) - 77).max()) == 0

    # random noise (worst case for the DCT) stays bounded by the quantizer
    noise = np.random.default_rng(3).integers(0, 256, (16, 16, 3), dtype=np.uint8)
    d = decode_jpeg(encode_jpeg(noise))
    err = d["pixels"].astype(np.float64) - noise.astype(np.float64)
    assert float(np.sqrt((err ** 2).mean())) < 10.0


def test_jpeg_codec_roundtrip_nonflat_quant_table(monkeypatch):
    """The repo's own tables are flat outside DC, which masked a decoder
    bug pairing zigzag-ordered coefficients with a natural-ordered quant
    table. A strongly non-flat (Annex-K-style) table must still
    round-trip within the smooth-image RMSE bound."""
    import numpy as np

    from medea_ray.engine import jpeg

    std_luma = np.array([
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ], np.uint8)
    monkeypatch.setattr(jpeg, "_Q_LUMA", std_luma)
    g = jpeg.jpeg_fixture_image(40, 32, seed=3)[:, :, 0]
    d = jpeg.decode_jpeg(jpeg.encode_jpeg(g))
    assert d is not None and (d["width"], d["height"]) == (40, 32)
    err = d["pixels"][:, :, 0].astype(np.float64) - g.astype(np.float64)
    rmse = float(np.sqrt((err ** 2).mean()))
    assert rmse < 8.0, rmse  # the zigzag/natural mispairing gave ~30


def test_jpeg_codec_rejects_malformed():
    import numpy as np

    from medea_ray.engine.jpeg import decode_jpeg, encode_jpeg, jpeg_fixture_image
    from medea_ray.engine.multimodal import builtin_decode

    good = encode_jpeg(jpeg_fixture_image(16, 16, 0))
    for p in [b"", b"\xff\xd8", good[:50], good[:-20], good[:2] + b"\x00" * 30]:
        assert decode_jpeg(p) is None

    # progressive SOF2 is rejected, not mis-decoded
    prog = bytearray(good)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    assert decode_jpeg(bytes(prog)) is None

    # builtin_decode sniffs JPEG and reports geometry + mean-RGB feature
    d = builtin_decode(good)
    assert d["ok"] and d["format"] == "jpeg" and (d["width"], d["height"]) == (16, 16)
    img = jpeg_fixture_image(16, 16, 0)
    mean = img.reshape(-1, 3).astype(np.float64).mean(axis=0) / 255.0
    assert np.allclose(d["feature"], mean, atol=0.02)
    assert builtin_decode(b"\xff\xd8 junk")["ok"] is False


def test_png_codec_rejects_malformed():
    import struct
    import zlib

    from medea_ray.engine.multimodal import _png_chunk, builtin_decode, make_png

    good = make_png(4, 4, seed=1)
    flipped = good[:40] + bytes([good[40] ^ 0xFF]) + good[41:]  # CRC break
    bad_filter = (b"\x89PNG\r\n\x1a\n"
                  + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 1, 8, 2, 0, 0, 0))
                  + _png_chunk(b"IDAT", zlib.compress(bytes([7]) + b"\x00" * 12, 0))
                  + _png_chunk(b"IEND", b""))
    short_raw = (b"\x89PNG\r\n\x1a\n"
                 + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 2, 8, 2, 0, 0, 0))
                 + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 13, 0))
                 + _png_chunk(b"IEND", b""))
    no_end = good[: len(good) - 12]
    bad_depth = (b"\x89PNG\r\n\x1a\n"
                 + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 1, 16, 2, 0, 0, 0))
                 + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 25, 0))
                 + _png_chunk(b"IEND", b""))
    for p in (flipped, good[:30], bad_filter, short_raw, no_end, bad_depth):
        assert builtin_decode(p)["ok"] is False


def test_builtin_codecs_reject_malformed():
    from medea_ray.engine.multimodal import builtin_decode, make_bmp, make_wav

    bad = [
        b"",
        b"garbage bytes",
        b"BM\x00\x01",                       # truncated BMP
        make_bmp(4, 4)[:40],                  # cut mid-header
        b"P6\n4 4\n255\n" + b"\x00" * 5,     # raster shorter than w*h*3
        b"P6\n4 4\n65535\n" + b"\x00" * 48,  # 16-bit maxval unsupported
        b"RIFF\x04\x00\x00\x00WAVE",         # no fmt/data chunks
        make_wav(8)[:30],                     # truncated WAV
    ]
    for p in bad:
        d = builtin_decode(p)
        assert d["ok"] is False, p[:20]


def test_add_lsh_buckets_and_ivf_survive_empty_blocks(ray_session):
    """Zero-row blocks must pass through the LSH bucketer and the IVF cell
    filter with typed columns, not crash in the reshape(0, -1) matrix
    build — same guard contract as _TopKScorer."""
    import ray.data as rd

    from medea_ray.engine.similarity import add_lsh_buckets, knn_ivf

    rng = np.random.default_rng(5)
    rows = [
        {"vec_id": i, "embedding": rng.standard_normal(16).astype(np.float32).tolist()}
        for i in range(8)
    ]
    # more blocks than rows → guaranteed empty blocks
    ds = rd.from_items(rows).repartition(16)
    out = add_lsh_buckets(ds, n_bits=4, n_tables=2).to_pandas()
    assert len(out) == 8 and {"lsh_0", "lsh_1"} <= set(out.columns)
    # dim pre-build: planes identical to the lazily-learned ones
    out2 = add_lsh_buckets(ds, n_bits=4, n_tables=2, dim=16).to_pandas()
    a = out.sort_values("vec_id")[["lsh_0", "lsh_1"]].to_numpy()
    b = out2.sort_values("vec_id")[["lsh_0", "lsh_1"]].to_numpy()
    assert (a == b).all()

    queries = rng.standard_normal((2, 16)).astype(np.float32)
    from medea_ray.engine.similarity import knn_ivf as _ivf
    got = _ivf(ds, queries, k=3, n_cells=2, n_probe=2).to_pandas()
    assert (got.groupby("query_id").size() <= 3).all()


def test_embedding_near_dup_string_ids(ray_session):
    """id_col is parametric: string ids must survive the verify stage's
    min/max pairing instead of crashing on an int64 cast."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    v = rng.standard_normal(32).astype(np.float32)
    rows = [
        {"url": "https://a.example/1", "embedding": v.tolist()},
        {"url": "https://b.example/2", "embedding": (v + 0.001).tolist()},
        {"url": "https://c.example/3", "embedding": (-v).tolist()},
    ]
    ds = rd.from_items(rows)
    pairs = embedding_near_dup(
        ds, id_col="url", threshold=0.9, n_bits=2, n_tables=4, seed=1
    ).to_pandas()
    assert len(pairs) == 1
    assert pairs.iloc[0]["id_a"] == "https://a.example/1"
    assert pairs.iloc[0]["id_b"] == "https://b.example/2"


def test_hash_sample_rejects_permissive_int_parses(ray_session):
    """'0x40', signs and whitespace parse under int(x, 16) but compare
    lexicographically against hex digests — they must be rejected."""
    import ray.data as rd

    from medea_ray.engine.sampling import (
        hash_sample, stratified_hash_sample, train_test_split,
    )

    for bad in ["0x40", "-1", " 8 ", "+f", ""]:
        with pytest.raises(ValueError, match="hex"):
            hash_sample(rd.range(1), "id", bad)
        with pytest.raises(ValueError, match="hex|prefix length"):
            stratified_hash_sample(rd.range(1), "id", "id", {"a": bad})
        with pytest.raises(ValueError, match="hex"):
            train_test_split(rd.range(1), "id", bad)


def test_token_count_ws_re2_whitespace_parity():
    """Python \\S is Unicode-aware (NBSP, vertical tab) while DuckDB's RE2
    \\S is exactly [^\\t\\n\\f\\r ] — the pinned class must agree with the
    oracle on both."""
    cases = ["a b", "a\x0bb", "a b", "a\tb", "a\fb", "a\nb", "x", ""]
    for s in cases:
        exp = duckdb.sql(
            "SELECT len(regexp_extract_all(?, '\\S+'))", params=[s]
        ).fetchone()[0]
        assert token_count_ws(s) == exp, repr(s)


def test_add_text_features_empty_blocks_keep_schema(ray_session):
    """Zero-row blocks must emit the q_* quality columns too — blocks with
    divergent schemas break to_pandas/concat downstream."""
    import ray.data as rd

    from medea_ray.engine.text import add_text_features

    rows = [{"text": "hello world"}, {"text": "the quick brown fox"}]
    ds = rd.from_items(rows).repartition(8)  # mostly empty blocks
    df = add_text_features(ds).to_pandas()
    assert len(df) == 2
    for c in ("q_len", "q_alpha_ratio", "q_repetition", "lang_pred"):
        assert c in df.columns


def test_build_payload_null_nchars():
    from medea_ray.fixtures.gen import build_payload
    import json as _json

    p = build_payload("https://x", "en", None, [], None)
    assert _json.loads(p)["meta"]["len"] == 0


def test_dedup_exact_bucketed_equals_broadcast(ray_session):
    """VERDICT r03 item 5: above the drop-set budget, dedup_exact must run
    bucketed anti-join passes (referential.bucket_of) and return EXACTLY
    the broadcast answer, on a corpus with a large planted dup-set
    (60% duplicates, plus null texts and null ids)."""
    import ray.data as rd

    from medea_ray.engine.dedup import dedup_exact

    rows = []
    for i in range(600):
        rows.append({"doc_id": i, "text": f"dup text {i % 40}"})  # 40 survivors
    rows += [
        {"doc_id": 9000, "text": None},        # null text: always kept
        {"doc_id": None, "text": "dup text 0"},  # null id riding a dup group
        {"doc_id": 9001, "text": "unique snowflake"},
    ]
    ds = rd.from_items(rows).repartition(8)

    broadcast = dedup_exact(ds, "doc_id", n_buckets=1).to_pandas()
    bucketed = dedup_exact(ds, "doc_id", n_buckets=5).to_pandas()
    # budget path: a small budget must auto-select the bucketed form
    # (560 drop ids / 100 -> 6 passes; each union branch re-executes the
    # input pipeline, so keep the count testable at 4 cpus)
    budget = dedup_exact(ds, "doc_id", drop_budget_rows=100).to_pandas()

    def canon(df):
        df = df.sort_values(["text", "doc_id"], na_position="last")
        return list(map(tuple, df[["doc_id", "text"]].fillna("<null>").values))

    assert canon(bucketed) == canon(broadcast)
    assert canon(budget) == canon(broadcast)
    # survivors: min doc_id per text group + null-text row + the unique row
    kept_texts = broadcast["text"].dropna().unique()
    assert len(broadcast) == 40 + 2 and len(kept_texts) == 41


def test_corpus_prep_banned_budget_bucketed_equals_broadcast(ray_session):
    """VERDICT r03 item 8: corpus_prep's banned set is 5% of the corpus by
    construction, so above banned_budget_rows the anti-join must switch to
    bucketed hash passes (filter_not_in_ds) — with exactly the broadcast
    result. sf0.001: 500 docs -> ~25 banned keys; budget 4 forces ~7
    bucket passes."""
    from medea_ray.engine.queries import corpus_prep

    sf = "/root/testdata/sf0.001"
    broadcast = sorted(r["doc_id"] for r in corpus_prep(sf).take_all())
    bucketed = sorted(
        r["doc_id"] for r in corpus_prep(sf, banned_budget_rows=4).take_all()
    )
    assert bucketed == broadcast and len(broadcast) > 0


def test_filter_not_in_ds_logs_and_budgets(ray_session, caplog):
    """filter_not_in_ds must log the value-set cardinality on every run
    (never silent) and leave the input untouched for an empty value set."""
    import logging

    import ray.data as rd

    from medea_ray.engine.decontam import filter_not_in_ds

    ds = rd.from_items([{"k": i} for i in range(100)]).repartition(4)
    vals = rd.from_items([{"k": i} for i in range(0, 100, 3)])
    with caplog.at_level(logging.INFO, logger="medea_ray.engine.decontam"):
        out = filter_not_in_ds(ds, "k", vals, "k", budget_rows=5)
    assert any("anti-join value set" in r.message for r in caplog.records)
    assert any("bucketed passes" in r.message for r in caplog.records)
    kept = sorted(r["k"] for r in out.take_all())
    assert kept == [i for i in range(100) if i % 3 != 0]

    empty = rd.from_items([{"k": 1}]).filter(lambda r: False)
    out2 = filter_not_in_ds(ds, "k", empty, "k")
    assert out2.count() == 100


# -- compressed audio (G.711 / IMA ADPCM) and MJPEG AVI video ----------------


def test_g711_decode_matches_reference_formula():
    """Vectorized mu-law/A-law expansion equals the public G.711 scalar
    formulas (Sun g711.c semantics) for every one of the 256 codes."""
    import numpy as np

    from medea_ray.engine.multimodal import alaw_decode_bytes, mulaw_decode_bytes

    def ulaw2lin(u):
        u = ~u & 0xFF
        t = (((u & 0xF) << 3) + 0x84) << ((u & 0x70) >> 4)
        return (0x84 - t) if (u & 0x80) else (t - 0x84)

    def alaw2lin(a):
        a ^= 0x55
        t = (a & 0xF) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        return t if (a & 0x80) else -t

    b = np.arange(256, dtype=np.uint8)
    assert (mulaw_decode_bytes(b) == np.array([ulaw2lin(int(x)) for x in b], np.int16)).all()
    assert (alaw_decode_bytes(b) == np.array([alaw2lin(int(x)) for x in b], np.int16)).all()


def test_g711_roundtrip_bounds_and_idempotence():
    """Compress→expand error stays within the top-segment quantization
    step over the whole int16 range, and expand→compress reproduces the
    code byte (mu-law's redundant -0 code is the single exception)."""
    import numpy as np

    from medea_ray.engine.multimodal import (
        alaw_decode_bytes, alaw_encode, mulaw_decode_bytes, mulaw_encode)

    x = np.arange(-32768, 32768, dtype=np.int16)
    eu = np.abs(mulaw_decode_bytes(mulaw_encode(x)).astype(np.int32) - x.astype(np.int32))
    ea = np.abs(alaw_decode_bytes(alaw_encode(x)).astype(np.int32) - x.astype(np.int32))
    assert eu.max() <= 644 and ea.max() <= 512
    b = np.arange(256, dtype=np.uint8)
    assert (mulaw_encode(mulaw_decode_bytes(b)) == b).sum() == 255  # 0x7F == -0
    assert (alaw_encode(alaw_decode_bytes(b)) == b).all()


def test_ima_adpcm_roundtrip_and_fact_truncation():
    """IMA ADPCM predictor tracks the bounded-slope fixture signal within
    tight bounds, and the WAV fact chunk truncates the zero-padded final
    block to the true frame count."""
    import numpy as np

    from medea_ray.engine.multimodal import (
        _decode_wav, adpcm_fixture_pcm, ima_adpcm_decode, ima_adpcm_encode,
        make_wav_adpcm)

    for n, seed in [(37, 0), (505, 3), (1000, 9)]:
        src = adpcm_fixture_pcm(n, seed)
        dec = ima_adpcm_decode(ima_adpcm_encode(src, 256), 256)[:n]
        err = np.abs(dec.astype(np.int32) - src.astype(np.int32))
        assert err.max() < 512 and float(np.sqrt((err.astype(float) ** 2).mean())) < 24.0
        d = _decode_wav(make_wav_adpcm(n, seed=seed))
        assert d is not None and d["ok"] and (d["width"], d["height"]) == (n, 1)
        assert d["feature"][:2] == [8000.0, 4.0]


def test_compressed_wav_decode_features():
    """builtin_decode handles all three compressed WAV formats; the
    companded amp means match a direct LUT expansion of the same bytes."""
    import numpy as np

    from medea_ray.engine.multimodal import (
        alaw_decode_bytes, builtin_decode, make_wav_alaw, make_wav_mulaw,
        mulaw_decode_bytes, mulaw_fixture_bytes)

    n = 421
    raw = mulaw_fixture_bytes(n, seed=5)
    for make, expand in ((make_wav_mulaw, mulaw_decode_bytes),
                         (make_wav_alaw, alaw_decode_bytes)):
        d = builtin_decode(make(n, seed=5))
        assert d["ok"] and d["format"] == "wav" and (d["width"], d["height"]) == (n, 1)
        want = float(np.abs(expand(raw).astype(np.float64)).mean() / 32768.0)
        assert abs(d["feature"][2] - want) < 1e-12


def test_avi_mjpeg_container_roundtrip():
    """MJPEG AVI: container geometry/fps/frame counts decode exactly and
    every entropy-coded frame reconstructs its fixture image (RMSE < 6,
    JPEG is lossy). builtin_decode routes RIFF 'AVI ' to the video path."""
    import numpy as np

    from medea_ray.engine.jpeg import jpeg_fixture_image
    from medea_ray.engine.multimodal import (
        builtin_decode, decode_avi_frames, make_avi_mjpeg)

    for w, h, nf, fps, seed in [(16, 12, 1, 25, 0), (18, 14, 5, 12, 3), (21, 16, 3, 30, 8)]:
        p = make_avi_mjpeg(w, h, n_frames=nf, fps=fps, seed=seed)
        d = decode_avi_frames(p)
        assert d is not None and (d["width"], d["height"]) == (w, h)
        assert len(d["frames"]) == nf and d["n_declared"] == nf
        assert d["fps"] == float(fps)
        for f, fr in enumerate(d["frames"]):
            img = jpeg_fixture_image(w, h, seed=seed * 31 + f)
            err = fr.astype(np.float64) - img.astype(np.float64)
            assert float(np.sqrt((err ** 2).mean())) < 6.0
        feat = builtin_decode(p)
        assert feat["ok"] and feat["format"] == "avi"
        assert feat["feature"][0] == float(fps) and feat["feature"][1] == float(nf)


def test_md5_hex_col_buffer_path_matches_pylist():
    """md5_hex_col (zero-copy Arrow-buffer hashing, round 5) must equal
    md5_hex(to_pylist()) across layouts: nulls, unicode, empty strings,
    large_string, chunked, sliced, non-string fallback."""
    import pyarrow as pa

    from medea_ray.engine import dedup

    rows = ["abc", None, "", "üñïçødé 漢字", "x" * 1000, "tail"]
    expected = dedup.md5_hex(rows)
    layouts = {
        "string": pa.array(rows, pa.string()),
        "large": pa.array(rows, pa.large_string()),
        "chunked": pa.chunked_array(
            [pa.array(rows[:2], pa.string()), pa.array(rows[2:], pa.string())]
        ),
        "sliced": pa.array(["s0", "s1"] + rows, pa.string()).slice(2),
    }
    for name, col in layouts.items():
        assert dedup.md5_hex_col(col).to_pylist() == expected, name
    assert dedup.md5_hex_col(pa.array([], pa.string())).to_pylist() == []
    # int column falls back through the str() -> encode path? No: md5_hex
    # expects strings — non-string columns surface via to_pylist parity
    assert dedup.md5_hex_col(pa.array([None, None])).to_pylist() == [None, None]


def test_decontaminate_digest_buffer_path(ray_session):
    """Whole-doc digest decontamination (prefix_len=None) takes the
    Arrow-buffer fast path; verdicts must match the prefix-mode str path
    and handle nulls/unicode."""
    import pyarrow as pa
    import ray.data as rd

    from medea_ray.engine import decontam

    corpus = ["keep me", "drop me ü", None, "", "also kept"]
    banned = ["drop me ü", ""]
    ds = rd.from_arrow(pa.table({"text": pa.array(corpus, pa.string())}))
    bds = rd.from_arrow(pa.table({"text": pa.array(banned, pa.string())}))
    out = decontam.decontaminate(ds, "text", bds).to_pandas()
    # null text is KEPT (no content), '' matches the banned '' digest
    assert sorted(out["text"].fillna("<null>")) == ["<null>", "also kept", "keep me"]
    # prefix mode (str path) agrees where prefixes coincide with whole text
    out2 = decontam.decontaminate(
        rd.from_arrow(pa.table({"text": pa.array(corpus, pa.string())})),
        "text",
        rd.from_arrow(pa.table({"text": pa.array(banned, pa.string())})),
        prefix_len=64,
    ).to_pandas()
    assert sorted(out2["text"].fillna("<null>")) == sorted(
        out["text"].fillna("<null>")
    )
