"""Driver-contract query implementations (__ray_entry__.queries()).

Each function takes ``sf_dir`` (a directory of the TPC-H-ish testdata
parquet tables) and returns a Dataset / pandas DataFrame / pyarrow Table.
Column names and types are chosen to match the DuckDB oracle SQL in
``__ray_entry__.oracle_sql`` exactly (the driver hash-compares values after
sorting columns by name).

Floating-point discipline for oracle-checked queries: no float
accumulations cross the compare boundary — sums are computed on integer
cents/milli units on BOTH sides; min/max of floats are exact; approximate
results (HLL, t-digest, PSI) are rows-only checked.

None of these call ray.init(); the driver owns the session.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from medea_ray.engine import dedup, drift, similarity, stats, text, uniqueness, window
from medea_ray.engine.pipeline import validate_dataset
from medea_ray.fixtures.gen import DEFECT_SPECIFIER, build_payload


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _round_away(arr):
    """DuckDB's round() is half-away-from-zero; pyarrow's default is
    half-to-even, so a value landing exactly on .5 would silently diverge
    from the oracle. Every cents/milli conversion goes through this."""
    return pc.round(arr, round_mode="half_towards_infinity")


# -- column stats (E6) -------------------------------------------------------


def stats_orders_totalprice(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", columns=["o_totalprice"])

    def add_cents(t: pa.Table) -> pa.Table:
        cents = pc.cast(_round_away(pc.multiply(t.column("o_totalprice"), 100.0)), pa.int64())
        return t.append_column("cents", cents)

    from ray.data.aggregate import Sum

    with_cents = ds.map_batches(add_cents, batch_format="pyarrow")
    agg = with_cents.aggregate(
        stats.make_basic_stats_agg("o_totalprice"), Sum("cents", alias_name="sum_cents")
    )
    s = agg["stats(o_totalprice)"]
    return pd.DataFrame(
        [
            {
                "n": np.int64(s["n"]),
                "n_null": np.int64(s["n_null"]),
                "min_price": float(s["min"]),
                "max_price": float(s["max"]),
                "sum_cents": np.int64(agg["sum_cents"]),
            }
        ]
    )


def stats_documents_nchars(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", columns=["n_chars"])
    s = ds.aggregate(stats.make_basic_stats_agg("n_chars"))["stats(n_chars)"]
    return pd.DataFrame(
        [
            {
                "n": np.int64(s["n"]),
                "n_null": np.int64(s["n_null"]),
                "min_nchars": np.int64(s["min"]),
                "max_nchars": np.int64(s["max"]),
                "sum_nchars": np.int64(s["sum"]),
            }
        ]
    )


def distinct_lang_exact(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", columns=["lang"])
    groups = uniqueness.group_count(ds, "lang").take_all()  # tiny
    n = sum(1 for g in groups if g["lang"] is not None)
    return pd.DataFrame([{"n_distinct_lang": np.int64(n)}])


def hll_distinct_text(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct documents.text (rows-only check; accuracy is
    asserted against the exact count in tests)."""
    ds = _read(sf_dir, "documents", columns=["text"])
    est = stats.approx_distinct(ds, "text")
    return pd.DataFrame([{"approx_distinct_text": float(est)}])


def tdigest_nchars(sf_dir: str) -> pd.DataFrame:
    """t-digest quantiles of documents.n_chars (rows-only; tolerance-tested)."""
    ds = _read(sf_dir, "documents", columns=["n_chars"])
    q = stats.quantiles(ds, "n_chars", (0.5, 0.95, 0.99))
    return pd.DataFrame([q])


def _text_digests_only(ds, text_col: str = "text"):
    """Map-side projection of non-null texts to md5 digests: the ONLY
    column the downstream distinct-count groupby exchanges is the 16-byte
    digest — the text never crosses a shuffle (VERDICT r03 item 2; same
    shape as exact_dup_texts). Schema-pinned in
    tests/test_aggregates.py::test_hll_guard_exchange_carries_digests_only."""

    def to_digest(t: pa.Table) -> pa.Table:
        t = t.drop_null()
        return pa.table({"content_md5": dedup.md5_hex_col(t.column(text_col))})

    return ds.map_batches(to_digest, batch_format="pyarrow")


def hll_distinct_guard(sf_dir: str) -> pd.DataFrame:
    """Driver-side accuracy guard for the HyperLogLog sketch: the estimate
    on documents.text must land within 5% of the exact distinct count
    (p=14 HLL has ~0.8% typical error). The oracle asserts the boolean, so
    a sketch regression turns this driver row red.

    The exact side stays engine-side AND digest-only: texts reduce to md5
    digests map-side, the groupby exchanges only the digests, and the
    driver sees a single COUNT (md5 is collision-free at corpus scale for
    distinct-count purposes — same contract as exact_dup_texts)."""
    ds = _read(sf_dir, "documents", columns=["text"])
    est = stats.approx_distinct(ds, "text")
    exact = uniqueness.group_count(_text_digests_only(ds), "content_md5").count()
    return pd.DataFrame(
        [{"hll_within_5pct": bool(abs(est - exact) <= max(1.0, 0.05 * exact))}]
    )


def tdigest_nchars_guard(sf_dir: str) -> pd.DataFrame:
    """Driver-side accuracy guard for the t-digest sketch: compares the
    sketch quantiles against exact quantiles (computed engine-side on the
    same rows) and returns the boolean verdicts. The DuckDB oracle asserts
    the verdicts are TRUE — so a sketch regression turns this driver row
    red, not just a pytest tolerance test. The exact side materializes one
    int column (guard-scale only; the sketch itself streams)."""
    ds = _read(sf_dir, "documents", columns=["n_chars"])
    est = stats.quantiles(ds, "n_chars", (0.5, 0.95))
    vals = np.concatenate(
        [
            b.column("n_chars").to_numpy(zero_copy_only=False)
            for b in ds.iter_batches(batch_format="pyarrow")
        ]
    )
    vals = vals[~np.isnan(vals.astype(np.float64))]
    exact = {
        "p50": float(np.quantile(vals, 0.5)),
        "p95": float(np.quantile(vals, 0.95)),
    }

    def ok(k):
        return bool(abs(est[k] - exact[k]) <= max(2.0, 0.02 * abs(exact[k])))

    return pd.DataFrame(
        [{"p50_within_tol": ok("p50"), "p95_within_tol": ok("p95")}]
    )


def lang_nchars_sketch_guard(sf_dir: str) -> pd.DataFrame:
    """Driver-side accuracy guard for PER-GROUP sketches
    (stats.grouped_sketch_summary): per-language t-digest p50 of n_chars
    must land within tolerance of the per-language exact quantile
    (computed engine-side). The oracle emits TRUE per language, so a
    grouped-sketch regression turns this driver row red."""
    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])
    grouped = stats.grouped_sketch_summary(
        ds, "lang", tdigest_cols=["n_chars"], quantile_qs=(0.5,)
    )
    exact: dict[str, float] = {}
    for b in ds.iter_batches(batch_format="pyarrow"):
        for lang, n in zip(b.column("lang").to_pylist(), b.column("n_chars").to_pylist()):
            if lang is not None and n is not None:
                exact.setdefault(lang, []).append(n)
    rows = []
    for lang, vals in sorted(exact.items()):
        e = float(np.quantile(np.asarray(vals, np.float64), 0.5))
        p50 = grouped[lang]["n_chars"]["p50"]
        rows.append({
            "lang": lang,
            "p50_within_tol": bool(abs(p50 - e) <= max(2.0, 0.05 * abs(e))),
        })
    return pd.DataFrame(rows)


# -- groupby / aggregate -----------------------------------------------------


def lang_histogram(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["lang"])
    return uniqueness.group_count(ds, "lang")


def heavy_hitters_guard(sf_dir: str) -> pd.DataFrame:
    """Driver-side exactness guard for the Misra-Gries heavy-hitters
    sketch (``stats.heavy_hitters``, E6c): the sketch runs distributed
    (per-batch exact token counts -> k-counter partials -> tree-combine,
    NO shuffle), the exact side is the ``top_tokens`` explode shape
    without the limit; three booleans the oracle asserts TRUE:

    - ``bounds_ok``: every sketched estimate satisfies
      ``exact - err <= est <= exact`` (the MG undercount contract);
    - ``coverage_ok``: every token with exact count > ``err`` is present
      in the sketch (the guarantee that makes the sketch usable);
    - ``err_bound_ok``: ``err <= n // (k+1)`` AND the sketch's ingested
      weight ``n`` equals the exact total token count (ties the sketch's
      traversal to the exact side).

    The exact token-count table is materialized on the driver — fine at
    guard scale factors (same documented pattern as ``drift_guard``); the
    sketch path itself never ships more than k entries per block.
    """
    import re

    token_re = re.compile(r"[a-z0-9_]+")
    # the testdata vocabulary is ~31 tokens at sf0.01: k=16 < |vocab|
    # forces real trims through the distributed path, so err > 0 and the
    # bounds are non-trivial (k >= |vocab| would sketch exactly)
    K = 16

    def token_counts(t: pa.Table) -> dict:
        counts: dict[str, int] = {}
        for txt in t.column("text").to_pylist():
            if txt is None:
                continue
            for tok in token_re.findall(txt.lower()):
                counts[tok] = counts.get(tok, 0) + 1
        return counts

    sk = stats.heavy_hitters(
        _read(sf_dir, "documents", columns=["text"]),
        "text",
        k=K,
        batch_counts=token_counts,
        batch_size=4096,
    )

    from ray.data.aggregate import Sum

    def explode_count(t: pa.Table) -> pa.Table:
        counts = token_counts(t)
        return pa.table(
            {
                "token": pa.array(list(counts.keys()), pa.string()),
                "cnt": pa.array(list(counts.values()), pa.int64()),
            }
        )

    exact_rows = (
        _read(sf_dir, "documents", columns=["text"])
        .map_batches(explode_count, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="n"))
        .take_all()
    )
    exact = {r["token"]: r["n"] for r in exact_rows}
    est = dict(sk["items"])
    err, n = sk["err"], sk["n"]
    bounds_ok = all(
        exact.get(v, 0) - err <= e <= exact.get(v, 0) for v, e in est.items()
    )
    coverage_ok = all(v in est for v, c in exact.items() if c > err)
    err_bound_ok = err <= n // (K + 1) and n == sum(exact.values())
    return pd.DataFrame(
        [
            {
                "bounds_ok": bool(bounds_ok),
                "coverage_ok": bool(coverage_ok),
                "err_bound_ok": bool(err_bound_ok),
            }
        ]
    )


def source_counts_salted(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["source"])
    return uniqueness.salted_group_count(ds, "source", n_salts=8)


def orders_by_status(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])

    def add_cents(t: pa.Table) -> pa.Table:
        cents = pc.cast(_round_away(pc.multiply(t.column("o_totalprice"), 100.0)), pa.int64())
        return pa.table({"o_orderstatus": t.column("o_orderstatus"), "cents": cents})

    return (
        ds.map_batches(add_cents, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="sum_cents"))
    )


def orders_by_nation(sf_dir: str):
    """Two chained broadcast lookup joins (orders→customer→nation) + the
    usual partial-agg groupby: the fact stream is enriched map-side, never
    shuffled; only the tiny (n_name, partials) exchange is wide."""
    from ray.data.aggregate import Count, Sum

    from medea_ray.engine.join import broadcast_join

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    customer = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    j1 = broadcast_join(
        orders, "o_custkey", customer, "c_custkey", ["c_nationkey"],
        how="inner", concurrency=(1, 4),
    )
    j2 = broadcast_join(
        j1, "c_nationkey", nation, "n_nationkey", ["n_name"],
        how="inner", concurrency=(1, 4),
    )

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(_round_away(pc.multiply(t.column("o_totalprice"), 100.0)), pa.int64())
        return pa.table({"n_name": t.column("n_name"), "cents": cents})

    return (
        j2.map_batches(prep, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="sum_cents"))
    )


def events_daily(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.strftime(t.column("ts"), format="%Y-%m-%d")
        milli = pc.cast(_round_away(pc.multiply(t.column("value"), 1000.0)), pa.int64())
        return pa.table({"day": day, "milli": milli})

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Count(alias_name="n"), Sum("milli", alias_name="sum_value_milli"))
    )


def events_by_type_daily(sf_dir: str):
    """Two-key groupby: (event_type, day) counts + integer-unit sums."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.strftime(t.column("ts"), format="%Y-%m-%d")
        milli = pc.cast(_round_away(pc.multiply(t.column("value"), 1000.0)), pa.int64())
        return pa.table(
            {"event_type": t.column("event_type"), "day": day, "milli": milli}
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Count(alias_name="n"), Sum("milli", alias_name="sum_value_milli"))
    )


# -- composed corpus-prep pipeline (the training-data flagship) ---------------


def corpus_prep(sf_dir: str, banned_budget_rows: int = 1 << 22):
    """End-to-end training-corpus preparation, each stage a streaming
    Ray transform: quality filter (length bounds, non-null text) → exact
    dedup on the prefix-40 content key (one shuffle, min-id survivor) →
    benchmark decontamination (budget-aware digest anti-join) → 50%
    deterministic hash sample. Output: surviving doc_ids.

    The only shuffle in the whole pipeline is the dedup groupby on the
    16-byte key; everything else is map-side. This is the composition a
    real 100-TB corpus run would use, just with testdata thresholds.

    The banned set here is every-20th-doc — 5 % OF THE CORPUS by
    construction, so unlike real benchmark suites (decontam.py contract:
    ~1e4-1e6 rows) it grows with the input. ``filter_not_in_ds`` guards
    that: cardinality and bytes are logged every run, and above
    ``banned_budget_rows`` the anti-join switches to bucketed hash
    passes instead of one driver-sized broadcast."""
    import hashlib

    from ray.data.aggregate import Min

    from medea_ray.engine.decontam import filter_not_in_ds
    from medea_ray.engine.sampling import hash_sample

    def prep(t: pa.Table) -> pa.Table:
        n = t.column("n_chars")
        keep = pc.and_(
            pc.is_valid(t.column("text")),
            pc.and_(pc.greater_equal(n, 100), pc.less_equal(n, 400)),
        )
        t = t.filter(keep)
        keys = [
            hashlib.md5(x[:40].encode()).hexdigest()
            for x in t.column("text").to_pylist()
        ]
        return pa.table({
            "key": pa.array(keys, pa.string()),
            "doc_id": t.column("doc_id"),
        })

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    deduped = (
        docs.map_batches(prep, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Min("doc_id", alias_name="doc_id"))
    )

    # benchmark set: every 20th doc of the ORIGINAL corpus (independent of
    # the quality filter, as real decontamination must be)
    def benchmark_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("text")))
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ids % 20 == 0))
        keys = [
            hashlib.md5(x[:40].encode()).hexdigest()
            for x in t.column("text").to_pylist()
        ]
        return pa.table({"key": pa.array(keys, pa.string())})

    banned_ds = docs.map_batches(benchmark_keys, batch_format="pyarrow")
    clean = filter_not_in_ds(
        deduped, "key", banned_ds, "key", budget_rows=banned_budget_rows
    )
    return hash_sample(clean, "doc_id", threshold_hex="8").select_columns(["doc_id"])


# -- benchmark decontamination (engine/decontam.py) ---------------------------


def docs_decontaminated(sf_dir: str):
    """Corpus minus rows whose 40-char text prefix digest matches the
    pseudo-benchmark set (every 20th doc) — exact-hash decontamination as
    a broadcast anti-join. Prefix-40 matching (the exact-dedup key) makes
    the check non-trivial: boilerplate-sharing docs drop with the banned
    doc itself."""
    from medea_ray.engine.decontam import decontaminate

    def drop_null_text(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column("text")))

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        drop_null_text, batch_format="pyarrow"
    )
    def benchmark_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 20 == 0))

    banned = docs.map_batches(benchmark_rows, batch_format="pyarrow")
    out = decontaminate(docs, "text", banned, prefix_len=40)
    return out.select_columns(["doc_id"])


# -- deterministic sampling / splits (engine/sampling.py) ---------------------


def doc_hash_sample(sf_dir: str):
    """~25% deterministic sample of documents by md5(doc_id) prefix."""
    from medea_ray.engine.sampling import hash_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    return hash_sample(ds, "doc_id", threshold_hex="40")


STRATA_THRESHOLDS = {"en": "4", "de": "8"}  # ~25% en, ~50% de, default ~12.5%


def doc_stratified_sample(sf_dir: str):
    """Per-language sampling rates (down-sample the dominant language,
    keep more of the rest) — deterministic md5-prefix thresholds per
    stratum."""
    from medea_ray.engine.sampling import stratified_hash_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    return stratified_hash_sample(
        ds, "doc_id", "lang", STRATA_THRESHOLDS, default_threshold_hex="2"
    )


KMEANS_K = 8
KMEANS_ITERS = 4


def kmeans_guard(sf_dir: str) -> pd.DataFrame:
    """Driver-side exactness guard for distributed k-means
    (engine/cluster.py): every iteration's integer partials from the
    distributed pass must equal a driver-side single-array reference of
    the identical algorithm BIT-FOR-BIT — the int64-grid accumulation is
    order-independent across any block split, so equality (not
    tolerance) is the bar — and the final assignments must match exactly
    with a comfortably positive argmin margin (so float matmul shape
    differences between batched and whole-array distance computations
    cannot flip a label). One row per iteration; the oracle asserts every
    boolean TRUE.

    The exact side MATERIALIZES the (vec_id, embedding) projection on
    the driver by design (the drift_guard pattern — that is what makes
    it an independent recomputation); a loud row cap refuses bench-scale
    inputs instead of silently exhausting driver memory."""
    from medea_ray.engine import cluster

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n = ds.count()
    if n > 2_000_000:
        raise ValueError(
            f"kmeans_guard is an oracle-scale exactness check; refusing to "
            f"materialize {n} embedding rows on the driver — call "
            f"cluster.fit directly for the distributed path"
        )
    cent, hist = cluster.fit(ds, k=KMEANS_K, n_iters=KMEANS_ITERS)
    lab = cluster.assign(ds, cent).take_all()

    frames = [b.to_pandas() for b in ds.iter_batches(batch_format="pyarrow")]
    df = pd.concat(frames, ignore_index=True)
    ids = df["vec_id"].to_numpy(dtype=np.int64)
    mat = np.asarray(df["embedding"].tolist(), dtype=np.float64)
    _, rhist, ra = cluster.fit_reference(mat, ids, KMEANS_K, KMEANS_ITERS)

    ref_assign = dict(zip(ids.tolist(), ra.tolist()))
    assignments_match = all(r["cluster"] == ref_assign[r[
        "vec_id"]] for r in lab) and len(lab) == len(ids)
    margin_ok = bool(min(r["margin"] for r in lab) > 1e-6)
    rows = []
    for i, ((s, c), (rs, rc)) in enumerate(zip(hist, rhist)):
        rows.append({
            "iter": i,
            "sums_match": bool(np.array_equal(s, rs)),
            "counts_match": bool(np.array_equal(c, rc)),
            "assignments_match": bool(assignments_match),
            "margin_ok": margin_ok,
        })
    out = pd.DataFrame(rows)
    out["iter"] = out["iter"].astype("int64")
    return out


SEMDEDUP_THRESHOLD = 0.4  # 23 deterministic drops at sf0.01 (non-vacuous)


def semdedup_guard(sf_dir: str) -> pd.DataFrame:
    """Driver-side exactness + property guard for SemDeDup-style semantic
    dedup (engine/semdedup.py: k-means cluster, then within-cluster
    greedy drop of cosine >= threshold near-duplicates, farthest-from-
    centroid keep rule).

    - ``sets_match``: the distributed (cluster, keep, survivor_id)
      labelling equals a driver-side single-array reference of the
      identical algorithm BIT-FOR-BIT (per-cluster groups are id-sorted
      before any float math, making results block-split invariant).
    - ``survivor_valid``: independently of the reference, every dropped
      row's survivor is kept, shares its cluster, and their exact
      float64 cosine >= threshold (precision).
    - ``kept_independent``: no two kept rows in the same cluster have
      cosine >= threshold (within-cluster completeness — cross-cluster
      pairs are out of scope by the published design).
    - ``drops_nonvacuous``: at least one row was dropped, so the
      booleans aren't trivially true.
    - ``margin_ok``: no pairwise cosine sits within 1e-6 of the
      threshold and no keep-priority sort tie — the decisions are
      nowhere near a float boundary.

    The exact side materializes the embedding matrix on the driver by
    design (the kmeans_guard pattern); a loud row cap refuses
    bench-scale inputs instead of silently exhausting driver memory."""
    from medea_ray.engine import semdedup

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n = ds.count()
    if n > 2_000_000:
        raise ValueError(
            f"semdedup_guard is an oracle-scale exactness check; refusing "
            f"to materialize {n} embedding rows on the driver — call "
            f"semdedup.semantic_dedup directly for the distributed path"
        )
    got = pd.DataFrame(
        semdedup.semantic_dedup(
            ds, k=KMEANS_K, n_iters=KMEANS_ITERS,
            threshold=SEMDEDUP_THRESHOLD,
        ).take_all()
    )

    tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    ids = tbl.column("vec_id").to_numpy(zero_copy_only=False)
    mat = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    ref, thr_m, ord_m = semdedup.semantic_dedup_reference(
        ids, mat, KMEANS_K, KMEANS_ITERS, SEMDEDUP_THRESHOLD
    )
    sets_match = len(got) == len(ids) and all(
        ref[r.vec_id]
        == (r.cluster, r.keep,
            None if pd.isna(r.survivor_id) else int(r.survivor_id))
        for r in got.itertuples()
    )

    # independent property checks from exact float64 cosines
    norm = mat / np.maximum(
        np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
    )
    cos = norm @ norm.T
    pos = {int(v): i for i, v in enumerate(ids)}
    cluster_of = dict(zip(got["vec_id"], got["cluster"]))
    kept_ids = got.loc[got["keep"], "vec_id"].tolist()
    survivor_valid = True
    for r in got[~got["keep"]].itertuples():
        s = int(r.survivor_id)
        ok = (
            s in set(kept_ids)
            and cluster_of[s] == r.cluster
            and cos[pos[int(r.vec_id)], pos[s]] >= SEMDEDUP_THRESHOLD
        )
        survivor_valid = survivor_valid and ok
    kept_independent = True
    kept_by_cluster: dict[int, list[int]] = {}
    for kid in kept_ids:
        kept_by_cluster.setdefault(int(cluster_of[kid]), []).append(int(kid))
    for members in kept_by_cluster.values():
        idx = [pos[m] for m in members]
        sub = cos[np.ix_(idx, idx)]
        iu, ju = np.triu_indices(len(idx), 1)
        if iu.size and (sub[iu, ju] >= SEMDEDUP_THRESHOLD).any():
            kept_independent = False
    return pd.DataFrame(
        [{
            "n_total": np.int64(len(ids)),
            "sets_match": bool(sets_match),
            "survivor_valid": bool(survivor_valid),
            "kept_independent": bool(kept_independent),
            "drops_nonvacuous": bool((~got["keep"]).any()),
            "margin_ok": bool(thr_m > 1e-6 and ord_m > 1e-6),
        }]
    )


def doc_split_counts(sf_dir: str):
    """Train/test split (~12.5% test) tagged by md5(doc_id) prefix, then
    (lang, split) counts — proves the split is deterministic and exhaustive."""
    from ray.data.aggregate import Count

    from medea_ray.engine.sampling import train_test_split

    def drop_null_ids(t: pa.Table) -> pa.Table:
        # null ids have no stable split (engine: null split, SQL CASE:
        # 'train') — exclude them on both sides rather than diverge
        return t.filter(pc.is_valid(t.column("doc_id")))

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"]).map_batches(
        drop_null_ids, batch_format="pyarrow"
    )
    tagged = train_test_split(ds, "doc_id", test_threshold_hex="2")
    return (
        tagged.select_columns(["lang", "split"])
        .groupby(["lang", "split"])
        .aggregate(Count(alias_name="n"))
    )


# -- large×large shuffle join (engine/join.py shuffle_join) -------------------


def orders_lineitem_join(sf_dir: str):
    """Inner hash-shuffle join of two fact-scale tables (orders⋈lineitem);
    floats cross the boundary only as pass-through VALUES (exact), never
    accumulations."""
    from medea_ray.engine.join import shuffle_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    lineitem = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"])
    out = shuffle_join(
        orders, lineitem, on="o_orderkey", right_on="l_orderkey",
        join_type="inner", num_partitions=16,
    )
    return out.select_columns(["o_orderkey", "o_custkey", "l_linenumber", "l_quantity"])


def orders_lineitem_salted_join(sf_dir: str):
    """Skew-resistant SALTED hash join — same result set as
    orders_lineitem_join but through join.salted_join (lineitem as the
    salted/spread side, orders replicated n_salts×): the oracle proves
    salting is result-invariant."""
    from medea_ray.engine.join import salted_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    lineitem = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"])
    out = salted_join(
        lineitem, orders, on="l_orderkey", right_on="o_orderkey",
        n_salts=4, join_type="inner", num_partitions=16,
    )
    # the join keeps the LEFT side's key name (lineitem is the salted side)
    return out.rename_columns({"l_orderkey": "o_orderkey"}).select_columns(
        ["o_orderkey", "o_custkey", "l_linenumber", "l_quantity"]
    )


def orders_no_lineitems(sf_dir: str):
    """Anti join (NOT EXISTS): orders with no lineitem rows."""
    from medea_ray.engine.join import shuffle_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    lineitem = _read(sf_dir, "lineitem", columns=["l_orderkey"])
    out = shuffle_join(
        orders, lineitem, on="o_orderkey", right_on="l_orderkey",
        join_type="left_anti", num_partitions=16,
    )
    return out.select_columns(["o_orderkey", "o_custkey"])


# -- ordered / windowed operators (engine/window.py) -------------------------


SESSION_GAP_US = 8 * 3600 * 1_000_000  # 8h: ~2.1 events/session on testdata

# static value-range buckets for the interval join; "burst" overlaps "mid"
# and "high" on purpose (multi-match rows prove the range-join semantics)
VALUE_RANGES = [
    ("low", 0.0, 50.0),
    ("mid", 50.0, 200.0),
    ("high", 200.0, 1000.0),
    ("burst", 100.0, 300.0),
]

TUMBLE_6H_US = 6 * 3600 * 1_000_000


def user_sessions(sf_dir: str):
    """Gap-based sessions per user over the events stream."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    return window.sessionize(ds, "user_id", "ts", gap_us=SESSION_GAP_US)


def clicks_last_purchase(sf_dir: str):
    """Backward as-of join: each click event paired with the timestamp of
    the same user's latest purchase at or before it (inner: clicks with no
    prior purchase drop, keeping the oracle output null-free)."""
    clicks = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"]).filter(
        expr="event_type == 'click'"
    )
    purchases = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"]).filter(
        expr="event_type == 'purchase'"
    )
    out = window.asof_join(
        clicks, purchases, on="user_id", ts_col="ts",
        left_cols=["event_id"], match_name="last_purchase_us", how="inner",
    )
    return out.select_columns(["event_id", "user_id", "ts_us", "last_purchase_us"])


def events_value_ranges(sf_dir: str):
    """Interval (range) join of events.value against static, overlapping
    value buckets — through the banded large×large ``join.range_join``
    (one shuffle on the band key + exact post-filter), so the scale path
    is what the oracle checks; the tiny-table broadcast path
    (``window.interval_join``) stays pytest-covered."""
    import ray.data as rd

    from medea_ray.engine import join

    ds = _read(sf_dir, "events", columns=["event_id", "value"])
    ranges = rd.from_arrow(pa.table({
        "bucket": pa.array([lab for lab, _, _ in VALUE_RANGES], pa.string()),
        "lo": pa.array([lo for _, lo, _ in VALUE_RANGES], pa.float64()),
        "hi": pa.array([hi for _, _, hi in VALUE_RANGES], pa.float64()),
    }))
    out = join.range_join(
        ds, "value", ranges, "lo", "hi", band_width=100.0, num_partitions=8
    )
    return out.select_columns(["event_id", "bucket"])


def top_events_per_user(sf_dir: str):
    """Window-function shape: top-3 events by value per user, ties broken
    by event_id asc (row_number() semantics)."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    out = window.top_k_per_group(
        ds, "user_id", order_col="value", k=3, tiebreak_col="event_id"
    )
    return out.select_columns(["user_id", "rank", "event_id"])


def events_tumbling_6h(sf_dir: str):
    """Tumbling 6-hour windowed aggregate: count + integer-milli value sum
    per window."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def milli(t: pa.Table) -> pa.Table:
        m = pc.cast(_round_away(pc.multiply(t.column("value"), 1000.0)), pa.int64())
        return t.drop_columns(["value"]).append_column("milli", m)

    win = window.tumbling_window(
        ds.map_batches(milli, batch_format="pyarrow"), "ts", TUMBLE_6H_US, ["milli"]
    )
    return (
        win.groupby("window_start_us")
        .aggregate(Count(alias_name="n"), Sum("milli", alias_name="sum_value_milli"))
    )


def events_hopping_12h(sf_dir: str):
    """Hopping windowed aggregate: 12-hour windows every 6 hours (k=2
    overlapping windows per event) — count + integer-milli value sum per
    window. The overlapping-window shape next to the tumbling one: the
    fan-out doubles rows map-side, then Ray's Count/Sum partials keep the
    exchange at (window, partial) rows."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def milli(t: pa.Table) -> pa.Table:
        m = pc.cast(_round_away(pc.multiply(t.column("value"), 1000.0)), pa.int64())
        return t.drop_columns(["value"]).append_column("milli", m)

    win = window.hopping_window(
        ds.map_batches(milli, batch_format="pyarrow"),
        "ts", width_us=2 * TUMBLE_6H_US, hop_us=TUMBLE_6H_US,
        keep_cols=["milli"],
    )
    return (
        win.groupby("window_start_us")
        .aggregate(Count(alias_name="n"), Sum("milli", alias_name="sum_value_milli"))
    )


EVENT_TYPES = ["click", "purchase", "error", "signup", "view"]


def user_event_pivot(sf_dir: str):
    """Long→wide pivot: per-user count column per event type."""
    from medea_ray.engine.reshape import pivot_counts

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    return pivot_counts(ds, "user_id", "event_type", EVENT_TYPES)


def user_running_value(sf_dir: str):
    """Running per-user value sum in (ts, event_id) order — the SUM OVER
    (PARTITION BY ... ROWS UNBOUNDED PRECEDING) window shape, on integer
    milli units."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        m = pc.cast(_round_away(pc.multiply(t.column("value"), 1000.0)), pa.int64())
        return t.drop_columns(["value"]).append_column("milli", m)

    out = window.cumulative_per_group(
        ds.map_batches(prep, batch_format="pyarrow"),
        group_col="user_id", order_col="ts", value_col="milli",
        tiebreak_col="event_id", out_name="running_milli",
    )
    return out.select_columns(["user_id", "event_id", "running_milli"])


def events_prev_value(sf_dir: str):
    """Per-user LAG: each event paired with the user's previous event
    value (integer milli), in (ts, event_id) order; first events drop so
    only exact integers cross the oracle boundary."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        m = pc.cast(_round_away(pc.multiply(t.column("value"), 1000.0)), pa.int64())
        return t.drop_columns(["value"]).append_column("milli", m)

    out = window.lag_per_group(
        ds.map_batches(prep, batch_format="pyarrow"),
        group_col="user_id", order_col="ts", value_col="milli",
        tiebreak_col="event_id", out_name="prev_milli",
    )

    def drop_first(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column("prev_milli")))

    return out.map_batches(drop_first, batch_format="pyarrow").select_columns(
        ["user_id", "event_id", "prev_milli"]
    )


def top_users_by_events(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["user_id"])
    counts = uniqueness.group_count(ds, "user_id")
    return counts.sort(["n", "user_id"], descending=[True, False]).limit(10)


def lineitem_filter_project(sf_dir: str):
    ds = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"]
    )
    return ds.filter(expr="l_quantity >= 49")


def text_len_histogram(sf_dir: str):
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", columns=["n_chars"])

    def bucketize(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.divide(t.column("n_chars"), 100.0)), pa.int64())
        return pa.table({"bucket": b})

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Count(alias_name="n"))
    )


# -- uniqueness / dedup ------------------------------------------------------


def exact_dup_texts(sf_dir: str):
    """Duplicate groups on a 40-char boilerplate prefix key (the testdata
    documents have no full-text duplicates; prefix keys both make the check
    non-degenerate and model real web-text boilerplate dedup). Full-text
    exact dedup is exercised by the pages fixtures, which plant duplicates."""
    import hashlib

    from ray.data.aggregate import Count, Min

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def add_key(t: pa.Table) -> pa.Table:
        keys = [
            None if x is None else hashlib.md5(x[:40].encode()).hexdigest()
            for x in t.column("text").to_pylist()
        ]
        return pa.table(
            {"content_md5": pa.array(keys, pa.string()), "doc_id": t.column("doc_id")}
        )

    return (
        ds.map_batches(add_key, batch_format="pyarrow")
        .groupby("content_md5")
        .aggregate(Count(alias_name="n"), Min("doc_id", alias_name="keep_id"))
        .filter(expr="n > 1")
    )


def simhash_near_dup(sf_dir: str) -> pd.DataFrame:
    """SimHash block-rotation near-dup candidate buckets (rows-only)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    cand = dedup.simhash_candidates(ds, "doc_id").to_pandas()
    if len(cand) == 0 or "ids" not in cand.columns:
        return pd.DataFrame({"block": [], "block_val": [], "n": [], "ids": []})
    cand["ids"] = cand["ids"].map(lambda x: ",".join(map(str, x)))
    cand["block_val"] = cand["block_val"].astype("uint64").astype(str)
    return (
        cand[["block", "block_val", "n", "ids"]]
        .sort_values(["block", "block_val"])
        .reset_index(drop=True)
    )


def minhash_near_dup(sf_dir: str) -> pd.DataFrame:
    """Near-dup candidate buckets over documents (rows-only check)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    cand = dedup.minhash_candidate_groups(ds, "doc_id", concurrency=(1, 4))
    df = cand.to_pandas()
    if len(df) == 0:
        return pd.DataFrame({"band_key": [], "n": [], "ids": []})
    df["ids"] = df["ids"].map(lambda x: ",".join(map(str, x)))
    return df[["band_key", "n", "ids"]].sort_values("band_key").reset_index(drop=True)


def referential_orders_customers(sf_dir: str) -> pd.DataFrame:
    """FK check orders.o_custkey ⊆ customer.c_custkey via broadcast
    anti-join (no shuffle of the fact side)."""
    from medea_ray.engine.referential import referential_check

    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    customer = _read(sf_dir, "customer", columns=["c_custkey"])
    r = referential_check(orders, "o_custkey", customer, "c_custkey")
    return pd.DataFrame([{"n_orphans": np.int64(r["n_orphans"])}])


def doc_text_digests(sf_dir: str):
    """(doc_id, md5 of text) — proves the text column round-trips
    byte-identically through the Ray read path (E12 invariant, checkable
    against DuckDB's md5 over the same parquet)."""
    import hashlib

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def digest(t: pa.Table) -> pa.Table:
        h = [
            None if x is None else hashlib.md5(x.encode()).hexdigest()
            for x in t.column("text").to_pylist()
        ]
        return pa.table({"doc_id": t.column("doc_id"), "text_md5": pa.array(h, pa.string())})

    return ds.map_batches(digest, batch_format="pyarrow")


#: planted decorations for docs_normalized — each row appends
#: deco[doc_id % 6] so every normalization rule fires non-vacuously
#: (curly quotes/dashes/ellipsis, accents incl. dotted-I and Ё, Greek
#: case fold, NBSP, guillemets/primes, double spaces). Mirrored as a
#: DuckDB array literal in __ray_entry__.oracle_sql.
NORMALIZE_DECO = (
    "“Héllo—Wörld”…",
    "CAFÉ № ½",
    "naïve  résumé",
    "ВЕРХНИЙ Ёё",
    "İstanbul ΣΙΓΜΑΣ",
    "a’b′c«d»",
)


def docs_normalized(sf_dir: str):
    """CCNet-style text normalization (engine/normalize.py), plus the
    raw-text md5 of the retired ``doc_text_digests`` slot so the E12
    byte-identical-roundtrip invariant keeps its oracle row.

    Each row's input is ``text || '\\n' || deco[doc_id%6] || BEL ||
    ' No.' || doc_id`` — a pure function of (text, doc_id) built
    identically in the SQL oracle — so the value-hash compare pins the
    full normalization chain (non-printing strip, punct table, Unicode
    lower, accent strip, digit collapse, whitespace collapse) BYTE-
    EXACTLY per row against DuckDB's independent replay
    (lower/strip_accents/replace-chain/regexp_replace)."""
    import hashlib

    from medea_ray.engine import normalize as N

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("doc_id")))
        i = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        extra = (
            np.array(NORMALIZE_DECO, object)[i % 6]
            + "\x07 No."
            + i.astype(str).astype(object)
        )
        raw = pc.binary_join_element_wise(
            pc.cast(t.column("text"), pa.string()),
            pa.array(extra, pa.string()),
            "\n",
        )
        h = [
            None if x is None else hashlib.md5(x.encode()).hexdigest()
            for x in t.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "text_md5": pa.array(h, pa.string()),
                "norm_text": N.normalize_array(raw),
            }
        )

    return ds.map_batches(plant, batch_format="pyarrow")


#: planted shared-line prefix for dedup_paragraphs_docs — mirrored
#: verbatim in the DuckDB oracle (__ray_entry__._paradedup_sql).
PARADEDUP_SHARED = "shared fact number "


def dedup_paragraphs_docs(sf_dir: str):
    """Corpus-wide keep-first paragraph dedup (engine/paradedup.py —
    the RefinedWeb exact-line-dedup verb). Each doc's text gets TWO
    planted copies of ``'shared fact number <doc_id%7>'`` appended, so
    every hash group spans ~71 docs (cross-doc dups) AND each doc holds
    a within-doc repeat: the min-doc_id owner keeps exactly its first
    planted instance, every other instance drops. The DuckDB oracle
    recomputes ownership from scratch (explode + rank window + HAVING
    count>1) and matches (n_paras, n_kept_paras, clean_text)
    BYTE-EXACTLY per row."""
    from medea_ray.engine import paradedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("doc_id")))
        i = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        s = pa.array(
            PARADEDUP_SHARED + (i % 7).astype(str).astype(object), pa.string()
        )
        raw = pc.binary_join_element_wise(
            pc.fill_null(pc.cast(t.column("text"), pa.string()), ""),
            s,
            s,
            "\n",
        )
        return pa.table({"doc_id": t.column("doc_id"), "text": raw})

    planted = ds.map_batches(plant, batch_format="pyarrow")
    return paradedup.dedup_paragraphs(planted, "text", "doc_id")


def warc_extract_pages(sf_dir: str):
    """Common-Crawl-shape source path, oracle-checked byte-exactly: each
    batch of documents is serialized as a REAL WARC stream (gzip members,
    response records, HTTP heads — ``engine/warc.py``), walked back out,
    and the html payloads go through the HTMLParser extraction stage
    (``engine/htmltext.py``).  The synthesized html wraps the text with
    ``&<>`` escaped, every space doubled, a doubled-space title, an empty
    ``<p>``, a ``<script>`` decoy and ``doc_id%3`` empty links — so the
    oracle's ``md5(text)`` equality PROVES entity decode, tag drop and
    whitespace normalization each invert exactly: the north-star
    byte-identical-extracted-text invariant as a value-hash row.  The
    whole synth → WARC → parse → extract loop runs inside ``map_batches``
    (nothing driver-side, nothing on disk)."""
    import hashlib
    from datetime import datetime, timedelta, timezone

    from medea_ray.engine.htmltext import HtmlExtractor
    from medea_ray.engine.warc import make_warc, warc_records_to_table

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    base = datetime(2026, 3, 1, tzinfo=timezone.utc)

    def to_pages(t: pa.Table) -> pa.Table:
        recs = []
        for doc_id, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            if text is None:
                continue
            esc = (
                text.replace("&", "&amp;")
                .replace("<", "&lt;")
                .replace(">", "&gt;")
                .replace(" ", "  ")
            )
            html = (
                f"<html><head><title>Doc  {doc_id}</title>"
                f'<script>var x = "<p>decoy</p>";</script></head>'
                f"<body><p></p><p>{esc}</p>"
                + '<a href="/r"></a>' * (int(doc_id) % 3)
                + "</body></html>"
            ).encode()
            recs.append(
                {
                    "url": f"https://corpus.example/doc/{doc_id}",
                    "date": base + timedelta(seconds=int(doc_id) % 86400),
                    "html": html,
                }
            )
        return warc_records_to_table(make_warc(recs), path="")

    pages = ds.map_batches(to_pages, batch_format="pyarrow")
    extracted = pages.map_batches(
        HtmlExtractor,
        fn_constructor_kwargs=dict(html_col="html"),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
        num_cpus=1,
    )

    def project(t: pa.Table) -> pa.Table:
        ids, md5s = [], []
        for url, txt in zip(
            t.column("url").to_pylist(), t.column("ext_text").to_pylist()
        ):
            ids.append(int(url.rsplit("/", 1)[1]))
            md5s.append(None if txt is None else hashlib.md5(txt.encode()).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "url": t.column("url"),
                "title": t.column("ext_title"),
                "n_links": t.column("ext_n_links"),
                "text_md5": pa.array(md5s, pa.string()),
            }
        )

    return extracted.map_batches(project, batch_format="pyarrow")


# -- token counts / text features -------------------------------------------


def doc_token_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return text.add_token_counts(ds, id_col="doc_id")


def top_tokens(sf_dir: str):
    """Corpus-wide top-50 tokens: the explode/unnest shape — one row per
    token occurrence is never materialized; each batch explodes and
    pre-counts its own tokens (Arrow group_by per batch), so the shuffle
    moves (token, partial_count) rows only, then groupby-sum + sort+limit.
    Tokenization is ASCII [a-z0-9_]+ on lower() to stay in exact lockstep
    with the DuckDB oracle's RE2 semantics."""
    import re

    from ray.data.aggregate import Sum

    token_re = re.compile(r"[a-z0-9_]+")
    ds = _read(sf_dir, "documents", columns=["text"])

    def explode_count(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for text in t.column("text").to_pylist():
            if text is None:
                continue
            for tok in token_re.findall(text.lower()):
                counts[tok] = counts.get(tok, 0) + 1
        return pa.table(
            {
                "token": pa.array(list(counts.keys()), pa.string()),
                "cnt": pa.array(list(counts.values()), pa.int64()),
            }
        )

    return (
        ds.map_batches(explode_count, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="n"))
        .sort(["n", "token"], descending=[True, False])
        .limit(50)
    )


def doc_word_stats(sf_dir: str):
    """Per-doc word-repetition stats (Gopher-style boilerplate signal):
    total vs distinct ASCII word counts, exactly mirrored in SQL."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return text.add_word_stats(ds, id_col="doc_id")


# Deterministic repeated tail planted on doc_id % 5 == 1 rows so the
# within-doc duplicated-n-gram path (dup5..dup10 spans) is non-vacuous
# on the near-unique synthetic corpus — identical literal on the SQL
# side (docs_pii_redacted precedent). Single source of truth for both.
GOPHER_PLANT = " spam ham eggs" * 6


def gopher_repetition_stats(sf_dir: str):
    """Gopher repetition signals (engine/gopher.py, arXiv:2112.11446
    Table A1): per-doc integer evidence — word count, text char count,
    ``max(count * gram_chars)`` for 2/3/4-grams, and span-union covered
    chars of within-doc duplicated 5..10-grams — hash-compared against a
    DuckDB oracle that recomputes every n-gram from scratch with
    ``string_split`` + ``list_slice``. Rows with null doc_id excluded on
    both sides; a repeated 3-word phrase is planted on doc_id % 5 == 1
    (``GOPHER_PLANT``) so dup coverage is non-vacuous (100 docs with
    all of dup5..dup10 > 0 at sf0.01)."""
    from medea_ray.engine import gopher

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("doc_id")))
        txt = pc.fill_null(t.column("text"), "")
        mask = pa.array(t.column("doc_id").to_numpy(zero_copy_only=False) % 5 == 1)
        planted = pc.if_else(
            mask, pc.binary_join_element_wise(txt, GOPHER_PLANT, ""), txt
        )
        return t.set_column(t.schema.get_field_index("text"), "text", planted)

    return gopher.repetition_stats(
        ds.map_batches(plant, batch_format="pyarrow"), "text", id_col="doc_id"
    )


# Shared 10-word boilerplate tail planted on doc_id % 7 == 3 rows so the
# CROSS-document duplicated-span path is non-vacuous (the synthetic
# corpus is near-unique at the 5-gram level); identical literal on the
# SQL side. Words chosen outside the testdata vocabulary.
DUPSPAN_PLANT = " the quick brown fox jumps over the lazy dog today"
DUPSPAN_K = 5


def dup_span_removal(sf_dir: str):
    """ExactSubstr-style duplicated-span removal (engine/substr.py,
    arXiv:2107.06499): every 5-word span occurring >= 2 times corpus-wide
    is masked from every document. Emits per-doc integers (n_words,
    n_covered) plus the cleaned text itself, so the value-hash compare
    pins the masking BYTE-EXACTLY against a DuckDB oracle that
    recomputes grams, the global duplicate set, the span union, and the
    ``string_agg`` re-join from scratch. A shared boilerplate tail is
    planted on doc_id % 7 == 3 (``DUPSPAN_PLANT``) so cross-document
    duplication is non-vacuous (~71 docs at sf0.01); natural within-doc
    repeats count too (min_count spans both cases, as in the paper)."""
    from medea_ray.engine import substr

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("doc_id")))
        txt = pc.fill_null(t.column("text"), "")
        mask = pa.array(t.column("doc_id").to_numpy(zero_copy_only=False) % 7 == 3)
        planted = pc.if_else(
            mask, pc.binary_join_element_wise(txt, DUPSPAN_PLANT, ""), txt
        )
        return t.set_column(t.schema.get_field_index("text"), "text", planted)

    planted = ds.map_batches(plant, batch_format="pyarrow").materialize()
    return substr.mask_dup_spans(planted, "text", id_col="doc_id", k=DUPSPAN_K)


def url_host_stats(sf_dir: str):
    """URL canonicalization / host extraction (engine/url.py): planted
    urls exercise every rule — scheme+host case, trailing host dot,
    default vs explicit port (http:80 / https:443 stripped, :8080
    kept), empty path → '/', query-param sort with empty-segment drop,
    fragment removal, and the co.uk registrable-domain pattern — and
    the DuckDB oracle recomputes the canonical string from scratch via
    regexp_extract / list_sort / list_filter, so the value hash pins
    the parsing semantics byte-exactly per row. The url is a pure
    function of doc_id, built identically on both sides
    (docs_pii_redacted precedent)."""
    from medea_ray.engine import url as U

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def plant(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("doc_id")))
        i = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        scheme = np.array(["HTTP", "https", "http"], object)[i % 3]
        tld = np.array([".COM", ".co.uk"], object)[i % 2]
        dot = np.array(["", "."], object)[(i % 5 == 0).astype(np.int64)]
        port = np.array([":80", ":443", ":8080", ""], object)[i % 4]
        ids = i.astype(str).astype(object)
        path = np.where(i % 11 == 0, "", "/P/" + ids)
        query = np.array(["?b=2&a=1&a=0&", ""], object)[(i % 2 != 0).astype(np.int64)]
        frag = np.array(["#Sec", "", ""], object)[i % 3]
        url = (
            scheme + "://Host" + (i % 7).astype(str).astype(object)
            + ".Example" + tld + dot + port + path + query + frag
        )
        return pa.table(
            {"doc_id": t.column("doc_id"), "url": pa.array(url, pa.string())}
        )

    planted = ds.map_batches(plant, batch_format="pyarrow")

    def project(t: pa.Table) -> pa.Table:
        parsed = U.parse_urls(t.column("url"))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "host": parsed.column("host"),
                "registrable_domain": parsed.column("registrable_domain"),
                "canonical_url": parsed.column("canonical_url"),
                "n_params": parsed.column("n_params"),
                "url_ok": parsed.column("url_ok"),
            }
        )

    return planted.map_batches(project, batch_format="pyarrow")


def bloom_filter_guard(sf_dir: str) -> pd.DataFrame:
    """Exactness guard for the mergeable Bloom filter (stats.BloomFilter,
    E6d — the fourth mergeable sketch next to HLL / TDigest /
    Misra-Gries). The filter is built DISTRIBUTED (64-row partials
    OR-merged through the bounded-fan-in tree) over planted keys
    ``'k' || doc_id``; the oracle asserts:

    - ``n_added`` == exact non-null doc_id count (SQL-computable);
    - ``no_false_negatives``: every present key probes True — the Bloom
      contract that makes the sketch usable for crawl dedup;
    - ``bits_match_reference``: the distributed build is BIT-IDENTICAL
      to a single-pass driver build (OR-merge order independence);
    - ``fp_within_bound``: false positives on 2000 disjoint ``'a' || i``
      probes stay under 2x the theoretical (1-e^(-kn/m))^k rate plus
      slack — a broken hash/merge collapses to all-True and fails.
    """
    import math

    import ray.data as rd

    from medea_ray.engine import stats as st

    N_BITS, N_HASHES, N_ABSENT = 1 << 13, 7, 2000

    def keyify(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("doc_id")))
        return pa.table(
            {"key": pc.binary_join_element_wise(
                "k", pc.cast(t.column("doc_id"), pa.string()), "")}
        )

    keys = (
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(keyify, batch_format="pyarrow")
        .materialize()  # consumed twice: build + probe
    )
    bloom = st.bloom_build(
        keys, "key", n_bits=N_BITS, n_hashes=N_HASHES,
        batch_size=64, max_driver_states=4,
    )

    probed = st.bloom_probe(keys, "key", bloom)
    n_present = 0
    n_missed = 0
    for b in probed.iter_batches(batch_format="pyarrow"):
        seen = b.column("maybe_seen").to_numpy(zero_copy_only=False)
        n_present += len(seen)
        n_missed += int((~seen).sum())

    def absent_keys(t: pa.Table) -> pa.Table:
        return pa.table(
            {"key": pc.binary_join_element_wise(
                "a", pc.cast(t.column("id"), pa.string()), "")}
        )

    absent = rd.range(N_ABSENT).map_batches(absent_keys, batch_format="pyarrow")
    n_fp = 0
    for b in st.bloom_probe(absent, "key", bloom).iter_batches(
        batch_format="pyarrow"
    ):
        n_fp += int(b.column("maybe_seen").to_numpy(zero_copy_only=False).sum())

    # single-pass driver reference over the same keys, bit-for-bit
    ref = st.BloomFilter(N_BITS, N_HASHES)
    for b in keys.iter_batches(batch_format="pyarrow"):
        ref.add_batch(b.column("key"))
    bits_match = bool(
        np.array_equal(ref.words, bloom.words) and ref.n_added == bloom.n_added
    )

    allowed = int(math.ceil(N_ABSENT * 2.0 * bloom.fp_rate_bound())) + 8
    return pd.DataFrame(
        [
            {
                "n_added": np.int64(bloom.n_added),
                "n_present_probed": np.int64(n_present),
                "n_absent_probed": np.int64(N_ABSENT),
                "no_false_negatives": bool(n_missed == 0),
                "bits_match_reference": bits_match,
                "fp_within_bound": bool(n_fp <= allowed),
            }
        ]
    )


def lm_unigram_stats(sf_dir: str):
    """CCNet-style LM scoring evidence (engine/lm.py): train an exact
    unigram model on the deterministic md5-prefix TRAIN split of the
    documents table (the doc_split_counts machinery — prefix >= '2'),
    score EVERY document against it, and emit the integer evidence the
    SQL oracle recomputes exactly: per-doc token count, OOV count
    (test-only tokens), and the sum of model counts over the doc's
    token occurrences. The float avg_logprob / perplexity columns are
    deterministic functions of these integers (pytest-pinned) and stay
    out of the hash compare.

    The synthetic corpus's vocabulary fully overlaps between splits, so
    the query PLANTS one doc-unique token per row (identically to the
    SQL oracle, the docs_pii_redacted precedent) — test-split docs then
    have exactly one genuinely out-of-vocabulary token, making the OOV
    path non-vacuous."""
    from medea_ray.engine import lm, sampling

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def drop_null_ids_and_plant(t: pa.Table) -> pa.Table:
        # null doc_ids have no stable split membership — exclude on
        # both sides (the doc_split_counts precedent)
        t = t.filter(pc.is_valid(t.column("doc_id")))
        planted = pc.binary_join_element_wise(
            pc.fill_null(t.column("text"), ""),
            " uniqtok",
            pc.cast(t.column("doc_id"), pa.string()),
            "",
        )
        return t.set_column(
            t.schema.get_field_index("text"), "text", planted
        )

    ds = ds.map_batches(drop_null_ids_and_plant, batch_format="pyarrow")
    tagged = sampling.train_test_split(ds, "doc_id", "2")

    def train_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("split"), "train"))

    train = tagged.map_batches(train_only, batch_format="pyarrow")
    model = lm.train_unigram(train, "text")
    out = pa.concat_tables(
        lm.score(ds, model, text_col="text", id_col="doc_id").iter_batches(
            batch_format="pyarrow"
        )
    )
    return (
        out.select(["doc_id", "n_tokens", "n_oov", "sum_tok_count"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def doc_pack_sequences(sf_dir: str):
    """GPT-style sequence packing (engine/pack.py): concatenate every
    document in doc_id order into one global token stream (pinned
    whitespace tokenization — ``count_substring + 1`` == DuckDB
    ``len(string_split(text, ' '))``) and cut fixed-length training
    sequences; emit each doc's global token interval [tok_start,
    tok_end) and spanned sequence range seq_first..seq_last — all
    int64, exact, independent of block layout. Null doc_ids have no
    packing order and are excluded on both sides (the doc_split_counts
    precedent). seq_len=256 makes most docs straddle a sequence
    boundary; bucket_width=64 exercises multiple range buckets and the
    cross-bucket offset stitching at every SF."""
    from medea_ray.engine import pack

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def drop_null_ids(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column("doc_id")))

    return pack.pack_sequences(
        ds.map_batches(drop_null_ids, batch_format="pyarrow"),
        id_col="doc_id",
        text_col="text",
        seq_len=256,
        bucket_width=64,
    )


_C4_LOREM = "lorem ipsum dolor sit amet today."
_C4_BRACE = "code sample with braces { inside }."


def _chunk(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _c4_plant_batch(t: pa.Table, carry_cols: tuple = ()) -> pa.Table:
    """Shared C4 planting kernel (see c4_clean_docs docstring): chunk
    the fixture words into 7-word lines, append '.', '!', '?', '\"' or
    nothing by (doc_id + line_no) % 5, and add lorem-ipsum /
    curly-brace victim lines on doc_id % 97 / % 89. Null doc_ids are
    dropped (no stable plant). ``carry_cols`` ride through unchanged
    (same row mask)."""
    t = t.filter(pc.is_valid(t.column("doc_id")))
    idn = _chunk(t.column("doc_id")).to_numpy(zero_copy_only=False).astype(np.int64)
    texts = pc.fill_null(_chunk(t.column("text")), "")
    la = _chunk(pc.split_pattern(texts, " "))
    cnts = pc.list_value_length(la).to_numpy().astype(np.int64)
    flat = pc.cast(_chunk(la.flatten()), pa.string())
    offsets = np.concatenate([np.zeros(1, np.int64), np.cumsum(cnts)])
    word_pos = np.arange(offsets[-1], dtype=np.int64) - np.repeat(offsets[:-1], cnts)
    lines_per_doc = (cnts - 1) // 7 + 1
    line_offsets = np.concatenate([np.zeros(1, np.int64), np.cumsum(lines_per_doc)])
    total_lines = int(line_offsets[-1])
    global_line = np.repeat(line_offsets[:-1], cnts) + word_pos // 7
    lw = np.bincount(global_line, minlength=total_lines).astype(np.int64)
    lo = np.concatenate([np.zeros(1, np.int64), np.cumsum(lw)])
    line_arr = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(lo, pa.int32()), flat), " "
    )
    ln = np.arange(total_lines, dtype=np.int64) - np.repeat(
        line_offsets[:-1], lines_per_doc
    )
    mod = ((np.repeat(idn, lines_per_doc) + ln) % 5).astype(np.int64)
    punct = pa.array(
        np.array([".", "!", "?", '"', ""], dtype=object)[mod], pa.string()
    )
    planted_line = pc.binary_join_element_wise(line_arr, punct, "")
    doc_text = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(line_offsets, pa.int32()), planted_line),
        "\n",
    )
    for mask, extra in ((idn % 97 == 0, _C4_LOREM), (idn % 89 == 0, _C4_BRACE)):
        doc_text = pc.if_else(
            pa.array(mask),
            pc.binary_join_element_wise(doc_text, "\n" + extra, ""),
            doc_text,
        )
    cols = {"doc_id": pa.array(idn, pa.int64()), "text": doc_text}
    for c in carry_cols:
        cols[c] = t.column(c)
    return pa.table(cols)


def c4_clean_docs(sf_dir: str):
    """C4-style line-level cleaning (engine/c4.py, arXiv:1910.10683
    §2.2): keep lines ending in terminal punctuation with >= 5 words,
    drop docs with < 3 kept lines or lorem-ipsum / curly-brace tells.

    The synthetic corpus has no newlines or punctuation, so the query
    PLANTS deterministic line structure from doc_id identically on both
    sides (the docs_pii_redacted precedent): words are chunked into
    7-word lines, each line gets '.', '!', '?', '\"' or nothing by
    (doc_id + line_no) % 5, and docs with doc_id % 97 == 0 /
    % 89 == 0 get a lorem-ipsum / curly-brace line appended. The
    value-hash compare then pins the whole filter — including the
    rebuilt clean_text — BYTE-EXACTLY per row vs DuckDB's list_filter
    replay. Null doc_ids excluded on both sides (no stable plant)."""
    from medea_ray.engine import c4

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    planted = ds.map_batches(_c4_plant_batch, batch_format="pyarrow")
    return c4.c4_line_clean(planted, text_col="text", id_col="doc_id")


# -- composed pretraining prep report (the training-data flagship) -----------

# Plant constants shared verbatim with the DuckDB oracle (CASE order:
# spam wins over dup wins over the natural C4 plant). SPAM passes C4
# (6-word '.'-terminated lines, 3 of them) but is massively repetitive
# -> Gopher victim; DUP passes both (42 distinct words, every
# repetition fraction far below Table A1) and is shared by all its
# docs -> exact-dedup victims (min-doc_id survivor).
PRETRAIN_SPAM = (
    "spam spam spam spam spam spam.\n"
    "spam spam spam spam spam spam.\n"
    "spam spam spam spam spam spam."
)
PRETRAIN_DUP = (
    "alpha beta gamma delta epsilon zeta eta.\n"
    "theta iota kappa lam mu nu xi.\n"
    "omicron pi rho sigma tau upsilon phi.\n"
    "chi psi omega aleph bet gimel dalet.\n"
    "he vav zayin het tet yod kaf.\n"
    "lamed mem nun samekh ayin pe tsadi."
)
PRETRAIN_SPAM_MOD = 11
PRETRAIN_DUP_MOD = 17
PRETRAIN_BENCH_MOD = 20  # benchmark suite = raw planted texts of these docs
PRETRAIN_TARGET_ROWS = 100
PRETRAIN_NGRAM_N = 5  # one interior 5-gram per kept 7-word line
PRETRAIN_BPE_MERGES = 30
# integer weights -> every mixture float op is exact (w/10, take/n are
# deterministic IEEE divisions the oracle replays bit-for-bit; a float
# temperature would make the normalizing SUM order-dependent)
PRETRAIN_MIX_WEIGHTS = {"en": 3, "de": 2, "es": 2, "fr": 2, "zh": 1}


def _pretrain_plant_batch(t: pa.Table) -> pa.Table:
    """(doc_id, lang, text) pretraining corpus: the shared C4 plant with
    SPAM/DUP overrides on doc_id % 11 / % 17 (spam precedence)."""
    out = _c4_plant_batch(t, carry_cols=("lang",))
    idn = _chunk(out.column("doc_id")).to_numpy()
    spam = idn % PRETRAIN_SPAM_MOD == 0
    dup = (idn % PRETRAIN_DUP_MOD == 0) & ~spam
    txt = _chunk(out.column("text"))
    txt = pc.if_else(pa.array(spam), pa.scalar(PRETRAIN_SPAM), txt)
    txt = pc.if_else(pa.array(dup), pa.scalar(PRETRAIN_DUP), txt)
    return pa.table({
        "doc_id": out.column("doc_id"),
        "lang": out.column("lang"),
        "text": txt,
    })


def _pretrain_bench_batch(t: pa.Table) -> pa.Table:
    """Benchmark side: the raw planted texts of doc_id % 20 == 0 docs
    (the decontamination suite is drawn from the corpus, so hits are
    guaranteed deterministic)."""
    out = _pretrain_plant_batch(t)
    idn = _chunk(out.column("doc_id")).to_numpy()
    return out.filter(pa.array(idn % PRETRAIN_BENCH_MOD == 0)).select(["text"])


def _pretrain_ref_encode_count(word: str, merges: list) -> int:
    """Independent BPE re-encode: apply merges in RANK ORDER, each over
    all adjacent occurrences left-to-right — the textbook formulation
    equivalent to BpeModel.encode_word's rank-greedy loop (a later merge
    can never enable an earlier-rank pair: the merged symbol postdates
    it in training order). Same positional EOW strip."""
    from medea_ray.engine.bpe import EOW

    syms = list(word) + [EOW]
    for a, b in merges:
        i, out = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    if syms and syms[-1] == EOW:
        syms = syms[:-1]
    elif syms and syms[-1].endswith(EOW):
        syms = syms[:-1] + [syms[-1][: -len(EOW)]]
    return len([s for s in syms if s])


def pretrain_prep_report(sf_dir: str) -> pd.DataFrame:
    """End-to-end pretrain.prepare_corpus over the planted corpus: C4
    clean -> Gopher filter -> exact dedup -> 5-gram decontam -> weighted
    mixture -> BPE accounting, returning ONE integer row of per-stage
    survivor counts. The DuckDB oracle replays stages 1-5 from scratch
    (list_filter C4, full n-gram repetition stats, md5 dedup, distinct
    gram anti-join, the closed-form md5-prefix mixture thresholds) and
    the final corpus word count; the BPE side is pinned by ``n_merges``
    (must complete all requested merges) plus ``tokens_ok`` — the
    distributed token_stats total vs an independently-written
    rank-order re-encode on the driver (kmeans_guard pattern; loud cap
    refuses oracle-scale misuse)."""
    from medea_ray.engine import pretrain as _pt

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    planted = docs.map_batches(_pretrain_plant_batch, batch_format="pyarrow")
    bench = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"]).map_batches(
        _pretrain_bench_batch, batch_format="pyarrow"
    )
    arts: dict = {}
    corpus, rep = _pt.prepare_corpus(
        planted,
        bench,
        id_col="doc_id",
        text_col="text",
        source_col="lang",
        target_rows=PRETRAIN_TARGET_ROWS,
        mixture_weights=PRETRAIN_MIX_WEIGHTS,
        ngram_n=PRETRAIN_NGRAM_N,
        bpe_merges=PRETRAIN_BPE_MERGES,
        bpe_min_count=2,
        batch_size=2048,
        artifacts_out=arts,
    )
    if rep["n_after_mixture"] > 500_000:
        raise ValueError(
            "pretrain_prep_report: driver-side token recount is an "
            f"oracle-scale guard; refusing {rep['n_after_mixture']} rows "
            "(> 500k). Use engine.bpe.token_stats directly at scale."
        )
    merges = arts["bpe_model"].merges
    ref_tokens = 0
    for b in corpus.iter_batches(batch_format="pyarrow"):
        for txt in b.column("text").to_pylist():
            for w in (txt or "").split(" "):
                ref_tokens += _pretrain_ref_encode_count(w, merges)
    return pd.DataFrame(
        [
            {
                "n_input": rep["n_input"],
                "n_after_c4": rep["n_after_c4"],
                "n_after_gopher": rep["n_after_gopher"],
                "n_after_dedup": rep["n_after_dedup"],
                "n_after_decontam": rep["n_after_decontam"],
                "n_after_mixture": rep["n_after_mixture"],
                "n_merges": rep["n_merges"],
                "n_words": rep["n_words"],
                "tokens_ok": bool(ref_tokens == rep["n_tokens"]),
            }
        ]
    )


def nb_classify_docs(sf_dir: str):
    """Multinomial Naive Bayes quality classification
    (engine/classify.py — the GPT-3-style quality-classifier verb):
    train on the md5-prefix TRAIN split with planted labels
    label = 'c' || doc_id % 2, score EVERY document, and emit the
    integer evidence the SQL oracle recomputes from scratch — n_tokens,
    n_oov, per-class sums of training counts over in-vocab occurrences
    — plus pred_label itself. Each doc gets 3 planted class-signal
    tokens, so the NB log-posterior margin is ~18 nats (measured at
    sf0.001/sf0.01) and the float argmax cannot flip between numpy and
    DuckDB ln/sum associations; a doc-unique token keeps the OOV path
    non-vacuous (the lm_unigram_stats precedent). The float margin
    column stays out of the hash compare."""
    from medea_ray.engine import classify, sampling

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("doc_id")))
        ids = _chunk(t.column("doc_id"))
        idn = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        cls = pa.array((idn % 2).astype(str))
        ctok = pc.binary_join_element_wise(" classtok", cls, "")
        planted = pc.binary_join_element_wise(
            pc.fill_null(_chunk(t.column("text")), ""),
            ctok, ctok, ctok,
            " uniqtok", pa.array(idn.astype(str)),
            "",
        )
        label = pc.binary_join_element_wise("c", cls, "")
        return pa.table(
            {"doc_id": pa.array(idn, pa.int64()), "text": planted,
             "label": pc.cast(label, pa.string())}
        )

    planted = ds.map_batches(plant, batch_format="pyarrow")
    tagged = sampling.train_test_split(planted, "doc_id", "2")

    def train_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("split"), "train"))

    model = classify.train_nb(
        tagged.map_batches(train_only, batch_format="pyarrow"),
        text_col="text", label_col="label",
    )
    return classify.classify(
        planted, model, text_col="text", id_col="doc_id"
    ).select_columns(
        ["doc_id", "n_tokens", "n_oov", "sum_cnt_c0", "sum_cnt_c1", "pred_label"]
    )


def doc_top_keyword(sf_dir: str):
    """Per-document distinguishing keyword (engine/tfidf.py): highest
    tf among tokens under the df ceiling (df <= floor(0.8 * N_docs) —
    stopword suppression, sklearn's max_df), ties → smaller df →
    bytewise smaller token. Integer/string-only, so the DuckDB oracle
    (df*5 <= n*4 + row_number replay) is hash-exact; the documents
    soup has a 31-token vocab with df 25..415 of 500 docs, so the
    ceiling genuinely excludes the most ubiquitous tokens at every SF
    while the small vocab forces heavy tf/df/token tiebreak traffic.
    Null doc_ids excluded on both sides (SQL's GROUP BY would merge
    them into one group); docs with no candidate tokens emit no row on
    either side (the WHERE + GROUP BY shape)."""
    from medea_ray.engine import tfidf

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def drop_null_ids(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column("doc_id")))

    ds = ds.map_batches(drop_null_ids, batch_format="pyarrow").materialize()
    return tfidf.top_keywords(
        ds, text_col="text", id_col="doc_id", max_df_frac=0.8
    )


# key/FD discovery (engine/constraints.py) — single source of truth
# for the key_fd_profile query AND its DuckDB oracle builder
KEYFD_TABLE = "orders"
KEYFD_COLS = ["o_orderkey", "o_custkey", "o_orderstatus"]
KEYFD_EXTRA_SETS = [
    ["o_custkey", "o_orderstatus"],  # composite non-key
    ["o_orderkey", "o_custkey"],  # composite key (superset of a key)
]


def key_fd_profile(sf_dir: str) -> pd.DataFrame:
    """Candidate-key + functional-dependency discovery over the orders
    table (engine/constraints.py — the Deequ-style relational half of
    constraint suggestion): exact distinct-tuple counts for 3 singles +
    2 composite sets via suggest_keys (ONE (set_id, digest) exchange;
    prescreen off so every count is exact and SQL-replayable) and all 6
    ordered pairwise FDs via discover_fds. One row per verdict:
    ``kind`` 'key' rows carry (cols, distinct_cnt, n_rows, is-key
    verdict); 'fd' rows carry (lhs, rhs, holds verdict; distinct_cnt
    -1 — the pair count is internal). Integer/boolean/string only.
    DuckDB recomputes every count with SELECT DISTINCT subqueries
    (nulls collide, the engine's GROUP BY convention)."""
    from medea_ray.engine import constraints

    ds = _read(sf_dir, KEYFD_TABLE, columns=KEYFD_COLS)
    sets = [[c] for c in KEYFD_COLS] + [list(s) for s in KEYFD_EXTRA_SETS]
    keys = constraints.suggest_keys(ds, sets)
    fds = constraints.discover_fds(ds, KEYFD_COLS)
    rows = []
    for cs in sets:
        info = keys[tuple(cs)]
        rows.append(
            {
                "kind": "key",
                "lhs": ",".join(cs),
                "rhs": "",
                "distinct_cnt": int(info["distinct"]),
                "n_rows": int(info["n_rows"]),
                "verdict": bool(info["is_key"]),
            }
        )
    n_rows = rows[0]["n_rows"]
    for fd in fds:
        rows.append(
            {
                "kind": "fd",
                "lhs": fd["lhs"],
                "rhs": fd["rhs"],
                "distinct_cnt": -1,
                "n_rows": n_rows,
                "verdict": bool(fd["holds"]),
            }
        )
    return pd.DataFrame(rows)


def doc_chunks(sf_dir: str):
    """Overlapping document chunking (engine/chunk.py — the RAG /
    context-window verb): 64-token windows with 16-token overlap
    (stride 48) over the single-space tokenization; every chunk's text
    is re-joined and matched BYTE-EXACTLY against DuckDB's
    generate_series + list-slice replay, pinning the window geometry,
    coverage and the flat-gather re-join per row. Stateless and
    shuffle-free on the Ray side. Null doc_ids excluded on both sides;
    empty/null text yields exactly one empty chunk (single-space split
    convention)."""
    from medea_ray.engine import chunk

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def drop_null_ids(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column("doc_id")))

    return chunk.chunk_docs(
        ds.map_batches(drop_null_ids, batch_format="pyarrow"),
        text_col="text",
        id_col="doc_id",
        chunk_tokens=64,
        overlap=16,
    )


def docs_pii_redacted(sf_dir: str):
    """PII redaction over the documents table (text.redact_pii — the
    scrub pass every training-data pipeline runs first). The synthetic
    text contains no digits or emails, so the query PLANTS deterministic
    PII spans derived from doc_id — identically to the SQL oracle — and
    the driver's value-hash compare then pins Arrow-vs-DuckDB RE2
    replacement semantics on every row rather than a no-op.

    Planted per row: an email (user<id>@...), an IPv4 (10.<id%200>.0.
    <id%250>), and a phone-like 555-<10+id%9990>. Output columns
    (doc_id, text_redacted, pii_found) match the oracle by name."""
    import numpy as np

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        idn = (
            ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        ).to_numpy(zero_copy_only=False)
        parts = [
            pc.fill_null(t.column("text"), ""),
            " contact user",
            pa.array(idn.astype(str)),
            "@mail.example.com from 10.",
            pa.array((idn % 200).astype(str)),
            ".0.",
            pa.array((idn % 250).astype(str)),
            " call 555-",
            pa.array((10 + idn % 9990).astype(str)),
        ]
        aug = pc.binary_join_element_wise(*parts, "")
        return pa.table({"doc_id": ids, "text_redacted": aug})

    planted = ds.map_batches(plant, batch_format="pyarrow")
    return text.redact_pii(
        planted, text_col="text_redacted", flag_col="pii_found"
    )


def doc_text_features(sf_dir: str) -> pd.DataFrame:
    """Language-ID + quality + fingerprint features (rows-only check)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = text.add_text_features(ds, concurrency=(1, 4))
    df = out.to_pandas()
    keep = [
        "doc_id",
        "lang_pred",
        "n_tokens_ws",
        "n_tokens_bpe",
        "fingerprint",
        "q_len",
        "q_alpha_ratio",
        "q_stopword_ratio",
        "q_repetition",
    ]
    return df[keep].sort_values("doc_id").reset_index(drop=True)


# -- Medea validation over a derived JSON payload ----------------------------


def _docs_with_payload(sf_dir: str):
    # pruned read + per-column pylists (a full to_pylist() row loop pulled
    # every column, including text, into Python dicts per row)
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars", "source"])

    def to_payload(t: pa.Table) -> pa.Table:
        dids = t.column("doc_id").to_pylist()
        langs = t.column("lang").to_pylist()
        nchars = t.column("n_chars").to_pylist()
        sources = t.column("source").to_pylist()
        payloads = [
            build_payload(
                f"doc://{did}",
                lang,
                nc,
                [src],
                did % 100 if did % 100 in DEFECT_SPECIFIER else None,
            )
            for did, lang, nc, src in zip(dids, langs, nchars, sources)
        ]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "payload": pa.array(payloads, pa.large_string()),
            }
        )

    return ds.map_batches(to_payload, batch_format="pyarrow")


def validate_documents_payload(sf_dir: str):
    """Full Ray validation path over a JSON payload derived from the
    documents table with seeded defects. Because the defects are a pure
    function of doc_id, the exact violation set is SQL-predictable — this
    is the strongest oracle-checked slice of the Medea kernel."""
    from medea_ray.fixtures.gen import flagship_schema_text

    payloads = _docs_with_payload(sf_dir)
    verdicts = validate_dataset(
        payloads, flagship_schema_text(), id_col="doc_id", concurrency=(1, 8)
    )
    bad = verdicts.filter(expr="valid == False")
    return bad.map_batches(
        lambda t: t.select(["doc_id", "schema_path", "failed_specifier"]),
        batch_format="pyarrow",
    )


def validation_verdict_counts(sf_dir: str) -> pd.DataFrame:
    """Aggregate pass/fail verdict over the same derived payload."""
    from ray.data.aggregate import Count, Sum

    from medea_ray.fixtures.gen import flagship_schema_text

    payloads = _docs_with_payload(sf_dir)
    verdicts = validate_dataset(
        payloads, flagship_schema_text(), id_col="doc_id", concurrency=(1, 8)
    )

    def partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_rows": pa.array([t.num_rows], pa.int64()),
                "n_valid": pa.array(
                    [pc.sum(pc.cast(t.column("valid"), pa.int64())).as_py() or 0],
                    pa.int64(),
                ),
            }
        )

    parts = verdicts.map_batches(partial, batch_format="pyarrow").take_all()
    n_rows = int(sum(p["n_rows"] for p in parts))
    n_valid = int(sum(p["n_valid"] for p in parts))
    return pd.DataFrame(
        [
            {
                "n_rows": np.int64(n_rows),
                "n_valid": np.int64(n_valid),
                "n_invalid": np.int64(n_rows - n_valid),
            }
        ]
    )


def schema_infer_profile(sf_dir: str) -> pd.DataFrame:
    """Schema inference (engine/infer.py) end-to-end over the derived
    payload corpus: profile every top-level property, induce a Medea
    schema, and prove the roundtrip (every profiled doc validates
    against the induced schema).

    One row per observed (property, JSON type): integer occurrence /
    presence / corpus counts, the optionality verdict, the enum size
    (0 = not an enum under cap 16 / 128 bytes), and the roundtrip
    boolean (constant across rows; computed, not assumed — a real
    validate_dataset pass over the induced text). Everything is
    integer/boolean, so the oracle is hash-exact: DuckDB replays the
    profile closed-form from the payload construction rule
    (build_payload: url='doc://'||doc_id, lang as-is, meta dropped at
    doc_id%100==97, extra bool added at ==96, tags always an array)."""
    from medea_ray.engine import infer

    text_schema, prof = infer.infer_schema(_docs_with_payload(sf_dir), "payload")
    v = validate_dataset(
        _docs_with_payload(sf_dir), text_schema, id_col="doc_id", concurrency=(1, 8)
    )
    roundtrip_ok = v.filter(expr="valid == False").count() == 0
    rows = []
    for prop in sorted(prof.props):
        pp = prof.props[prop]
        for jt in infer.JTYPES:
            n = pp.type_counts.get(jt, 0)
            if not n:
                continue
            rows.append(
                {
                    "prop": prop,
                    "jtype": jt,
                    "n_type": np.int64(n),
                    "n_present": np.int64(pp.present),
                    "n_docs": np.int64(prof.n_docs),
                    "optional": bool(pp.present < prof.n_object_roots),
                    "enum_size": np.int64(
                        len(pp.enum_values) if pp.enum_values is not None else 0
                    ),
                    "roundtrip_valid": bool(roundtrip_ok),
                }
            )
    return pd.DataFrame(rows)


EVENTS_PROPS_SCHEMA = """$schema $start
    $type
        $object
    $properties
        $property-name "k"
        $property-schema $number
"""


def validate_events_props(sf_dir: str) -> pd.DataFrame:
    """Medea validation of the REAL events.props JSON column (an object
    with a required numeric "k" and no additional properties). The DuckDB
    oracle checks the same structure with a regex — a fully independent
    implementation of the constraint on the same rows."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_id", "props"])
    verdicts = validate_dataset(
        ds, EVENTS_PROPS_SCHEMA, payload_col="props", id_col="event_id", concurrency=(1, 8)
    )

    def partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_rows": pa.array([t.num_rows], pa.int64()),
                "n_valid": pa.array(
                    [pc.sum(pc.cast(t.column("valid"), pa.int64())).as_py() or 0],
                    pa.int64(),
                ),
            }
        )

    parts = verdicts.map_batches(partial, batch_format="pyarrow").take_all()
    n_rows = int(sum(p["n_rows"] for p in parts))
    n_valid = int(sum(p["n_valid"] for p in parts))
    return pd.DataFrame(
        [
            {
                "n_rows": np.int64(n_rows),
                "n_valid": np.int64(n_valid),
                "n_invalid": np.int64(n_rows - n_valid),
            }
        ]
    )


# -- drift -------------------------------------------------------------------


DRIFT_BINS = np.array([-1e18, 0, 10, 25, 50, 75, 100, 250, 1000, 1e18])


def drift_events_value(sf_dir: str) -> pd.DataFrame:
    """KS/PSI of events.value across days (rows-only; the histogram inputs
    are oracle-checked via events_daily)."""
    ds = _read(sf_dir, "events", columns=["ts", "value"])
    rep = drift.drift_report(ds, "value", ts_col="ts", numeric_bins=DRIFT_BINS)
    return pd.DataFrame(rep)


def drift_guard(sf_dir: str) -> pd.DataFrame:
    """Driver-side accuracy guard for the PSI drift statistic: the
    distributed pipeline's per-day PSI (map_batches partial histograms →
    groupby → drift.psi) must match an INDEPENDENT exact recomputation —
    pandas day/bin counting plus a vectorized numpy PSI with the same
    eps semantics — to 1e-9. The oracle emits one TRUE per day present in
    events, so both a PSI regression and a day-bucketing regression turn
    this driver row red (the last E-operator family without a hard
    oracle; VERDICT r02 item 4).

    The exact side MATERIALIZES the (ts, value) projection on the driver
    by design — that is what makes it an independent recomputation. The
    guard is registered for oracle scale factors only; a loud row-count
    cap refuses bench-scale inputs rather than silently exhausting driver
    memory (ADVICE r03)."""
    ds = _read(sf_dir, "events", columns=["ts", "value"])
    n = ds.count()
    if n > 5_000_000:
        raise ValueError(
            f"drift_guard is an oracle-scale accuracy check; refusing to "
            f"materialize {n} rows on the driver — run drift_events_value "
            f"for the distributed statistic"
        )
    rep = drift.drift_report(ds, "value", ts_col="ts", numeric_bins=DRIFT_BINS)

    # exact side: one driver-side pass, deliberately NOT via engine.drift
    frames = [
        b.select(["ts", "value"]).to_pandas()
        for b in ds.iter_batches(batch_format="pyarrow")
    ]
    df = pd.concat(frames, ignore_index=True)
    days = df["ts"].dt.strftime("%Y-%m-%d")
    x = df["value"].to_numpy(dtype=np.float64, na_value=np.nan)
    idx = np.digitize(np.nan_to_num(x, nan=-np.inf), DRIFT_BINS)
    idx = np.where(np.isnan(x), -1, idx)
    counts = (
        pd.DataFrame({"day": days, "bin": idx})
        .groupby(["day", "bin"]).size().unstack(fill_value=0)
    )

    def psi_exact(r: np.ndarray, c: np.ndarray, eps: float = 1e-6) -> float:
        p = np.maximum(r / max(r.sum(), 1), eps)
        q = np.maximum(c / max(c.sum(), 1), eps)
        return float(np.sum((q - p) * np.log(q / p)))

    ref_day = counts.index.min()
    ref = counts.loc[ref_day].to_numpy(dtype=np.float64)
    rows = []
    got = {r["bucket"]: r["psi"] for r in rep}
    for day in counts.index:
        exact = psi_exact(ref, counts.loc[day].to_numpy(dtype=np.float64))
        ok = day in got and abs(got[day] - exact) <= 1e-9
        rows.append({"bucket": day, "psi_within_tol": bool(ok)})
    return pd.DataFrame(rows)


# -- similarity search -------------------------------------------------------


def _knn_queries() -> np.ndarray:
    rng = np.random.default_rng(123)
    return rng.standard_normal((2, 64)).astype(np.float32)


def knn_topk_membership(sf_dir: str) -> pd.DataFrame:
    """Exact cosine top-20 membership per query (query_id, vec_id). Rank and
    score stay out of the compare: DuckDB computes cosine in float32 and
    sub-ulp ordering differences would make value-hashing floats flaky;
    membership is stable."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    got = similarity.knn_bruteforce(ds, _knn_queries(), k=20, concurrency=(1, 4))
    df = got.to_pandas()[["query_id", "vec_id"]].copy()
    df["query_id"] = df["query_id"].astype("int64")
    df["vec_id"] = df["vec_id"].astype("int64")
    return df.sort_values(["query_id", "vec_id"]).reset_index(drop=True)


def knn_lsh_probe(sf_dir: str) -> pd.DataFrame:
    """LSH-bucketed ANN variant (rows-only; recall is tolerance-tested)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    got = similarity.knn_lsh(ds, _knn_queries(), k=10, n_bits=6, n_tables=8)
    df = got.to_pandas()[["query_id", "vec_id", "rank"]]
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


def knn_ivf_probe(sf_dir: str) -> pd.DataFrame:
    """IVF coarse-quantizer ANN variant (rows-only; recall tolerance-tested)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    got = similarity.knn_ivf(ds, _knn_queries(), k=10, n_cells=16, n_probe=8)
    df = got.to_pandas()[["query_id", "vec_id", "rank"]]
    df["query_id"] = df["query_id"].astype("int64")
    df["vec_id"] = df["vec_id"].astype("int64")
    df["rank"] = df["rank"].astype("int64")
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


# measured deterministic recall@10 on the isotropic testdata vectors
# (seeded hyperplanes/centroids): LSH 0.40-0.50 at sf0.001/sf0.01, IVF
# 0.70-0.90 — the guard thresholds sit safely below the measured floor but
# far above the ~0.0 a bucketing/schema regression produces
LSH_RECALL_MIN = 0.3
IVF_RECALL_MIN = 0.5


def _ann_recall_guard(sf_dir: str, ann_fn, threshold: float, ok_name: str) -> pd.DataFrame:
    """recall@10 of an ANN variant vs the exact top-10 (both distributed),
    as per-query oracle-checkable booleans."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    exact = similarity.knn_bruteforce(ds, _knn_queries(), k=10, concurrency=(1, 4)).to_pandas()
    got = ann_fn(ds)
    rows = []
    for qi in (0, 1):
        exp = set(exact[exact["query_id"] == qi]["vec_id"])
        ids = set(got[got["query_id"] == qi]["vec_id"])
        recall = len(ids & exp) / len(exp) if exp else 0.0
        rows.append({"query_id": np.int64(qi), ok_name: bool(recall >= threshold)})
    return pd.DataFrame(rows)


def knn_lsh_recall_guard(sf_dir: str) -> pd.DataFrame:
    """Driver-side recall guard for the LSH ANN path (VERDICT r02 item 5):
    an LSH bucketing/probe regression drives recall toward 0 and turns
    this oracle-checked row red."""
    return _ann_recall_guard(
        sf_dir,
        lambda ds: similarity.knn_lsh(ds, _knn_queries(), k=10, n_bits=6, n_tables=8).to_pandas(),
        LSH_RECALL_MIN,
        "lsh_recall_ok",
    )


def knn_ivf_recall_guard(sf_dir: str) -> pd.DataFrame:
    """Driver-side recall guard for the IVF ANN path (VERDICT r02 item 5)."""
    return _ann_recall_guard(
        sf_dir,
        lambda ds: similarity.knn_ivf(ds, _knn_queries(), k=10, n_cells=16, n_probe=8).to_pandas(),
        IVF_RECALL_MIN,
        "ivf_recall_ok",
    )


def minhash_verified_pairs(sf_dir: str) -> pd.DataFrame:
    """MinHash-LSH candidates verified by exact n-gram Jaccard.

    Fully oracle-checked (round 4): on this corpus the LSH candidate set
    contains every pair with exact word-3-gram Jaccard >= 0.5 (measured
    recall 1.0, min in-set Jaccard 0.9, no pairs in [0.45, 0.5)), so the
    verified pair set EQUALS the exact all-pairs Jaccard set — which the
    DuckDB oracle recomputes from scratch with integer-only threshold math
    (jaccard >= 0.5  <=>  3*|intersection| >= |A|+|B|; no floats cross the
    compare boundary). A banding/signature/verify regression changes the
    emitted set and hash-mismatches the row.

    ``verify`` is pinned to ``"exact"``: the registered driver query must
    emit the same pair set at every scale factor, and the ``"auto"``
    default switches to the ±0.06 signature estimate once sampled mean
    text length crosses its threshold."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = dedup.near_dup_pairs(
        ds, "doc_id", threshold=0.5, verify="exact", concurrency=(1, 4)
    )
    pairs = pairs[["id_a", "id_b"]].copy()
    pairs["id_a"] = pairs["id_a"].astype("int64")
    pairs["id_b"] = pairs["id_b"].astype("int64")
    return pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def near_dup_clusters(sf_dir: str) -> pd.DataFrame:
    """Transitive near-duplicate clusters: the verified MinHash pair set
    (same exact-Jaccard contract as ``minhash_verified_pairs``) closed
    under connectivity by ``graph.connected_components`` (large-star /
    small-star, one groupby shuffle per phase per round). Output is
    (doc_id, cluster_id = min doc_id of the component) for every doc in
    >= 1 verified pair.

    The DuckDB oracle recomputes the SAME pair set from scratch
    (integer-only Jaccard threshold) and takes its transitive closure with
    a recursive CTE — so both the pair emission AND the distributed
    clustering are pinned by the value hash; a star-phase bug that splits
    or merges a component changes cluster_id on some row."""
    import ray.data as rd

    from medea_ray.engine.graph import connected_components

    pairs = minhash_verified_pairs(sf_dir)
    if len(pairs) == 0:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "cluster_id": pd.Series([], dtype="int64"),
            }
        )
    labels = connected_components(
        rd.from_pandas(pairs), "id_a", "id_b",
        node_col="doc_id", cluster_col="cluster_id",
    ).to_pandas()
    labels["doc_id"] = labels["doc_id"].astype("int64")
    labels["cluster_id"] = labels["cluster_id"].astype("int64")
    return labels.sort_values("doc_id").reset_index(drop=True)


def dedup_near_docs(sf_dir: str) -> pd.DataFrame:
    """End-to-end near-duplicate dedup (dedup.dedup_near): the verified
    MinHash pair set (exact-Jaccard contract of minhash_verified_pairs)
    -> large-star/small-star connected components -> min-doc_id cluster
    survivor -> budget-aware anti-filter of the corpus. Output: every
    surviving doc_id.

    The DuckDB oracle recomputes the pair set from scratch (integer-only
    Jaccard threshold), closes it transitively with a recursive CTE and
    drops every node above its component minimum — so the pair emission,
    the distributed clustering AND the survivor anti-join are pinned by
    one value hash (a split/merged component or a mis-broadcast drop set
    changes the survivor list)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    surv = dedup.dedup_near(
        ds, "doc_id", threshold=0.5, verify="exact", concurrency=(1, 4)
    )
    df = surv.to_pandas()[["doc_id"]].copy()
    df["doc_id"] = df["doc_id"].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)


def embedding_near_dup_pairs(sf_dir: str) -> pd.DataFrame:
    """Near-duplicate embedding pairs via multi-table LSH + exact cosine
    verify. The testdata embeddings are isotropic random vectors (max
    pairwise cosine ~0.51 at sf0.01), so the threshold is 0.4 — low enough
    that the query has a non-empty deterministic answer, exercising the
    whole bucket/verify/dedup path. n_bits=4 matches the 500-row corpus
    (2^4 buckets ≈ 31 rows each); at web scale n_bits scales as
    log2(n/target_bucket)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    pairs = similarity.embedding_near_dup(
        ds, threshold=0.4, n_bits=4, n_tables=8
    ).to_pandas()
    if len(pairs) == 0 or "id_a" not in pairs.columns:
        # empty Ray datasets drop their schema in to_pandas
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64")})
    pairs["id_a"] = pairs["id_a"].astype("int64")
    pairs["id_b"] = pairs["id_b"].astype("int64")
    return (
        pairs[["id_a", "id_b"]].sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )


def simhash_recall_guard(sf_dir: str) -> pd.DataFrame:
    """Driver-side exactness guard for the SimHash block-rotation path
    (VERDICT r03 item 1): turns the rows-only ``simhash_near_dup`` into an
    oracle-checked row.

    Two booleans, both asserted TRUE by the oracle:

    - ``buckets_match_bruteforce``: the distributed candidate buckets
      (``dedup.simhash_candidates``, one groupby shuffle) reproduce the
      operator's brute-force definition EXACTLY — the co-bucketed pair set
      equals all pairs sharing >= 1 exact 16-bit signature block.
    - ``hamming_recall_ok``: pigeonhole guarantee — every pair within
      Hamming distance n_blocks-1 = 3 co-buckets (24 such pairs at
      sf0.01; non-vacuous).

    The exact side recomputes signatures sequentially on the driver —
    guard scale only (the documents table is 500 rows at every sf); the
    candidate side is the full distributed engine path."""
    import itertools

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    cand = dedup.simhash_candidates(ds, "doc_id")
    co: set[tuple[int, int]] = set()
    for row in cand.take_all():
        co.update(itertools.combinations(sorted(row["ids"]), 2))

    ids: list[int] = []
    sigs: list[int] = []
    for b in ds.iter_batches(batch_format="pyarrow"):
        for rid, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            if t is None:
                continue
            ids.append(rid)
            sigs.append(dedup.simhash64(t))
    sig_arr = np.asarray(sigs, dtype=np.uint64)
    id_arr = np.asarray(ids, dtype=np.int64)

    n_blocks, bits = 4, 16
    mask = np.uint64((1 << bits) - 1)
    share: set[tuple[int, int]] = set()
    for blk in range(n_blocks):
        vals = (sig_arr >> np.uint64(blk * bits)) & mask
        byval: dict[int, list[int]] = {}
        for rid, v in zip(id_arr, vals):
            byval.setdefault(int(v), []).append(int(rid))
        for members in byval.values():
            if len(members) > 1:
                share.update(itertools.combinations(sorted(set(members)), 2))

    xor = sig_arr[:, None] ^ sig_arr[None, :]
    ham = np.unpackbits(
        xor.view(np.uint8).reshape(len(ids), len(ids), 8), axis=2
    ).sum(axis=2)
    iu, ju = np.triu_indices(len(ids), 1)
    near_mask = ham[iu, ju] <= n_blocks - 1
    near = {
        (min(a, b), max(a, b))
        for a, b in zip(id_arr[iu[near_mask]], id_arr[ju[near_mask]])
    }
    return pd.DataFrame(
        [{
            "buckets_match_bruteforce": bool(co == share),
            "hamming_recall_ok": bool(near <= co),
        }]
    )


EMB_RECALL_MIN = 0.7  # measured deterministic recall 0.746 (44/59) at sf0.01


def embedding_near_dup_guard(sf_dir: str) -> pd.DataFrame:
    """Driver-side precision/recall guard for the embedding near-dup path
    (VERDICT r03 item 1): turns the rows-only ``embedding_near_dup_pairs``
    into an oracle-checked row.

    - ``precision_ok``: every emitted pair's exact float64 cosine is
      >= the 0.4 threshold (the engine verifies in-bucket with float64,
      so a verify regression flips this).
    - ``recall_ok``: emitted pairs cover >= EMB_RECALL_MIN of the exact
      all-pairs cosine >= 0.4 set (59 pairs at sf0.01; the multi-table
      LSH recovers 44 of them, deterministic under seed 42).

    The exact side materializes the embedding matrix on the driver —
    guard scale only (one float64 matmul); the candidate side is the full
    distributed bucket/verify/dedup path."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    got = embedding_near_dup_pairs(sf_dir)
    emitted = set(zip(got["id_a"], got["id_b"]))

    ids_l: list[int] = []
    rows: list[np.ndarray] = []
    for b in ds.iter_batches(batch_format="pyarrow"):
        ids_l.extend(b.column("vec_id").to_pylist())
        rows.append(np.stack(b.column("embedding").to_numpy(zero_copy_only=False)))
    mat = np.concatenate(rows).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    cos = mat @ mat.T
    id_arr = np.asarray(ids_l, dtype=np.int64)
    iu, ju = np.triu_indices(len(ids_l), 1)
    hit = cos[iu, ju] >= 0.4
    exact = {
        (min(a, b), max(a, b))
        for a, b in zip(id_arr[iu[hit]], id_arr[ju[hit]])
    }
    recall = len(emitted & exact) / len(exact) if exact else 1.0
    return pd.DataFrame(
        [{
            "precision_ok": bool(emitted <= exact),
            "recall_ok": bool(recall >= EMB_RECALL_MIN),
        }]
    )


# -- multimodal --------------------------------------------------------------


def media_features_fake(sf_dir: str) -> pd.DataFrame:
    """Multimodal plumbing over a binary column synthesized from documents
    (rows-only; the decode is the documented deterministic stub)."""
    from medea_ray.engine.multimodal import extract_media_features

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_binary(t: pa.Table) -> pa.Table:
        blobs = [
            None if x is None else b"<html>" + x.encode() + b"</html>"
            for x in t.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": t.column("doc_id"), "blob": pa.array(blobs, pa.large_binary())}
        )

    binary = ds.map_batches(to_binary, batch_format="pyarrow")
    out = extract_media_features(binary, payload_col="blob", decoder="fake",
                                 batch_size=64, concurrency=(1, 4))
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    df = tbl.select(
        ["doc_id", "media_ok", "media_format", "media_width", "media_height", "media_n_bytes"]
    ).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def media_features(sf_dir: str) -> pd.DataFrame:
    """REAL multimodal decode, oracle-checked (VERDICT r02 item 6): each
    document row synthesizes a media payload (BMP / PPM / WAV / PNG,
    cycling on doc_id % 4 — a pure function of doc_id, see
    ``multimodal.media_dims``), the actor-pool extractor parses the actual
    container bytes (headers, strides, chunk walk; for PNG a CRC-verified
    chunk walk + zlib inflate + scanline unfilter), and the driver checks
    (format, width, height, n_bytes) against DuckDB recomputing the same
    arithmetic (PNG fixtures use stored deflate blocks so the size is
    exactly 68 + h*(1+3w)). n_bytes is measured from the real blob, so a
    container-layout bug on either side turns the row red."""
    from medea_ray.engine.multimodal import extract_media_features, make_media_blob

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def to_binary(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        return pa.table({
            "doc_id": t.column("doc_id"),
            "blob": pa.array([make_media_blob(i) for i in ids], pa.large_binary()),
        })

    binary = ds.map_batches(to_binary, batch_format="pyarrow")
    out = extract_media_features(binary, payload_col="blob", decoder="builtin",
                                 batch_size=64, concurrency=(1, 4))
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    df = tbl.select(
        ["doc_id", "media_format", "media_width", "media_height", "media_n_bytes"]
    ).to_pandas()
    assert tbl.column("media_ok").to_pandas().all(), "builtin decode failed a fixture blob"
    df["media_width"] = df["media_width"].astype("int64")
    df["media_height"] = df["media_height"].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)


def image_resize_guard(sf_dir: str) -> pd.DataFrame:
    """Image RESIZE (decode → resize → feature, the thumbnailing /
    model-input verb), oracle-checked EXACTLY: each document synthesizes
    a deterministic PPM (dims from the media_dims arithmetic, pixel
    (y,x,c) = (y*3w+3x+c + doc_id*11) % 256), the ImageResizer actor
    stage nearest-resizes it to per-row targets, and DuckDB recomputes
    the resized pixel sum closed-form over a generate_series grid —
    nearest uses pure integer index arithmetic ((Y*h)//oh), so the
    value hash pins the decode, the index mapping, and the sum on every
    row. A second bilinear pass resizes to the SOURCE dims: the
    half-pixel-center identity must reproduce the image exactly, so its
    sum equals the closed-form full-image sum (any weight/index bug
    breaks it). Weights/interior values of non-identity bilinear are
    pinned by pytest against a scalar reference."""
    from medea_ray.engine.multimodal import make_ppm, resize_images

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def to_binary(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        return pa.table({
            "doc_id": t.column("doc_id"),
            "blob": pa.array(
                [make_ppm(4 + i % 13, 3 + (i // 13) % 11, seed=i) for i in ids],
                pa.large_binary(),
            ),
            "ow": pa.array([2 + i % 7 for i in ids], pa.int32()),
            "oh": pa.array([2 + (i // 7) % 5 for i in ids], pa.int32()),
            "src_w": pa.array([4 + i % 13 for i in ids], pa.int32()),
            "src_h": pa.array([3 + (i // 13) % 11 for i in ids], pa.int32()),
        })

    # materialize once: both resize passes consume this dataset, and a
    # lazy plan would re-run PPM synthesis + decode per consumption
    binary = ds.map_batches(to_binary, batch_format="pyarrow").materialize()
    near = resize_images(
        binary, "blob", out_h_col="oh", out_w_col="ow", method="nearest",
        batch_size=64, concurrency=(1, 4),
    )
    ntbl = pa.concat_tables(near.iter_batches(batch_format="pyarrow"))
    assert ntbl.column("resize_ok").to_pandas().all(), "nearest resize failed a fixture"
    bil = resize_images(
        binary, "blob", out_h_col="src_h", out_w_col="src_w",
        method="bilinear", batch_size=64, concurrency=(1, 4),
    )
    btbl = pa.concat_tables(bil.iter_batches(batch_format="pyarrow"))
    assert btbl.column("resize_ok").to_pandas().all(), "bilinear resize failed a fixture"
    ndf = ntbl.select(
        ["doc_id", "resized_width", "resized_height", "resized_sum"]
    ).to_pandas()
    bdf = btbl.select(["doc_id", "resized_sum"]).to_pandas().rename(
        columns={"resized_sum": "bilinear_id_sum"}
    )
    df = ndf.merge(bdf, on="doc_id")
    for col in ("resized_width", "resized_height", "resized_sum", "bilinear_id_sum"):
        df[col] = df[col].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)


def jpeg_codec_guard(sf_dir: str) -> pd.DataFrame:
    """Baseline JPEG codec, oracle-checked as per-doc boolean guards:
    each document encodes a deterministic RGB gradient image
    (16+doc_id%9 × 16+(doc_id//9)%7, seed doc_id) through the pure-numpy
    encoder (DCT → quantize → zigzag → Huffman + byte stuffing) and
    decodes it back (DHT/DQT parse → Huffman → dequant → IDCT →
    YCbCr→RGB). geometry_ok asserts exact dimensions; fidelity_ok bounds
    reconstruction RMSE < 6 under the uniform quantizer (JPEG is lossy —
    bit-equality is the wrong check). The DuckDB oracle expects every
    row TRUE, so a Huffman, DCT, or marker regression turns the row red."""
    import numpy as np

    from medea_ray.engine.jpeg import decode_jpeg, encode_jpeg, jpeg_fixture_image

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def roundtrip(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        geom, fid = [], []
        for i in ids:
            w, h = 16 + i % 9, 16 + (i // 9) % 7
            img = jpeg_fixture_image(w, h, seed=i)
            d = decode_jpeg(encode_jpeg(img))
            ok = d is not None and d["width"] == w and d["height"] == h
            geom.append(bool(ok))
            if ok:
                err = d["pixels"].astype(np.float64) - img.astype(np.float64)
                fid.append(bool(float(np.sqrt((err ** 2).mean())) < 6.0))
            else:
                fid.append(False)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "geometry_ok": pa.array(geom, pa.bool_()),
            "fidelity_ok": pa.array(fid, pa.bool_()),
        })

    out = ds.map_batches(roundtrip, batch_format="pyarrow", batch_size=64)
    df = pa.concat_tables(out.iter_batches(batch_format="pyarrow")).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def audio_codec_guard(sf_dir: str) -> pd.DataFrame:
    """Compressed-audio WAV codecs, oracle-checked EXACTLY: each document
    synthesizes mu-law (format 7) and A-law (format 6) WAVs whose data
    bytes are the deterministic pattern ``(i*37 + doc_id*13) % 256``; the
    engine decodes them through the real G.711 expansion and emits the
    integer sum of |sample| — which DuckDB recomputes bit-exactly from
    the public G.711 segment formulas over ``generate_series`` (for both
    companded codecs |decoded| is a closed form of the byte). IMA ADPCM
    (format 0x11) is predictor-adaptive, so it is guarded as booleans:
    decoded frame count exact (via the ``fact`` chunk truncating the
    zero-padded final block) and round-trip RMSE/max-error bounds on a
    bounded-slope fixture signal the predictor must track."""
    import numpy as np

    from medea_ray.engine.multimodal import (
        adpcm_fixture_pcm, alaw_decode_bytes, ima_adpcm_decode,
        ima_adpcm_encode, mulaw_decode_bytes, mulaw_fixture_bytes)

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def guard(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        mu, al, ok = [], [], []
        for i in ids:
            n = 300 + i % 40
            raw = mulaw_fixture_bytes(n, seed=i)
            mu.append(int(np.abs(mulaw_decode_bytes(raw).astype(np.int64)).sum()))
            al.append(int(np.abs(alaw_decode_bytes(raw).astype(np.int64)).sum()))
            src = adpcm_fixture_pcm(n, seed=i)
            dec = ima_adpcm_decode(ima_adpcm_encode(src, 256), 256)
            good = dec is not None and len(dec) >= n
            if good:
                dec = dec[:n]
                err = dec.astype(np.float64) - src.astype(np.float64)
                good = (
                    float(np.sqrt((err ** 2).mean())) < 24.0
                    and float(np.abs(err).max()) < 512.0
                )
            ok.append(bool(good))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "mulaw_amp_sum": pa.array(mu, pa.int64()),
            "alaw_amp_sum": pa.array(al, pa.int64()),
            "adpcm_ok": pa.array(ok, pa.bool_()),
        })

    out = ds.map_batches(guard, batch_format="pyarrow", batch_size=256)
    df = pa.concat_tables(out.iter_batches(batch_format="pyarrow")).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def mjpeg_avi_guard(sf_dir: str) -> pd.DataFrame:
    """Entropy-coded VIDEO, oracle-checked as per-doc boolean guards: each
    document synthesizes an MJPEG AVI (RIFF container, 'vids'/'MJPG'
    stream, 2 + doc_id % 4 frames of 16+doc_id%7 × 12+(doc_id//7)%5,
    every frame a real baseline JPEG), the engine walks the container and
    entropy-decodes every frame. geometry_ok asserts exact dims, frame
    count (payloads AND the avih/strh declared counts) and fps from
    rate/scale; fidelity_ok bounds per-frame reconstruction RMSE < 6 vs
    the source fixture image (JPEG is lossy — bit-equality is the wrong
    check). The DuckDB oracle expects every row TRUE."""
    import numpy as np

    from medea_ray.engine.jpeg import jpeg_fixture_image
    from medea_ray.engine.multimodal import decode_avi_frames, make_avi_mjpeg

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def roundtrip(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        geom, fid = [], []
        for i in ids:
            w, h, nf = 16 + i % 7, 12 + (i // 7) % 5, 2 + i % 4
            d = decode_avi_frames(make_avi_mjpeg(w, h, n_frames=nf, fps=12, seed=i))
            ok = (
                d is not None and d["width"] == w and d["height"] == h
                and len(d["frames"]) == nf and d["n_declared"] == nf
                and d["fps"] == 12.0
            )
            geom.append(bool(ok))
            good = ok
            if ok:
                for f, fr in enumerate(d["frames"]):
                    img = jpeg_fixture_image(w, h, seed=i * 31 + f)
                    err = fr.astype(np.float64) - img.astype(np.float64)
                    if float(np.sqrt((err ** 2).mean())) >= 6.0:
                        good = False
                        break
            fid.append(bool(good))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "geometry_ok": pa.array(geom, pa.bool_()),
            "fidelity_ok": pa.array(fid, pa.bool_()),
        })

    out = ds.map_batches(roundtrip, batch_format="pyarrow", batch_size=64)
    df = pa.concat_tables(out.iter_batches(batch_format="pyarrow")).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def gif_frame_stats(sf_dir: str) -> pd.DataFrame:
    """Video-style frame sampling, oracle-checked end-to-end: each
    document synthesizes an ANIMATED GIF (15×13, 2 + doc_id % 5 frames,
    really LZW-compressed), the actor-pool ``FrameSampler`` decodes every
    frame (full LZW: variable-width codes, clear/end, KwKwK) and keeps
    every 2nd, and the driver checks (n_frames, n_sampled, geometry,
    integer pixel sum of the sampled frames) against DuckDB recomputing
    the same arithmetic — the grayscale-identity palette makes the
    decoded red channel equal the pixel index, so a closed-form sum over
    the (seed, frame, position) pattern is exactly SQL-expressible."""
    from medea_ray.engine.multimodal import make_gif, sample_frames

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def to_gif(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        return pa.table({
            "doc_id": t.column("doc_id"),
            "blob": pa.array(
                [make_gif(15, 13, n_frames=2 + i % 5, seed=i) for i in ids],
                pa.large_binary()),
        })

    binary = ds.map_batches(to_gif, batch_format="pyarrow")
    out = sample_frames(binary, payload_col="blob", every=2,
                        batch_size=64, concurrency=(1, 4))
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    assert tbl.column("frames_ok").to_pandas().all(), "GIF decode failed a fixture blob"
    df = tbl.select(
        ["doc_id", "n_frames", "n_sampled", "frame_width", "frame_height", "px_sum"]
    ).to_pandas()
    for c in ("n_frames", "n_sampled", "frame_width", "frame_height"):
        df[c] = df[c].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)
