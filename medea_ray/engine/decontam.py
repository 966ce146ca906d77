"""Benchmark decontamination: drop (or tag) corpus rows whose content
hash appears in a banned/benchmark set.

Training corpora must not contain evaluation data; the standard first
line of defense is exact content-hash matching against the benchmark
suite. The banned side is small by nature (benchmarks are ~1e4-1e6
rows), so this is a broadcast anti-join on the digest: hash the banned
texts once, ``ray.put`` the digest set, and filter the (huge) corpus in
an embarrassingly parallel actor-pool stage — the corpus is never
shuffled and only 16-byte digests are ever broadcast.

Matching is on ``md5(key_of(text))`` where ``key_of`` defaults to the
full text; pass ``prefix_len`` to match on a text prefix instead (the
same normalization knob as exact dedup — near-identical boilerplate
variants of a benchmark row then also match). For fuzzy decontamination
compose with the MinHash near-dup family in ``dedup.py``.

The reference (juspay/medea) has no corpus surface; this comes from the
north rule's training-data engine scope.
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_log = logging.getLogger(__name__)


def _digest(text: str, prefix_len: int | None) -> bytes:
    if prefix_len is not None:
        text = text[:prefix_len]
    return hashlib.md5(text.encode()).digest()


def banned_digests(banned_ds, text_col: str, prefix_len: int | None = None) -> set[bytes]:
    """Collect the banned side's text digests on the driver (small by the
    operator's contract — digests only, 16 bytes/row, never the texts)."""

    def to_digest(t: pa.Table) -> pa.Table:
        col = t.column(text_col).to_pylist()
        out = [_digest(x, prefix_len) for x in col if x is not None]
        return pa.table({"d": pa.array(out, pa.binary(16))})

    parts = banned_ds.map_batches(to_digest, batch_format="pyarrow").take_all()
    return {r["d"] for r in parts}


class _NotInFilter:
    """Actor-pool stage holding a broadcast value set once per actor
    (a plain-function stage would ``ray.get`` + deserialize the set on
    every batch). The probe is one vectorized ``pc.is_in`` against an
    Arrow value-set array built once in ``__init__`` (round 5: the
    per-row Python ``v not in set`` loop was the dedup anti-join's
    bottleneck at high dup rates); Arrow's MATCH null semantics equal
    the old loop's — a null cell is dropped iff the set held None."""

    def __init__(self, values_ref, col: str):
        import ray

        values = (
            values_ref
            if isinstance(values_ref, (set, pa.Array, pa.ChunkedArray))
            else ray.get(values_ref)
        )
        if isinstance(values, set):
            values = pa.array(list(values))
        elif isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        # an Arrow array crosses the object store zero-copy (buffer
        # protocol) — a broadcast Python set would unpickle per actor
        self.value_set = values
        self.col = col

    def __call__(self, t: pa.Table) -> pa.Table:
        if len(self.value_set) == 0:
            return t
        mask = pc.invert(
            pc.is_in(t.column(self.col), value_set=self.value_set)
        )
        return t.filter(pc.fill_null(mask, True))


def filter_not_in(ds, col: str, values, concurrency=(1, 8)):
    """Drop rows whose ``col`` value is in ``values`` (a set, or an
    Arrow array — preferred at scale: it broadcasts zero-copy) — the
    generic broadcast anti-join filter (``decontaminate`` is this plus
    hashing)."""
    import ray

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    ref = ray.put(values if isinstance(values, pa.Array) else set(values))
    return ds.map_batches(
        _NotInFilter,
        fn_constructor_kwargs=dict(values_ref=ref, col=col),
        batch_format="pyarrow",
        # big batches: pc.is_in rebuilds the value-set hash table per
        # CALL (~80 ms at 600k values), so amortize it over many rows
        batch_size=32768,
        concurrency=concurrency,
        num_cpus=1,
    )


# -- bucketed anti-filter (drop sets too large to broadcast) ------------------
#
# Per-worker-process cache of broadcast bucket value sets: the bucketed
# passes run as STATELESS tasks (an actor pool per union branch needs one
# CPU per branch just for pool minimums — dozens of branches would deadlock
# any cluster), so each worker deserializes a given bucket's set once and
# reuses it across the tasks it runs.
_BUCKET_SET_CACHE: dict = {}


def _cached_value_array(ref) -> pa.Array:
    """Bucket value set as an Arrow array (the ``pc.is_in`` probe side),
    deserialized + converted once per worker process."""
    if isinstance(ref, set):  # direct-injection path (tests): no cache key
        return pa.array(list(ref))
    key = ref.hex()
    got = _BUCKET_SET_CACHE.get(key)
    if got is None:
        import ray

        if len(_BUCKET_SET_CACHE) > 8:  # bounded: stale buckets from prior passes
            _BUCKET_SET_CACHE.clear()
        got = _BUCKET_SET_CACHE[key] = pa.array(list(ray.get(ref)))
    return got


def _make_bucket_pass(values_ref, col: str, bucket: int, n_buckets: int):
    """One hash-bucket pass of the bucketed anti-filter: keep only the
    batch rows whose ``col`` hashes to ``bucket`` (or the null rows for
    bucket -1), then drop those in the (bucket-local) broadcast set."""

    def fn(t: pa.Table) -> pa.Table:
        from medea_ray.engine.referential import bucket_of

        b = bucket_of(t.column(col), n_buckets)
        t = t.filter(pa.array(b == bucket))
        if t.num_rows == 0:
            return t
        values = _cached_value_array(values_ref)
        if len(values) == 0:
            return t
        mask = pc.invert(pc.is_in(t.column(col), value_set=values))
        return t.filter(pc.fill_null(mask, True))

    return fn


def anti_filter_bucketed(ds, col: str, values_ds, value_col: str, n_buckets: int):
    """Drop rows of ``ds`` whose ``col`` appears in ``values_ds[value_col]``,
    in ``n_buckets`` deterministic hash-bucket passes (``referential.
    bucket_of``): pass b broadcasts only bucket b's values and emits only
    the rows whose key hashes to b, so driver and actor memory stay bounded
    at ~|values| / n_buckets while the result is exactly the broadcast
    answer (each row lands in exactly one bucket; null-key rows ride a
    dedicated -1 pass, dropped iff null is in the value set).

    ``values_ds`` must be MATERIALIZED (it is re-scanned per bucket) and
    small-schema (the value column only — digests/ids, never payloads).
    Each bucket is one more streaming pass over ``ds``'s pipeline, which
    should be a cheap re-read (parquet source): a wide op upstream
    re-executes per branch, and a many-branch union of wide plans can
    stall Ray 2.49's streaming executor (measured at 57 branches) — keep
    ``n_buckets`` modest and budget-derived."""
    import ray

    from medea_ray.engine.referential import bucket_of

    def bucket_slice(b: int) -> set:
        def pick(t: pa.Table) -> pa.Table:
            c = t.column(value_col)
            return t.filter(pa.array(bucket_of(c, n_buckets) == b))

        return {
            r[value_col]
            for r in values_ds.map_batches(pick, batch_format="pyarrow").take_all()
        }

    def null_count(t: pa.Table) -> pa.Table:
        return pa.table(
            {"n": pa.array([t.column(value_col).null_count], pa.int64())}
        )

    has_null = (
        sum(
            r["n"]
            for r in values_ds.map_batches(
                null_count, batch_format="pyarrow"
            ).take_all()
        )
        > 0
    )

    parts = []
    for b in list(range(n_buckets)) + [-1]:
        values = bucket_slice(b) if b >= 0 else ({None} if has_null else set())
        parts.append(
            ds.map_batches(
                _make_bucket_pass(ray.put(values), col, b, n_buckets),
                batch_format="pyarrow",
            )
        )
    out = parts[0]
    for d in parts[1:]:
        out = out.union(d)
    return out


def filter_not_in_ds(
    ds,
    col: str,
    values_ds,
    value_col: str,
    budget_rows: int = 1 << 22,
    n_buckets: int | None = None,
    concurrency=(1, 8),
    stats_out: dict | None = None,
):
    """Budget-aware anti-join: drop rows of ``ds`` whose ``col`` appears
    in ``values_ds[value_col]``. While the value set fits ``budget_rows``
    it is broadcast once (``filter_not_in``); above the budget the filter
    runs in hash-bucket passes (``anti_filter_bucketed``). Cardinality and
    bytes are always logged, never silent — the 100-TB guard the
    broadcast-only path lacks. When ``stats_out`` is a dict, the value-set
    cardinality is stored as ``stats_out["n_dropped"]`` (== rows dropped
    iff ``col`` is unique per row and every value occurs in ``ds``)."""
    values_ds = values_ds.materialize()  # value column only — never payloads
    n = values_ds.count()
    if stats_out is not None:
        stats_out["n_dropped"] = n
    _log.info(
        "filter_not_in_ds: anti-join value set: %d rows, %d bytes (budget %d rows)",
        n, values_ds.size_bytes() or 0, budget_rows,
    )
    if n == 0:
        return ds
    if n_buckets is None:
        n_buckets = 1 if n <= budget_rows else min(16, -(-n // budget_rows))
    if n_buckets <= 1:
        # collect the value column AS ARROW (no driver-side Python-set
        # build; the unique'd array broadcasts zero-copy to the filter
        # actors — round 5: the set build + per-actor unpickle dominated
        # the dedup anti-join at high dup rates)
        chunks = [
            b.column(value_col).combine_chunks()
            if isinstance(b.column(value_col), pa.ChunkedArray)
            else b.column(value_col)
            for b in values_ds.iter_batches(batch_format="pyarrow")
        ]
        values = (
            pc.unique(pa.concat_arrays(chunks))
            if chunks
            else pa.array([], pa.string())
        )
        return filter_not_in(ds, col, values, concurrency=concurrency)
    _log.info(
        "filter_not_in_ds: value set exceeds budget -> %d bucketed passes",
        n_buckets,
    )
    return anti_filter_bucketed(ds, col, values_ds, value_col, n_buckets)


class _Decontaminator:
    """Actor-pool stage holding the broadcast digest set."""

    def __init__(self, digests_ref, text_col: str, prefix_len, mode: str, tag_name: str):
        import ray

        self.digests = digests_ref if isinstance(digests_ref, set) else ray.get(digests_ref)
        self.text_col = text_col
        self.prefix_len = prefix_len
        self.mode = mode
        self.tag_name = tag_name

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t.column(self.text_col)
        parts = None
        if self.prefix_len is None:
            # full-text digests hash straight off the Arrow buffer (a
            # char-prefix digest must slice the DECODED str, so only the
            # whole-doc mode can skip materialization)
            from medea_ray.engine.arrow_util import as_array, string_buffer_parts

            parts = string_buffer_parts(as_array(col))
        if parts is not None:
            data, offsets, null_mask = parts
            digests, md5 = self.digests, hashlib.md5
            hit = [
                (null_mask is None or not null_mask[i])
                and md5(data[offsets[i] : offsets[i + 1]]).digest() in digests
                for i in range(t.num_rows)
            ]
        else:
            texts = col.to_pylist()
            hit = [
                x is not None and _digest(x, self.prefix_len) in self.digests
                for x in texts
            ]
        if self.mode == "tag":
            return t.append_column(self.tag_name, pa.array(hit, pa.bool_()))
        return t.filter(pc.invert(pa.array(hit, pa.bool_())))


def decontaminate(
    ds,
    text_col: str,
    banned_ds,
    banned_text_col: str | None = None,
    prefix_len: int | None = None,
    mode: str = "drop",
    tag_name: str = "contaminated",
    concurrency=(1, 8),
):
    """Remove (``mode="drop"``) or flag (``mode="tag"``) rows of ``ds``
    whose ``text_col`` digest appears in ``banned_ds``. Null texts never
    match (no content to leak) — with ``mode="drop"`` they are KEPT."""
    import ray

    if mode not in ("drop", "tag"):
        raise ValueError(f"mode must be 'drop' or 'tag', got {mode!r}")
    digests = banned_digests(banned_ds, banned_text_col or text_col, prefix_len)
    ref = ray.put(digests)
    return ds.map_batches(
        _Decontaminator,
        fn_constructor_kwargs=dict(
            digests_ref=ref, text_col=text_col, prefix_len=prefix_len,
            mode=mode, tag_name=tag_name,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# N-gram decontamination (GPT-3 appendix C / PaLM style): a corpus doc is
# contaminated if ANY of its word n-grams (default n=13) also occurs in the
# benchmark suite. Whole-doc digest matching above misses partial overlap
# (a benchmark question quoted inside a larger page); this catches it.
#
# Scale shape: the benchmark side is small by contract (~1e4-1e6 rows) but
# its GRAM set is ~100x its row count. Two broadcast layouts:
#   match="string" (default): Arrow string value set, EXACT matching — the
#     layout the DuckDB lockstep test replays verbatim; loud byte budget.
#   match="hashed": sorted int64 xxhash array (8 B/gram) for web-scale
#     benchmark suites. 64-bit collisions can only flag EXTRA docs as
#     contaminated (conservative direction — never keeps a leaked doc);
#     the direction is documented and pinned by a forced-collision test.
# The corpus is never shuffled; probing is one map_batches pass reusing
# substr.py's vectorized gram kernels (split/starts/ids/strings).
# ---------------------------------------------------------------------------


def benchmark_gram_set(
    bench_ds,
    text_col: str,
    n: int,
    *,
    match: str = "string",
    budget_bytes: int = 1 << 30,
):
    """Distinct word ``n``-grams of the benchmark side, collected on the
    driver (per-batch-unique partials → set union; same small-side
    contract as ``banned_digests``). Returns a sorted ``pa.Array`` of
    gram strings (``match="string"``) or a sorted ``np.int64`` hash
    array (``match="hashed"``), plus the distinct-gram count."""
    from medea_ray.engine.substr import _gram_ids, _gram_starts, _gram_strings, _split

    if n < 1:
        raise ValueError(f"ngram n must be >= 1, got {n}")
    if match not in ("string", "hashed"):
        raise ValueError(f"match must be 'string' or 'hashed', got {match!r}")

    def batch_grams(t: pa.Table) -> pa.Table:
        cnts, flat, offsets = _split(t.column(text_col))
        starts, _ = _gram_starts(cnts, offsets, n)
        if starts.size == 0:
            return pa.table({"gram": pa.array([], pa.string())})
        ids, _ = _gram_ids(flat, starts, n)
        _, first_pos = np.unique(ids, return_index=True)
        return pa.table({"gram": _gram_strings(flat, starts[first_pos], n)})

    stream = bench_ds.map_batches(batch_grams, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    )

    if match == "hashed":
        # hash per batch and only keep int64s driver-side, so both the
        # budget accounting AND peak driver memory really are 8 B/gram
        # (the budget error's own remedy) — never the string set
        from medea_ray.engine.uniqueness import _hash64

        acc = np.empty(0, np.int64)
        pending, pend_n = [], 0

        def compact(acc, pending):
            acc = np.unique(np.concatenate([acc, *pending])) if pending else acc
            if acc.size * 8 > budget_bytes:
                raise ValueError(
                    f"benchmark_gram_set: {acc.size} hashed grams exceed "
                    f"budget_bytes={budget_bytes}; raise the budget "
                    "(truncating would silently keep leaked docs)"
                )
            return acc

        for b in stream:
            col = b.column("gram")
            if len(col):
                pending.append(np.asarray(_hash64(col)).view(np.int64))
                pend_n += len(col)
            if pend_n >= 1 << 20:
                acc, pending, pend_n = compact(acc, pending), [], 0
        acc = compact(acc, pending)
        _log.info(
            "benchmark_gram_set: %d distinct %d-gram hashes (%d bytes, hashed)",
            acc.size, n, acc.size * 8,
        )
        return acc, int(acc.size)

    grams: set[str] = set()
    nbytes = 0
    for b in stream:
        for g in b.column("gram").to_pylist():
            if g not in grams:
                grams.add(g)
                # UTF-8 byte length, not len(g): multibyte gram text would
                # undercount real memory and trip the loud budget guard
                # too late on non-ASCII benchmark suites
                nbytes += len(g.encode()) + 56  # + str object overhead
                if nbytes > budget_bytes:
                    raise ValueError(
                        f"benchmark_gram_set: gram set exceeds budget_bytes="
                        f"{budget_bytes} at {len(grams)} grams; use "
                        "match='hashed' (8 B/gram) or raise the budget "
                        "(truncating would silently keep leaked docs)"
                    )
    _log.info(
        "benchmark_gram_set: %d distinct %d-grams (~%d bytes, string)",
        len(grams), n, nbytes,
    )
    return pa.array(sorted(grams), pa.string()), len(grams)


class _GramProbe:
    """Actor-pool stage: per-doc n-gram hit counts vs the broadcast
    benchmark gram set (materialized once per actor in ``__init__``)."""

    def __init__(self, set_ref, text_col: str, id_col: str, n: int, match: str,
                 mode: str = "stats"):
        import ray

        self.text_col = text_col
        self.id_col = id_col
        self.n = n
        self.match = match
        self.mode = mode
        self.value_set = ray.get(set_ref) if not isinstance(
            set_ref, (pa.Array, np.ndarray)
        ) else set_ref

    def __call__(self, t: pa.Table) -> pa.Table:
        from medea_ray.engine.substr import _gram_ids, _gram_starts, _gram_strings, _split

        n = self.n
        texts = t.column(self.text_col)
        cnts, flat, offsets = _split(texts)
        ndocs = len(t)
        starts, doc_idx_flat = _gram_starts(cnts, offsets, n)
        n_grams = np.maximum(cnts - n + 1, 0)
        n_hits = np.zeros(ndocs, np.int64)
        if starts.size and len(self.value_set):
            ids, _ = _gram_ids(flat, starts, n)
            uniq, first_pos = np.unique(ids, return_index=True)
            grams = _gram_strings(flat, starts[first_pos], n)
            if self.match == "string":
                hit_u = pc.is_in(grams, value_set=self.value_set).to_numpy(
                    zero_copy_only=False
                )
            else:
                from medea_ray.engine.uniqueness import _hash64

                h = np.asarray(_hash64(grams)).view(np.int64)
                c = self.value_set
                pos = np.searchsorted(c, h)
                hit_u = (pos < c.size) & (c[np.minimum(pos, c.size - 1)] == h)
            hit_u = np.asarray(hit_u, bool)
            hit_per_start = hit_u[ids]
            gram_docs = doc_idx_flat[starts]
            n_hits = np.bincount(
                gram_docs[hit_per_start], minlength=ndocs
            ).astype(np.int64)
        if self.mode == "drop":
            # single-pass row filter: keep full rows with zero hits (no
            # separate id anti-join pass, no id-uniqueness requirement)
            return t.filter(pa.array(n_hits == 0))
        return pa.table(
            {
                self.id_col: t.column(self.id_col),
                "n_grams": pa.array(n_grams),
                "n_hits": pa.array(n_hits),
                "contaminated": pa.array(n_hits > 0),
            }
        )


def contamination_stats(
    ds,
    bench_ds,
    text_col: str = "text",
    bench_text_col: str | None = None,
    *,
    n: int = 13,
    id_col: str = "doc_id",
    match: str = "string",
    budget_bytes: int = 1 << 30,
    batch_size: int = 4096,
    concurrency=None,
):
    """Per-doc n-gram contamination stats vs a benchmark Dataset:
    ``(id_col, n_grams, n_hits, contaminated)``. A doc with fewer than
    ``n`` words has 0 grams and is never contaminated; null text counts
    as the empty string (0 grams)."""
    return _probe_stage(
        ds, bench_ds, text_col, bench_text_col, n=n, id_col=id_col,
        match=match, budget_bytes=budget_bytes, batch_size=batch_size,
        concurrency=concurrency, mode="stats",
    )


def _probe_stage(ds, bench_ds, text_col, bench_text_col, *, n, id_col, match,
                 budget_bytes, batch_size, concurrency, mode):
    import ray

    from medea_ray.engine.pipeline import ACTOR_NUM_CPUS, default_pool

    value_set, _ = benchmark_gram_set(
        bench_ds, bench_text_col or text_col, n, match=match,
        budget_bytes=budget_bytes,
    )
    ref = ray.put(value_set)
    pool = concurrency if concurrency is not None else default_pool()
    return ds.map_batches(
        _GramProbe,
        fn_constructor_kwargs=dict(
            set_ref=ref, text_col=text_col, id_col=id_col, n=n, match=match,
            mode=mode,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool,
        num_cpus=ACTOR_NUM_CPUS,
    )


def decontaminate_ngrams(
    ds,
    bench_ds,
    text_col: str = "text",
    bench_text_col: str | None = None,
    *,
    n: int = 13,
    id_col: str = "doc_id",
    match: str = "string",
    budget_bytes: int = 1 << 30,
    batch_size: int = 4096,
    concurrency=None,
):
    """Drop corpus rows sharing ANY word n-gram with the benchmark side
    (keeps full rows; docs with < n words — including null text — are
    always kept). Single pass: the probe stage filters rows in place
    (no separate id anti-join, no id-uniqueness requirement — the
    ``_Decontaminator`` pattern)."""
    return _probe_stage(
        ds, bench_ds, text_col, bench_text_col, n=n, id_col=id_col,
        match=match, budget_bytes=budget_bytes, batch_size=batch_size,
        concurrency=concurrency, mode="drop",
    )
