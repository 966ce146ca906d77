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
    every batch)."""

    def __init__(self, values_ref, col: str):
        import ray

        self.values = values_ref if isinstance(values_ref, set) else ray.get(values_ref)
        self.col = col

    def __call__(self, t: pa.Table) -> pa.Table:
        mask = pa.array(
            [v not in self.values for v in t.column(self.col).to_pylist()],
            pa.bool_(),
        )
        return t.filter(mask)


def filter_not_in(ds, col: str, values: set, concurrency=(1, 8)):
    """Drop rows whose ``col`` value is in ``values`` — the generic
    broadcast anti-join filter (``decontaminate`` is this plus hashing)."""
    import ray

    ref = ray.put(set(values))
    return ds.map_batches(
        _NotInFilter,
        fn_constructor_kwargs=dict(values_ref=ref, col=col),
        batch_format="pyarrow",
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


def _cached_set(ref) -> set:
    if isinstance(ref, set):
        return ref
    key = ref.hex()
    got = _BUCKET_SET_CACHE.get(key)
    if got is None:
        import ray

        if len(_BUCKET_SET_CACHE) > 8:  # bounded: stale buckets from prior passes
            _BUCKET_SET_CACHE.clear()
        got = _BUCKET_SET_CACHE[key] = ray.get(ref)
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
        values = _cached_set(values_ref)
        if not values:
            return t
        mask = pa.array(
            [v not in values for v in t.column(col).to_pylist()], pa.bool_()
        )
        return t.filter(mask)

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
):
    """Budget-aware anti-join: drop rows of ``ds`` whose ``col`` appears
    in ``values_ds[value_col]``. While the value set fits ``budget_rows``
    it is broadcast once (``filter_not_in``); above the budget the filter
    runs in hash-bucket passes (``anti_filter_bucketed``). Cardinality and
    bytes are always logged, never silent — the 100-TB guard the
    broadcast-only path lacks."""
    values_ds = values_ds.materialize()  # value column only — never payloads
    n = values_ds.count()
    _log.info(
        "filter_not_in_ds: anti-join value set: %d rows, %d bytes (budget %d rows)",
        n, values_ds.size_bytes() or 0, budget_rows,
    )
    if n == 0:
        return ds
    if n_buckets is None:
        n_buckets = 1 if n <= budget_rows else min(16, -(-n // budget_rows))
    if n_buckets <= 1:
        values = {r[value_col] for r in values_ds.take_all()}
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
        texts = t.column(self.text_col).to_pylist()
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
