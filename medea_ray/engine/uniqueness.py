"""Key-uniqueness / duplicate detection via hash-partitioned shuffle with
explicit skew handling (SURVEY.md §2.5 E9).

Two-phase aggregation: phase 1 pre-aggregates per *batch* inside
``map_batches`` (vectorized Arrow ``group_by``) so a key occurring k times
in a block contributes ONE partial row, not k — that is the skew mitigation
for hot keys (a url duplicated a million times crosses the shuffle as a few
hundred partial counts, one per block). Phase 2 is a small
``groupby(key).sum`` over partials. For *adversarial* skew where even
partial rows of one key could swamp a reducer, ``salted_group_count``
additionally salts each partial row (batch-random offset + position, mod
``n_salts``) for a 3-stage (partial → salted combine → final) plan —
FP-Hadoop-style partial/final splitting (see PAPERS.md).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

logger = logging.getLogger(__name__)


def _hash64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized 64-bit hash of a string column (polars/xxhash-family,
    seed-pinned; stable across processes within one run — verified, and all
    uses below are collision-VERIFIED so even a cross-version change could
    only alter intermediate candidate sets, never results)."""
    import polars as pl

    h = pl.from_arrow(pa.table({"k": col}))["k"].hash(seed=0).to_numpy()
    # reinterpret as int64: Ray's sort/groupby path round-trips column
    # values through Python ints, and uint64 values above 2^63 overflow
    # the rebuild into C long (observed: pickled-object fallback blocks)
    return h.view(np.int64)


def _partial_counts_fn(key: str):
    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key]).group_by([key]).aggregate([([], "count_all")])
        return pa.table({key: t.column(key), "cnt": t.column("count_all")})

    return partial


def group_count(ds, key: str, batch_size: int = 8192, n_buckets: int = 64):
    """(key, n) counts: in-batch partial aggregation, then the shared
    adaptive reduce (exchange.bucketed_group_agg — one hash-bucket
    shuffle + vectorized per-bucket Arrow group_by for large exchanges,
    generic sort-aggregate below the crossover; dup_urls measured
    4.2 s → 0.9 s at the 600k-page shape)."""
    from medea_ray.engine.exchange import bucketed_group_agg

    partials = ds.map_batches(
        _partial_counts_fn(key), batch_format="pyarrow", batch_size=batch_size
    )
    return bucketed_group_agg(
        partials, [key], [("cnt", "sum", "n")], n_buckets=n_buckets
    )


def duplicates(ds, key: str, batch_size: int = 8192):
    """Keys appearing more than once: (key, n) with n >= 2."""
    return group_count(ds, key, batch_size).filter(expr="n > 1")


def duplicates_hashed(
    ds,
    key: str,
    batch_size: int = 8192,
    candidate_budget: int = 4_000_000,
    _hash_fn=None,
):
    """Same result as ``duplicates`` (keys with n >= 2) but the wide
    exchange moves FIXED-WIDTH 64-bit digests, never the key strings.

    Phase 1 hashes the key per batch and pre-aggregates (h, cnt) partials;
    phase 2 is a uint64 groupby (cheap sort) whose n>1 survivors — the
    duplicate-DIGEST set, small for mostly-unique corpora — are broadcast
    back (``ray.put`` once) and phase 3 exact-counts only the rows whose
    digest is in that set, grouping on the real key so 64-bit collision
    false positives drop out. At web scale this turns a shuffle of every
    url string into a shuffle of 8-byte ints plus a second pruned pass.

    ``candidate_budget`` bounds the broadcast digest set; above it the
    corpus is dup-heavy (not the workload this path is for) and we fall
    back to the exact string-shuffle ``duplicates`` with a log line.
    ``_hash_fn`` is injectable for collision tests only.
    """
    import ray
    from ray.data.aggregate import Sum

    hash_fn = _hash_fn or _hash64

    def partial_hashed(batch: pa.Table) -> pa.Table:
        h = pa.array(np.asarray(hash_fn(batch.column(key))).view(np.int64), pa.int64())
        g = pa.table({"h": h}).group_by(["h"]).aggregate([([], "count_all")])
        return pa.table({"h": g.column("h"), "cnt": g.column("count_all")})

    partials = ds.map_batches(
        partial_hashed, batch_format="pyarrow", batch_size=batch_size
    )
    dup_h = (
        partials.groupby("h")
        .aggregate(Sum("cnt", alias_name="n"))
        .filter(expr="n > 1")
    )
    cands = [b.column("h").to_numpy() for b in dup_h.iter_batches(batch_format="pyarrow")]
    cand = np.sort(np.concatenate(cands)) if cands else np.empty(0, np.int64)
    if cand.size > candidate_budget:
        logger.warning(
            "duplicates_hashed: %d candidate digests exceed budget %d "
            "(dup-heavy corpus) — falling back to exact string shuffle",
            cand.size,
            candidate_budget,
        )
        return duplicates(ds, key, batch_size)
    if cand.size == 0:
        # typed empty result matching duplicates()'s (key, n) schema
        sch = ds.schema()  # Ray Data Schema wrapper: parallel names/types
        key_type = dict(zip(sch.names, sch.types))[key]
        empty = pa.table(
            {key: pa.array([], key_type), "n": pa.array([], pa.int64())}
        )
        import ray.data as rd

        return rd.from_arrow(empty)
    cand_ref = ray.put(cand)

    def keep_candidates(batch: pa.Table) -> pa.Table:
        c = ray.get(cand_ref)
        h = np.asarray(hash_fn(batch.column(key))).view(np.int64)
        idx = np.searchsorted(c, h)
        idx[idx == c.size] = 0
        mask = c[idx] == h
        return batch.filter(pa.array(mask))

    pruned = ds.map_batches(
        keep_candidates, batch_format="pyarrow", batch_size=batch_size
    )
    return group_count(pruned, key, batch_size).filter(expr="n > 1")


def salted_group_count(ds, key: str, n_salts: int = 16, batch_size: int = 8192):
    """3-stage salted counting for adversarially hot keys: partial per batch
    with a salt column, shuffle on (key, salt), then shuffle the (much
    smaller) per-salt combines on key alone."""
    from ray.data.aggregate import Sum

    def partial_salted(batch: pa.Table) -> pa.Table:
        g = batch.select([key]).group_by([key]).aggregate([([], "count_all")])
        t = pa.table({key: g.column(key), "cnt": g.column("count_all")})
        # Salt must differ across partials of the SAME key (that's what
        # spreads a hot key over reducers). Position alone is NOT enough:
        # on key-sorted input a hot key holds the same first-occurrence
        # rank in every batch and would land on one reducer anyway, so a
        # per-batch random offset (OS entropy) rotates the assignment.
        # The final count is salt-invariant, so determinism is unaffected.
        offset = np.random.default_rng().integers(n_salts)
        salt = (np.arange(t.num_rows, dtype=np.int64) + offset) % n_salts
        return t.append_column("salt", pa.array(salt, pa.int64()))

    partials = ds.map_batches(
        partial_salted, batch_format="pyarrow", batch_size=batch_size
    )
    per_salt = partials.groupby([key, "salt"]).aggregate(Sum("cnt", alias_name="n_part"))
    return per_salt.groupby(key).aggregate(Sum("n_part", alias_name="n"))
