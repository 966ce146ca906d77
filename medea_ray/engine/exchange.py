"""Shared bucketed reduce for (key → integer-aggregate) exchanges.

Ray 2.49's generic ``groupby(cols).aggregate(...)`` sort-aggregate is
the single most expensive shape in the engine at high row counts —
measured 10-14× slower than an equivalent single-int64-key bucket
shuffle whose per-bucket work is one vectorized Arrow ``group_by``
(see constraints.distinct_counts / uniqueness.group_count round-5
notes: 6.7 s → 0.47 s on a 1.2M-row digest exchange, dup_urls
4.2 s → 0.9 s). This module is that pattern, shared:

- every partial row gets a bucket ``hash64(keys[0]) & (n_buckets-1)``
  (integer keys bucket by value mask — no hash needed); equal key
  tuples share ``keys[0]``, so a distinct tuple lands in exactly ONE
  bucket and per-bucket aggregates compose exactly;
- the ONE shuffle groups by that int64 bucket; each bucket group runs
  one Arrow ``Table.group_by(keys).aggregate(...)`` (sum/min/max/
  count_all — all exact over integers);
- null keys bucket with the empty string / 0 but keep their own group
  row (Arrow group_by's null-group semantics).

SCALE CONTRACT: one bucket's distinct keys must fit a worker's heap;
uniform hashing keeps buckets even, so size ``n_buckets`` ≥
distinct_rows × row_bytes / per-worker budget. Callers whose keys[0]
is low-cardinality (a handful of labels) must pass a higher-cardinality
``bucket_key`` — bucketing is only as parallel as keys[0]'s cardinality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def bucketed_group_agg(
    partials,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    *,
    bucket_key: str | None = None,
    n_buckets: int = 64,
    small_threshold: int = 1 << 18,
):
    """Reduce a partials Dataset exactly: one row per distinct ``keys``
    tuple with ``aggs = [(col, fn, out_name)]`` (fn ∈ sum/min/max/count)
    applied across all partial rows. Output columns: keys + out names.
    ``bucket_key`` defaults to ``keys[0]``.

    ADAPTIVE: the partials are materialized (the shuffle would buffer
    them anyway) and exchanges of ≤ ``small_threshold`` rows take the
    generic sort-aggregate instead — below ~2^18 rows the bucket
    machinery's fixed cost (~0.5-1 s: extra stage + per-group task
    spawns) exceeds its win, measured on the 600k-page bench: tiny
    vocab exchanges (tfidf/lm/bpe) regressed ~1 s under unconditional
    bucketing while 10^6-row digest exchanges gained 10×. A ``count``
    agg always buckets (the generic branch's row-count semantics
    differ on null cells)."""
    keys = list(keys)
    if not keys:
        raise ValueError("bucketed_group_agg: at least one key required")
    if n_buckets < 1 or n_buckets & (n_buckets - 1):
        raise ValueError(
            f"bucketed_group_agg: n_buckets must be a power of two, got {n_buckets}"
        )
    for _c, fn, _o in aggs:
        if fn not in ("sum", "min", "max", "count"):
            raise ValueError(f"bucketed_group_agg: unsupported agg fn {fn!r}")
    bkey = bucket_key or keys[0]
    if bkey not in keys:
        raise ValueError(
            f"bucketed_group_agg: bucket_key {bkey!r} must be one of keys {keys}"
        )
    mask = np.int64(n_buckets - 1)
    arrow_aggs = [(c, fn) for c, fn, _ in aggs]
    renames = {f"{c}_{fn}": out for c, fn, out in aggs}

    partials = partials.materialize()
    if partials.count() <= small_threshold and all(
        fn != "count" for _, fn, _ in aggs
    ):
        from ray.data.aggregate import Max, Min, Sum

        ray_aggs = [
            {"sum": Sum, "min": Min, "max": Max}[fn](c, alias_name=out)
            for c, fn, out in aggs
        ]
        return partials.groupby(keys if len(keys) > 1 else keys[0]).aggregate(
            *ray_aggs
        )

    def add_bucket(t: pa.Table) -> pa.Table:
        kc = t.column(bkey)
        if pa.types.is_integer(kc.type):
            b = pc.fill_null(kc, 0).to_numpy(zero_copy_only=False).astype(
                np.int64
            ) & mask
        else:
            from medea_ray.engine.uniqueness import _hash64

            s = (
                kc
                if pa.types.is_string(kc.type) or pa.types.is_large_string(kc.type)
                else kc.cast(pa.string())
            )
            b = np.asarray(_hash64(pc.fill_null(s, ""))).view(np.int64) & mask
        return t.append_column("_xb", pa.array(b, pa.int64()))

    def per_bucket(t: pa.Table) -> pa.Table:
        # dedupe the projection: two aggs over one column (sum+min of v)
        # or an agg over a key column must not select it twice
        sel = keys + list(
            dict.fromkeys(c for c, _, _ in aggs if c not in keys)
        )
        g = t.select(sel).group_by(keys).aggregate(arrow_aggs)
        cols = {k: g.column(k) for k in keys}
        for gc, out in renames.items():
            cols[out] = g.column(gc)
        return pa.table(cols)

    return (
        partials.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_xb")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
