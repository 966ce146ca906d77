"""Referential-integrity (foreign-key) constraint checking.

Scale shape: the referenced key set (dimension side — customers, parts,
hosts) is usually orders of magnitude smaller than the fact side, so we
broadcast it once via ``ray.put`` and anti-join inside ``map_batches``
with a vectorized ``pyarrow.compute.is_in`` — NO shuffle of the fact
table ever happens.

For a referenced side too big to broadcast, ``n_buckets`` splits the
check into deterministic hash buckets: pass b collects only the
referenced keys hashing to bucket b (≈1/n of the key set on the driver
at a time), broadcasts that slice, and scans the fact rows whose FK
hashes to the same bucket. A non-null FK is an orphan iff it is an
orphan within its own bucket, so the union of per-bucket orphan streams
is exact. Still shuffle-free — n_buckets streaming passes trade I/O for
bounded driver/actor memory. ``broadcast_budget_bytes`` picks
``n_buckets`` automatically from the referenced row count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc



def _splitmix64_np(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array (wraps mod 2^64)."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def bucket_of(col, n_buckets: int) -> np.ndarray:
    """Deterministic bucket id per value (int32 array; -1 for nulls).

    Integer keys hash vectorized via splitmix64. String/binary keys hash
    per UNIQUE value (blake2b-8) and fan back out with ``pc.index_in`` —
    the unique set per batch is small for real FK columns, and bucket
    assignment only needs determinism, not per-row speed."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    null_mask = pc.is_null(col).to_numpy(zero_copy_only=False)
    if pa.types.is_integer(col.type):
        v = col.cast(pa.int64(), safe=False).fill_null(0).to_numpy(zero_copy_only=False)
        h = _splitmix64_np(v.astype(np.uint64))
        out = (h % np.uint64(n_buckets)).astype(np.int32)
    else:
        import hashlib

        uniq = pc.unique(col.drop_null())
        ub = np.array(
            [
                int.from_bytes(
                    hashlib.blake2b(
                        u.as_py() if isinstance(u.as_py(), bytes) else str(u.as_py()).encode(),
                        digest_size=8,
                    ).digest(),
                    "little",
                )
                % n_buckets
                for u in uniq
            ],
            dtype=np.int32,
        )
        idx = pc.index_in(col, value_set=uniq).fill_null(0).to_numpy(zero_copy_only=False)
        out = ub[idx] if len(ub) else np.zeros(len(col), dtype=np.int32)
    out = out.copy()
    out[null_mask] = -1
    return out


class _OrphanFilter:
    """Actor-pool stage holding the broadcast referenced-key set. With
    ``bucket`` set, only fact rows whose FK hashes to that bucket are
    checked (the key set then holds just that bucket's keys)."""

    def __init__(self, keys_ref, fk_col: str, bucket: int | None = None, n_buckets: int = 1):
        import ray

        keys = ray.get(keys_ref) if not isinstance(keys_ref, (pa.Array, pa.ChunkedArray)) else keys_ref
        self.keys = keys
        self.fk_col = fk_col
        self.bucket = bucket
        self.n_buckets = n_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.fk_col)
        if self.bucket is not None:
            in_bucket = bucket_of(col, self.n_buckets) == self.bucket
            batch = batch.filter(pa.array(in_bucket))
            if batch.num_rows == 0:
                return batch
            col = batch.column(self.fk_col)
        present = pc.is_in(col, value_set=self.keys)
        # an orphan is a non-null FK that is not in the referenced key set
        orphan = pc.and_(pc.invert(pc.fill_null(present, False)), pc.is_valid(col))
        return batch.filter(orphan)


def _collect_keys(referenced_ds, pk_col: str, bucket: int | None = None, n_buckets: int = 1):
    """Unique referenced keys (optionally only those in one hash bucket)
    as a pyarrow Array, deduplicated per block before the driver merge."""
    import ray

    def prep(t: pa.Table) -> pa.Table:
        col = t.column(pk_col)
        if bucket is not None:
            t = t.filter(pa.array(bucket_of(col, n_buckets) == bucket))
            col = t.column(pk_col)
        u = pc.unique(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
        return pa.table({pk_col: u})

    parts = ray.get(
        referenced_ds.map_batches(prep, batch_format="pyarrow").to_arrow_refs()
    )
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.array([], referenced_ds.schema().base_schema.field(pk_col).type)
    return pc.unique(pa.concat_tables(parts).column(pk_col).combine_chunks())


def orphan_rows(
    fact_ds,
    fk_col: str,
    referenced_ds,
    pk_col: str,
    concurrency=(1, 8),
    n_buckets: int | None = None,
    broadcast_budget_bytes: int | None = None,
):
    """Rows of ``fact_ds`` whose ``fk_col`` has no match in
    ``referenced_ds[pk_col]`` (broadcast anti-join; hash-bucketed passes
    when the referenced side exceeds the broadcast budget)."""
    import ray

    if n_buckets is None:
        if broadcast_budget_bytes is not None:
            # estimate: 32 B/key (covers int64 and short strings with slack).
            # Each bucket is a full streaming pass over BOTH sides, so the
            # count is capped: past ~64 passes a shuffle join would win.
            est = referenced_ds.count() * 32
            n_buckets = min(64, max(1, -(-est // broadcast_budget_bytes)))
        else:
            n_buckets = 1

    if n_buckets <= 1:
        keys_ref = ray.put(_collect_keys(referenced_ds, pk_col))
        return fact_ds.map_batches(
            _OrphanFilter,
            fn_constructor_kwargs=dict(keys_ref=keys_ref, fk_col=fk_col),
            batch_format="pyarrow",
            concurrency=concurrency,
            num_cpus=1,
        )

    parts = []
    for b in range(n_buckets):
        keys_ref = ray.put(_collect_keys(referenced_ds, pk_col, b, n_buckets))
        parts.append(
            fact_ds.map_batches(
                _OrphanFilter,
                fn_constructor_kwargs=dict(
                    keys_ref=keys_ref, fk_col=fk_col, bucket=b, n_buckets=n_buckets
                ),
                batch_format="pyarrow",
                concurrency=concurrency,
                num_cpus=1,
            )
        )
    out = parts[0]
    for d in parts[1:]:
        out = out.union(d)
    return out


def referential_check(
    fact_ds,
    fk_col: str,
    referenced_ds,
    pk_col: str,
    concurrency=(1, 8),
    n_buckets: int | None = None,
    broadcast_budget_bytes: int | None = None,
) -> dict:
    """Summary form: {n_orphans}. The violation rows themselves stream out
    of ``orphan_rows`` if needed."""
    orphans = orphan_rows(
        fact_ds, fk_col, referenced_ds, pk_col, concurrency,
        n_buckets=n_buckets, broadcast_budget_bytes=broadcast_budget_bytes,
    )

    return {"n_orphans": int(orphans.count())}
