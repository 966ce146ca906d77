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

import numpy as np
import pyarrow as pa


def _partial_counts_fn(key: str):
    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key]).group_by([key]).aggregate([([], "count_all")])
        return pa.table({key: t.column(key), "cnt": t.column("count_all")})

    return partial


def group_count(ds, key: str, batch_size: int = 8192):
    """(key, n) counts: in-batch partial aggregation, then a small shuffle."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        _partial_counts_fn(key), batch_format="pyarrow", batch_size=batch_size
    )
    return partials.groupby(key).aggregate(Sum("cnt", alias_name="n"))


def duplicates(ds, key: str, batch_size: int = 8192):
    """Keys appearing more than once: (key, n) with n >= 2."""
    return group_count(ds, key, batch_size).filter(expr="n > 1")


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
