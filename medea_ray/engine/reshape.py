"""Reshape operators: long→wide pivot over a categorical column.

``pivot_counts`` turns (index, category) event streams into one wide row
per index with a count column per category — the
``SUM(CASE WHEN cat = v THEN 1 ELSE 0 END)`` SQL shape.

Scale shape: each batch pre-aggregates its own (index, category) counts
with one Arrow ``group_by`` (so the shuffle moves partial-count rows,
not events), then ONE groupby on the index widens per group. The
category list is an explicit parameter — a fixed, known vocabulary keeps
the output schema static across blocks (dynamic discovery would need a
driver-side ``unique()`` pass first; callers can do that on the rare
cold start and then pin the list). Unknown categories are counted into
``other_name`` when given, else dropped with no error (documented —
counts, not a validator).

The reference (juspay/medea) has no tabular surface; this comes from the
north rule's engine scope.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pivot_counts(
    ds,
    index_col: str,
    pivot_col: str,
    categories: list[str],
    prefix: str = "n_",
    other_name: str | None = None,
):
    """One row per ``index_col`` value with ``{prefix}{category}`` count
    columns (int64, zero-filled). See module doc for the scale shape."""
    cats = list(categories)
    cat_pos = {c: i for i, c in enumerate(cats)}
    n_out = len(cats) + (1 if other_name else 0)

    def partial(t: pa.Table) -> pa.Table:
        counts = pa.TableGroupBy(
            t.select([index_col, pivot_col]), [index_col, pivot_col]
        ).aggregate([([], "count_all")])
        return counts.rename_columns([index_col, pivot_col, "cnt"])

    def widen(t: pa.Table) -> pa.Table:
        idx_type = t.schema.field(index_col).type
        names = [prefix + c for c in cats] + ([prefix + other_name] if other_name else [])
        schema = pa.schema([(index_col, idx_type)] + [(n, pa.int64()) for n in names])
        if t.num_rows == 0:
            return schema.empty_table()
        out = np.zeros(n_out, np.int64)
        cnts = t.column("cnt").to_numpy(zero_copy_only=False)
        for k, c in zip(t.column(pivot_col).to_pylist(), cnts):
            pos = cat_pos.get(k)
            if pos is None:
                if other_name is None:
                    continue
                pos = n_out - 1
            out[pos] += c
        cols = {index_col: pa.array([t.column(index_col)[0].as_py()], idx_type)}
        for i, n in enumerate(names):
            cols[n] = pa.array([out[i]], pa.int64())
        return pa.table(cols, schema=schema)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(index_col)
        .map_groups(widen, batch_format="pyarrow")
    )
