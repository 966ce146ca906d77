"""Tiny shared Arrow helpers used across engine modules."""

from __future__ import annotations

import pyarrow as pa


def as_array(col) -> pa.Array:
    """ChunkedArray → contiguous Array (no-op for plain Arrays). The
    single shared copy — engine modules alias this as ``_as_array`` so
    chunk-handling fixes land everywhere at once."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col


def as_filled_strings(col) -> pa.Array:
    """Text column → contiguous string Array with nulls as ``''``.

    An all-null block degrades its column to Arrow ``null`` type, which
    ``pc.fill_null(..., '')`` REJECTS (ArrowInvalid) — every text kernel
    that coalesces nulls must cast through string first or crash on the
    first all-null block (the guard lm.train_unigram documents)."""
    import pyarrow.compute as pc

    arr = as_array(col)
    if pa.types.is_null(arr.type):
        arr = arr.cast(pa.string())
    return pc.fill_null(arr, "")
