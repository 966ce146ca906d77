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
