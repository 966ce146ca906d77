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


def string_buffer_parts(col):
    """Zero-copy access to a string column's raw UTF-8 storage:
    ``(data: memoryview, offsets: np.ndarray[len+1], null_mask | None)``,
    or ``None`` when the column is not (large_)string — callers fall
    back to ``to_pylist``. ``data[offsets[i]:offsets[i+1]]`` is row i's
    exact UTF-8 bytes (Arrow string storage IS the value's encoding), so
    per-row parse/hash consumers can skip the Python-str materialization
    entirely — measured bus-bound win, BENCH/BASELINE.md round-5 note.
    Handles chunked and sliced (non-zero offset) inputs."""
    import numpy as np

    a = as_array(col)
    if not (pa.types.is_string(a.type) or pa.types.is_large_string(a.type)):
        return None
    wide = pa.types.is_large_string(a.type)
    bufs = a.buffers()
    if len(a) == 0 or bufs[1] is None:
        return memoryview(b""), np.zeros(1, np.int64), None
    offsets = np.frombuffer(
        bufs[1],
        dtype=np.int64 if wide else np.int32,
        count=len(a) + 1,
        offset=a.offset * (8 if wide else 4),
    )
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    null_mask = a.is_null().to_numpy(zero_copy_only=False) if a.null_count else None
    return data, offsets, null_mask


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
