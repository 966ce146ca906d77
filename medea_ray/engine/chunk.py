"""Overlapping document chunking — the context-window verb (RAG
indexing, long-doc training example construction): split each document
into fixed-size token windows with a configurable overlap.

Pinned semantics (the DuckDB oracle ``doc_chunks`` replays them):

- tokens are the single-space split of the text (the gopher/substr
  convention — empty text is one empty token, so every doc yields at
  least one chunk);
- stride ``S = chunk_tokens - overlap``; chunk ``k`` covers the token
  window ``[k*S, min(k*S + chunk_tokens, n))``;
- ``n_chunks = 1`` when ``n <= chunk_tokens`` else
  ``1 + ceil((n - chunk_tokens) / S)`` — the last chunk is allowed to
  be short, never empty, and every token is covered;
- ``chunk_text`` is the window's tokens re-joined with single spaces
  (byte-exact for single-space text, the corpus convention).

Embarrassingly parallel: one stateless ``map_batches`` pass, NO
shuffle, no broadcast state. Fully vectorized — per-batch chunk
geometry is integer arithmetic, and the window gather is one
``np.repeat``/cumsum index build + one Arrow ``take`` + ListArray
re-join (no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from medea_ray.engine.arrow_util import as_array as _as_array


def chunk_batch(
    texts,
    chunk_tokens: int,
    overlap: int,
) -> tuple[np.ndarray, pa.Table]:
    """Pure kernel: text column → (doc row index per chunk, table of
    (chunk_id, n_chunk_tokens, chunk_text))."""
    S = chunk_tokens - overlap
    texts = pc.fill_null(_as_array(texts), "")
    la = _as_array(pc.split_pattern(texts, " "))
    cnts = pc.list_value_length(la).to_numpy().astype(np.int64)
    flat = pc.cast(_as_array(la.flatten()), pa.string())
    offsets = np.concatenate([np.zeros(1, np.int64), np.cumsum(cnts)])

    over = np.maximum(cnts - chunk_tokens, 0)
    n_chunks = 1 + (over + S - 1) // S
    chunk_doc = np.repeat(np.arange(len(cnts), dtype=np.int64), n_chunks)
    chunk_offsets = np.concatenate([np.zeros(1, np.int64), np.cumsum(n_chunks)])
    total = int(chunk_offsets[-1])
    k = np.arange(total, dtype=np.int64) - np.repeat(chunk_offsets[:-1], n_chunks)
    start = k * S
    end = np.minimum(start + chunk_tokens, cnts[chunk_doc])
    sizes = end - start
    # gather indices into the flat word array: one repeat/cumsum build
    out_off = np.concatenate([np.zeros(1, np.int64), np.cumsum(sizes)])
    idx = np.arange(out_off[-1], dtype=np.int64) - np.repeat(out_off[:-1], sizes)
    idx += np.repeat(offsets[chunk_doc] + start, sizes)
    words = flat.take(pa.array(idx, pa.int64()))
    # large_list: chunk output re-expands overlapped tokens, so int64
    # offsets keep giant batches safe
    text_out = pc.binary_join(
        pa.LargeListArray.from_arrays(pa.array(out_off, pa.int64()), words),
        " ",
    )
    return chunk_doc, pa.table(
        {
            "chunk_id": pa.array(k, pa.int64()),
            "n_chunk_tokens": pa.array(sizes, pa.int64()),
            "chunk_text": text_out,
        }
    )


def chunk_docs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 512,
    overlap: int = 64,
    batch_size: int = 1024,
):
    """Dataset of ``(id_col, chunk_id, n_chunk_tokens, chunk_text)`` —
    one row per overlapping window (see module docstring). Stateless,
    shuffle-free; output text volume is ``~n/(1 - overlap/chunk_tokens)``
    of the input, so size ``batch_size`` accordingly."""
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not (0 <= overlap < chunk_tokens):
        raise ValueError(
            f"0 <= overlap < chunk_tokens required, got overlap={overlap} "
            f"chunk_tokens={chunk_tokens}"
        )

    def fn(t: pa.Table) -> pa.Table:
        chunk_doc, body = chunk_batch(
            t.column(text_col), chunk_tokens=chunk_tokens, overlap=overlap
        )
        ids = _as_array(t.column(id_col)).take(pa.array(chunk_doc, pa.int64()))
        return body.add_column(0, id_col, ids)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
