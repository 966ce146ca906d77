"""Gopher-style repetition / quality signals over a text column.

Implements the repetition-removal family of filters from the Gopher
dataset pipeline (Rae et al. 2021, arXiv:2112.11446, Table A1 — the
MassiveWeb quality heuristics), the standard scrub every web-scale
training-data pipeline runs alongside dedup/decontamination:

- ``top{n}_chars`` (n = 2, 3, 4): characters attributable to the most
  repeated word n-gram — ``max(count * gram_char_len)`` over the doc's
  n-grams. A pure integer, so the metric is invariant to which gram
  attains the max (no tie-break needed; the paper's "fraction of
  characters in the most frequent n-gram" divides this by the doc's
  char count).
- ``dup{n}_chars`` (n = 5..10): characters covered by the UNION of all
  occurrences of within-doc duplicated n-grams (count >= 2) — the
  paper's "fraction of characters inside duplicate n-grams", with
  overlap counted once (span union over word indices, word characters
  only; inter-word separators are not attributed).
- duplicate line / paragraph stats (``dup_line_stats``): occurrences
  beyond the first of a repeated line (resp. paragraph), and their
  character counts.

Semantics pinned for the DuckDB oracle (`gopher_repetition_stats`):
words are ``text`` split on a single space (DuckDB ``string_split(text,
' ')``), n-gram char length = sum of word lengths + (n-1) separators
(== ``length(array_to_string(...))``), rows with null ``doc_id`` are
excluded, null text reads as ``''``.

Scale shape: everything here is per-document — one ``map_batches``
pass, no shuffle, no state. The per-batch kernel is vectorized end to
end (Arrow ``split_pattern``/``dictionary_encode`` + one
``np.unique(axis=0)`` per n over an integer gram matrix); there is no
per-row Python loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)

# Gopher Table A1 thresholds: docs whose repetition FRACTION (metric
# chars / total text chars) exceeds the value are filtered out.
GOPHER_MAX_FRAC = {
    "top2_chars": 0.20,
    "top3_chars": 0.18,
    "top4_chars": 0.16,
    "dup5_chars": 0.15,
    "dup6_chars": 0.14,
    "dup7_chars": 0.13,
    "dup8_chars": 0.12,
    "dup9_chars": 0.11,
    "dup10_chars": 0.10,
}


from medea_ray.engine.arrow_util import as_array as _as_array
from medea_ray.engine.arrow_util import as_filled_strings


def _split_words(texts: pa.Array, pattern: str = " "):
    """Split → (counts, flat_words, doc_offsets) with slice-safe offsets.

    ``flatten()`` honours the list array's own offset/length, so this is
    correct for sliced/combined chunks (``.values`` would not be)."""
    la = _as_array(pc.split_pattern(texts, pattern))
    cnts = pc.list_value_length(la).to_numpy().astype(np.int64)
    flat = _as_array(la.flatten())
    offsets = np.concatenate([np.zeros(1, np.int64), np.cumsum(cnts)])
    return cnts, flat, offsets


def repetition_kernel(
    texts: pa.Array | pa.ChunkedArray,
    top_ns=TOP_NS,
    dup_ns=DUP_NS,
) -> dict[str, np.ndarray]:
    """Per-document repetition integers for one batch of texts.

    Returns ``{"n_words": ..., "top{n}_chars": ..., "dup{n}_chars": ...}``
    (int64 arrays, one entry per input row). Null texts count as ``''``.
    """
    ns = set(top_ns) | set(dup_ns)
    if not ns or min(ns) < 2:
        # the incremental-id loop starts at bigrams; silently returning
        # zeros for n=1 would mislead — unit-level duplicates are
        # dup_line_stats' job
        raise ValueError("repetition n-gram sizes must be >= 2")
    texts = _as_array(texts)
    texts = as_filled_strings(texts)
    cnts, flat, offsets = _split_words(texts)
    ndocs = len(texts)
    total = int(offsets[-1])
    out: dict[str, np.ndarray] = {"n_words": cnts}
    for n in top_ns:
        out[f"top{n}_chars"] = np.zeros(ndocs, np.int64)
    for n in dup_ns:
        out[f"dup{n}_chars"] = np.zeros(ndocs, np.int64)
    if total == 0:
        return out

    wl = pc.utf8_length(flat).to_numpy().astype(np.int64)
    codes = _as_array(pc.dictionary_encode(flat)).indices.to_numpy().astype(np.int64)
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), cnts)
    idx_in_doc = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], cnts)
    cnt_rep = np.repeat(cnts, cnts)
    ws_cum = np.concatenate([np.zeros(1, np.int64), np.cumsum(wl)])

    # Incremental (doc, n-gram) identity: the id of the n-gram starting
    # at i extends the (n-1)-gram id at i with codes[i + n - 1], so each
    # n costs ONE int64 pair-unique (prev_id << 32 | code) instead of an
    # O(n)-wide row-unique — n-gram identities stay exact (no hashing;
    # both halves are < 2^32 within a batch by construction).
    max_n = max(set(top_ns) | set(dup_ns))
    wanted = set(top_ns) | set(dup_ns)
    # n = 1 seed: per-doc word identity
    prev_ids = np.unique(
        (doc_idx << np.int64(32)) | codes, return_inverse=True
    )[1].astype(np.int64)
    for n in range(2, max_n + 1):
        valid = idx_in_doc <= cnt_rep - n
        starts = np.nonzero(valid)[0]
        if starts.size == 0:
            break
        key = (prev_ids[starts] << np.int64(32)) | codes[starts + n - 1]
        uniq_key, first, inv, ucnt = np.unique(
            key, return_index=True, return_inverse=True, return_counts=True
        )
        if n in wanted and n in top_ns:
            gs = starts[first]
            glen = ws_cum[gs + n] - ws_cum[gs] + (n - 1)
            score = ucnt * glen
            docs_u = doc_idx[gs]
            order = np.argsort(docs_u, kind="stable")
            docs_s, score_s = docs_u[order], score[order]
            seg = np.nonzero(
                np.concatenate([[True], docs_s[1:] != docs_s[:-1]])
            )[0]
            out[f"top{n}_chars"][docs_s[seg]] = np.maximum.reduceat(score_s, seg)
        if n in wanted and n in dup_ns:
            dup_occ = starts[ucnt[inv] >= 2]
            if dup_occ.size:
                covered = np.zeros(total, bool)
                for k in range(n):
                    covered[dup_occ + k] = True
                out[f"dup{n}_chars"] += np.bincount(
                    doc_idx[covered], weights=wl[covered], minlength=ndocs
                ).astype(np.int64)
        # re-densify ids for the next extension (keep them < 2^32)
        next_ids = np.full(total, -1, np.int64)
        next_ids[starts] = inv
        prev_ids = next_ids
    return out


def dup_line_stats(
    texts: pa.Array | pa.ChunkedArray, sep: str = "\n"
) -> dict[str, np.ndarray]:
    """Duplicate-line (or paragraph, ``sep='\\n\\n'``) integers per doc:

    - ``n_lines``: split segment count;
    - ``dup_lines``: occurrences beyond the first of any repeated line
      (Gopher's duplicate-line fraction numerator);
    - ``dup_line_chars``: their character count (repeat occurrences
      only, matching "fraction of characters in duplicate lines").
    """
    texts = as_filled_strings(texts)
    cnts, flat, offsets = _split_words(texts, sep)
    ndocs = len(texts)
    total = int(offsets[-1])
    if total == 0:
        z = np.zeros(ndocs, np.int64)
        return {"n_lines": cnts, "dup_lines": z, "dup_line_chars": z.copy()}
    wl = pc.utf8_length(flat).to_numpy().astype(np.int64)
    codes = _as_array(pc.dictionary_encode(flat)).indices.to_numpy().astype(np.int64)
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), cnts)
    pair = np.empty((total, 2), np.int64)
    pair[:, 0] = doc_idx
    pair[:, 1] = codes
    uniq, first, ucnt = np.unique(pair, axis=0, return_index=True, return_counts=True)
    excess = ucnt - 1
    dup_lines = np.bincount(uniq[:, 0], weights=excess, minlength=ndocs).astype(np.int64)
    dup_chars = np.bincount(
        uniq[:, 0], weights=excess * wl[first], minlength=ndocs
    ).astype(np.int64)
    return {"n_lines": cnts, "dup_lines": dup_lines, "dup_line_chars": dup_chars}


def repetition_stats(
    ds,
    text_col: str = "text",
    id_col: str | None = None,
    top_ns=TOP_NS,
    dup_ns=DUP_NS,
    batch_size: int = 4096,
):
    """Dataset → per-doc repetition integers (one stateless map_batches
    pass; see module docstring for the column contract). Emits
    ``n_text_chars`` (utf8 length of the null-coalesced text) as the
    fraction denominator alongside the raw integers."""

    def fn(t: pa.Table) -> pa.Table:
        texts = as_filled_strings(t.column(text_col))
        rep = repetition_kernel(texts, top_ns, dup_ns)
        cols: dict[str, pa.Array] = {}
        if id_col is not None:
            cols[id_col] = t.column(id_col)
        # int64 to match the oracle's BIGINT length() (utf8_length is int32)
        cols["n_text_chars"] = pc.cast(pc.utf8_length(texts), pa.int64())
        for k, v in rep.items():
            cols[k] = pa.array(v, pa.int64())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def flag_repetitive(
    ds,
    thresholds: dict[str, float] | None = None,
    denom_col: str = "n_text_chars",
    out_col: str = "repetitive",
):
    """Add a boolean ``repetitive`` column to a ``repetition_stats``
    output: TRUE when ANY metric's char fraction exceeds its Gopher
    threshold (docs a Gopher-style pipeline would drop). Zero-char docs
    are never flagged (no denominator)."""
    th = GOPHER_MAX_FRAC if thresholds is None else thresholds

    def fn(t: pa.Table) -> pa.Table:
        denom = t.column(denom_col).to_numpy().astype(np.float64)
        flag = np.zeros(len(t), bool)
        ok = denom > 0
        for col, mx in th.items():
            v = t.column(col).to_numpy().astype(np.float64)
            flag[ok] |= v[ok] / denom[ok] > mx
        return t.append_column(out_col, pa.array(flag))

    return ds.map_batches(fn, batch_format="pyarrow")
