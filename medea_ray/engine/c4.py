"""C4-style line-level cleaning for web corpora.

The cleaning pass of Raffel et al. 2020 (arXiv:1910.10683 §2.2, the C4
dataset): pages are filtered line by line, keeping only lines that read
like prose, and pages that lose too much are dropped entirely. Pinned
rules (the DuckDB oracle ``c4_line_clean`` replays them from scratch):

- a LINE is a ``"\\n"``-separated segment of the text;
- a line is KEPT iff it ends in a terminal punctuation mark
  (``.``, ``!``, ``?``, ``"``) AND its whitespace word count
  (single-space split arity, the tokenization pinned across
  gopher/substr/lm) is >= ``min_words_per_line`` (paper: 5);
- a DOCUMENT is KEPT iff it retains >= ``min_lines`` kept lines
  (paper: 3) AND its lowercased text does not contain
  ``"lorem ipsum"`` AND the raw text does not contain ``{`` (the
  paper's code/boilerplate tells);
- ``clean_text`` is the kept lines re-joined with ``"\\n"`` (empty
  string when nothing survives — C4 drops such pages via ``kept``).

The paper's "three-sentence span dedup" step is a separate operator
here (``substr.mask_dup_spans``); its bad-word list is out of scope.

One stateless ``map_batches`` pass, fully vectorized: one
``split_pattern``, Arrow ``ends_with`` / ``count_substring`` kernels on
the flat line array, and the flat→ListArray re-join used by
``substr._SpanMasker`` — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TERMINAL_PUNCT = (".", "!", "?", '"')


from medea_ray.engine.arrow_util import as_array as _as_array
from medea_ray.engine.arrow_util import as_filled_strings


def clean_batch(
    texts,
    min_words_per_line: int = 5,
    min_lines: int = 3,
) -> pa.Table:
    """Pure kernel: text column → (n_lines, n_kept_lines, kept,
    clean_text). Null text behaves as the empty string (1 empty line,
    0 kept, dropped)."""
    texts = as_filled_strings(texts)
    nrows = len(texts)
    la = _as_array(pc.split_pattern(texts, "\n"))
    cnts = pc.list_value_length(la).to_numpy().astype(np.int64)
    flat = pc.cast(_as_array(la.flatten()), pa.string())

    ends_ok = pc.ends_with(flat, pattern=TERMINAL_PUNCT[0])
    for p in TERMINAL_PUNCT[1:]:
        ends_ok = pc.or_(ends_ok, pc.ends_with(flat, pattern=p))
    # word count = single-space split arity (empty line counts 1 — in
    # lockstep with DuckDB len(string_split(line, ' ')))
    words = pc.add(pc.count_substring(flat, " "), 1)
    keep_line = pc.and_(
        ends_ok, pc.greater_equal(words, min_words_per_line)
    ).to_numpy(zero_copy_only=False)

    doc_idx = np.repeat(np.arange(nrows, dtype=np.int64), cnts)
    n_kept = np.bincount(doc_idx[keep_line], minlength=nrows).astype(np.int64)
    new_offsets = np.concatenate([np.zeros(1, np.int64), np.cumsum(n_kept)])
    kept_lines = flat.filter(pa.array(keep_line))
    rejoined = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(new_offsets, pa.int32()), kept_lines),
        "\n",
    )

    lower = pc.utf8_lower(texts)
    doc_ok = pc.and_(
        pc.and_(
            pa.array(n_kept >= min_lines),
            pc.invert(pc.match_substring(lower, "lorem ipsum")),
        ),
        pc.invert(pc.match_substring(texts, "{")),
    )
    return pa.table(
        {
            "n_lines": pa.array(cnts, pa.int64()),
            "n_kept_lines": pa.array(n_kept, pa.int64()),
            "kept": doc_ok,
            "clean_text": rejoined,
        }
    )


def c4_line_clean(
    ds,
    text_col: str = "text",
    id_col: str | None = None,
    min_words_per_line: int = 5,
    min_lines: int = 3,
    batch_size: int = 4096,
):
    """Dataset wrapper around :func:`clean_batch`: emits per doc
    ``(id_col?, n_lines, n_kept_lines, kept, clean_text)``. The payload
    text column is dropped from the output (downstream consumes the
    cleaned text), so nothing re-ships the raw page."""
    if min_words_per_line < 1 or min_lines < 0:
        raise ValueError(
            f"min_words_per_line >= 1 and min_lines >= 0 required, got "
            f"{min_words_per_line}/{min_lines}"
        )

    def fn(t: pa.Table) -> pa.Table:
        out = clean_batch(
            t.column(text_col),
            min_words_per_line=min_words_per_line,
            min_lines=min_lines,
        )
        if id_col is not None:
            out = out.add_column(0, id_col, _as_array(t.column(id_col)))
        return out

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
