"""Corpus-wide duplicated-substring (word k-gram span) removal.

The ExactSubstr operation of Lee et al. 2021 (arXiv:2107.06499,
"Deduplicating Training Data Makes Language Models Better"): any span of
``k`` consecutive words whose exact sequence occurs at least
``min_count`` times ACROSS THE CORPUS (two docs, or twice in one doc)
is removed from every document; the surviving words are re-joined with
single spaces. The paper builds one monolithic suffix array — here the
same span semantics are re-expressed Ray-Data-first as two streaming
passes over word k-grams:

1. **Count**: each batch shingles its docs and pre-counts UNIQUE grams
   (the ``top_tokens`` explode+pre-count shape, so the exchange moves
   (gram, partial-count) rows, never one row per occurrence) → ONE
   ``groupby(gram)`` sum → grams with global count >= ``min_count``.
2. **Mask**: the duplicated-gram set is collected under a loud budget,
   broadcast once (``ray.put``), and an actor-pool stage re-shingles
   each doc, marks every start whose gram is in the set, span-unions
   the covered word indices, and re-joins the uncovered words — all
   Arrow/numpy vectorized (membership via ``pc.is_in`` against a
   per-actor cached Arrow value set; the only per-row state is integer
   index arithmetic).

Exactness: gram identity is the gram STRING (no hashing), so a span is
masked iff its word sequence literally repeats — the DuckDB oracle
(``dup_span_removal``) recomputes the whole thing from scratch. Word
splitting is single-space (``string_split(text, ' ')``), matching
``gopher.py``'s pinned tokenization.

Scale shape: the wide exchange carries per-batch-unique gram strings
with partial counts. For web-scale corpora whose gram cardinality
dwarfs the exchange budget, the documented variant is the
``uniqueness.duplicates_hashed`` two-phase digest prefilter (64-bit
gram hashes first, exact recount over candidates only); the
``max_dup_grams`` budget raises loudly rather than silently truncating,
because dropping grams would silently KEEP duplicated text.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_log = logging.getLogger(__name__)


from medea_ray.engine.arrow_util import as_array as _as_array


def _split(texts: pa.Array):
    """(counts, flat_words, offsets) for single-space word splitting.
    All-null blocks (Arrow null type) coalesce to '' like any null."""
    from medea_ray.engine.arrow_util import as_filled_strings

    la = _as_array(pc.split_pattern(as_filled_strings(texts), " "))
    cnts = pc.list_value_length(la).to_numpy().astype(np.int64)
    flat = _as_array(la.flatten())
    offsets = np.concatenate([np.zeros(1, np.int64), np.cumsum(cnts)])
    return cnts, flat, offsets


def _gram_starts(cnts: np.ndarray, offsets: np.ndarray, k: int):
    """Positions (into the flat word array) where a k-gram may start
    without crossing a document boundary."""
    total = int(offsets[-1])
    ndocs = len(cnts)
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), cnts)
    idx_in_doc = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], cnts)
    valid = idx_in_doc <= np.repeat(cnts, cnts) - k
    return np.nonzero(valid)[0], doc_idx


def _gram_ids(flat: pa.Array, starts: np.ndarray, k: int):
    """Exact per-batch gram identity via incremental pair-unique (the
    gopher.py kernel trick, WITHOUT the doc seed — corpus-wide identity):
    returns (ids per start, first-occurrence start per unique id)."""
    codes = _as_array(pc.dictionary_encode(flat)).indices.to_numpy().astype(np.int64)
    ids = codes[starts]
    firsts = None
    for j in range(1, k):
        key = (ids << np.int64(32)) | codes[starts + j]
        _, first, inv = np.unique(key, return_index=True, return_inverse=True)
        ids = np.asarray(inv).ravel().astype(np.int64)
        firsts = first
    if k == 1:
        _, firsts, inv = np.unique(ids, return_index=True, return_inverse=True)
        ids = np.asarray(inv).ravel().astype(np.int64)
    return ids, firsts


def _gram_strings(flat: pa.Array, gs: np.ndarray, k: int) -> pa.Array:
    """Space-joined gram strings for the given start positions
    (vectorized: k gathered word arrays + one binary_join_element_wise)."""
    if gs.size == 0:
        return pa.array([], pa.string())
    parts = [flat.take(pa.array(gs + j)) for j in range(k)]
    return pc.binary_join_element_wise(*[pc.cast(p, pa.string()) for p in parts], " ")


def duplicated_grams(
    ds,
    text_col: str = "text",
    k: int = 5,
    min_count: int = 2,
    batch_size: int = 4096,
    exchange: str = "string",
    candidate_budget: int = 4_000_000,
    _hash_fn=None,
):
    """Dataset of ``(gram, n)`` — word k-grams whose corpus-wide
    occurrence count is >= ``min_count``. The shuffle input is one row
    per batch-unique gram (pre-counted), not per occurrence.

    ``exchange="string"`` shuffles the gram strings themselves (exact in
    one pass). ``exchange="hashed"`` is the web-scale path (the
    ``uniqueness.duplicates_hashed`` two-phase shape): phase 1 shuffles
    only 8-byte gram digests and finds duplicate DIGESTS; phase 2
    re-counts the gram STRINGS of candidate digests only, so 64-bit
    collision false positives drop out and the string exchange shrinks
    to the (small, for mostly-unique corpora) candidate set. Results
    are identical; ``candidate_budget`` bounds the broadcast digest set
    and falls back to the exact string exchange with a log line above
    it. ``_hash_fn`` is injectable for collision tests only."""
    from ray.data.aggregate import Sum

    def batch_unique(t: pa.Table):
        """(gram strings, counts) unique within this batch."""
        cnts, flat, offsets = _split(t.column(text_col))
        starts, _doc = _gram_starts(cnts, offsets, k)
        if starts.size == 0:
            return pa.array([], pa.string()), np.empty(0, np.int64)
        ids, _ = _gram_ids(flat, starts, k)
        uniq, first, ucnt = np.unique(ids, return_index=True, return_counts=True)
        return _gram_strings(flat, starts[first], k), ucnt.astype(np.int64)

    if exchange == "string":

        def partial(t: pa.Table) -> pa.Table:
            grams, ucnt = batch_unique(t)
            return pa.table({"gram": grams, "cnt": pa.array(ucnt, pa.int64())})

        from medea_ray.engine.exchange import bucketed_group_agg

        return bucketed_group_agg(
            ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size),
            ["gram"],
            [("cnt", "sum", "n")],
        ).filter(expr=f"n >= {int(min_count)}")
    if exchange != "hashed":
        raise ValueError(f"unknown exchange {exchange!r}")

    import ray

    from medea_ray.engine.uniqueness import _hash64

    hash_fn = _hash_fn or _hash64

    def partial_hashed(t: pa.Table) -> pa.Table:
        grams, ucnt = batch_unique(t)
        h = np.asarray(hash_fn(grams)).view(np.int64) if len(grams) else np.empty(0, np.int64)
        # same digest can repeat across batch-unique grams only via
        # collision; per-batch re-group keeps the partial well-formed
        g = pa.table({"h": pa.array(h, pa.int64()), "cnt": pa.array(ucnt, pa.int64())})
        g = g.group_by(["h"]).aggregate([("cnt", "sum")])
        return pa.table({"h": g.column("h"), "cnt": g.column("cnt_sum")})

    from medea_ray.engine.exchange import bucketed_group_agg

    dup_h = bucketed_group_agg(
        ds.map_batches(partial_hashed, batch_format="pyarrow", batch_size=batch_size),
        ["h"],
        [("cnt", "sum", "n")],
    ).filter(expr=f"n >= {int(min_count)}")
    cands = [
        b.column("h").to_numpy()
        for b in dup_h.iter_batches(batch_format="pyarrow")
    ]
    cand = np.sort(np.concatenate(cands)) if cands else np.empty(0, np.int64)
    if cand.size > candidate_budget:
        _log.warning(
            "duplicated_grams: %d candidate digests exceed budget %d — "
            "falling back to the exact string exchange",
            cand.size, candidate_budget,
        )
        return duplicated_grams(
            ds, text_col, k=k, min_count=min_count,
            batch_size=batch_size, exchange="string",
        )
    _log.info("duplicated_grams: %d candidate digests (hashed phase)", cand.size)
    cand_ref = ray.put(cand)

    def partial_candidates(t: pa.Table) -> pa.Table:
        grams, ucnt = batch_unique(t)
        if len(grams) == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        c = ray.get(cand_ref)
        h = np.asarray(hash_fn(grams)).view(np.int64)
        pos = np.searchsorted(c, h)
        is_cand = (pos < c.size) & (c[np.minimum(pos, max(c.size - 1, 0))] == h) \
            if c.size else np.zeros(h.size, bool)
        keep = pa.array(is_cand)
        return pa.table({"gram": grams.filter(keep),
                         "cnt": pa.array(ucnt[is_cand], pa.int64())})

    from medea_ray.engine.exchange import bucketed_group_agg

    return bucketed_group_agg(
        ds.map_batches(partial_candidates, batch_format="pyarrow", batch_size=batch_size),
        ["gram"],
        [("cnt", "sum", "n")],
    ).filter(expr=f"n >= {int(min_count)}")


class _SpanMasker:
    """Actor-pool stage: mask every span covered by a duplicated gram.

    The broadcast gram set is materialized ONCE per actor into an Arrow
    value set (``__init__``), each ``__call__`` is pure Arrow/numpy."""

    def __init__(self, grams_ref, text_col: str, id_col: str | None, k: int):
        import ray

        self.text_col = text_col
        self.id_col = id_col
        self.k = k
        grams = ray.get(grams_ref)
        self.value_set = pa.array(sorted(grams), pa.string())

    def __call__(self, t: pa.Table) -> pa.Table:
        k = self.k
        texts = pc.fill_null(_as_array(t.column(self.text_col)), "")
        cnts, flat, offsets = _split(texts)
        total = int(offsets[-1])
        ndocs = len(t)
        starts, doc_idx = _gram_starts(cnts, offsets, k)
        covered = np.zeros(total, bool)
        if starts.size and len(self.value_set):
            ids, firsts = _gram_ids(flat, starts, k)
            uniq, first_pos = np.unique(ids, return_index=True)
            grams = _gram_strings(flat, starts[first_pos], k)
            is_dup_u = pc.is_in(grams, value_set=self.value_set).to_numpy(
                zero_copy_only=False
            )
            dup_ids = np.zeros(int(uniq.size), bool)
            dup_ids[:] = is_dup_u
            dup_occ = starts[dup_ids[ids]]
            for j in range(k):
                covered[dup_occ + j] = True
        kept = ~covered
        # rebuild per-doc cleaned text: ListArray over the kept words with
        # recomputed offsets, then one binary_join per row
        kept_counts = np.bincount(doc_idx[kept], minlength=ndocs).astype(np.int64) \
            if total else np.zeros(ndocs, np.int64)
        new_offsets = np.concatenate([np.zeros(1, np.int64), np.cumsum(kept_counts)])
        kept_words = flat.filter(pa.array(kept)) if total else flat
        # int32 offsets: per-batch word counts are far below 2^31
        la = pa.ListArray.from_arrays(
            pa.array(new_offsets, pa.int32()), pc.cast(kept_words, pa.string())
        )
        clean = pc.binary_join(la, " ")
        cols: dict = {}
        if self.id_col is not None:
            cols[self.id_col] = t.column(self.id_col)
        cols["n_words"] = pa.array(cnts, pa.int64())
        cols["n_covered"] = pa.array(
            np.bincount(doc_idx[covered], minlength=ndocs).astype(np.int64)
            if total else np.zeros(ndocs, np.int64),
            pa.int64(),
        )
        cols["clean_text"] = clean
        return pa.table(cols)


def mask_dup_spans(
    ds,
    text_col: str = "text",
    id_col: str | None = None,
    k: int = 5,
    min_count: int = 2,
    batch_size: int = 4096,
    concurrency=(1, 8),
    max_dup_grams: int = 4_000_000,
    exchange: str = "string",
):
    """ExactSubstr-style dedup: remove every k-word span that occurs
    >= ``min_count`` times corpus-wide; emit per doc ``(id, n_words,
    n_covered, clean_text)``.

    ``max_dup_grams`` bounds the broadcast set LOUDLY (silently capping
    would silently keep duplicated text). ``ds`` is re-consumed per
    pass — twice with ``exchange="string"`` (count + mask), three times
    with ``exchange="hashed"`` (digest count + candidate recount +
    mask, four if the candidate-budget fallback re-runs the string
    count) — so pass a materialized/parquet-backed Dataset, not an
    expensive lazy chain. ``exchange="hashed"`` selects the two-phase
    digest-prefilter count pass (see ``duplicated_grams``).
    """
    import ray

    dup = duplicated_grams(ds, text_col, k=k, min_count=min_count,
                           batch_size=batch_size, exchange=exchange)
    grams: list[str] = []
    for b in dup.iter_batches(batch_format="pyarrow"):
        grams.extend(b.column("gram").to_pylist())
        if len(grams) > max_dup_grams:
            raise ValueError(
                f"mask_dup_spans: duplicated-gram set exceeds "
                f"max_dup_grams={max_dup_grams}; raise the budget or use the "
                f"duplicates_hashed digest-prefilter variant (see module doc)"
            )
    _log.info("mask_dup_spans: %d duplicated %d-grams (min_count=%d)",
              len(grams), k, min_count)
    ref = ray.put(set(grams))
    return ds.map_batches(
        _SpanMasker,
        fn_constructor_kwargs=dict(
            grams_ref=ref, text_col=text_col, id_col=id_col, k=k
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.75,
    )
