"""Distributed BPE tokenizer training + encoding.

Byte-pair-encoding subword training (Sennrich+ 2015, arXiv:1508.07909
§3.2) re-shaped for Ray Data: the only corpus-scale work is ONE
``(word, count)`` groupby exchange — per-batch Arrow ``value_counts``
partials of single-space words, summed by one ``groupby(word)``. The
merge loop then runs driver-side over the WORD-FREQUENCY table, which
is vocabulary-sized, not corpus-sized (the standard trainer shape —
HuggingFace/SentencePiece trainers do exactly this); a ``min_count``
pre-filter is applied DISTRIBUTEDLY before collection and the distinct
word count is guarded by a loud ``max_words`` budget (truncating the
vocabulary silently would bias the learned merges).

Determinism contract (pinned by the block-layout test): pair selection
is ``(count desc, pair lexicographically ascending)`` over exact
integer counts, so the learned merge list is identical for any corpus
partitioning. Words carry an explicit end-of-word symbol ``"</w>"`` as
their final initial symbol, so merges can learn word-final units; the
marker is stripped from emitted token strings.

Encoding is an actor-pool ``map_batches`` stage: the rank table is
built once per actor, each batch encodes through a word-level cache
(web text repeats words massively — the cache turns per-word merge
loops into dict hits).

The reference (juspay/medea) has no tokenizer surface; this comes from
the north rule's training-data engine scope.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from medea_ray.engine.arrow_util import as_array as _as_array
from medea_ray.engine.arrow_util import as_filled_strings

_log = logging.getLogger(__name__)

EOW = "</w>"


def word_counts(ds, text_col: str, *, min_count: int = 1, batch_size: int = 8192):
    """Exact corpus word frequencies: one groupby(word) exchange over
    per-batch Arrow value_counts partials. Null text counts as ''.
    Returns a Dataset of (word, n) with n >= min_count; empty-string
    words (from empty texts / repeated separators) are dropped — they
    tokenize to nothing."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        texts = as_filled_strings(t.column(text_col))
        flat = _as_array(_as_array(pc.split_pattern(texts, " ")).flatten())
        vc = flat.value_counts()
        if len(vc) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        words = vc.field("values")
        keep = pc.not_equal(words, "")
        return pa.table({
            "word": pc.cast(words.filter(keep), pa.string()),
            "n": vc.field("counts").filter(keep),
        })

    from medea_ray.engine.exchange import bucketed_group_agg

    out = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size),
        ["word"],
        [("n", "sum", "n")],
    )
    if min_count > 1:
        out = out.filter(expr=f"n >= {int(min_count)}")
    return out


@dataclass
class BpeModel:
    """Learned merge list (training order = rank order) + metadata."""

    merges: list  # [(a, b), ...] symbol-string pairs, rank = index
    n_words_table: int  # distinct words the trainer saw
    ranks: dict = field(default_factory=dict, repr=False)

    def __post_init__(self):
        if not self.ranks:
            self.ranks = {p: i for i, p in enumerate(self.merges)}

    def encode_word(self, word: str) -> list[str]:
        """Classic rank-greedy merge loop (merge the lowest-rank pair
        everywhere, repeat). EOW marker stripped from output tokens."""
        syms = list(word) + [EOW]
        ranks = self.ranks
        while len(syms) > 1:
            best_rank = None
            best_pair = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, (syms[i], syms[i + 1])
            if best_pair is None:
                break
            a, b = best_pair
            merged, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            syms = merged
        # Marker-derived chars only ever live in the LAST symbol (the
        # marker starts as the final symbol and merges preserve
        # position), so strip POSITIONALLY: a literal "</w>" occurring
        # in the text itself is preserved verbatim in the output and
        # round-trips (''.join(tokens) == word for every input).
        if syms and syms[-1] == EOW:
            syms = syms[:-1]
        elif syms and syms[-1].endswith(EOW):
            syms = syms[:-1] + [syms[-1][: -len(EOW)]]
        return [s for s in syms if s]


def _train_from_counts(pairs_wc: list[tuple[str, int]], num_merges: int) -> list:
    """Driver-side merge loop over the (word, count) table. Exact
    integer pair counts, deterministic (count desc, pair asc) choice,
    stops early when no pair occurs >= 2 times (merging singletons
    teaches nothing).

    Per-merge cost is proportional to the AFFECTED pairs, not the live
    pair set: counts update incrementally (entries deleted at zero) and
    the argmax is a lazy max-heap — stale heap entries are skipped by
    comparing against the current count, so (-count, pair) heap order
    realizes the (count desc, pair asc) tie-break exactly. A symbol
    equal to the "</w>" marker built from literal text chars conflates
    with the marker in pair statistics (a count-level bias on
    adversarial text; encoding round-trips regardless — see
    ``encode_word``)."""
    import heapq

    words: list[list[str]] = []
    counts: list[int] = []
    for w, c in pairs_wc:
        if w:
            words.append(list(w) + [EOW])
            counts.append(int(c))

    pair_counts: dict[tuple, int] = {}
    pair_words: dict[tuple, set] = {}
    heap: list = []

    def add_word(idx: int, sign: int):
        syms, c = words[idx], counts[idx] * sign
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            nc = pair_counts.get(p, 0) + c
            if nc:
                pair_counts[p] = nc
            else:
                pair_counts.pop(p, None)
                pair_words.pop(p, None)
            if sign > 0:
                pair_words.setdefault(p, set()).add(idx)
                if nc >= 2:
                    heapq.heappush(heap, (-nc, p))

    for idx in range(len(words)):
        add_word(idx, +1)

    merges: list = []
    for _ in range(num_merges):
        best_pair = None
        while heap:
            negc, p = heapq.heappop(heap)
            c = pair_counts.get(p, 0)
            if c < 2:
                continue  # dead or decayed below the merge floor
            if -negc == c:
                best_pair = p
                break
            heapq.heappush(heap, (-c, p))  # stale entry: requeue current
        if best_pair is None:
            break
        merges.append(best_pair)
        a, b = best_pair
        ab = a + b
        # the add_word(-1) pass zeroes best_pair's count naturally —
        # popping it here first would make the decrement go negative
        affected = sorted(pair_words.get(best_pair, set()))
        for idx in affected:
            add_word(idx, -1)
            syms, merged, i = words[idx], [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    merged.append(ab)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            words[idx] = merged
            add_word(idx, +1)
    return merges


def train_bpe(
    ds,
    text_col: str = "text",
    *,
    num_merges: int = 1000,
    min_count: int = 2,
    max_words: int = 1 << 22,
    batch_size: int = 8192,
) -> BpeModel:
    """Train BPE merges on a corpus. Corpus-scale work = the one
    word-count exchange; the merge loop runs on the collected
    (word, count) table under a loud ``max_words`` budget — raise
    ``min_count`` (applied distributedly, before collection) to shrink
    the table at web scale."""
    wc = word_counts(ds, text_col, min_count=min_count, batch_size=batch_size)
    wc = wc.materialize()
    n_distinct = wc.count()
    if n_distinct > max_words:
        raise ValueError(
            f"train_bpe: {n_distinct} distinct words (min_count="
            f"{min_count}) exceed max_words={max_words}; raise min_count "
            "or the budget (truncating the vocabulary would silently "
            "bias the merges)"
        )
    _log.info("train_bpe: %d distinct words >= min_count=%d", n_distinct, min_count)
    rows = wc.take_all()
    table = sorted((r["word"], r["n"]) for r in rows)  # layout-invariant order
    merges = _train_from_counts(table, num_merges)
    return BpeModel(merges=merges, n_words_table=n_distinct)


class BpeEncoder:
    """Actor-pool stage: per-doc token stats under a trained model.
    Emits ``(id_col, n_words, n_tokens)`` — integer-only, so outputs
    are exactly comparable across batch layouts. The per-actor word
    cache is bounded (clears at ``cache_cap`` entries)."""

    def __init__(self, model_ref, text_col: str, id_col: str, cache_cap: int = 1 << 20):
        import ray

        self.model = model_ref if isinstance(model_ref, BpeModel) else ray.get(model_ref)
        self.text_col = text_col
        self.id_col = id_col
        self.cache: dict[str, int] = {}
        self.cache_cap = cache_cap

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = as_filled_strings(t.column(self.text_col))
        la = _as_array(pc.split_pattern(texts, " "))
        cnts = pc.list_value_length(la).to_numpy().astype(np.int64)
        # the merge loop runs over per-batch UNIQUE words only
        # (dictionary_encode), then gathers back per instance
        d = _as_array(pc.dictionary_encode(_as_array(la.flatten())))
        uniq = d.dictionary.to_pylist()
        idxs = d.indices.to_numpy().astype(np.int64)
        cache, model = self.cache, self.model
        per_uniq = np.empty(len(uniq), np.int64)
        for i, w in enumerate(uniq):
            n = cache.get(w)
            if n is None:
                if len(cache) >= self.cache_cap:
                    cache.clear()
                n = cache[w] = len(model.encode_word(w))
            per_uniq[i] = n
        ntok_flat = per_uniq[idxs] if len(uniq) else np.empty(0, np.int64)
        offsets = np.concatenate([np.zeros(1, np.int64), np.cumsum(cnts)])
        n_tokens = np.add.reduceat(
            np.concatenate([ntok_flat, np.zeros(1, np.int64)]), offsets[:-1]
        )
        n_tokens[cnts == 0] = 0
        # n_words counts non-empty words (empty text splits to [''])
        empty_per_uniq = np.fromiter(
            (1 if not w else 0 for w in uniq), np.int64, count=len(uniq)
        )
        empty_flat = empty_per_uniq[idxs] if len(uniq) else np.empty(0, np.int64)
        n_empty = np.add.reduceat(
            np.concatenate([empty_flat, np.zeros(1, np.int64)]), offsets[:-1]
        )
        n_empty[cnts == 0] = 0
        n_words = cnts - n_empty
        return pa.table(
            {
                self.id_col: t.column(self.id_col),
                "n_words": pa.array(n_words),
                "n_tokens": pa.array(n_tokens),
            }
        )


def token_stats(
    ds,
    model: BpeModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    batch_size: int = 4096,
    concurrency=None,
):
    """Per-doc (n_words, n_tokens) under a trained BPE model — the
    token-budget accounting pass every training-data pipeline runs."""
    import ray

    from medea_ray.engine.pipeline import ACTOR_NUM_CPUS, default_pool

    ref = ray.put(model)
    pool = concurrency if concurrency is not None else default_pool()
    return ds.map_batches(
        BpeEncoder,
        fn_constructor_kwargs=dict(model_ref=ref, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool,
        num_cpus=ACTOR_NUM_CPUS,
    )
