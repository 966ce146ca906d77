"""N-gram language-model scoring for corpus quality filtering — the
CCNet verb (Wenzek et al., arXiv:1911.00359: score web documents by LM
perplexity, keep the low-perplexity tail). The reference (juspay/medea)
is a single-document validation library with no corpus operators; this
comes from the brief's training-data-pipeline surface next to
text.quality_features.

Design:
- ``train_unigram``: EXACT integer token counts over a (usually
  hash-sampled) training corpus. Tokenization is the repo-wide ``\\S+``
  convention (matches DuckDB ``regexp_extract_all(text, '\\S+')``, see
  text.token_count_ws). Per-batch Counter partials emit (token, n)
  rows pre-aggregated, ONE groupby(token) shuffle of integer partials
  reduces them — counts are order-independent integer sums, so the
  model is bit-identical however Ray blocks the corpus.
- ``UnigramLM``: add-one smoothing over the trained vocab plus a
  single OOV bucket: p(tok) = (c(tok)+1) / (total + V + 1). Integer
  numerator/denominator, so per-token log-probs are deterministic
  float64 of integers.
- ``score``: broadcast the model once (object store), one actor-pool
  map pass emits per-document INTEGER evidence (n_tokens, n_oov,
  sum_tok_count — exactly what a SQL oracle can recompute) plus the
  float avg_logprob / perplexity derived from it.

Scale shape (100 TB): the only exchange is the (token, partial-count)
groupby (token strings + int64, never documents). The driver holds the
final vocab under a LOUD ``vocab_budget`` guard — for web-scale vocabs
cap with ``max_vocab`` (deterministic (count desc, token asc) trim; the
Misra-Gries sketch in stats.heavy_hitters is the documented
approximate alternative when even the trimmed exact pass is too wide).
Scoring never shuffles: the model rides the object store to each actor
once.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


class UnigramLM:
    """Frozen unigram model: integer counts, add-one smoothing, one OOV
    bucket. ``logprob(tok) = ln((c+1) / (total + V + 1))``."""

    def __init__(self, counts: dict[str, int]):
        self.counts = counts
        self.total = sum(counts.values())
        self.vocab_size = len(counts)
        self._denom = self.total + self.vocab_size + 1

    def token_evidence(self, tokens: list[str]) -> tuple[int, int, int]:
        """(n_tokens, n_oov, sum of model counts over occurrences) —
        the integer triple a SQL oracle can recompute exactly."""
        n_oov = 0
        s = 0
        get = self.counts.get
        for t in tokens:
            c = get(t, 0)
            if c == 0:
                n_oov += 1
            s += c
        return len(tokens), n_oov, s

    def avg_logprob(self, tokens: list[str]) -> float:
        if not tokens:
            return float("nan")
        get = self.counts.get
        d = math.log(self._denom)
        return sum(math.log(get(t, 0) + 1) - d for t in tokens) / len(tokens)


def train_unigram(
    ds,
    text_col: str = "text",
    max_vocab: int | None = None,
    vocab_budget: int = 5_000_000,
) -> UnigramLM:
    """Exact unigram counts over ``ds[text_col]``. One integer-partial
    groupby(token) shuffle; the reduced vocab is collected to the driver
    under ``vocab_budget`` (loud failure, never silent truncation).
    ``max_vocab`` keeps the most frequent tokens with the deterministic
    (count desc, token asc) order."""

    def partial(t: pa.Table) -> pa.Table:
        # vectorized tokenize+count: Arrow's whitespace split matches the
        # \S+ convention except for the empty edge tokens it emits on
        # leading/trailing whitespace — filtered below
        import pyarrow.compute as pc

        empty = pa.table(
            {"token": pa.array([], pa.string()),
             "n": pa.array([], pa.int64())}
        )
        col = pc.drop_null(t.column(text_col))
        if len(col) == 0 or pa.types.is_null(col.type):
            # all-null blocks degrade the column to null type, which the
            # split kernel rejects
            return empty
        flat = pc.list_flatten(pc.utf8_split_whitespace(col))
        flat = flat.filter(pc.not_equal(flat, ""))
        if len(flat) == 0:
            return empty
        vc = flat.value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table(
            {"token": vc.field("values"),
             "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    # materialize: the reduced (token, n) table is consumed twice
    # (budget count + take_all) — without it the whole corpus tokenize
    # + groupby shuffle would re-execute for each consumption
    from medea_ray.engine.exchange import bucketed_group_agg

    reduced = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["token"],
        [("n", "sum", "sum(n)")],
    ).materialize()
    n_vocab = reduced.count()
    if n_vocab > vocab_budget:
        raise ValueError(
            f"unigram vocab has {n_vocab} entries, over the "
            f"{vocab_budget} driver budget — pass max_vocab (exact trim) "
            f"or use stats.heavy_hitters for an approximate model"
        )
    rows = reduced.take_all()
    counts = {r["token"]: int(r["sum(n)"]) for r in rows}
    if max_vocab is not None and len(counts) > max_vocab:
        keep = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        counts = dict(keep[:max_vocab])
    return UnigramLM(counts)


class _Scorer:
    """Actor-pool stage: fetches the broadcast model once per actor and
    pre-builds the Arrow vocab/count arrays (once, not per batch). The
    per-batch kernel is fully vectorized: whitespace split →
    ``index_in`` against the vocab → cumsum-based segment sums per
    document (empty edge tokens masked out, see train partial)."""

    def __init__(self, model_ref, text_col: str, id_col: str):
        import ray

        self.model = (
            model_ref if isinstance(model_ref, UnigramLM) else ray.get(model_ref)
        )
        self.text_col = text_col
        self.id_col = id_col
        toks = list(self.model.counts.keys())
        self._vocab = pa.array(toks, pa.string())
        self._counts = np.asarray(
            [self.model.counts[t] for t in toks], dtype=np.int64
        )
        self._log_denom = math.log(self.model._denom)

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        id_type = t.schema.field(self.id_col).type
        schema = pa.schema(
            [
                (self.id_col, id_type),
                ("n_tokens", pa.int64()),
                ("n_oov", pa.int64()),
                ("sum_tok_count", pa.int64()),
                ("avg_logprob", pa.float64()),
                ("perplexity", pa.float64()),
            ]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        texts = t.column(self.text_col)
        if pa.types.is_null(texts.type):  # all-null block
            texts = pc.cast(texts, pa.string())
        texts = pc.fill_null(texts, "")
        lists = pc.utf8_split_whitespace(texts)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        ends = np.cumsum(lens.astype(np.int64))
        starts = ends - lens
        real = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        if self.model.vocab_size:
            idx = pc.index_in(flat, value_set=self._vocab)
            in_vocab = pc.is_valid(idx).to_numpy(zero_copy_only=False)
            cnt = self._counts[
                pc.fill_null(idx, 0).to_numpy(zero_copy_only=False)
            ]
            cnt = np.where(in_vocab, cnt, 0)
        else:
            in_vocab = np.zeros(len(flat), dtype=bool)
            cnt = np.zeros(len(flat), dtype=np.int64)

        def segsum(vals):
            cs = np.concatenate([[0], np.cumsum(vals)])
            return cs[ends] - cs[starts]

        n_tok = segsum(real.astype(np.int64))
        n_oov = segsum((real & ~in_vocab).astype(np.int64))
        s_cnt = segsum(np.where(real, cnt, 0))
        logp = np.where(real, np.log(cnt + 1.0) - self._log_denom, 0.0)
        with np.errstate(invalid="ignore"):
            alp = np.where(
                n_tok > 0, segsum(logp) / np.maximum(n_tok, 1), np.nan
            )
        return pa.table(
            {
                self.id_col: t.column(self.id_col),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_oov": pa.array(n_oov, pa.int64()),
                "sum_tok_count": pa.array(s_cnt, pa.int64()),
                "avg_logprob": pa.array(alp),
                "perplexity": pa.array(np.exp(-alp)),
            },
            schema=schema,
        )


def score(
    ds,
    model: UnigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_size: int = 1024,
    concurrency=(1, 8),
):
    """Per-document LM evidence: integer (n_tokens, n_oov,
    sum_tok_count) plus avg_logprob / perplexity. The model is shipped
    through the object store once and read per actor, never per
    batch."""
    import ray

    approx = len(model.counts) * 32
    model_ref = model if approx < (1 << 20) else ray.put(model)
    return ds.map_batches(
        _Scorer,
        fn_constructor_kwargs=dict(
            model_ref=model_ref, text_col=text_col, id_col=id_col
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
