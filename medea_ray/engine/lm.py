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
import re
from collections import Counter

import numpy as np
import pyarrow as pa

_TOKEN_RE = re.compile(r"\S+")


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
        c: Counter[str] = Counter()
        for s in t.column(text_col):
            v = s.as_py()
            if v is not None:
                c.update(_TOKEN_RE.findall(v))
        if not c:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        toks, ns = zip(*c.items())
        return pa.table(
            {"token": pa.array(toks, pa.string()),
             "n": pa.array(ns, pa.int64())}
        )

    reduced = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .sum("n")
    )
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
    """Actor-pool stage: fetches the broadcast model once per actor."""

    def __init__(self, model_ref, text_col: str, id_col: str):
        import ray

        self.model = (
            model_ref if isinstance(model_ref, UnigramLM) else ray.get(model_ref)
        )
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
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
        n_tok, n_oov, s_cnt, alp = [], [], [], []
        for s in t.column(self.text_col):
            v = s.as_py()
            toks = [] if v is None else _TOKEN_RE.findall(v)
            a, b, c = self.model.token_evidence(toks)
            n_tok.append(a)
            n_oov.append(b)
            s_cnt.append(c)
            alp.append(self.model.avg_logprob(toks))
        alp_arr = np.asarray(alp, dtype=np.float64)
        return pa.table(
            {
                self.id_col: t.column(self.id_col),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_oov": pa.array(n_oov, pa.int64()),
                "sum_tok_count": pa.array(s_cnt, pa.int64()),
                "avg_logprob": pa.array(alp_arr),
                "perplexity": pa.array(np.exp(-alp_arr)),
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
