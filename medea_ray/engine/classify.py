"""Multinomial Naive Bayes text classification — the "quality
classifier" verb of large-scale corpus pipelines (GPT-3's
high-quality-reference classifier, Brown et al. 2020 appendix A;
CCNet's LM filter cousin, arXiv:1911.00359): train a cheap linear
classifier on a small labeled set, score every document, keep or
bucket by predicted class. The reference (juspay/medea) is a
single-document validation library; this operator comes from the
brief's training-data-pipeline surface next to engine/lm.py.

Design (mirrors lm.py so every accumulation is an exact integer):

- ``train_nb``: per-(label, token) occurrence counts over the labeled
  corpus — per-batch Arrow ``value_counts`` partials keyed by
  ``label + "\\x00" + token`` ride ONE ``groupby(key)`` shuffle of
  integer partials, so the model is bit-identical however Ray blocks
  the input. Per-label document counts (the priors) travel in the
  same exchange under a reserved key prefix. The reduced model is
  collected under a LOUD ``vocab_budget``.
- ``NaiveBayesModel``: add-one (Laplace) multinomial NB —
  ``p(tok|c) = (count_c(tok) + 1) / (total_c + V)`` over the training
  vocab ``V`` (the sklearn MultinomialNB convention with alpha=1);
  tokens outside the vocab are ignored for scoring and reported as
  ``n_oov`` evidence. Priors are document-count fractions.
- ``classify``: broadcast the model once per actor, one vectorized
  pass per batch (``index_in`` + cumsum segment sums — no row loop)
  emitting per-document INTEGER evidence a SQL oracle can recompute
  exactly — ``n_tokens``, ``n_oov``, ``sum_cnt_<label>`` (sum of the
  label's training counts over the doc's in-vocab occurrences) — plus
  ``pred_label`` (argmax of the NB log-posterior; exact ties resolve
  to the lexicographically smallest label) and the float ``margin``
  (top-vs-second log-posterior gap) for threshold-style filtering.

Scale shape (100 TB): the only exchange is the (label-token,
partial-count) groupby — key strings + int64, never documents. The
model ships through the object store once; scoring never shuffles.
Tokenization is the repo-wide ``\\S+`` convention (DuckDB
``regexp_extract_all(text, '\\S+')``).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_DOC_KEY = "\x01DOCS\x00"  # reserved prior-count key prefix


class NaiveBayesModel:
    """Frozen multinomial NB: sorted labels, integer counts, add-one
    smoothing over the training vocab."""

    def __init__(self, counts: dict[str, dict[str, int]], doc_counts: dict[str, int]):
        if not doc_counts:
            raise ValueError("NaiveBayesModel: no training documents")
        self.labels = sorted(doc_counts)
        self.doc_counts = dict(doc_counts)
        self.counts = {l: dict(counts.get(l, {})) for l in self.labels}
        vocab = set()
        for c in self.counts.values():
            vocab.update(c)
        self.vocab = sorted(vocab)
        self.vocab_size = len(self.vocab)
        self.totals = {l: sum(c.values()) for l, c in self.counts.items()}
        n_docs = sum(self.doc_counts.values())
        self.log_priors = {
            l: math.log(self.doc_counts[l] / n_docs) for l in self.labels
        }

    def doc_log_posterior(self, tokens: list[str], label: str) -> float:
        """Driver-side reference scorer (tests): ln prior + sum over
        in-vocab occurrences of ln((c+1)/(total+V))."""
        c = self.counts[label]
        denom = math.log(self.totals[label] + self.vocab_size)
        lp = self.log_priors[label]
        vocab = set(self.vocab)
        for t in tokens:
            if t in vocab:
                lp += math.log(c.get(t, 0) + 1) - denom
        return lp


def train_nb(
    ds,
    text_col: str = "text",
    label_col: str = "label",
    vocab_budget: int = 5_000_000,
) -> NaiveBayesModel:
    """Exact per-(label, token) counts + per-label doc counts over the
    labeled corpus; one integer-partial groupby shuffle. Labels must be
    non-null strings without NUL bytes (raise, never coerce)."""

    def partial(t: pa.Table) -> pa.Table:
        keys: list[pa.Array] = []
        ns: list[pa.Array] = []
        labels = t.column(label_col)
        if isinstance(labels, pa.ChunkedArray):
            labels = labels.combine_chunks()
        if labels.null_count or pa.types.is_null(labels.type):
            raise ValueError(f"train_nb: null {label_col!r}")
        if not pa.types.is_string(labels.type):
            raise ValueError(
                f"train_nb: {label_col!r} must be string, got {labels.type}"
            )
        uniq = pc.unique(labels)
        for lbl in uniq.to_pylist():
            if "\x00" in lbl:
                raise ValueError(f"train_nb: NUL byte in label {lbl!r}")
            rows = t.filter(pc.equal(labels, lbl))
            texts = pc.drop_null(rows.column(text_col))
            keys.append(pa.array([_DOC_KEY + lbl], pa.string()))
            ns.append(pa.array([len(rows)], pa.int64()))
            if len(texts) == 0 or pa.types.is_null(texts.type):
                continue
            flat = pc.list_flatten(pc.utf8_split_whitespace(texts))
            flat = flat.filter(pc.not_equal(flat, ""))
            if len(flat) == 0:
                continue
            vc = flat.value_counts()
            if isinstance(vc, pa.ChunkedArray):
                vc = vc.combine_chunks()
            keys.append(
                pc.binary_join_element_wise(
                    lbl + "\x00", pc.cast(vc.field("values"), pa.string()), ""
                )
            )
            ns.append(pc.cast(vc.field("counts"), pa.int64()))
        if not keys:
            return pa.table(
                {"key": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        return pa.table(
            {"key": pa.concat_arrays(keys), "n": pa.concat_arrays(ns)}
        )

    # materialize: the reduced (key, n) table is consumed twice (budget
    # count + take_all) — without it the corpus tokenize + groupby
    # shuffle would re-execute for each consumption
    from medea_ray.engine.exchange import bucketed_group_agg

    reduced = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["key"],
        [("n", "sum", "sum(n)")],
    ).materialize()
    n_keys = reduced.count()
    if n_keys > vocab_budget:
        raise ValueError(
            f"train_nb: {n_keys} (label, token) keys exceed the "
            f"{vocab_budget} driver budget — shrink the labeled set or "
            f"pre-trim the vocabulary"
        )
    counts: dict[str, dict[str, int]] = {}
    doc_counts: dict[str, int] = {}
    for r in reduced.take_all():
        key, n = r["key"], int(r["sum(n)"])
        if key.startswith(_DOC_KEY):
            doc_counts[key[len(_DOC_KEY):]] = n
        else:
            lbl, tok = key.split("\x00", 1)
            counts.setdefault(lbl, {})[tok] = n
    return NaiveBayesModel(counts, doc_counts)


class _Classifier:
    """Actor-pool stage: model materialized once per actor into a
    vocab array + per-label count/log-prob matrices; each batch is one
    ``index_in`` + k vectorized gathers + segment sums."""

    def __init__(self, model_ref, text_col: str, id_col: str):
        import ray

        m = model_ref if isinstance(model_ref, NaiveBayesModel) else ray.get(model_ref)
        self.model = m
        self.text_col = text_col
        self.id_col = id_col
        self._vocab = pa.array(m.vocab, pa.string())
        k, V = len(m.labels), m.vocab_size
        self._cnt = np.zeros((k, V), np.int64)
        for i, l in enumerate(m.labels):
            c = m.counts[l]
            for j, tok in enumerate(m.vocab):
                n = c.get(tok)
                if n:
                    self._cnt[i, j] = n
        denom = np.array(
            [math.log(m.totals[l] + V) for l in m.labels], np.float64
        )
        self._logp = np.log(self._cnt + 1.0) - denom[:, None]
        self._log_priors = np.array(
            [m.log_priors[l] for l in m.labels], np.float64
        )
        self._labels = np.array(m.labels, dtype=object)

    def __call__(self, t: pa.Table) -> pa.Table:
        m = self.model
        id_type = t.schema.field(self.id_col).type
        fields = [
            (self.id_col, id_type),
            ("n_tokens", pa.int64()),
            ("n_oov", pa.int64()),
        ]
        fields += [(f"sum_cnt_{l}", pa.int64()) for l in m.labels]
        fields += [("pred_label", pa.string()), ("margin", pa.float64())]
        schema = pa.schema(fields)
        if t.num_rows == 0:
            return schema.empty_table()
        texts = t.column(self.text_col)
        if pa.types.is_null(texts.type):
            texts = pc.cast(texts, pa.string())
        lists = pc.utf8_split_whitespace(pc.fill_null(texts, ""))
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        ends = np.cumsum(lens.astype(np.int64))
        starts = ends - lens
        real = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        if m.vocab_size:
            idx_a = pc.index_in(flat, value_set=self._vocab)
            in_vocab = pc.is_valid(idx_a).to_numpy(zero_copy_only=False)
            idx = pc.fill_null(idx_a, 0).to_numpy(zero_copy_only=False)
        else:
            in_vocab = np.zeros(len(flat), dtype=bool)
            idx = np.zeros(len(flat), dtype=np.int64)
        use = real & in_vocab

        def segsum(vals):
            cs = np.concatenate([[0], np.cumsum(vals)])
            return cs[ends] - cs[starts]

        n_tok = segsum(real.astype(np.int64))
        n_oov = segsum((real & ~in_vocab).astype(np.int64))
        cols = {self.id_col: t.column(self.id_col)}
        cols["n_tokens"] = pa.array(n_tok, pa.int64())
        cols["n_oov"] = pa.array(n_oov, pa.int64())
        lps = np.empty((len(m.labels), t.num_rows), np.float64)
        for i, l in enumerate(m.labels):
            cols[f"sum_cnt_{l}"] = pa.array(
                segsum(np.where(use, self._cnt[i][idx], 0)), pa.int64()
            )
            lps[i] = self._log_priors[i] + segsum(
                np.where(use, self._logp[i][idx], 0.0)
            )
        best = np.argmax(lps, axis=0)  # first max wins = smallest label
        srt = np.sort(lps, axis=0)
        margin = (
            srt[-1] - srt[-2] if len(m.labels) > 1
            else np.full(t.num_rows, np.inf)
        )
        cols["pred_label"] = pa.array(self._labels[best], pa.string())
        cols["margin"] = pa.array(margin, pa.float64())
        return pa.table(cols, schema=schema)


def classify(
    ds,
    model: NaiveBayesModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_size: int = 1024,
    concurrency=(1, 8),
):
    """Per-document NB evidence + prediction (see module docstring).
    The model ships through the object store once per actor."""
    import ray

    approx = sum(len(c) for c in model.counts.values()) * 32
    model_ref = model if approx < (1 << 20) else ray.put(model)
    return ds.map_batches(
        _Classifier,
        fn_constructor_kwargs=dict(
            model_ref=model_ref, text_col=text_col, id_col=id_col
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
