"""Distinguishing-keyword extraction over a document corpus (the
practical tf-idf verb: keyword tagging / topic tells / index-term
selection).

Pinned semantics — for every document, the top keyword is the most
frequent term among the NON-UBIQUITOUS ones:

    candidates = tokens with df <= floor(max_df_frac * N_docs)
    winner     = max by (tf DESC, df ASC, token ASC bytewise)

This is deliberately NOT the float ``tf * ln(N/df)`` argmax. That
weight is not reproducible across engines (``ln`` is not required to
be correctly rounded, and exact cross-(tf, df) ties exist — e.g.
``2*ln(16/4) == ln(16/1)`` — whose float winners flip between numpy
and DuckDB), and a bare (tf desc) rank without the df ceiling
degenerates to stopwords. The df ceiling is the standard practical
stopword suppression (sklearn's ``max_df``); within the candidates
the (tf desc, df asc) rank IS the tf-idf order whenever tf ties, and
every comparison is integer/string-only so the driver oracle is
hash-exact. Documents whose every token is over the ceiling emit no
row (the SQL ``WHERE df <= limit`` + GROUP BY shape). Arrow's
bytewise string order equals DuckDB's binary collation for valid
UTF-8.

Two streaming passes, mirroring ``lm.train_unigram``'s shape:

1. **df**: per-batch per-doc UNIQUE tokens pre-counted → ONE
   ``groupby(token)`` integer-partial shuffle → the df map is
   collected under a LOUD ``vocab_budget`` and broadcast once
   (``ray.put``); token strings + int64 are the only exchange.
2. **per-doc top-1**: a stateless vectorized pass — tokens
   dictionary-encoded per batch, (doc, code) pair-unique for tf,
   token order ranked via one Arrow sort of the batch vocab, then a
   single integer ``np.lexsort`` picks each doc's winner. No row
   loop, no text shuffle.

Tokenization is the repo-wide ``\\S+`` convention (DuckDB
``regexp_extract_all(text, '\\S+')``). Docs with no tokens emit no row
(the SQL GROUP BY shape).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


from medea_ray.engine.arrow_util import as_array as _as_array


def _doc_tokens(t: pa.Table, text_col: str):
    """(doc row index per occurrence, flat token array) with empty
    edge tokens removed — the \\S+ convention."""
    texts = t.column(text_col)
    if pa.types.is_null(texts.type):
        texts = pc.cast(texts, pa.string())
    lists = _as_array(pc.utf8_split_whitespace(pc.fill_null(texts, "")))
    flat = _as_array(pc.list_flatten(lists))
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    doc = np.repeat(np.arange(len(t), dtype=np.int64), lens)
    real = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return doc[real], flat.filter(pa.array(real))


def document_frequencies(ds, text_col: str = "text", _with_doc_count: bool = False):
    """Dataset of ``(token, df)`` — the number of documents containing
    each token. One integer-partial groupby; the input text never
    shuffles. With ``_with_doc_count`` (internal), one extra row under
    the empty-string token carries the count of documents that have at
    least one token (the empty token cannot occur — the \\S+ split
    filters it), so N_docs rides the same exchange."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        doc, flat = _doc_tokens(t, text_col)
        if len(flat) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "df_part": pa.array([], pa.int64())}
            )
        codes = _as_array(pc.dictionary_encode(flat))
        code_np = codes.indices.to_numpy().astype(np.int64)
        vocab = codes.dictionary
        # per-doc unique (doc, code) pairs -> df partial per code
        pair = doc * np.int64(len(vocab)) + code_np
        upair = np.unique(pair)
        ucode = (upair % len(vocab)).astype(np.int64)
        dfp = np.bincount(ucode, minlength=len(vocab)).astype(np.int64)
        toks = pc.cast(vocab, pa.string())
        dfs = pa.array(dfp, pa.int64())
        if _with_doc_count:
            n_docs = int(np.unique(doc).size)
            toks = pa.concat_arrays([toks, pa.array([""], pa.string())])
            dfs = pa.concat_arrays([dfs, pa.array([n_docs], pa.int64())])
        return pa.table({"token": toks, "df_part": dfs})

    from medea_ray.engine.exchange import bucketed_group_agg

    return bucketed_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["token"],
        [("df_part", "sum", "df")],
    )


class _TopKeyword:
    """Actor-pool stage: broadcast df map materialized once per actor
    (sorted token array + aligned df ints); per batch one
    dictionary-encode + pair-unique tf + one integer lexsort."""

    def __init__(self, df_ref, text_col: str, id_col: str):
        import ray

        tokens, dfs = df_ref if isinstance(df_ref, tuple) else ray.get(df_ref)
        self._vocab = tokens          # pa.string() array, SORTED bytewise
        self._df = dfs                # aligned int64 numpy
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        id_type = t.schema.field(self.id_col).type
        schema = pa.schema(
            [
                (self.id_col, id_type),
                ("top_token", pa.string()),
                ("tf", pa.int64()),
                ("df", pa.int64()),
            ]
        )
        doc, flat = _doc_tokens(t, self.text_col)
        if len(flat) == 0 or len(self._vocab) == 0:
            # no tokens in the batch, or no candidates under the ceiling
            return schema.empty_table()
        codes = _as_array(pc.dictionary_encode(flat))
        code_np = codes.indices.to_numpy().astype(np.int64)
        vocab = pc.cast(codes.dictionary, pa.string())
        V = len(vocab)
        # tf per (doc, code): pair-unique + counts
        pair = doc * np.int64(V) + code_np
        upair, tf = np.unique(pair, return_counts=True)
        udoc = (upair // V).astype(np.int64)
        ucode = (upair % V).astype(np.int64)
        # bytewise token rank within the batch vocab (== DuckDB binary
        # collation) so the tiebreak lexsort stays integer-only
        order = pc.sort_indices(vocab).to_numpy().astype(np.int64)
        rank = np.empty(V, np.int64)
        rank[order] = np.arange(V, dtype=np.int64)
        # candidate lookup: the broadcast map holds only tokens under
        # the df ceiling — a miss means NOT A CANDIDATE, not an error
        idx = pc.index_in(vocab, value_set=self._vocab)
        is_cand_code = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        df_per_code = self._df[
            pc.fill_null(idx, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        ]
        keep = is_cand_code[ucode]
        if not keep.any():
            return schema.empty_table()
        udoc, ucode, tf = udoc[keep], ucode[keep], tf[keep]
        df_occ = df_per_code[ucode]
        # winner per doc: (doc asc, tf desc, df asc, token-rank asc)
        sel = np.lexsort((rank[ucode], df_occ, -tf, udoc))
        firsts = sel[np.concatenate([[True], udoc[sel][1:] != udoc[sel][:-1]])]
        win_doc = udoc[firsts]
        ids = _as_array(t.column(self.id_col)).take(pa.array(win_doc))
        return pa.table(
            {
                self.id_col: ids,
                "top_token": vocab.take(pa.array(ucode[firsts])),
                "tf": pa.array(tf[firsts], pa.int64()),
                "df": pa.array(df_occ[firsts], pa.int64()),
            },
            schema=schema,
        )


def top_keywords(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df_frac: float = 1.0,
    vocab_budget: int = 5_000_000,
    batch_size: int = 1024,
    concurrency=(1, 8),
):
    """Per-document distinguishing keyword: ``(id_col, top_token, tf,
    df)`` under the integer-only ranking in the module docstring, with
    candidacy limited to tokens whose df <= floor(max_df_frac * N_docs)
    (``max_df_frac=1.0`` disables the ceiling). ``ds`` is consumed
    twice (df pass + scoring pass) — pass a materialized/parquet-backed
    Dataset. Only the CANDIDATE df map is broadcast, collected under a
    LOUD ``vocab_budget``."""
    import math

    import ray

    if not (0.0 < max_df_frac <= 1.0):
        raise ValueError(f"max_df_frac in (0, 1] required, got {max_df_frac}")
    red = document_frequencies(ds, text_col, _with_doc_count=True).materialize()
    n_vocab = red.count()
    if n_vocab > vocab_budget:
        raise ValueError(
            f"tfidf: {n_vocab} distinct tokens exceed the {vocab_budget} "
            f"driver budget — pre-filter the vocabulary (e.g. drop "
            f"singletons with a df >= 2 filter) or trim upstream"
        )
    toks: list[str] = []
    dfs: list[int] = []
    n_docs = 0
    for b in red.iter_batches(batch_format="pyarrow"):
        for tok, df in zip(b.column("token").to_pylist(), b.column("df").to_pylist()):
            if tok == "":
                n_docs = int(df)
            else:
                toks.append(tok)
                dfs.append(int(df))
    limit = math.floor(max_df_frac * n_docs)
    df_np = np.asarray(dfs, np.int64)
    cand = df_np <= limit
    # sort bytewise via Arrow to match the rank convention
    tok_arr = pa.array(toks, pa.string()).filter(pa.array(cand))
    df_cand = df_np[cand]
    sidx = pc.sort_indices(tok_arr).to_numpy().astype(np.int64)
    tok_sorted = tok_arr.take(pa.array(sidx))
    df_sorted = df_cand[sidx]
    ref = ray.put((tok_sorted, df_sorted))
    return ds.map_batches(
        _TopKeyword,
        fn_constructor_kwargs=dict(df_ref=ref, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.75,
    )
