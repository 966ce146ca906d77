"""Sequence packing (concat-and-chunk) for LLM training-data prep.

The packing step every autoregressive training pipeline runs last:
documents are concatenated in a deterministic total order (``id_col``
ascending) into one global token stream, which is then cut into
fixed-length training sequences of ``seq_len`` tokens. Each document
therefore owns the half-open token interval ``[tok_start, tok_end)`` of
the global stream and spans the sequences ``seq_first .. seq_last``
(GPT-style packing: documents straddle sequence boundaries rather than
being padded — see e.g. Brown et al. 2020 §2.1, arXiv:2005.14165).

This is a GLOBAL cumulative sum — an order-defined operator like
``window.cumulative_per_group``, but with no partition key. It is
re-expressed Ray-Data-first without a global sort:

1. **Token counts**: one ``map_batches`` pass emits ``(id, bucket,
   n_tokens)`` where ``bucket = id // bucket_width`` is a RANGE bucket
   (deterministic, data-independent). Token counts use the pinned
   whitespace tokenization (``count_substring(text, " ") + 1`` ==
   DuckDB ``len(string_split(text, ' '))``, empty string = 1 token),
   or a precomputed ``tokens_col``.
2. **Bucket offsets**: per-batch partial sums → ONE tiny
   ``groupby(bucket)`` whose result is one row per RANGE BUCKET (not
   per doc) — the only driver-side state, prefix-summed and broadcast
   once with ``ray.put``.
3. **Within-bucket cumsum**: ONE ``groupby(bucket)`` shuffle; each
   group is sorted by id, cumsummed, and shifted by its bucket's
   global offset. Group size is bounded by ``bucket_width`` (ids per
   bucket), so no hot-group risk; a loud ``max_bucket_rows`` guard
   protects against pathological id distributions.

Exactness: every accumulation is int64; the result is independent of
block layout (tests pin block-split invariance). Ids must be non-null
and unique — a duplicate or null id makes the packing order undefined,
so both raise loudly rather than producing an arbitrary layout.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_log = logging.getLogger(__name__)


from medea_ray.engine.arrow_util import as_array as _as_array


def whitespace_token_counts(texts) -> np.ndarray:
    """Pinned whitespace token count: single-space split arity
    (``count_substring + 1``; empty/null text counts as 1 token —
    identical to DuckDB ``len(string_split(COALESCE(text,''), ' '))``)."""
    t = pc.fill_null(_as_array(texts), "")
    n = pc.add(pc.count_substring(t, " "), 1)
    return pc.cast(n, pa.int64()).to_numpy()


def pack_sequences(
    ds,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    tokens_col: str | None = None,
    seq_len: int = 2048,
    bucket_width: int = 1 << 20,
    max_bucket_rows: int = 5_000_000,
):
    """Pack documents into fixed-length training sequences; returns a
    Dataset of ``(id_col, n_tokens, tok_start, tok_end, seq_first,
    seq_last)`` — all int64, exact, block-layout-independent.

    ``tokens_col`` (precomputed int counts, may be 0) takes precedence
    over ``text_col`` (whitespace-tokenized). A document with 0 tokens
    occupies the empty interval at ``tok_start`` and is assigned
    ``seq_first == seq_last == tok_start // seq_len``.

    The input is consumed once; the returned Dataset carries only the
    six integer columns, so downstream stages never re-shuffle text.
    """
    import ray

    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    if tokens_col is None and text_col is None:
        raise ValueError("one of text_col / tokens_col is required")

    def to_counts(t: pa.Table) -> pa.Table:
        ids = _as_array(t.column(id_col))
        if ids.null_count:
            raise ValueError(
                f"pack_sequences: null {id_col!r} has no packing order; "
                "filter or assign ids upstream"
            )
        idn = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        if tokens_col is not None:
            n = _as_array(t.column(tokens_col))
            if n.null_count:
                raise ValueError(f"pack_sequences: null {tokens_col!r}")
            n = pc.cast(n, pa.int64()).to_numpy(zero_copy_only=False)
            if (np.asarray(n) < 0).any():
                raise ValueError(f"pack_sequences: negative {tokens_col!r}")
        else:
            n = whitespace_token_counts(t.column(text_col))
        return pa.table(
            {
                id_col: pa.array(idn, pa.int64()),
                "bucket": pa.array(idn // np.int64(bucket_width), pa.int64()),
                "n_tokens": pa.array(np.asarray(n, np.int64), pa.int64()),
            }
        )

    toks = ds.map_batches(to_counts, batch_format="pyarrow").materialize()

    # --- bucket totals: per-batch partials -> one tiny groupby ---
    from ray.data.aggregate import Sum

    def bucket_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["bucket"]).aggregate(
            [("n_tokens", "sum"), ("bucket", "count")]
        )
        return pa.table(
            {
                "bucket": g.column("bucket"),
                "tok": g.column("n_tokens_sum"),
                "rows": g.column("bucket_count"),
            }
        )

    totals = (
        toks.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("tok", alias_name="tok"), Sum("rows", alias_name="rows"))
        .take_all()
    )  # one row per RANGE bucket — tiny by construction
    totals.sort(key=lambda r: r["bucket"])
    buckets = np.array([r["bucket"] for r in totals], np.int64)
    rows = np.array([r["rows"] for r in totals], np.int64)
    over = rows > max_bucket_rows
    if over.any():
        raise ValueError(
            f"pack_sequences: bucket(s) {buckets[over][:5].tolist()} hold "
            f"{rows[over].max()} rows > max_bucket_rows={max_bucket_rows}; "
            f"shrink bucket_width={bucket_width}"
        )
    sums = np.array([r["tok"] for r in totals], np.int64)
    offsets = np.concatenate([np.zeros(1, np.int64), np.cumsum(sums)[:-1]])
    _log.info(
        "pack_sequences: %d docs, %d tokens, %d buckets, seq_len=%d -> %d sequences",
        int(rows.sum()), int(sums.sum()), len(buckets), seq_len,
        int(-(-sums.sum() // seq_len)) if sums.sum() else 0,
    )
    bcast = ray.put((buckets, offsets))
    C = np.int64(seq_len)

    def per_bucket(t: pa.Table) -> pa.Table:
        bkeys, boffs = ray.get(bcast)
        ids = _as_array(t.column(id_col)).to_numpy(zero_copy_only=False)
        n = _as_array(t.column("n_tokens")).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, n = ids[order], n[order]
        if ids.size > 1 and (ids[1:] == ids[:-1]).any():
            dup = int(ids[1:][ids[1:] == ids[:-1]][0])
            raise ValueError(
                f"pack_sequences: duplicate {id_col!r}={dup} makes the "
                "packing order undefined; dedup upstream"
            )
        b = int(t.column("bucket")[0].as_py())
        off = boffs[np.searchsorted(bkeys, b)]
        ends = off + np.cumsum(n)
        starts = ends - n
        seq_first = starts // C
        seq_last = np.where(n > 0, (ends - 1) // C, seq_first)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "tok_start": pa.array(starts, pa.int64()),
                "tok_end": pa.array(ends, pa.int64()),
                "seq_first": pa.array(seq_first, pa.int64()),
                "seq_last": pa.array(seq_last, pa.int64()),
            }
        )

    return toks.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")
