"""Composed pretraining corpus-prep pipeline.

The end-to-end chain a web-scale training-data run executes, composed
from the engine's individually-oracled stages (each stage's exact
semantics are pinned by its own module's tests/oracles — this module
adds only the composition and its per-stage accounting):

  1. C4 line-level cleaning       (c4.clean_batch kernel)
  2. Gopher repetition filter     (gopher.repetition_kernel + Table A1
                                   char-fraction thresholds)
  3. exact dedup, keep-first      (dedup.dedup_exact — digest exchange,
                                   text never shuffled)
  4. 13-gram benchmark decontam   (decontam.decontaminate_ngrams)
  5. domain-mixture re-sampling   (sampling.mixture_sample)
  6. BPE train + token accounting (bpe.train_bpe / token_stats)

Scale shape — the full corpus is materialized exactly TWICE end to end
(the two multi-consumption boundaries), never per stage:

- Stages 1–2 are adjacent stateless filters, fused into ONE
  ``map_batches`` pass; their per-stage survivor counts ride along as
  one tiny counter row per batch (the integer-partial pattern of
  ``engine/infer.py``) instead of a ``materialize().count()`` each.
- Materialization #1 (post-Gopher) feeds dedup, which consumes its
  input twice (digest groupby + anti-filter) — both re-scans of the
  materialized blocks.
- The dedup survivor count is derived arithmetically from the dropped
  id-set cardinality (``stats_out``; exact under dedup_exact's
  documented unique-``id_col`` precondition) so the dedup→decontam leg
  stays one streaming pass.
- Materialization #2 (post-decontam) feeds the mixture sampler, which
  consumes its input twice (source-count pass + filter pass — its
  documented double-consumption contract).
- The mixture output (already shrunk to ~``target_rows``) is
  materialized for the BPE trainer's two passes and returned.

Only ids/digests/gram sets ever cross an exchange; the text column
moves exclusively through stateless map_batches stages.

The reference (juspay/medea) has no corpus surface; this composition
is the north rule's training-data engine scope end-to-end.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from medea_ray.engine.arrow_util import as_array as _as_array
from medea_ray.engine.arrow_util import as_filled_strings

_log = logging.getLogger(__name__)

# sidecar column carrying the per-batch (n_in, n_after_c4,
# n_after_gopher) integer partials; null on every survivor row
_COUNTS_COL = "_pp_counts"


def prepare_corpus(
    ds,
    bench_ds,
    *,
    id_col: str = "url",
    text_col: str = "text",
    source_col: str = "lang",
    target_rows: int,
    temperature: float = 0.7,
    mixture_weights: dict | None = None,
    ngram_n: int = 13,
    min_words_per_line: int = 5,
    min_lines: int = 3,
    gopher_thresholds: dict | None = None,
    bpe_merges: int = 200,
    bpe_min_count: int = 2,
    batch_size: int = 4096,
    artifacts_out: dict | None = None,
):
    """Run the six-stage pretraining prep over ``ds`` (columns
    ``id_col``, ``source_col``, ``text_col``); ``bench_ds`` is the
    evaluation suite to decontaminate against (its ``text_col``).

    ``id_col`` must be unique per row (dedup_exact's keep-one
    precondition; the dedup survivor count is derived from the dropped
    id-set cardinality).

    Returns ``(corpus, report)``: the surviving ``(id, source, text)``
    Dataset (cleaned text, materialized) and an integer report with
    per-stage survivor counts plus the final token accounting."""
    from medea_ray.engine import bpe as _bpe
    from medea_ray.engine import dedup as _dedup
    from medea_ray.engine import decontam as _decontam
    from medea_ray.engine import sampling as _sampling
    from medea_ray.engine.c4 import clean_batch
    from medea_ray.engine.gopher import GOPHER_MAX_FRAC, repetition_kernel

    th = GOPHER_MAX_FRAC if gopher_thresholds is None else gopher_thresholds

    # Stages 1+2 fused: C4 line cleaning (keep docs passing the
    # line/doc rules; text becomes the kept-lines re-join) then the
    # Gopher repetition filter (drop docs whose top/dup n-gram char
    # FRACTION exceeds the Table A1 thresholds — the exact
    # ``v / denom > mx`` comparison form of gopher.flag_repetitive, so
    # the composed stage agrees with the standalone filter on boundary
    # rows; zero-char docs are never flagged). Each batch additionally
    # emits ONE counter row holding its integer partials.
    def c4_gopher_stage(t: pa.Table) -> pa.Table:
        out = clean_batch(
            t.column(text_col),
            min_words_per_line=min_words_per_line,
            min_lines=min_lines,
        )
        kept = _as_array(out.column("kept"))
        ids = _as_array(t.column(id_col)).filter(kept)
        srcs = _as_array(t.column(source_col)).filter(kept)
        texts = _as_array(out.column("clean_text")).filter(kept)
        n_in, n_c4 = len(t), len(ids)

        filled = as_filled_strings(texts)
        stats = repetition_kernel(filled)
        denom = pc.utf8_length(filled).to_numpy().astype(np.float64)
        bad = np.zeros(n_c4, bool)
        nz = denom > 0
        for metric, frac in th.items():
            if metric in stats:
                v = stats[metric].astype(np.float64)
                bad[nz] |= v[nz] / denom[nz] > frac
        keep2 = pa.array(~bad)
        ids, srcs, texts = ids.filter(keep2), srcs.filter(keep2), texts.filter(keep2)
        n_gopher = len(ids)

        counts_t = pa.list_(pa.int64())
        surv = pa.table({
            id_col: ids,
            source_col: srcs,
            text_col: texts,
            _COUNTS_COL: pa.nulls(n_gopher, counts_t),
        })
        counter = pa.table({
            id_col: pa.nulls(1, ids.type),
            source_col: pa.nulls(1, srcs.type),
            text_col: pa.nulls(1, texts.type),
            _COUNTS_COL: pa.array([[n_in, n_c4, n_gopher]], counts_t),
        })
        return pa.concat_tables([surv, counter])

    # materialization #1 (of 2): the multi-consumption boundary for the
    # counter roll-up + dedup's two passes
    mat1 = (
        ds.select_columns([id_col, source_col, text_col])
        .map_batches(c4_gopher_stage, batch_format="pyarrow", batch_size=batch_size)
        .materialize()
    )

    def counter_rows(t: pa.Table) -> pa.Table:
        lists = _as_array(
            t.column(_COUNTS_COL).filter(pc.is_valid(t.column(_COUNTS_COL)))
        )
        flat = np.asarray(lists.flatten()).reshape(-1, 3)
        return pa.table({
            "n_in": pa.array(flat[:, 0], pa.int64()),
            "n_c4": pa.array(flat[:, 1], pa.int64()),
            "n_gopher": pa.array(flat[:, 2], pa.int64()),
        })

    sums = mat1.map_batches(counter_rows, batch_format="pyarrow").sum(
        ["n_in", "n_c4", "n_gopher"]
    )
    report: dict = {
        "n_input": int(sums["sum(n_in)"]),
        "n_after_c4": int(sums["sum(n_c4)"]),
        "n_after_gopher": int(sums["sum(n_gopher)"]),
    }

    def survivor_rows(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t.column(_COUNTS_COL))).drop_columns(
            [_COUNTS_COL]
        )

    survivors = mat1.map_batches(survivor_rows, batch_format="pyarrow")

    # 3. exact dedup (keep-first by id; digest-only exchange) chained
    # lazily into 4. n-gram benchmark decontamination — one streaming
    # pass over the materialized survivors, no boundary materialization
    # (the dedup survivor count comes from the drop-set cardinality)
    dedup_stats: dict = {}
    cur = _dedup.dedup_exact(
        survivors, id_col, text_col, stats_out=dedup_stats
    )
    cur = _decontam.decontaminate_ngrams(
        cur, bench_ds, text_col, n=ngram_n, id_col=id_col,
        batch_size=batch_size,
    )
    # materialization #2 (of 2): the multi-consumption boundary for the
    # mixture sampler's count + filter passes
    cur = cur.materialize()
    report["n_after_dedup"] = report["n_after_gopher"] - int(
        dedup_stats["n_dropped"]
    )
    report["n_after_decontam"] = cur.count()

    # 5. domain-mixture re-sampling (temperature reweighting) — the
    # output is already shrunk toward target_rows, so materializing it
    # for the BPE trainer's two passes is a small-corpus materialize
    # explicit integer weights (Pile-style) take precedence over the
    # temperature form when provided — mixture_sample requires exactly
    # one of the two
    cur = _sampling.mixture_sample(
        cur, id_col, source_col, target_rows=target_rows,
        weights=mixture_weights,
        temperature=None if mixture_weights is not None else temperature,
        batch_size=batch_size,
    ).materialize()
    report["n_after_mixture"] = cur.count()

    # 6. BPE train + token accounting over the final corpus
    model = _bpe.train_bpe(
        cur, text_col, num_merges=bpe_merges, min_count=bpe_min_count,
        batch_size=batch_size,
    )
    if artifacts_out is not None:
        # non-JSON artifacts ride separately from the integer report
        # (the CLI json.dumps the report verbatim)
        artifacts_out["bpe_model"] = model
    report["n_merges"] = len(model.merges)
    stats_ds = _bpe.token_stats(
        cur, model, text_col, id_col=id_col, batch_size=batch_size
    )
    n_tokens = n_words = 0
    for b in stats_ds.iter_batches(batch_format="pyarrow"):
        n_tokens += pc.sum(b.column("n_tokens")).as_py() or 0
        n_words += pc.sum(b.column("n_words")).as_py() or 0
    report["n_tokens"] = int(n_tokens)
    report["n_words"] = int(n_words)
    _log.info("prepare_corpus: %s", report)
    return cur, report
