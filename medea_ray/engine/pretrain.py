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

Each stage materializes its (id, source, text) survivor set before the
next — at real scale these are the parquet checkpoint boundaries a
resumable run writes anyway (engine/pipeline.py's manifest layout),
and materializing keeps every count a metadata read instead of a
re-execution. Only ids/digests/gram sets ever cross an exchange; the
text column moves exclusively through stateless map_batches stages.

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


def prepare_corpus(
    ds,
    bench_ds,
    *,
    id_col: str = "url",
    text_col: str = "text",
    source_col: str = "lang",
    target_rows: int,
    temperature: float = 0.7,
    ngram_n: int = 13,
    min_words_per_line: int = 5,
    min_lines: int = 3,
    gopher_thresholds: dict | None = None,
    bpe_merges: int = 200,
    bpe_min_count: int = 2,
    batch_size: int = 4096,
):
    """Run the six-stage pretraining prep over ``ds`` (columns
    ``id_col``, ``source_col``, ``text_col``); ``bench_ds`` is the
    evaluation suite to decontaminate against (its ``text_col``).

    Returns ``(corpus, report)``: the surviving ``(id, source, text)``
    Dataset (cleaned text) and an integer report with per-stage
    survivor counts plus the final token accounting."""
    from medea_ray.engine import bpe as _bpe
    from medea_ray.engine import dedup as _dedup
    from medea_ray.engine import decontam as _decontam
    from medea_ray.engine import sampling as _sampling
    from medea_ray.engine.c4 import clean_batch
    from medea_ray.engine.gopher import GOPHER_MAX_FRAC, repetition_kernel

    report: dict = {}
    cur = ds.select_columns([id_col, source_col, text_col]).materialize()
    report["n_input"] = cur.count()

    # 1. C4 line cleaning: keep docs passing the line/doc rules, text
    # becomes the kept-lines re-join; id/source carried through
    def c4_stage(t: pa.Table) -> pa.Table:
        out = clean_batch(
            t.column(text_col),
            min_words_per_line=min_words_per_line,
            min_lines=min_lines,
        )
        kept = _as_array(out.column("kept"))
        return pa.table(
            {
                id_col: _as_array(t.column(id_col)).filter(kept),
                source_col: _as_array(t.column(source_col)).filter(kept),
                text_col: _as_array(out.column("clean_text")).filter(kept),
            }
        )

    cur = cur.map_batches(
        c4_stage, batch_format="pyarrow", batch_size=batch_size
    ).materialize()
    report["n_after_c4"] = cur.count()

    # 2. Gopher repetition filter: drop docs whose top/dup n-gram char
    # coverage exceeds the Table A1 fractions (zero-char docs never
    # flagged — same rule as gopher.flag_repetitive)
    th = GOPHER_MAX_FRAC if gopher_thresholds is None else gopher_thresholds

    def gopher_stage(t: pa.Table) -> pa.Table:
        texts = as_filled_strings(t.column(text_col))
        stats = repetition_kernel(texts)
        denom = pc.utf8_length(texts).to_numpy().astype(np.float64)
        bad = np.zeros(len(t), bool)
        nz = denom > 0
        for metric, frac in th.items():
            if metric in stats:
                bad[nz] |= stats[metric][nz] > frac * denom[nz]
        return t.filter(pa.array(~bad))

    cur = cur.map_batches(
        gopher_stage, batch_format="pyarrow", batch_size=batch_size
    ).materialize()
    report["n_after_gopher"] = cur.count()

    # 3. exact dedup (keep-first by id; digest-only exchange)
    cur = _dedup.dedup_exact(cur, id_col, text_col).materialize()
    report["n_after_dedup"] = cur.count()

    # 4. n-gram benchmark decontamination
    cur = _decontam.decontaminate_ngrams(
        cur, bench_ds, text_col, n=ngram_n, id_col=id_col,
        batch_size=batch_size,
    ).materialize()
    report["n_after_decontam"] = cur.count()

    # 5. domain-mixture re-sampling (temperature reweighting)
    cur = _sampling.mixture_sample(
        cur, id_col, source_col, target_rows=target_rows,
        temperature=temperature, batch_size=batch_size,
    ).materialize()
    report["n_after_mixture"] = cur.count()

    # 6. BPE train + token accounting over the final corpus
    model = _bpe.train_bpe(
        cur, text_col, num_merges=bpe_merges, min_count=bpe_min_count,
        batch_size=batch_size,
    )
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
