"""Corpus-wide exact paragraph/line deduplication.

The repeated-passage removal of RefinedWeb (arXiv:2306.01116 §3.3,
"exact line dedup") / MassiveText: a paragraph that occurs anywhere
else in the corpus (cross-doc or earlier in the SAME doc) is removed
everywhere except its FIRST occurrence; surviving paragraphs are
re-joined in document order. Boilerplate (nav bars, cookie banners,
footers) concentrates here, so at web scale the duplicated-paragraph
set is tiny relative to the corpus while instance counts are huge.

Pinned semantics (the DuckDB oracle ``dedup_paragraphs_docs`` replays
them from scratch):

- a PARAGRAPH is a ``sep``-separated segment (default ``"\\n"`` —
  line-level, the RefinedWeb unit);
- a paragraph is a dedup CANDIDATE iff ``len(para) >= min_chars``
  (codepoints); shorter ones (blank lines, list bullets) are always
  kept and never claim ownership;
- instance order is ``rank = doc_id * 2**idx_bits + idx`` (idx = the
  paragraph's position in its doc) — a pure function of the row, so
  the keep-first winner is block-layout invariant; ids must be
  non-negative ints with ``doc_id < 2**(63-idx_bits)`` and
  ``idx < 2**idx_bits`` (raises loudly otherwise — a truncated rank
  would silently reorder ownership);
- an instance is KEPT iff it is not a candidate, or its paragraph's
  global minimum rank equals its own rank (exact rank ties — two rows
  sharing a doc_id — keep both: deterministic under-dedup, documented
  because id uniqueness is the caller's contract);
- ``clean_text`` is the kept paragraphs re-joined with ``sep``
  (null text stays null and contributes nothing).

Scale shape: pass 1 explodes each batch to per-batch-UNIQUE
``(md5(para), min_rank_in_batch, n_in_batch)`` rows — the combiner
that keeps the ONE ``groupby(md5)`` exchange at one row per distinct
paragraph per batch, never one per instance. Only paragraphs with a
global instance count > 1 come back: the broadcast is the
``{md5 -> owner_rank}`` map over DUPLICATED paragraphs only,
collected under a loud ``owner_budget_rows`` (truncating it would
silently KEEP duplicated text — same contract as
``substr.mask_dup_spans``; the documented above-budget variant is
hash-bucketed owner-map passes). Pass 2 is stateless ``map_batches``:
re-split, md5 + dict probe inside the per-paragraph hashing loop that
already exists (the md5 itself has no Arrow kernel), re-join — the
corpus text never crosses an exchange.
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pyarrow as pa

_log = logging.getLogger(__name__)

# Per-worker-process cache of the deserialized owner map. ray.get of a
# dict re-deserializes on EVERY call (only buffer types are zero-copy),
# so a per-batch ray.get would pay a full unpickle of a potentially
# multi-million-entry map ~150× per 600k rows. One entry only: a new
# ref evicts the old map.
_OWNER_CACHE: dict[bytes, dict] = {}


def _cached_owner_map(ref) -> dict:
    import ray

    key = ref.binary()
    omap = _OWNER_CACHE.get(key)
    if omap is None:
        _OWNER_CACHE.clear()
        omap = _OWNER_CACHE[key] = ray.get(ref)
    return omap


def _check_rank_parts(ids: np.ndarray, idx_bits: int) -> None:
    if len(ids) and (ids.min() < 0 or ids.max() >= 1 << (63 - idx_bits)):
        raise ValueError(
            f"dedup_paragraphs: doc ids must be in [0, 2**{63 - idx_bits}) "
            f"to pack a rank; got range [{ids.min()}, {ids.max()}]"
        )


def _explode_uniques(text_col: str, id_col: str, sep: str, min_chars: int, idx_bits: int):
    def fn(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        _check_rank_parts(ids, idx_bits)
        best: dict[str, list] = {}
        for did, txt in zip(ids.tolist(), texts):
            if txt is None:
                continue
            paras = txt.split(sep)
            if len(paras) > 1 << idx_bits:
                raise ValueError(
                    f"dedup_paragraphs: doc {did} has {len(paras)} paragraphs"
                    f" > 2**{idx_bits}; raise idx_bits"
                )
            base = did << idx_bits
            for i, p in enumerate(paras):
                if len(p) < min_chars:
                    continue
                h = hashlib.md5(p.encode()).hexdigest()
                e = best.get(h)
                if e is None:
                    best[h] = [base + i, 1]
                else:
                    # batches are not id-sorted: keep the batch-local min
                    if base + i < e[0]:
                        e[0] = base + i
                    e[1] += 1
        return pa.table(
            {
                "md5": pa.array(list(best.keys()), pa.string()),
                "rank": pa.array([v[0] for v in best.values()], pa.int64()),
                "n": pa.array([v[1] for v in best.values()], pa.int64()),
            }
        )

    return fn


def duplicated_paragraph_owners(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_chars: int = 1,
    idx_bits: int = 20,
    batch_size: int = 4096,
):
    """(md5, owner_rank, n) for every paragraph with a global instance
    count > 1 — the reduced table pass 2 broadcasts. One groupby(md5)
    exchange over per-batch-unique combiner rows."""
    from ray.data.aggregate import Min, Sum

    fn = _explode_uniques(text_col, id_col, sep, min_chars, idx_bits)
    uniques = ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
    return (
        uniques.groupby("md5")
        .aggregate(Min("rank", alias_name="owner_rank"), Sum("n", alias_name="n"))
        .filter(expr="n > 1")
    )


def dedup_paragraphs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_chars: int = 1,
    idx_bits: int = 20,
    owner_budget_rows: int = 1 << 22,
    batch_size: int = 4096,
):
    """Corpus-wide keep-first paragraph dedup. Emits one row per input
    row: ``(id_col, n_paras, n_kept_paras, clean_text)`` — see module
    docstring for the pinned semantics and scale shape."""
    import ray

    owners_ds = duplicated_paragraph_owners(
        ds, text_col, id_col, sep, min_chars, idx_bits, batch_size
    ).materialize()
    n_dup = owners_ds.count()
    _log.info(
        "dedup_paragraphs: %d duplicated paragraphs (budget %d rows, %d bytes)",
        n_dup, owner_budget_rows, owners_ds.size_bytes() or 0,
    )
    if n_dup > owner_budget_rows:
        raise ValueError(
            f"dedup_paragraphs: {n_dup} duplicated paragraphs exceed "
            f"owner_budget_rows={owner_budget_rows}; raise the budget or "
            "run the hash-bucketed owner-map variant (truncating would "
            "silently keep duplicated text)"
        )
    owners: dict[str, int] = {}
    for b in owners_ds.iter_batches(batch_format="pyarrow"):
        owners.update(
            zip(b.column("md5").to_pylist(), b.column("owner_rank").to_pylist())
        )
    ref = ray.put(owners)

    def rejoin(t: pa.Table) -> pa.Table:
        omap = _cached_owner_map(ref)
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        _check_rank_parts(ids, idx_bits)
        n_paras = np.zeros(len(texts), np.int64)
        n_kept = np.zeros(len(texts), np.int64)
        out = []
        for row, (did, txt) in enumerate(zip(ids.tolist(), texts)):
            if txt is None:
                out.append(None)
                continue
            paras = txt.split(sep)
            base = did << idx_bits
            kept = []
            for i, p in enumerate(paras):
                if len(p) >= min_chars:
                    h = hashlib.md5(p.encode()).hexdigest()
                    owner = omap.get(h)
                    if owner is not None and owner != base + i:
                        continue
                kept.append(p)
            n_paras[row] = len(paras)
            n_kept[row] = len(kept)
            out.append(sep.join(kept))
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_paras": pa.array(n_paras),
                "n_kept_paras": pa.array(n_kept),
                "clean_text": pa.array(out, pa.string()),
            }
        )

    return ds.map_batches(rejoin, batch_format="pyarrow", batch_size=batch_size)
