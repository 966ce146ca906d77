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
import pyarrow.compute as pc

from medea_ray.engine.arrow_util import as_array as _as_array
from medea_ray.engine.arrow_util import string_buffer_parts

_log = logging.getLogger(__name__)


def _split_paras(texts: pa.Array, ids: np.ndarray, sep: str, idx_bits: int):
    """Vectorized paragraph explode: Arrow ``split_pattern`` (same
    non-overlapping left-to-right semantics as ``str.split(sep)``) →
    ``(flat_paras, per_row_counts, flat_ranks)``; null texts contribute
    zero paragraphs (their count reads 0). Ranks are the pinned
    ``doc_id << idx_bits | position`` instance order; the per-doc
    paragraph-count cap raises with the offending doc id."""
    la = _as_array(pc.split_pattern(texts, sep))
    cnts = pc.fill_null(pc.list_value_length(la), 0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    cap = 1 << idx_bits
    if (cnts > cap).any():
        bad = int(np.argmax(cnts > cap))
        raise ValueError(
            f"dedup_paragraphs: doc {int(ids[bad])} has {int(cnts[bad])} "
            f"paragraphs > 2**{idx_bits}; raise idx_bits"
        )
    flat = _as_array(la.flatten())
    offsets = np.concatenate([np.zeros(1, np.int64), np.cumsum(cnts)])
    idx_in_doc = np.arange(offsets[-1], dtype=np.int64) - np.repeat(
        offsets[:-1], cnts
    )
    ranks = (np.repeat(ids, cnts) << np.int64(idx_bits)) + idx_in_doc
    return flat, cnts, ranks


def _flat_digests(flat: pa.Array, take: np.ndarray) -> list[bytes]:
    """Raw md5 per selected flat paragraph, hashed off the Arrow buffer
    (no Python-str materialization of the corpus text — the
    string_buffer_parts lever; hexdigest == digest.hex() when a hex key
    is needed)."""
    parts = string_buffer_parts(flat)
    _md5 = hashlib.md5
    if parts is None:  # non-string flat (can't happen for split output)
        vals = flat.take(pa.array(take, pa.int64())).to_pylist()
        return [_md5(v.encode()).digest() for v in vals]
    data, off, _ = parts
    return [_md5(data[off[i] : off[i + 1]]).digest() for i in take]

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
        texts = _as_array(t.column(text_col))
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        _check_rank_parts(ids, idx_bits)
        flat, _cnts, ranks = _split_paras(texts, ids, sep, idx_bits)
        cand = np.nonzero(
            pc.utf8_length(flat).to_numpy(zero_copy_only=False) >= min_chars
        )[0]
        if cand.size == 0:
            return pa.table({
                "md5": pa.array([], pa.string()),
                "rank": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        digs = _flat_digests(flat, cand)
        arr = np.frombuffer(b"".join(digs), dtype="<i8").reshape(-1, 2)
        rk = ranks[cand]
        # batch-local combiner: one row per distinct paragraph with its
        # min rank + instance count (vectorized lexsort + reduceat — the
        # dict loop this replaces decoded every text to a Python str)
        order = np.lexsort((arr[:, 1], arr[:, 0]))
        sa, sr = arr[order], rk[order]
        seg = np.nonzero(
            np.concatenate([[True], (sa[1:] != sa[:-1]).any(axis=1)])
        )[0]
        min_rank = np.minimum.reduceat(sr, seg)
        n_inst = np.diff(np.concatenate([seg, [len(sr)]]))
        uniq = sa[seg]
        hexes = [uniq[i].tobytes().hex() for i in range(len(seg))]
        return pa.table(
            {
                "md5": pa.array(hexes, pa.string()),
                "rank": pa.array(min_rank, pa.int64()),
                "n": pa.array(n_inst.astype(np.int64), pa.int64()),
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
    from medea_ray.engine.exchange import bucketed_group_agg

    fn = _explode_uniques(text_col, id_col, sep, min_chars, idx_bits)
    uniques = ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
    return bucketed_group_agg(
        uniques,
        ["md5"],
        [("rank", "min", "owner_rank"), ("n", "sum", "n")],
    ).filter(expr="n > 1")


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
        texts = _as_array(t.column(text_col))
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        _check_rank_parts(ids, idx_bits)
        nrows = len(t)
        flat, cnts, ranks = _split_paras(texts, ids, sep, idx_bits)
        keep = np.ones(len(flat), bool)
        cand = np.nonzero(
            pc.utf8_length(flat).to_numpy(zero_copy_only=False) >= min_chars
        )[0]
        if cand.size:
            # the owner-map probe is the one remaining per-paragraph
            # loop (dict probe on the hex digest — md5 has no Arrow
            # kernel); the text itself is hashed off the buffer and
            # never decoded
            digs = _flat_digests(flat, cand)
            get = omap.get
            drop = [
                j
                for j, (i, d) in enumerate(zip(cand, digs))
                if (o := get(d.hex())) is not None and o != ranks[i]
            ]
            if drop:
                keep[cand[np.asarray(drop, np.int64)]] = False
        doc_idx = np.repeat(np.arange(nrows, dtype=np.int64), cnts)
        n_kept = np.bincount(doc_idx[keep], minlength=nrows).astype(np.int64)
        new_offsets = np.concatenate([np.zeros(1, np.int64), np.cumsum(n_kept)])
        # binary_join only has a list<string> kernel — cast the KEPT
        # values (post-filter, the smaller side) when the input column
        # arrived as large_string (parquet readers emit it for big text)
        kept_vals = pc.cast(flat.filter(pa.array(keep)), pa.string())
        rejoined = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(new_offsets, pa.int32()), kept_vals
            ),
            sep,
        )
        # null text stays null (split gave it zero paragraphs; a zero-
        # kept NON-null doc must still re-join to '')
        null_mask = pc.is_null(texts)
        clean = pc.if_else(null_mask, pa.nulls(nrows, pa.string()), rejoined)
        n_paras = pa.array(cnts, pa.int64())
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_paras": n_paras,
                "n_kept_paras": pa.array(n_kept, pa.int64()),
                "clean_text": clean,
            }
        )

    return ds.map_batches(rejoin, batch_format="pyarrow", batch_size=batch_size)
