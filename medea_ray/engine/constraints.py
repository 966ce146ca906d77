"""Relational constraint discovery: candidate keys and functional
dependencies over Dataset columns — the tabular half of the
constraint-suggestion family (engine/infer.py is the JSON half).

Semantics (what a Deequ-style suggester would assert):

- **candidate key**: a column set whose exact distinct-tuple count
  equals the row count (no two rows share the tuple; nulls count as a
  value — two null-tuples collide, matching SQL ``GROUP BY``, NOT the
  ``UNIQUE``-constraint convention where NULLs never collide).
- **functional dependency** lhs → rhs: holds iff the exact distinct
  count of lhs equals the exact distinct count of lhs ∪ rhs (every
  lhs tuple pairs with exactly one rhs tuple).

Scale shape: every column-set's tuples reduce map-side to 16-byte
BLAKE2 digests of an injective length-prefixed framing (value
collisions are impossible by framing; digest collisions are
negligible at corpus scale — the same contract ``exact_dup_texts``
pins for md5). ALL requested sets ride ONE exchange of
(set_id: int64, digest: 16B) pairs, pre-deduped per batch; the
original values never shuffle. An optional HyperLogLog prescreen
(``suggest_keys(prescreen=True)``) drops SINGLE-column sets whose
approximate distinct count is far below the row count WITHOUT any
shuffle (HLL partials tree-combine, engine/stats.py) — multi-column
sets always pay the exact pass (no multi-column HLL is kept) — so at
web scale only plausible single-column keys join the digest exchange.

Distinctness is computed on each value's canonical Arrow string
rendering (exact for integer/string/bool/date columns; float columns
compare by their Arrow decimal rendering, documented).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from medea_ray.engine.arrow_util import as_array as _as_array

# Framing marker bytes: a null cell and a value cell can never render
# identically, and the length prefix makes cell boundaries unambiguous
# (so ("a|b",) vs ("a","b") and ("1","2") vs ("12","") stay distinct).
_NULL_CELL = "\x00N"


def _framed_cell(col) -> pa.Array:
    """Injective string rendering of one column: 'V<len>:<text>' for
    values, the null marker for nulls."""
    if pa.types.is_null(col.type):
        col = pc.cast(col, pa.string())
    s = col if pa.types.is_string(col.type) or pa.types.is_large_string(col.type) else None
    if s is None:
        if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            # hex keeps the rendering valid UTF-8 and injective
            s = pc.binary_join_element_wise("hex:", pc.cast(_hexlify(col), pa.string()), "")
        else:
            s = pc.cast(col, pa.string())
    lens = pc.cast(pc.utf8_length(pc.fill_null(s, "")), pa.string())
    framed = pc.binary_join_element_wise("V", lens, ":", pc.fill_null(s, ""), "")
    return _as_array(pc.if_else(pc.is_null(col), _NULL_CELL, framed))


def _hexlify(col) -> pa.Array:
    import binascii

    return pa.array(
        [None if v is None else binascii.hexlify(v).decode() for v in col.to_pylist()],
        pa.string(),
    )


def tuple_digests(
    t: pa.Table, cols: list[str], unique: bool = False, _frame_cache=None
) -> list[bytes]:
    """16-byte BLAKE2b digest per row of the framed (cols) tuple. With
    ``unique=True`` the framed tuples dedup batch-side FIRST (one Arrow
    ``pc.unique``), so the Python digest loop only touches distinct
    values — for low-cardinality sets that is the whole speedup.
    ``_frame_cache`` (a per-batch dict) lets callers requesting many
    column sets frame each column once instead of once per set."""
    if _frame_cache is None:
        framed = [_framed_cell(t.column(c)) for c in cols]
    else:
        framed = []
        for c in cols:
            if c not in _frame_cache:
                _frame_cache[c] = _framed_cell(t.column(c))
            framed.append(_frame_cache[c])
    if len(framed) == 1:
        joined = framed[0]
    else:
        parts: list = []
        for f in framed:
            parts.extend((f, "\x00;"))
        joined = _as_array(pc.binary_join_element_wise(*parts[:-1], ""))
    if unique:
        joined = pc.unique(joined)
    return [
        hashlib.blake2b(v.encode("utf-8", "surrogatepass"), digest_size=16).digest()
        for v in joined.to_pylist()
    ]


def distinct_counts(
    ds, col_sets: list[list[str]], batch_size: int = 8192
) -> list[int]:
    """Exact distinct-tuple count for every column set, in ONE pass and
    ONE (set_id, digest) exchange (per-batch pre-dedup; 16-byte digests
    only). Returns counts aligned with ``col_sets``."""
    from ray.data.aggregate import Sum

    col_sets = [list(cs) for cs in col_sets]
    if not col_sets:
        return []
    for cs in col_sets:
        if not cs:
            raise ValueError("distinct_counts: empty column set")

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np

        sids, digs = [], []
        frame_cache: dict = {}  # each column framed ONCE per batch,
        # however many sets it appears in (discover_fds asks for k
        # singles + k(k-1)/2 pairs)
        for sid, cs in enumerate(col_sets):
            uniq = tuple_digests(t, cs, unique=True, _frame_cache=frame_cache)
            sids.extend([sid] * len(uniq))
            digs.extend(uniq)
        # 16-byte digests ride the exchange as two int64 columns (Ray's
        # sort shuffle round-trips int64 natively; see uniqueness._hash64)
        flat = (
            np.frombuffer(b"".join(digs), dtype="<i8").reshape(-1, 2)
            if digs
            else np.empty((0, 2), np.int64)
        )
        return pa.table(
            {
                "sid": pa.array(sids, pa.int64()),
                "d0": pa.array(flat[:, 0], pa.int64()),
                "d1": pa.array(flat[:, 1], pa.int64()),
            }
        )

    reduced = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby(["sid", "d0", "d1"])
        .count()
    )

    def count_per_sid(t: pa.Table) -> pa.Table:
        g = t.select(["sid"]).group_by(["sid"]).aggregate([([], "count_all")])
        return pa.table({"sid": g.column("sid"), "cnt": g.column("count_all")})

    counts = {int(cs): 0 for cs in range(len(col_sets))}
    per_sid = (
        reduced.map_batches(count_per_sid, batch_format="pyarrow")
        .groupby("sid")
        .aggregate(Sum("cnt", alias_name="n"))
    )
    for r in per_sid.take_all():
        counts[int(r["sid"])] = int(r["n"])
    return [counts[i] for i in range(len(col_sets))]


def fd_holds(ds, lhs: list[str], rhs: list[str], batch_size: int = 8192) -> bool:
    """Exact verdict for the functional dependency lhs → rhs."""
    lhs, rhs = list(lhs), list(rhs)
    both = lhs + [c for c in rhs if c not in lhs]
    if both == lhs:
        return True  # rhs ⊆ lhs holds trivially
    n_lhs, n_both = distinct_counts(ds, [lhs, both], batch_size=batch_size)
    return n_lhs == n_both


def suggest_keys(
    ds,
    col_sets: list[list[str]],
    *,
    prescreen: bool = False,
    prescreen_slack: float = 0.9,
    batch_size: int = 8192,
) -> dict:
    """Exact candidate-key verdict per column set.

    With ``prescreen=True``, single-column sets whose HyperLogLog
    approximate distinct count falls below ``prescreen_slack * n_rows``
    are rejected without an exact pass (p=14 HLL error is ~0.8%, so
    0.9 is a safe margin: a true key can never be screened out).
    Returns {tuple(cols): {"is_key": bool, "distinct": int | None,
    "n_rows": int, "screened": bool}} — ``distinct`` is None for
    screened-out sets (never exactly counted)."""
    from medea_ray.engine import stats

    col_sets = [list(cs) for cs in col_sets]
    n_rows = ds.count()
    out = {}
    survivors: list[list[str]] = []
    if prescreen:
        singles = [cs[0] for cs in col_sets if len(cs) == 1]
        approx = (
            {
                c: s["approx_distinct"]
                for c, s in stats.sketch_summary(ds, hll_cols=singles).items()
            }
            if singles
            else {}
        )
        for cs in col_sets:
            if len(cs) == 1 and approx.get(cs[0], n_rows) < prescreen_slack * n_rows:
                out[tuple(cs)] = {
                    "is_key": False,
                    "distinct": None,
                    "n_rows": n_rows,
                    "screened": True,
                }
            else:
                survivors.append(cs)
    else:
        survivors = col_sets

    counts = distinct_counts(ds, survivors, batch_size=batch_size)
    for cs, n in zip(survivors, counts):
        out[tuple(cs)] = {
            "is_key": n == n_rows,
            "distinct": n,
            "n_rows": n_rows,
            "screened": False,
        }
    return {tuple(cs): out[tuple(cs)] for cs in col_sets}


def discover_fds(
    ds, columns: list[str], batch_size: int = 8192
) -> list[dict]:
    """All pairwise single-column FDs among ``columns``, from ONE
    distinct-count pass over the k singles + k·(k−1)/2 pairs. Returns
    [{"lhs", "rhs", "holds"}] for every ordered pair (both directions
    read the same unordered pair count)."""
    columns = list(columns)
    k = len(columns)
    singles = [[c] for c in columns]
    pairs = [
        [columns[i], columns[j]] for i in range(k) for j in range(i + 1, k)
    ]
    counts = distinct_counts(ds, singles + pairs, batch_size=batch_size)
    single_n = dict(zip(columns, counts[:k]))
    out = []
    idx = k
    for i in range(k):
        for j in range(i + 1, k):
            pair_n = counts[idx]
            idx += 1
            a, b = columns[i], columns[j]
            out.append({"lhs": a, "rhs": b, "holds": single_n[a] == pair_n})
            out.append({"lhs": b, "rhs": a, "holds": single_n[b] == pair_n})
    return out
