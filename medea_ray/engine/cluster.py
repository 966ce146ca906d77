"""Distributed k-means over an embedding column — the clustering verb of
large-scale training-data curation (semantic-dedup / data-mixing /
per-cluster sampling pipelines; SemDeDup-style workflows cluster first,
then dedup within clusters).

The reference (juspay/medea) is a single-document validation library with
no vector operators; this comes from the brief's training-data-pipeline
surface next to similarity.py's ANN family.

Determinism contract (what makes the driver guard exact): vectors are
quantized ONCE to int64 units (``quant`` steps, round half away from
zero), so every per-cluster accumulation is an INTEGER sum — exact and
order-independent across any block split — and centroids (sum / count in
float64) are bit-identical no matter how Ray batches or schedules the
pass. Assignments are float64 argmins against those deterministic
centroids; ``assign`` also returns each row's best-vs-second-best
relative margin so callers (and the driver guard) can assert the data is
nowhere near an argmin tie before relying on exact assignment equality
across differently-shaped matmuls.

Scale shape (100 TB story): centroids (k × d float64, KB-sized) are
captured in the map_batches closure once per iteration; per-block
partials are ONE pickled (k × d int64 sums, k counts) state, merged
through the same bounded-fan-in shuffle-free tree as
``stats.sketch_summary`` — the driver never holds more than
``max_driver_states`` states regardless of block count, and no stage
shuffles data. Per-iteration cost is one streaming pass over the
dataset. Exact Lloyd iterations; for fewer passes at extreme scale the
published mini-batch formulation (Sculley, WWW '10) drops in by feeding
a deterministic hash-sample (sampling.hash_sample) to ``fit``.
"""

from __future__ import annotations

import logging
import pickle

import numpy as np
import pyarrow as pa

_log = logging.getLogger(__name__)

DEFAULT_QUANT = 1_000_000  # quantization steps per unit (micro-units)


def _batch_matrix(t: pa.Table, col: str) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix (nulls rejected)."""
    c = t.column(col)
    if c.null_count:
        raise ValueError(f"null vectors in {col!r} are not clusterable")
    fixed = c.combine_chunks().flatten().to_numpy(zero_copy_only=False)
    n = t.num_rows
    return np.asarray(fixed, dtype=np.float64).reshape(n, -1)


def quantize(m: np.ndarray, quant: int = DEFAULT_QUANT) -> np.ndarray:
    """float matrix → int64 grid (round half away from zero). Integer
    sums over any subset are exact, which is the whole determinism
    story."""
    return (np.floor(np.abs(m) * quant + 0.5) * np.sign(m)).astype(np.int64)


def _dist2(q: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Squared L2 distances (n, k) of int64-grid rows to float64
    centroids: |q|^2 - 2 q·c + |c|^2 (one matmul)."""
    qf = q.astype(np.float64)
    d2 = (
        (qf * qf).sum(axis=1, keepdims=True)
        - 2.0 * (qf @ cent.T)
        + (cent * cent).sum(axis=1)[None, :]
    )
    return d2


def _partial_state(q: np.ndarray, assign: np.ndarray, k: int):
    """(k, d) int64 per-cluster sums + (k,) counts for one batch."""
    d = q.shape[1]
    sums = np.zeros((k, d), dtype=np.int64)
    for j in range(k):  # k is small; each pass is a vectorized reduction
        mask = assign == j
        if mask.any():
            sums[j] = q[mask].sum(axis=0)
    counts = np.bincount(assign, minlength=k).astype(np.int64)
    return sums, counts


def _merge_pickled(t: pa.Table) -> pa.Table:
    states = [pickle.loads(s.as_py()) for s in t.column("state")]
    sums = sum(s[0] for s in states)
    counts = sum(s[1] for s in states)
    return pa.table(
        {"state": pa.array([pickle.dumps((sums, counts))], pa.large_binary())}
    )


def _tree_reduce(cur, max_driver_states: int, combine_fanin: int):
    """Bounded-fan-in shuffle-free reduction of pickled-state rows (the
    stats.sketch_summary shape) down to <= max_driver_states, then a
    driver merge."""
    while True:
        cur = cur.materialize()  # states only: KB per row
        if cur.count() <= max_driver_states:
            break
        cur = cur.map_batches(
            _merge_pickled, batch_format="pyarrow", batch_size=combine_fanin
        )
    parts = [pickle.loads(r["state"]) for r in cur.take_all()]
    if not parts:
        return None
    sums = sum(p[0] for p in parts)
    counts = sum(p[1] for p in parts)
    return sums, counts


def _init_centroids(ds, vec_col: str, id_col: str, k: int, quant: int):
    """Deterministic seeds: the quantized vectors of the k smallest ids.
    Per-batch vectorized top-k (np.argpartition) keeps k rows per block;
    a bounded tree would drop in for extreme block counts, but k × blocks
    id+vec rows are tiny (k is single/double digits)."""

    def topk(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) > k:
            keep = np.argpartition(ids, k - 1)[:k]
            t = t.take(pa.array(np.sort(keep)))
        return t.select([id_col, vec_col])

    rows = ds.map_batches(topk, batch_format="pyarrow").take_all()
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds the {len(rows)} available vectors")
    rows.sort(key=lambda r: r[id_col])
    seed = np.asarray([r[vec_col] for r in rows[:k]], dtype=np.float64)
    return quantize(seed, quant).astype(np.float64)


def fit(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_iters: int = 10,
    quant: int = DEFAULT_QUANT,
    max_driver_states: int = 512,
    combine_fanin: int = 64,
):
    """Exact Lloyd k-means. Returns ``(centroids, history)`` where
    ``centroids`` is (k, d) float64 on the quantized grid scale (divide
    by ``quant`` for the original units) and ``history`` is the
    per-iteration list of (sums, counts) integer partials (what the
    driver guard compares exactly). Empty clusters keep their previous
    centroid (logged)."""
    cent = _init_centroids(ds, vec_col, id_col, k, quant)
    history = []
    for it in range(n_iters):
        c = cent  # bind the current value into the closure

        def partial(t: pa.Table, _c=c) -> pa.Table:
            if t.num_rows == 0:  # Ray can emit empty blocks
                return pa.table({"state": pa.array([], pa.large_binary())})
            q = quantize(_batch_matrix(t, vec_col), quant)
            a = np.argmin(_dist2(q, _c), axis=1)
            st = _partial_state(q, a, k)
            return pa.table(
                {"state": pa.array([pickle.dumps(st)], pa.large_binary())}
            )

        red = _tree_reduce(
            ds.map_batches(partial, batch_format="pyarrow"),
            max_driver_states,
            combine_fanin,
        )
        if red is None:
            raise ValueError("k-means over an empty dataset")
        sums, counts = red
        history.append((sums, counts))
        nz = counts > 0
        if not nz.all():
            _log.warning(
                "k-means iter %d: %d empty clusters keep their centroids",
                it, int((~nz).sum()),
            )
        new = cent.copy()
        new[nz] = sums[nz].astype(np.float64) / counts[nz, None]
        cent = new
    return cent, history


def assign(
    ds,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quant: int = DEFAULT_QUANT,
):
    """Label every row with its nearest centroid. Returns a Dataset of
    (id, cluster, margin) where ``margin`` is the relative gap between
    the second-best and best squared distance — rows with a tiny margin
    are the only ones whose label could depend on float summation order,
    so exactness guards assert ``min(margin)`` is comfortably positive."""
    cent = np.asarray(centroids, dtype=np.float64)

    def lab(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                id_col: t.column(id_col),
                "cluster": pa.array([], pa.int64()),
                "margin": pa.array([], pa.float64()),
            })
        q = quantize(_batch_matrix(t, vec_col), quant)
        d2 = _dist2(q, cent)
        order = np.argsort(d2, axis=1)
        best = order[:, 0]
        if d2.shape[1] > 1:
            b = d2[np.arange(len(best)), best]
            s = d2[np.arange(len(best)), order[:, 1]]
            margin = (s - b) / np.maximum(b, 1.0)
        else:
            margin = np.full(len(best), np.inf)
        return pa.table({
            id_col: t.column(id_col),
            "cluster": pa.array(best.astype(np.int64), pa.int64()),
            "margin": pa.array(margin, pa.float64()),
        })

    return ds.map_batches(lab, batch_format="pyarrow")


def fit_reference(
    mat: np.ndarray,
    ids: np.ndarray,
    k: int,
    n_iters: int,
    quant: int = DEFAULT_QUANT,
):
    """Driver-side single-array reference of the identical algorithm
    (same quantization, same init, same update rule) for exactness
    guards — the drift_guard pattern: the distributed integer partials
    must equal these bit-for-bit."""
    order = np.argsort(ids, kind="stable")
    q = quantize(np.asarray(mat, dtype=np.float64), quant)
    cent = q[order[:k]].astype(np.float64)
    if len(ids) < k:
        raise ValueError(f"k={k} exceeds the {len(ids)} available vectors")
    history = []
    for _ in range(n_iters):
        a = np.argmin(_dist2(q, cent), axis=1)
        sums, counts = _partial_state(q, a, k)
        history.append((sums, counts))
        nz = counts > 0
        new = cent.copy()
        new[nz] = sums[nz].astype(np.float64) / counts[nz, None]
        cent = new
    a = np.argmin(_dist2(q, cent), axis=1)
    return cent, history, a
