"""Distributed connected components over an edge list.

The reference (juspay/medea) has no graph operators — it is a per-document
validation library (src/Data/Medea.hs:225-232). This module serves the
near-duplicate dedup story the engine brief mandates: candidate pairs
(dedup.near_dup_pairs / similarity.embedding_near_dup) -> connected
clusters -> one survivor per cluster.

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce and
Beyond", ACM SoCC 2014):

- large-star(u): connect every neighbor v > u to the minimum of u's
  closed neighborhood;
- small-star(u): orient every edge toward its larger endpoint, then
  connect u and all of its (smaller) neighbors to that minimum.

Each phase is ONE hash-shuffle groupby over the edge list with vectorized
per-group Arrow kernels; the edge set converges to a star forest whose
centers are the per-component minima (a fixed point of both phases) in
O(log^2 n) rounds worst case — 1-2 rounds on the near-clique components
LSH dedup produces.

Scale shape (100 TB story): the iterative state is the EDGE list (pairs
<< corpus rows for dedup workloads); each round materializes only that,
never the corpus. Per-group memory is O(degree); the star-forest fixed
point concentrates each component on its root's group, so component size
must fit one worker's group — the same contract as the capped dedup
buckets, except that capping edges here would silently split clusters,
so an oversized component RAISES (``max_component``) instead of dropping.
Convergence is detected by an order-insensitive multiset fingerprint of
the edge set — (count, sum of per-edge 64-bit hashes) — identical for two
consecutive rounds.  The count side is metadata-only on a materialized
dataset, so the hash scan runs only in rounds whose count matched the
previous round's (~the final two); ``max_rounds`` bounds the loop loudly.
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_log = logging.getLogger(__name__)

_MIX_A = np.uint64(0x9E3779B97F4A7C15)
_MIX_B = np.uint64(0xC2B2AE3D27D4EB4F)
_U64 = (1 << 64) - 1


def _clean_edges(t: pa.Table, src: str, dst: str) -> pa.Table:
    """Project to (u, v); drop null endpoints and self-loops."""
    u, v = t.column(src), t.column(dst)
    keep = pc.and_kleene(
        pc.and_kleene(pc.is_valid(u), pc.is_valid(v)), pc.not_equal(u, v)
    )
    t = t.filter(pc.fill_null(keep, False))
    return pa.table({"u": t.column(src), "v": t.column(dst)})


def _both_orientations(t: pa.Table) -> pa.Table:
    u = t.column("u").combine_chunks()
    v = t.column("v").combine_chunks()
    return pa.table(
        {"u": pa.concat_arrays([u, v]), "v": pa.concat_arrays([v, u])}
    )


def _orient_to_larger(t: pa.Table) -> pa.Table:
    u, v = t.column("u"), t.column("v")
    return pa.table(
        {"u": pc.max_element_wise(u, v), "v": pc.min_element_wise(u, v)}
    )


def _group_neighbors(t: pa.Table, max_component: int):
    """(u, unique neighbor array) for one groupby group; loud size guard."""
    u = t.column("u")[0].as_py()
    nbrs = pc.unique(t.column("v").combine_chunks())
    if len(nbrs) > max_component:
        raise RuntimeError(
            f"connected_components: node {u!r} has {len(nbrs)} neighbors, "
            f"above max_component={max_component}; a component this large "
            "does not fit one worker group — raise max_component or pre-"
            "dedup exact duplicates (the usual cause of mega-clusters)"
        )
    return u, nbrs


def _large_star_group(t: pa.Table, max_component: int) -> pa.Table:
    u, nbrs = _group_neighbors(t, max_component)
    m = min(pc.min(nbrs).as_py(), u)
    bigger = nbrs.filter(pc.greater(nbrs, pa.scalar(u, nbrs.type)))
    return pa.table(
        {"u": bigger, "v": pa.repeat(pa.scalar(m, nbrs.type), len(bigger))}
    )


def _small_star_group(t: pa.Table, max_component: int) -> pa.Table:
    # groups arrive oriented (u = larger endpoint, v = smaller), so every
    # neighbor is < u and the neighborhood minimum is the global candidate
    u, nbrs = _group_neighbors(t, max_component)
    m = pc.min(nbrs).as_py()
    others = nbrs.filter(pc.not_equal(nbrs, pa.scalar(m, nbrs.type)))
    out_u = pa.concat_arrays([others, pa.array([u], nbrs.type)])
    return pa.table(
        {"u": out_u, "v": pa.repeat(pa.scalar(m, nbrs.type), len(out_u))}
    )


def _hash_sum(es) -> int:
    """Order-insensitive 64-bit multiset hash sum of the edge set.

    Integer ids hash vectorized in numpy (uint64 wraparound is the point);
    other types fall through to a per-row blake2b — documented cost, and
    this scan only runs in rounds whose edge COUNT matched the previous
    round's (see the convergence loop). The per-block partials are 2-int
    rows summed on the driver with Python ints (pc.sum would wrap int64
    silently)."""

    def per_batch(t: pa.Table) -> pa.Table:
        u, v = t.column("u"), t.column("v")
        if pa.types.is_integer(u.type):
            a = u.to_numpy(zero_copy_only=False).astype(np.uint64)
            b = v.to_numpy(zero_copy_only=False).astype(np.uint64)
            with np.errstate(over="ignore"):
                h = (a * _MIX_A) ^ ((b * _MIX_B) >> np.uint64(7))
            s = int(np.sum(h, dtype=np.uint64))
        else:
            s = 0
            for x, y in zip(u.to_pylist(), v.to_pylist()):
                d = hashlib.blake2b(
                    repr((x, y)).encode(), digest_size=8
                ).digest()
                s = (s + int.from_bytes(d, "little")) & _U64
        return pa.table(
            {
                # split the u64 so the partial rides in two exact int64s
                "h_lo": pa.array([s & 0x7FFFFFFF], pa.int64()),
                "h_hi": pa.array([s >> 31], pa.int64()),
            }
        )

    rows = es.map_batches(per_batch, batch_format="pyarrow").take_all()
    return sum((r["h_hi"] << 31) | r["h_lo"] for r in rows) & _U64


def connected_components(
    edges,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    node_col: str = "node",
    cluster_col: str = "cluster",
    max_rounds: int = 64,
    max_component: int = 1 << 22,
):
    """Connected components of the undirected graph given as an edge list.

    Returns a Dataset ``(node_col, cluster_col)`` where ``cluster_col`` is
    the MINIMUM node id of the node's component (deterministic, total over
    any orderable Arrow type — ints and strings both work). Only nodes
    incident to >= 1 edge appear; isolated nodes are their own clusters by
    definition and are the caller's to add (``dedup_near`` keeps them by
    construction: they never enter a drop set).

    Self-loops and null endpoints are dropped. Duplicate / reversed edges
    are fine (each phase works on unique per-group neighbor sets).
    """
    es = edges.map_batches(
        lambda t: _clean_edges(t, src, dst), batch_format="pyarrow"
    ).materialize()

    if es.count() == 0:
        import ray.data as rd

        sch = es.schema()  # ray.data Schema wrapper (None when no blocks)
        id_type = (
            sch.types[sch.names.index("u")]
            if sch is not None and "u" in sch.names
            else pa.int64()
        )
        if not isinstance(id_type, pa.DataType):  # e.g. object-dtype input
            id_type = pa.int64()
        return rd.from_arrow(
            pa.table(
                {node_col: pa.array([], id_type), cluster_col: pa.array([], id_type)}
            )
        )

    # Convergence = identical (count, multiset-hash) for two consecutive
    # rounds.  count() on a materialized dataset is metadata-only (no task
    # wave), so the hash SCAN runs only in rounds whose count matched the
    # previous round's — i.e. ~only the final two rounds near the fixed
    # point, not every round.  prev_es is held one extra generation so its
    # hash can be computed lazily the first time counts match.
    prev_n: int | None = None
    prev_h: int | None = None
    prev_es = None
    for round_i in range(max_rounds):
        large = (
            es.map_batches(_both_orientations, batch_format="pyarrow")
            .groupby("u")
            .map_groups(
                lambda t: _large_star_group(t, max_component),
                batch_format="pyarrow",
            )
        )
        es = (
            large.map_batches(_orient_to_larger, batch_format="pyarrow")
            .groupby("u")
            .map_groups(
                lambda t: _small_star_group(t, max_component),
                batch_format="pyarrow",
            )
            .materialize()
        )
        n = es.count()
        if n == prev_n:
            if prev_h is None:
                prev_h = _hash_sum(prev_es)
            h = _hash_sum(es)
            if h == prev_h:
                _log.info(
                    "connected_components: converged after %d rounds "
                    "(%d edges)",
                    round_i + 1,
                    n,
                )
                break
            prev_h = h
        else:
            prev_h = None
        prev_n, prev_es = n, es
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
            f" (last edge count {prev_n}); raise max_rounds"
        )

    def label_group(t: pa.Table) -> pa.Table:
        u, nbrs = _group_neighbors(t, max_component)
        m = min(pc.min(nbrs).as_py(), u)
        return pa.table(
            {
                node_col: pa.array([u], nbrs.type),
                cluster_col: pa.array([m], nbrs.type),
            }
        )

    return (
        es.map_batches(_both_orientations, batch_format="pyarrow")
        .groupby("u")
        .map_groups(label_group, batch_format="pyarrow")
    )
