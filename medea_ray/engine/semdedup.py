"""SemDeDup-style semantic deduplication: k-means cluster the embedding
column, then drop all but one of every group of semantically
near-identical vectors WITHIN each cluster (exact float64 cosine >=
``threshold``), keeping the member farthest from its cluster centroid
(the published low-centroid-similarity keep rule; Abbas et al.,
arXiv:2303.09540) with the id as deterministic tiebreak.

The reference (juspay/medea) is a single-document validation library
with no vector operators; this comes from the brief's
training-data-pipeline surface, composing ``engine.cluster`` (exact
distributed Lloyd) with a per-cluster pairwise verify in the
``similarity.embedding_near_dup`` in-bucket idiom.

Why cluster-first instead of LSH (``similarity.embedding_near_dup``):
at web scale all-pairs is impossible and LSH recall decays with
threshold; SemDeDup bounds the pairwise work to within-cluster where
semantic duplicates concentrate, so the knob is ``k`` (clusters), not
hash geometry. The two operators are complementary and share the
drop-set/anti-filter contract of ``dedup.dedup_exact``.

Scale shape (100 TB story): ``cluster.fit`` is shuffle-free (bounded
fan-in integer-partial tree, KB centroids broadcast per iteration);
labelling is one map_batches; the ONLY exchange is the
groupby(cluster) that co-partitions each cluster's vectors for the
pairwise stage. Size ``k`` so expected occupancy corpus/k stays under
``max_cluster_size`` (the paper runs 50k clusters on billions of
rows). Oversized clusters NEVER drop data: rows beyond the cap pass
through as kept with a logged warning (under-dedup, never data loss),
matching the capped-bucket contract elsewhere.

Determinism contract (what makes the driver guard exact): every
per-cluster group is sorted by id BEFORE any float math, so the
distributed group and the driver-side reference see bit-identical
(m, d) inputs and the same BLAS shapes — cosines, greedy order and
keep/drop sets are then bit-reproducible regardless of how Ray blocked
or ordered the rows. The guard additionally asserts the data sits
nowhere near a decision boundary (threshold margin, keep-order
margin); the remaining boundary — the centroid-ARGMIN of the label
step — is not asserted here but by ``kmeans_guard``, which runs
``cluster.assign`` margin checks over the SAME embeddings table with
the same K/iteration constants (queries.KMEANS_K / KMEANS_ITERS —
keep the two queries' constants in lockstep or add the margin here).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

from medea_ray.engine import cluster as _cluster
from medea_ray.engine.similarity import _normalize

_log = logging.getLogger(__name__)


def _greedy_dedup(
    ids: np.ndarray,
    mat: np.ndarray,
    centroid: np.ndarray,
    threshold: float,
    margins: bool = True,
):
    """Keep/drop decision for ONE complete cluster.

    ``ids`` must arrive sorted ascending with ``mat`` rows aligned (the
    canonical order that makes float results bit-reproducible). Greedy
    scan in keep-priority order (farthest from centroid first, id
    tiebreak): an item is kept iff its max cosine to every
    already-kept item is < threshold; otherwise it's dropped and its
    survivor is the already-kept item with the highest cosine.

    Returns (keep_mask, survivor_idx, max_cos, margins) where margins =
    (min |cos - threshold| over pairs, min adjacent gap of the
    keep-priority sort key) — the guard's boundary-distance evidence.
    ``margins=False`` skips the O(n^2) pair scan (production scale;
    guards keep it on) and reports (nan, nan).
    """
    m = _normalize(mat.astype(np.float64))
    c = np.asarray(centroid, dtype=np.float64)
    c = c / max(np.linalg.norm(c), 1e-12)
    cent_sim = m @ c
    # keep-priority: ascending centroid similarity (farthest first),
    # ids ascending break ties
    order = np.lexsort((ids, cent_sim))
    sims = m @ m.T
    n = len(ids)
    keep = np.zeros(n, dtype=bool)
    survivor = np.full(n, -1, dtype=np.int64)
    max_cos = np.full(n, np.nan)
    # incremental running max: best[j] / best_at[j] track the highest
    # cosine (and its holder) between j and the kept set so far — one
    # vectorized update per KEPT item instead of a gather per item
    # (strict > keeps the earliest kept argmax, matching np.argmax's
    # first-winner tie rule in keep order)
    best = np.full(n, -np.inf)
    best_at = np.full(n, -1, dtype=np.int64)
    any_kept = False
    for i in order:
        if any_kept:
            max_cos[i] = best[i]
            if best[i] >= threshold:
                survivor[i] = best_at[i]
                continue
        keep[i] = True
        upd = sims[:, i] > best
        best[upd] = sims[upd, i]
        best_at[upd] = i
        any_kept = True
    if not margins:
        return keep, survivor, max_cos, (np.nan, np.nan)
    if n > 1:
        # min |cos - threshold| over distinct pairs, reusing the sims
        # buffer in place (the loop above is done with it) — no O(n^2)
        # index arrays, no second allocation
        np.subtract(sims, threshold, out=sims)
        np.fabs(sims, out=sims)
        np.fill_diagonal(sims, np.inf)
        thr_margin = float(sims.min())
    else:
        thr_margin = np.inf
    ordered = cent_sim[order]
    order_margin = float(np.min(np.diff(ordered))) if n > 1 else np.inf
    return keep, survivor, max_cos, (thr_margin, order_margin)


def semantic_dedup(
    ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iters: int = 4,
    threshold: float = 0.95,
    max_cluster_size: int = 4096,
    quant: int = _cluster.DEFAULT_QUANT,
    centroids: np.ndarray | None = None,
    margins: bool = True,
):
    """Returns a Dataset of one row PER INPUT ROW:
    (id, cluster, keep, survivor_id, max_cos_to_kept, thr_margin,
    order_margin). ``keep=False`` rows are the semantic duplicates to
    anti-filter out of the corpus (compose with
    ``decontam.filter_not_in_ds`` exactly like ``dedup.dedup_exact``);
    their ``survivor_id`` is the kept row that shadowed them.

    ``centroids`` short-circuits the fit (pass the output of
    ``cluster.fit`` to reuse one clustering across several thresholds).
    """
    if centroids is None:
        centroids, _ = _cluster.fit(
            ds, vec_col=vec_col, id_col=id_col, k=k, n_iters=n_iters, quant=quant
        )
    cent = np.asarray(centroids, dtype=np.float64)

    def label(t: pa.Table) -> pa.Table:
        id_type = t.schema.field(id_col).type
        vec_type = t.schema.field(vec_col).type
        schema = pa.schema(
            [(id_col, id_type), (vec_col, vec_type), ("cluster", pa.int64())]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        # cluster's float64 extraction (not similarity's float32 cast):
        # quantization must see the same values fit() saw.
        q = _cluster.quantize(_cluster._batch_matrix(t, vec_col), quant)
        a = np.argmin(_cluster._dist2(q, cent), axis=1)
        return pa.table(
            {
                id_col: t.column(id_col),
                vec_col: t.column(vec_col),
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
            },
            schema=schema,
        )

    labelled = ds.map_batches(label, batch_format="pyarrow")

    def per_cluster(t: pa.Table) -> pa.Table:
        # zero-copy Arrow group (a pandas group would box every vector
        # into a per-row object — measured 2x the whole stage)
        cid = int(t.column("cluster")[0].as_py())
        ids_all = t.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids_all, kind="stable")
        t = t.take(pa.array(order))
        n_all = t.num_rows
        n_head = min(n_all, max_cluster_size)
        if n_all > max_cluster_size:
            # NEVER drop data on overflow: rows beyond the cap pass
            # through as kept (under-dedup, logged) — smallest ids are
            # deduped, the tail is passed through.
            _log.warning(
                "semantic_dedup: cluster %d has %d rows, capped to %d "
                "(%d rows pass through undeduped)",
                cid, n_all, max_cluster_size, n_all - max_cluster_size,
            )
        head = t.slice(0, n_head)
        ids = head.column(id_col).to_numpy(zero_copy_only=False)
        mat = _cluster._batch_matrix(head, vec_col)
        keep, surv, mc, (thr_m, ord_m) = _greedy_dedup(
            ids, mat, cent[cid], threshold, margins=margins
        )
        surv_vals = ids[np.maximum(surv, 0)]
        id_type = t.schema.field(id_col).type
        n_tail = n_all - n_head
        return pa.table(
            {
                id_col: t.column(id_col),
                "cluster": pa.array(np.full(n_all, cid, np.int64)),
                "keep": pa.array(
                    np.concatenate([keep, np.ones(n_tail, bool)])
                ),
                "survivor_id": pa.concat_arrays(
                    [
                        pa.array(surv_vals, id_type, mask=surv < 0),
                        pa.nulls(n_tail, id_type),
                    ]
                ),
                "max_cos_to_kept": pa.array(
                    np.concatenate([mc, np.full(n_tail, np.nan)])
                ),
                "thr_margin": pa.array(
                    np.concatenate(
                        [np.full(n_head, thr_m), np.full(n_tail, np.nan)]
                    )
                ),
                "order_margin": pa.array(
                    np.concatenate(
                        [np.full(n_head, ord_m), np.full(n_tail, np.nan)]
                    )
                ),
            }
        )

    return labelled.groupby("cluster").map_groups(
        per_cluster, batch_format="pyarrow"
    )


def semantic_dedup_reference(
    ids: np.ndarray,
    mat: np.ndarray,
    k: int,
    n_iters: int,
    threshold: float,
    quant: int = _cluster.DEFAULT_QUANT,
):
    """Driver-side single-array reference of the identical algorithm
    (same fit, same labelling, same per-cluster greedy on id-sorted
    rows) for exactness guards — the kmeans_guard pattern. Returns
    {id: (cluster, keep, survivor_id)} plus the min margins."""
    ids = np.asarray(ids, dtype=np.int64)
    mat = np.asarray(mat, dtype=np.float64)
    cent, _, _ = _cluster.fit_reference(mat, ids, k, n_iters, quant)
    q = _cluster.quantize(mat, quant)
    a = np.argmin(_cluster._dist2(q, cent), axis=1)
    out: dict[int, tuple[int, bool, int | None]] = {}
    thr_margin = np.inf
    order_margin = np.inf
    for cid in range(cent.shape[0]):
        mask = a == cid
        if not mask.any():
            continue
        cids = ids[mask]
        o = np.argsort(cids, kind="stable")
        cids = cids[o]
        cmat = mat[mask][o]
        keep, surv, _, (tm, om) = _greedy_dedup(
            cids, cmat, cent[cid], threshold
        )
        thr_margin = min(thr_margin, tm)
        order_margin = min(order_margin, om)
        for i, rid in enumerate(cids):
            out[int(rid)] = (
                cid,
                bool(keep[i]),
                None if surv[i] < 0 else int(cids[surv[i]]),
            )
    return out, thr_margin, order_margin
