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
nowhere near a decision boundary (threshold margin, keep-order margin,
centroid-argmin margin), so reproducibility never silently rests on
ties.
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
    for pos in range(n):
        i = order[pos]
        kept_idx = np.flatnonzero(keep)
        if kept_idx.size:
            s = sims[i, kept_idx]
            j = int(np.argmax(s))
            max_cos[i] = s[j]
            if s[j] >= threshold:
                survivor[i] = kept_idx[j]
                continue
        keep[i] = True
    iu, ju = np.triu_indices(n, 1)
    thr_margin = (
        float(np.min(np.abs(sims[iu, ju] - threshold))) if iu.size else np.inf
    )
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

    def per_cluster(df):
        import pandas as pd

        cid = int(df["cluster"].iloc[0])
        df = df.sort_values(id_col, kind="stable").reset_index(drop=True)
        if len(df) > max_cluster_size:
            # NEVER drop data on overflow: rows beyond the cap pass
            # through as kept (under-dedup, logged) — smallest ids are
            # deduped, the tail is passed through.
            _log.warning(
                "semantic_dedup: cluster %d has %d rows, capped to %d "
                "(%d rows pass through undeduped)",
                cid, len(df), max_cluster_size, len(df) - max_cluster_size,
            )
        head = df.iloc[:max_cluster_size]
        tail = df.iloc[max_cluster_size:]
        ids = head[id_col].to_numpy()
        mat = np.asarray(head[vec_col].tolist(), dtype=np.float64)
        keep, surv, mc, (thr_m, ord_m) = _greedy_dedup(
            ids, mat, cent[cid], threshold
        )
        out = pd.DataFrame(
            {
                id_col: ids,
                "cluster": np.int64(cid),
                "keep": keep,
                "survivor_id": [
                    None if s < 0 else ids[s] for s in surv
                ],
                "max_cos_to_kept": mc,
                "thr_margin": thr_m,
                "order_margin": ord_m,
            }
        )
        if len(tail):
            out = pd.concat(
                [
                    out,
                    pd.DataFrame(
                        {
                            id_col: tail[id_col].to_numpy(),
                            "cluster": np.int64(cid),
                            "keep": True,
                            "survivor_id": None,
                            "max_cos_to_kept": np.nan,
                            "thr_margin": np.nan,
                            "order_margin": np.nan,
                        }
                    ),
                ],
                ignore_index=True,
            )
        out["survivor_id"] = out["survivor_id"].astype("Int64")
        return out

    return labelled.groupby("cluster").map_groups(
        per_cluster, batch_format="pandas"
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
