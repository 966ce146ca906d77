"""Similarity search over an embedding column (``list<float>``).

- ``knn_bruteforce``: exact cosine top-k. The query matrix is broadcast
  once via ``ray.put`` and every batch does ONE numpy matmul against it —
  the per-batch local top-k rows (k per query per batch) are the only thing
  reduced on the driver, so the full corpus streams. This is the baseline
  and the verification oracle.
- ``knn_lsh``: the scale path — random-hyperplane LSH bucket signatures
  assign each vector to a bucket per table; queries probe only matching
  buckets (here expressed as a filter + the same brute-force kernel over
  the candidate subset). Recall is tunable by (n_tables, n_bits).
- ``embedding_near_dup``: near-duplicate vectors via the same LSH buckets +
  exact cosine verify within buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float32)
    return flat.reshape(len(arr), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _TopKScorer:
    """Actor-pool stage: holds the normalized query matrix (fetched from the
    object store once per actor) and emits per-batch local top-k.

    The output schema is pinned explicitly (id type taken from the input
    column): an upstream candidate filter can empty a block, and an
    inferred schema on an empty list degrades to ``null`` type, breaking
    the driver-side ``concat_tables`` (the round-1 knn_lsh crash).
    Similarities accumulate in float64 — float32 sums make top-k
    membership flaky when neighbors are sub-ulp apart."""

    def __init__(self, queries_ref, id_col: str, vec_col: str, k: int):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.q = _normalize(np.asarray(q, dtype=np.float32)).astype(np.float64)
        self.id_col = id_col
        self.vec_col = vec_col
        self.k = k

    def _out_schema(self, id_type: pa.DataType) -> pa.Schema:
        return pa.schema(
            [("query_id", pa.int32()), (self.id_col, id_type), ("cosine", pa.float64())]
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        id_type = batch.schema.field(self.id_col).type
        schema = self._out_schema(id_type)
        if batch.num_rows == 0:
            return schema.empty_table()
        m = _normalize(_batch_matrix(batch, self.vec_col)).astype(np.float64)
        sims = m @ self.q.T  # (rows, n_queries)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        k = min(self.k, len(ids))
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            top = np.argpartition(-col, k - 1)[:k] if k < len(col) else np.arange(len(col))
            for i in top:
                out_q.append(qi)
                out_id.append(ids[i])
                out_sim.append(float(col[i]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int32()),
                self.id_col: pa.array(out_id, id_type),
                "cosine": pa.array(out_sim, pa.float64()),
            },
            schema=schema,
        )


def knn_bruteforce(
    ds,
    queries: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    concurrency=(1, 8),
) -> pa.Table:
    """Exact cosine top-k per query vector. Returns
    (query_id, id, cosine, rank) sorted by (query_id, -cosine, id)."""
    import ray

    queries = np.asarray(queries, dtype=np.float32)
    # broadcast once, read per actor — never per batch. Small matrices ride
    # in the constructor args directly (object-store refs in constructor
    # args would make actor restarts fragile, ray#53727); big ones go
    # through the object store.
    q_ref = queries if queries.nbytes < (1 << 20) else ray.put(queries)
    partials = ds.map_batches(
        _TopKScorer,
        fn_constructor_kwargs=dict(queries_ref=q_ref, id_col=id_col, vec_col=vec_col, k=k),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
    # Local top-k rows are tiny (k × n_queries × n_batches) → driver reduce.
    # Zero-row blocks are dropped before concat: Ray can emit schema-less
    # empty placeholder blocks that would fail concat_tables.
    t = partials.to_arrow_refs()
    tables = [x for x in ray.get(t) if x.num_rows > 0]
    if not tables:
        # all candidate blocks were empty — typed empty result
        id_type = ds.schema().base_schema.field(id_col).type
        allt = pa.schema(
            [("query_id", pa.int32()), (id_col, id_type), ("cosine", pa.float64())]
        ).empty_table()
    else:
        allt = pa.concat_tables(tables)
    import pandas as pd

    df = allt.to_pandas()
    df = df.sort_values(["query_id", "cosine", id_col], ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(df, preserve_index=False)


def lsh_signature(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(rows,) uint64 bucket ids from sign bits against random hyperplanes."""
    bits = (m @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.uint64))
    return (bits.astype(np.uint64) * weights).sum(axis=1).astype(np.uint64)


def add_lsh_buckets(
    ds,
    vec_col: str = "embedding",
    n_bits: int = 8,
    n_tables: int = 4,
    dim: int | None = None,
    seed: int = 42,
):
    """Append one bucket column per LSH table (lsh_0..lsh_{t-1}).

    Pass ``dim`` to pre-build the hyperplanes; otherwise they are learned
    from the first non-empty batch. Zero-row blocks (empty parquet
    fragments, upstream filters) pass through with typed empty bucket
    columns — the same guard every other vector stage here carries."""

    class _Bucketer:
        def __init__(self):
            if dim is not None:
                self.planes = self._build(dim)
            else:
                self.planes = None

        @staticmethod
        def _build(d: int):
            rng = np.random.default_rng(seed)
            return [
                rng.standard_normal((n_bits, d)).astype(np.float32)
                for _ in range(n_tables)
            ]

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                for t in range(n_tables):
                    batch = batch.append_column(
                        f"lsh_{t}", pa.array([], pa.uint64())
                    )
                return batch
            m = _batch_matrix(batch, vec_col)
            if self.planes is None:
                self.planes = self._build(m.shape[1])
            for t, planes in enumerate(self.planes):
                batch = batch.append_column(
                    f"lsh_{t}", pa.array(lsh_signature(m, planes), pa.uint64())
                )
            return batch

    return ds.map_batches(_Bucketer, batch_format="pyarrow", concurrency=(1, 8), num_cpus=1)


def knn_lsh(
    ds,
    queries: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> pa.Table:
    """Approximate top-k: probe only rows sharing an LSH bucket with the
    query in at least one table, then exact-score the candidates."""
    queries = np.asarray(queries, dtype=np.float32)
    rng = np.random.default_rng(seed)
    dim = queries.shape[1]
    planes = [rng.standard_normal((n_bits, dim)).astype(np.float32) for _ in range(n_tables)]
    qn = _normalize(queries)
    q_sigs = [lsh_signature(qn, p) for p in planes]  # per table: (n_queries,)

    bucketed = add_lsh_buckets(ds, vec_col, n_bits, n_tables, dim=dim, seed=seed)
    sig_sets = [set(s.tolist()) for s in q_sigs]

    def candidate_filter(batch: pa.Table) -> pa.Table:
        keep = np.zeros(batch.num_rows, dtype=bool)
        for t in range(n_tables):
            col = batch.column(f"lsh_{t}").to_numpy(zero_copy_only=False)
            keep |= np.isin(col, list(sig_sets[t]))
        return batch.filter(pa.array(keep))

    candidates = bucketed.map_batches(candidate_filter, batch_format="pyarrow")
    return knn_bruteforce(candidates, queries, id_col, vec_col, k)


def train_ivf_centroids(
    ds,
    vec_col: str = "embedding",
    n_cells: int = 64,
    sample_size: int = 20_000,
    n_iters: int = 12,
    seed: int = 42,
) -> np.ndarray:
    """Spherical k-means coarse quantizer trained on a driver-side sample
    (the sample is small; the corpus never materializes). Deterministic."""
    sample = ds.limit(sample_size).take_all()
    m = _normalize(np.stack([r[vec_col] for r in sample]).astype(np.float32))
    rng = np.random.default_rng(seed)
    k = min(n_cells, len(m))
    centroids = m[rng.choice(len(m), size=k, replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(m @ centroids.T, axis=1)
        for c in range(k):
            members = m[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    return centroids


def knn_ivf(
    ds,
    queries: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 64,
    n_probe: int = 8,
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> pa.Table:
    """IVF approximate top-k: assign every vector to its nearest coarse
    centroid (one matmul per batch against the broadcast centroid matrix),
    keep only rows in the union of each query's ``n_probe`` closest cells,
    exact-score the survivors. The scan is one streaming pass; recall is
    tuned by (n_cells, n_probe)."""
    queries = np.asarray(queries, dtype=np.float32)
    if centroids is None:
        centroids = train_ivf_centroids(ds, vec_col, n_cells, seed=seed)
    qn = _normalize(queries)
    sims = qn @ centroids.T  # (n_queries, n_cells)
    probe = min(n_probe, centroids.shape[0])
    probe_cells = set()
    for qi in range(qn.shape[0]):
        probe_cells.update(np.argsort(-sims[qi])[:probe].tolist())
    probe_arr = np.array(sorted(probe_cells), dtype=np.int64)

    import ray

    cent_ref = centroids if centroids.nbytes < (1 << 20) else ray.put(centroids)

    class _CellFilter:
        def __init__(self):
            self.centroids = (
                cent_ref if isinstance(cent_ref, np.ndarray) else ray.get(cent_ref)
            )

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            m = _normalize(_batch_matrix(batch, vec_col))
            cells = np.argmax(m @ self.centroids.T, axis=1)
            return batch.filter(pa.array(np.isin(cells, probe_arr)))

    candidates = ds.map_batches(
        _CellFilter, batch_format="pyarrow", concurrency=(1, 8), num_cpus=1
    )
    return knn_bruteforce(candidates, queries, id_col, vec_col, k)


def embedding_near_dup(
    ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_bits: int = 10,
    n_tables: int = 4,
    max_bucket_size: int = 512,
    seed: int = 42,
):
    """Near-duplicate vector pairs: per-LSH-table bucket groupby with an
    exact float64 cosine verify inside each bucket, pairs unioned across
    tables and deduped by one final (id_a, id_b) groupby.

    Scale contract: size ``n_bits`` to the corpus so expected bucket
    occupancy stays small — ``n_bits ≈ log2(n_rows / target_bucket)``
    (2^n_bits buckets per table). The per-bucket pairwise verify is hard
    bounded by ``max_bucket_size`` (smallest ids kept, overflow logged —
    never a silent cap); multiple tables recover recall the per-table
    bucketing loses. All tables ride ONE shuffle: rows are exploded to
    ``(bucket_key = table << n_bits | bucket, id, vector)`` long format
    (n_tables × corpus volume), one groupby co-partitions each bucket's
    vectors, and a final tiny (id_a, id_b) groupby dedups pairs found by
    several tables. (A union of n_tables separate groupby branches stalls
    Ray 2.49's streaming executor — measured, hence the single-key form.)"""
    import logging

    import pandas as pd

    log = logging.getLogger(__name__)

    planes_by_table = None  # built lazily once dim is known

    def explode(batch: pa.Table) -> pa.Table:
        nonlocal planes_by_table
        id_type = batch.schema.field(id_col).type
        vec_type = batch.schema.field(vec_col).type
        schema = pa.schema(
            [("bucket_key", pa.uint64()), (id_col, id_type), (vec_col, vec_type)]
        )
        if batch.num_rows == 0:
            return schema.empty_table()
        m = _batch_matrix(batch, vec_col)
        if planes_by_table is None:
            r = np.random.default_rng(seed)
            planes_by_table = [
                r.standard_normal((n_bits, m.shape[1])).astype(np.float32)
                for _ in range(n_tables)
            ]
        keys = []
        for t, planes in enumerate(planes_by_table):
            sig = lsh_signature(m, planes)
            keys.append(sig | np.uint64(t << n_bits))
        key_col = pa.array(np.concatenate(keys), pa.uint64())
        idx = pa.chunked_array([pa.array(np.arange(batch.num_rows, dtype=np.int64))] * n_tables)
        rep_ids = batch.column(id_col).take(idx)
        rep_vecs = batch.column(vec_col).take(idx)
        return pa.table({"bucket_key": key_col, id_col: rep_ids, vec_col: rep_vecs}, schema=schema)

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    def _id_out(a: np.ndarray) -> np.ndarray:
        # integer ids normalize to int64; string/other ids keep their dtype
        # (the id columns must be consistently typed across groups for the
        # final pair-dedup groupby)
        return a.astype("int64") if np.issubdtype(a.dtype, np.integer) else a

    def _empty(id_dtype) -> pd.DataFrame:
        out_dtype = "int64" if pd.api.types.is_integer_dtype(id_dtype) else id_dtype
        return pd.DataFrame({
            "id_a": pd.Series(dtype=out_dtype),
            "id_b": pd.Series(dtype=out_dtype),
            "cosine": pd.Series(dtype="float64"),
        })

    def verify(df):
        if len(df) < 2:
            return _empty(df[id_col].dtype)
        if len(df) > max_bucket_size:
            log.warning(
                "embedding_near_dup: bucket of %d capped to %d (dropped %d rows)",
                len(df), max_bucket_size, len(df) - max_bucket_size,
            )
            df = df.sort_values(id_col).head(max_bucket_size)
        m = _normalize(np.stack(df[vec_col].to_numpy()).astype(np.float64))
        sims = m @ m.T
        ids = df[id_col].to_numpy()
        ia, ib = np.triu_indices(len(df), k=1)
        mask = sims[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "id_a": _id_out(np.minimum(ids[ia[mask]], ids[ib[mask]])),
                "id_b": _id_out(np.maximum(ids[ia[mask]], ids[ib[mask]])),
                "cosine": sims[ia, ib][mask].astype(np.float64),
            }
        )

    pairs = exploded.groupby("bucket_key").map_groups(verify, batch_format="pandas")
    from ray.data.aggregate import Max

    # a pair found in several tables collapses to one row
    return pairs.groupby(["id_a", "id_b"]).aggregate(Max("cosine", alias_name="cosine"))


class _SemanticProbe:
    """Actor-pool stage for embedding-based decontamination: holds the
    normalized benchmark matrix (fetched once per actor), each batch is
    one matmul + row-max. Rows with a NULL vector never match (no
    content to compare) and are kept in drop mode."""

    def __init__(self, bench_ref, id_col: str, vec_col: str,
                 threshold: float, mode: str):
        import ray

        b = ray.get(bench_ref) if not isinstance(bench_ref, np.ndarray) else bench_ref
        self.bench = np.asarray(b, dtype=np.float64)
        self.id_col = id_col
        self.vec_col = vec_col
        self.threshold = threshold
        self.mode = mode

    def _max_sims(self, batch: pa.Table) -> np.ndarray:
        arr = batch.column(self.vec_col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        valid = arr.is_valid().to_numpy(zero_copy_only=False)
        sims = np.full(len(arr), -2.0)  # below any cosine: null never matches
        if valid.any() and len(self.bench):
            m = _normalize(_batch_matrix(batch.filter(pa.array(valid)),
                                         self.vec_col)).astype(np.float64)
            s = (m @ self.bench.T).max(axis=1)
            # a NaN element inside a corpus vector (null list element /
            # NaN float) makes its similarity NaN; treat it like a null
            # vector — never contaminated, KEPT in drop mode — so drop
            # stays the exact complement of stats
            s[~np.isfinite(s)] = -2.0
            sims[valid] = s
        return sims

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 and self.mode == "stats":
            return pa.schema(
                [(self.id_col, batch.schema.field(self.id_col).type),
                 ("max_cosine", pa.float64()),
                 ("contaminated", pa.bool_())]
            ).empty_table()
        sims = self._max_sims(batch)
        if self.mode == "drop":
            return batch.filter(pa.array(sims < self.threshold))
        # -2.0 is an internal sentinel (null / non-finite vector): emit a
        # NULL max_cosine, never a fabricated out-of-range similarity
        cos = pa.array(
            [None if v == -2.0 else float(v) for v in sims], pa.float64()
        )
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "max_cosine": cos,
                "contaminated": pa.array(sims >= self.threshold),
            }
        )


def _bench_matrix(bench_ds, vec_col: str, budget_rows: int) -> np.ndarray:
    """Collect + L2-normalize the benchmark embedding matrix on the
    driver (small by the decontamination contract; loud budget — null
    vectors contribute nothing)."""
    parts, n = [], 0
    for b in bench_ds.iter_batches(batch_format="pyarrow"):
        col = b.column(vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = col.is_valid().to_numpy(zero_copy_only=False)
        if not valid.any():
            continue
        parts.append(_batch_matrix(b.filter(pa.array(valid)), vec_col))
        n += parts[-1].shape[0]
        if n > budget_rows:
            raise ValueError(
                f"semantic_decontaminate: benchmark side exceeds "
                f"bench_budget_rows={budget_rows}; raise the budget "
                "(truncating would silently keep leaked docs)"
            )
    if not parts:
        return np.empty((0, 1), np.float64)
    m = _normalize(np.vstack(parts).astype(np.float64))
    if not np.isfinite(m).all():
        # one NaN benchmark vector would poison max-cosine for EVERY
        # corpus row (silently dropping the whole corpus in drop mode)
        raise ValueError(
            "semantic_decontaminate: benchmark embeddings contain NaN/"
            "null elements; clean the benchmark side first"
        )
    return m


def semantic_decontaminate(
    ds,
    bench_ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    threshold: float = 0.95,
    mode: str = "drop",
    bench_budget_rows: int = 1 << 20,
    batch_size: int = 4096,
    concurrency=None,
):
    """Embedding-based benchmark decontamination (the semantic tier
    above exact digests and 13-gram overlap: a paraphrased benchmark
    row shares no n-gram but sits next to it in embedding space). Drop
    (``mode="drop"``) or flag (``mode="stats"`` →
    ``(id, max_cosine, contaminated)``) corpus rows whose vector's max
    cosine against ANY benchmark vector reaches ``threshold``.

    Scale shape: the benchmark matrix is collected under a loud row
    budget, L2-normalized once, broadcast once per actor; each corpus
    batch costs ONE matmul — the corpus is never shuffled. The same
    per-row determinism as knn_bruteforce (float64 accumulation,
    row-independent) makes the flags layout-invariant."""
    import ray

    from medea_ray.engine.pipeline import ACTOR_NUM_CPUS, default_pool

    if mode not in ("drop", "stats"):
        raise ValueError(f"mode must be 'drop' or 'stats', got {mode!r}")
    bench = _bench_matrix(bench_ds, vec_col, bench_budget_rows)
    # small matrices ride in the constructor args directly (object-store
    # refs in constructor args make actor restarts fragile, ray#53727)
    ref = bench if bench.nbytes < (1 << 20) else ray.put(bench)
    pool = concurrency if concurrency is not None else default_pool()
    return ds.map_batches(
        _SemanticProbe,
        fn_constructor_kwargs=dict(
            bench_ref=ref, id_col=id_col, vec_col=vec_col,
            threshold=threshold, mode=mode,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool,
        num_cpus=ACTOR_NUM_CPUS,
    )
