"""Deduplication operators for large-scale text corpora.

All variants follow the same scale shape: a vectorized/batch-local
signature stage (``map_batches``) followed by ONE hash-partitioned shuffle
on the signature (``groupby``), never an all-pairs comparison:

- exact:         md5(text) → groupby hash → keep min id per group.
- minhash_lsh:   shingles → k minhashes → b bands; groupby (band, band-hash)
                 emits candidate groups; optional exact-Jaccard verify on
                 the (small) candidate set.
- simhash:       64-bit simhash; near-dups collide on rotated band keys.
- embedding:     cosine near-dup via LSH over random hyperplanes (see
                 similarity.py for the search-side of the same idea).

Signatures are deterministic (splitmix64 / fixed seeds) so results are
stable across runs, cluster sizes, and resume.
"""

from __future__ import annotations

import hashlib
import logging
import re

import numpy as np
import pyarrow as pa

_WORD_RE = re.compile(r"\w+", re.UNICODE)

_log = logging.getLogger(__name__)

# Hard bound on per-bucket state in candidate collection and verification.
# A degenerate bucket (empty docs, boilerplate) otherwise collects the
# whole corpus into one group; overflow is logged — never a silent cap.
DEFAULT_MAX_BUCKET = 1024


def _collect_bucket_ids(
    exploded,
    id_col: str,
    key_cols: list[str],
    max_bucket_size: int = DEFAULT_MAX_BUCKET,
    unique_ids: bool = False,
    bucket_key: str | None = None,
    n_buckets: int = 64,
):
    """(key..., n, ids, dropped) per bucket with ≥2 members. The
    exchange groups by a coarse hash bucket of ``bucket_key`` (default
    ``key_cols[-1]`` — the highest-cardinality key by convention:
    band/block VALUES, not block indices), and each coarse group runs
    fully vectorized Arrow: optional (keys, id) dedup, one sort by
    (keys..., id), one ``group_by(keys).aggregate([(id, 'list')])``
    (single-threaded so the sorted id order is preserved), then
    ``list_slice`` capping to the ``max_bucket_size`` smallest ids
    (``dropped`` records the overflow — logged in aggregate, never a
    silent cap). Replaces the per-(band,hash)-group ``map_groups``
    whose task-per-group scheduling dominated at bench scale. The
    output stays Arrow-native — ``ids`` is ``list<id type>``, keys keep
    their input types."""
    import pyarrow.compute as pc

    from medea_ray.engine.uniqueness import _hash64

    bkey = bucket_key or key_cols[-1]
    mask = np.int64(n_buckets - 1)

    def add_bucket(t: pa.Table) -> pa.Table:
        kc = t.column(bkey)
        if pa.types.is_integer(kc.type):
            b = pc.fill_null(kc, 0).to_numpy(zero_copy_only=False).astype(
                np.int64
            ) & mask
        else:
            s = (
                kc
                if pa.types.is_string(kc.type) or pa.types.is_large_string(kc.type)
                else kc.cast(pa.string())
            )
            b = np.asarray(_hash64(pc.fill_null(s, ""))).view(np.int64) & mask
        return t.append_column("_cb", pa.array(b, pa.int64()))

    def per_bucket(t: pa.Table) -> pa.Table:
        id_type = t.schema.field(id_col).type
        schema = pa.schema(
            [(k, t.schema.field(k).type) for k in key_cols]
            + [("n", pa.int64()), ("ids", pa.list_(id_type)), ("dropped", pa.int64())]
        )
        t = t.select(key_cols + [id_col])
        if unique_ids:
            t = t.group_by(key_cols + [id_col], use_threads=False).aggregate([])
        t = t.sort_by(
            [(k, "ascending") for k in key_cols] + [(id_col, "ascending")]
        )
        g = t.group_by(key_cols, use_threads=False).aggregate([(id_col, "list")])
        lists = g.column(f"{id_col}_list")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        n = pc.cast(pc.list_value_length(lists), pa.int64())
        keep = pc.greater_equal(n, 2)
        g = g.filter(keep)
        if g.num_rows == 0:
            return schema.empty_table()
        lists = lists.filter(keep)
        n = n.filter(keep)
        dropped = pc.max_element_wise(pc.subtract(n, max_bucket_size), 0)
        n_over = pc.sum(pc.cast(pc.greater(dropped, 0), pa.int64())).as_py() or 0
        if n_over:
            _log.warning(
                "%d bucket(s) over max_bucket_size=%d (largest %d members; "
                "%d ids dropped total)",
                n_over, max_bucket_size, pc.max(n).as_py(),
                pc.sum(dropped).as_py(),
            )
        capped = pc.list_slice(lists, 0, max_bucket_size)
        cols = {k: g.column(k) for k in key_cols}
        cols["n"] = n
        cols["ids"] = pc.cast(capped, pa.list_(id_type))
        cols["dropped"] = dropped
        return pa.table(cols, schema=schema)

    return (
        exploded.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(per_bucket, batch_format="pyarrow")
    )

_M64 = (1 << 64) - 1
_GOLD = 0x9E3779B97F4A7C15


def _splitmix64_int(x: int) -> int:
    x = (x + _GOLD) & _M64
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & _M64
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & _M64
    x ^= x >> 31
    return x


def shingles(text: str, n: int = 3) -> set[int]:
    """Word n-gram shingle hashes (64-bit)."""
    words = _WORD_RE.findall(text.lower())
    if len(words) < n:
        return {hash_bytes(" ".join(words).encode())} if words else set()
    out = set()
    for i in range(len(words) - n + 1):
        out.add(hash_bytes(" ".join(words[i : i + n]).encode()))
    return out


def hash_bytes(b: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "little")


# -- exact dedup -------------------------------------------------------------


def md5_hex(texts: list) -> list:
    return [None if t is None else hashlib.md5(t.encode()).hexdigest() for t in texts]


def md5_hex_col(col) -> pa.Array:
    """md5 hexdigests of a string column, hashed straight off the Arrow
    data buffer (zero-copy memoryview slices — the text payload is never
    materialized as Python strs; the same bus-traffic lever as
    pipeline.ValidatorKernel.validate_column). Identical output to
    ``md5_hex(col.to_pylist())``: Arrow string storage IS each value's
    UTF-8 encoding. Nulls stay null; non-string columns fall back to the
    list path."""
    from medea_ray.engine.arrow_util import string_buffer_parts

    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(a) == 0:
        return pa.array([], pa.string())
    parts = string_buffer_parts(a)
    if parts is None:
        return pa.array(md5_hex(a.to_pylist()), pa.string())
    data, offsets, null_mask = parts
    _md5 = hashlib.md5
    return pa.array(
        [
            None
            if (null_mask is not None and null_mask[i])
            else _md5(data[offsets[i] : offsets[i + 1]]).hexdigest()
            for i in range(len(a))
        ],
        pa.string(),
    )


def md5_int_pairs(col) -> np.ndarray:
    """Raw md5 per row of a NON-NULL string column as an (n, 2) int64
    array (the 16 digest bytes little-endian-viewed — the same digest
    information as the hex form, exchanged as two native int64 columns
    instead of a 32-char string). Hashes off the Arrow buffer."""
    from medea_ray.engine.arrow_util import as_array, string_buffer_parts

    a = as_array(col)
    if len(a) == 0:
        return np.empty((0, 2), np.int64)
    parts = string_buffer_parts(a)
    _md5 = hashlib.md5
    if parts is None or parts[2] is not None:
        digs = b"".join(_md5(v.encode()).digest() for v in a.to_pylist())
    else:
        data, off, _ = parts
        digs = b"".join(
            _md5(data[off[i] : off[i + 1]]).digest() for i in range(len(a))
        )
    return np.frombuffer(digs, dtype="<i8").reshape(-1, 2)


def add_content_hash(ds, text_col: str = "text", out_col: str = "content_md5"):
    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(out_col, md5_hex_col(batch.column(text_col)))

    return ds.map_batches(fn, batch_format="pyarrow")


def exact_dup_groups(ds, id_col: str, text_col: str = "text"):
    """(content_md5, n, keep_id): duplicate groups with the survivor
    (min id). One shuffle on the 16-byte hash, never on the text —
    reduced via the shared adaptive bucket exchange (n counts ROWS per
    group: the instance count, not non-null ids, so it rides a constant
    ones column)."""
    from medea_ray.engine.exchange import bucketed_group_agg

    def with_ones(t: pa.Table) -> pa.Table:
        return pa.table({
            "content_md5": md5_hex_col(t.column(text_col)),
            id_col: t.column(id_col),
            "one": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
        })

    hashed = ds.map_batches(with_ones, batch_format="pyarrow")
    return bucketed_group_agg(
        hashed,
        ["content_md5"],
        [("one", "sum", "n"), (id_col, "min", "keep_id")],
    ).filter(expr="n > 1")


def dedup_exact(
    ds,
    id_col: str,
    text_col: str = "text",
    concurrency=(1, 16),
    drop_budget_rows: int = 1 << 22,
    n_buckets: int | None = None,
    stats_out: dict | None = None,
):
    """Keep one row per distinct text (min-``id_col`` survivor). Returns
    the deduplicated Dataset (all original columns).

    Passes, none of which ever shuffles the text column (the round-2
    implementation ran one full-row groupby on the content hash — the
    most expensive possible shape at corpus scale):

    1. project to (content_md5, id) and groupby the 16-byte hash; each
       duplicate group emits its NON-survivor ids (everything but the min).
    2. anti-filter the original dataset map-side with that drop-id set:
       broadcast once (``ray.put``, the ``decontam.filter_not_in`` shape)
       while the set fits ``drop_budget_rows``; above the budget the
       filter runs in ``n_buckets`` deterministic hash-bucket passes
       (``referential.bucket_of``) — pass b broadcasts only bucket b's
       drop ids and emits only the rows whose id hashes to b, so driver
       and actor memory stay bounded at ~|drop set| / n_buckets while the
       result is exactly the broadcast answer (each row lands in exactly
       one bucket; null-id rows ride a dedicated -1 pass). The bucket
       count is logged, never silent.

    Rows with a null ``text_col`` have no content to compare and are
    always kept.

    ``id_col`` should be unique for exact keep-one semantics (the id IS
    the filter key). With duplicated ids the operator degrades safely
    within a group — every row sharing the survivor's id value is kept,
    never dropped — but an id duplicated across two *different* texts can
    drop more than intended; pre-assign a unique id upstream in that case.

    When ``stats_out`` is a dict, ``stats_out["n_dropped"]`` receives the
    dropped id-set cardinality (== rows dropped under the unique-id
    precondition) so callers can derive the survivor count without an
    extra pass over the output (pretrain.prepare_corpus's accounting).
    """
    import pyarrow.compute as pc

    from medea_ray.engine.decontam import filter_not_in_ds

    # Reduce shape (round 5): digests ride as two int64 columns and the
    # exchange groups by a d0-derived bucket (one int64 key; a digest's
    # rows all land in one bucket), each bucket computing its drop ids
    # with three vectorized Arrow passes — unique (digest, id) pairs,
    # min id per digest, hash-join + keep ids above their group minimum.
    # The old per-group map_groups over the generic content_md5 string
    # sort measured 7.8 s at the 600k-page bench shape; this is ~4×
    # less. Per-batch (digest, id) pre-dedup keeps a key occurring k
    # times in a block to ONE exchanged row.
    def to_key_id(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column(text_col)))
        pair = md5_int_pairs(t.column(text_col))
        out = pa.table({
            "d0": pa.array(pair[:, 0], pa.int64()),
            "d1": pa.array(pair[:, 1], pa.int64()),
            id_col: t.column(id_col),
        })
        return out.group_by(["d0", "d1", id_col]).aggregate([])

    keyed = ds.map_batches(to_key_id, batch_format="pyarrow").materialize()
    # one task per bucket: tiny exchanges take one bucket (a single
    # vectorized task beats per-group scheduling), large ones fan out
    reduce_buckets = 1 if keyed.count() <= 1 << 18 else 64
    mask = np.int64(reduce_buckets - 1)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = t.column("d0").to_numpy(zero_copy_only=False) & mask
        return t.append_column("_db", pa.array(b, pa.int64()))

    def bucket_drop_ids(t: pa.Table) -> pa.Table:
        id_type = t.schema.field(id_col).type
        uniq = t.select(["d0", "d1", id_col]).group_by(
            ["d0", "d1", id_col]
        ).aggregate([])
        mins = uniq.group_by(["d0", "d1"]).aggregate([(id_col, "min")])
        j = uniq.join(mins, keys=["d0", "d1"])
        ids, id_min = j.column(id_col), j.column(f"{id_col}_min")
        # drop everything above the group minimum. A null id sorts after
        # every value (the pre-round-5 pc.array_sort_indices order): it
        # is dropped whenever the group has a non-null survivor, kept
        # when the whole group is id-less (min over all-null is null)
        drop = pc.or_(
            pc.fill_null(pc.not_equal(ids, id_min), False),
            pc.and_(pc.is_null(ids), pc.is_valid(id_min)),
        )
        return pa.table(
            {"drop_id": j.filter(drop).column(id_col)},
            schema=pa.schema([("drop_id", id_type)]),
        )

    dropped = (
        keyed.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_db")
        .map_groups(bucket_drop_ids, batch_format="pyarrow")
    )
    # budget-aware anti-join (decontam.filter_not_in_ds): materializes the
    # drop-id rows only — dup_rate × corpus ids, never the corpus — logs
    # cardinality/bytes, broadcasts within budget, else hash-bucket passes
    # (each bucket is one more streaming pass over the INPUT pipeline; the
    # bucket cap and the Ray-2.49 union-stall rationale live there)
    return filter_not_in_ds(
        ds,
        id_col,
        dropped,
        "drop_id",
        budget_rows=drop_budget_rows,
        n_buckets=n_buckets,
        concurrency=concurrency,
        stats_out=stats_out,
    )


# -- MinHash + LSH -----------------------------------------------------------


class MinHashSigner:
    """Stateful map_batches stage: k permutation seeds are derived once per
    actor; emits per-row minhash band keys (id, band, band_hash)."""

    def __init__(
        self,
        id_col: str,
        text_col: str = "text",
        num_hashes: int = 64,
        num_bands: int = 16,
        shingle_n: int = 3,
        seed: int = 42,
        carry_text: bool = False,
        carry_signature: bool = False,
    ):
        assert num_hashes % num_bands == 0
        self.id_col = id_col
        self.text_col = text_col
        self.num_hashes = num_hashes
        self.num_bands = num_bands
        self.rows_per_band = num_hashes // num_bands
        self.shingle_n = shingle_n
        # carry_text=True co-partitions each bucket's TEXTS through the band
        # shuffle so verification can run inside map_groups (distributed)
        # instead of on the driver — at the cost of num_bands × text volume.
        # carry_signature=True instead ships the fixed-size minhash
        # signature (num_hashes × 8 B) for estimate-mode verification —
        # constant shuffle volume per row regardless of document length.
        self.carry_text = carry_text
        self.carry_signature = carry_signature
        rng = np.random.default_rng(seed)
        # hash family h_i(x) = splitmix64(x ^ seed_i): vectorized over the
        # (num_hashes × n_shingles) grid in uint64 — no Python-int loop.
        self.seeds = rng.integers(0, 1 << 63, size=num_hashes, dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray | None:
        sh = shingles(text, self.shingle_n)
        if not sh:
            return None
        x = np.fromiter(sh, dtype=np.uint64, count=len(sh))
        grid = x[None, :] ^ self.seeds[:, None]
        grid = (grid + np.uint64(_GOLD)).astype(np.uint64)
        grid ^= grid >> np.uint64(30)
        grid *= np.uint64(0xBF58476D1CE4E5B9)
        grid ^= grid >> np.uint64(27)
        grid *= np.uint64(0x94D049BB133111EB)
        grid ^= grid >> np.uint64(31)
        return grid.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        id_type = batch.schema.field(self.id_col).type
        fields = [
            (self.id_col, id_type),
            ("band", pa.int32()),
            ("band_key", pa.uint64()),
        ]
        if self.carry_text:
            fields.append((self.text_col, batch.schema.field(self.text_col).type))
        if self.carry_signature:
            fields.append(("sig", pa.binary()))
        schema = pa.schema(fields)
        ids, bands, keys, texts, sigs = [], [], [], [], []
        rpb = self.rows_per_band
        for rid, text in zip(
            batch.column(self.id_col).to_pylist(), batch.column(self.text_col).to_pylist()
        ):
            if text is None:
                continue
            sig = self.signature(text)
            if sig is None:
                continue
            sig_bytes = sig.tobytes() if self.carry_signature else None
            for b in range(self.num_bands):
                band_bytes = sig[b * rpb : (b + 1) * rpb].tobytes()
                ids.append(rid)
                bands.append(b)
                keys.append(hash_bytes(band_bytes + bytes([b])))
                if self.carry_text:
                    texts.append(text)
                if self.carry_signature:
                    sigs.append(sig_bytes)
        cols = {
            self.id_col: pa.array(ids, id_type),
            "band": pa.array(bands, pa.int32()),
            "band_key": pa.array(np.array(keys, dtype=np.uint64), pa.uint64()),
        }
        if self.carry_text:
            cols[self.text_col] = pa.array(texts, schema.field(self.text_col).type)
        if self.carry_signature:
            cols["sig"] = pa.array(sigs, pa.binary())
        return pa.table(cols, schema=schema)


def minhash_candidate_groups(
    ds,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 64,
    num_bands: int = 16,
    shingle_n: int = 3,
    concurrency=(1, 8),
    max_bucket_size: int = DEFAULT_MAX_BUCKET,
):
    """Near-duplicate candidate groups: rows sharing any LSH band bucket.
    Returns (band_key, n, ids, dropped) for buckets with ≥2 members — the
    shuffle moves only (id, band_key) pairs, b per row; per-bucket state is
    capped at ``max_bucket_size`` (see _collect_bucket_ids)."""
    signed = ds.map_batches(
        MinHashSigner,
        fn_constructor_kwargs=dict(
            id_col=id_col,
            text_col=text_col,
            num_hashes=num_hashes,
            num_bands=num_bands,
            shingle_n=shingle_n,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
    return _collect_bucket_ids(signed, id_col, ["band_key"], max_bucket_size)


def jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = shingles(a, n), shingles(b, n)
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def near_dup_pairs(
    ds,
    id_col: str,
    text_col: str = "text",
    threshold: float = 0.7,
    num_hashes: int = 64,
    num_bands: int = 16,
    shingle_n: int = 3,
    concurrency=(1, 8),
    max_bucket_size: int = DEFAULT_MAX_BUCKET,
    verify: str = "auto",
    auto_len_cutoff: int = 2048,
    auto_sample: int = 256,
):
    """MinHash-LSH candidates + distributed pair verification: every band
    bucket verifies its own members inside ``map_groups`` (pairwise over ≤
    ``max_bucket_size`` members), and a final tiny (id_a, id_b) groupby
    dedups pairs found in several bands. The driver only ever sees the
    verified pairs — never candidate texts (round 1 pulled them with
    take_all() and verified in a driver loop).

    ``verify="exact"`` co-partitions TEXTS through the band shuffle
    (num_bands × text volume) and computes exact n-gram Jaccard (shingle
    sets built once per member). ``verify="estimate"`` ships only the
    fixed num_hashes × 8 B minhash signature — constant shuffle volume
    per row regardless of document length, the right trade for long web
    pages — and estimates Jaccard as the fraction of agreeing signature
    components (unbiased; std ≈ sqrt(j(1-j)/num_hashes) ≈ 0.06 at k=64).
    The default ``verify="auto"`` peeks at ``auto_sample`` texts and picks
    exact only when the mean length is below ``auto_len_cutoff`` bytes
    (short snippets, where the estimate's ±0.06 matters most); web-page-
    scale text gets the constant-shuffle-volume estimate mode. The choice
    is logged — never a silent scale trap.
    Returns a pandas DataFrame (id_a, id_b, jaccard ≥ threshold)."""
    import pandas as pd

    if verify not in ("exact", "estimate", "auto"):
        raise ValueError(f"verify must be 'exact', 'estimate' or 'auto', got {verify!r}")
    if verify == "auto":
        sample = [
            r[text_col]
            for r in ds.limit(auto_sample).select_columns([text_col]).take(auto_sample)
            if r[text_col] is not None
        ]
        mean_len = sum(len(t) for t in sample) / len(sample) if sample else 0.0
        verify = "exact" if mean_len < auto_len_cutoff else "estimate"
        _log.info(
            "near_dup_pairs verify='auto': mean text length %.0f B over %d sampled"
            " rows -> %s verification (cutoff %d B)",
            mean_len, len(sample), verify, auto_len_cutoff,
        )
    exact = verify == "exact"
    signed = ds.map_batches(
        MinHashSigner,
        fn_constructor_kwargs=dict(
            id_col=id_col,
            text_col=text_col,
            num_hashes=num_hashes,
            num_bands=num_bands,
            shingle_n=shingle_n,
            carry_text=exact,
            carry_signature=not exact,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )

    def verify_group(t: pa.Table) -> pa.Table:
        id_type = t.schema.field(id_col).type
        schema = pa.schema(
            [("id_a", id_type), ("id_b", id_type), ("jaccard", pa.float64())]
        )
        if t.num_rows < 2:
            return schema.empty_table()
        ids = t.column(id_col).to_pylist()
        order = sorted(range(len(ids)), key=lambda i: ids[i])
        if len(order) > max_bucket_size:
            _log.warning(
                "near_dup_pairs: bucket of %d capped to %d (dropped %d members)",
                len(order), max_bucket_size, len(order) - max_bucket_size,
            )
            order = order[:max_bucket_size]
        out_a, out_b, out_j = [], [], []
        if exact:
            texts = t.column(text_col).to_pylist()
            members = [(ids[i], texts[i]) for i in order]
            sets = [shingles(tx, shingle_n) for _, tx in members]
            for i in range(len(members)):
                si = sets[i]
                if not si:
                    continue
                for j in range(i + 1, len(members)):
                    if members[j][0] == members[i][0]:
                        continue  # duplicate id rows are not near-dups of themselves
                    sj = sets[j]
                    if not sj:
                        continue
                    inter = len(si & sj)
                    if not inter:
                        continue
                    jac = inter / (len(si) + len(sj) - inter)
                    if jac >= threshold:
                        out_a.append(members[i][0])
                        out_b.append(members[j][0])
                        out_j.append(jac)
        else:
            raw = t.column("sig").to_pylist()
            sigs = np.stack(
                [np.frombuffer(raw[i], dtype=np.uint64) for i in order]
            )  # (m, num_hashes)
            kept_ids = [ids[i] for i in order]
            for i in range(len(kept_ids) - 1):
                est = (sigs[i] == sigs[i + 1 :]).mean(axis=1)  # vs all later rows
                for dj in np.nonzero(est >= threshold)[0]:
                    if kept_ids[i + 1 + dj] == kept_ids[i]:
                        continue  # duplicate id rows are not near-dups of themselves
                    out_a.append(kept_ids[i])
                    out_b.append(kept_ids[i + 1 + dj])
                    out_j.append(float(est[dj]))
        return pa.table(
            {
                "id_a": pa.array(out_a, id_type),
                "id_b": pa.array(out_b, id_type),
                "jaccard": pa.array(out_j, pa.float64()),
            },
            schema=schema,
        )

    pairs = signed.groupby("band_key").map_groups(verify_group, batch_format="pyarrow")
    from ray.data.aggregate import Max

    deduped = pairs.groupby(["id_a", "id_b"]).aggregate(Max("jaccard", alias_name="jaccard"))
    df = deduped.to_pandas()
    if len(df) == 0 or "id_a" not in df.columns:
        # empty Ray datasets lose their schema in to_pandas
        return pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}
        )
    return (
        df[["id_a", "id_b", "jaccard"]]
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


# -- SimHash -----------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit simhash over word-level features (deterministic).

    Vectorized kernel: each UNIQUE word is hashed once (occurrences carry
    through as frequency weights — identical result to per-occurrence
    accumulation), the 64 bit-planes are unpacked in one ``np.unpackbits``
    over the byte view, and the signed accumulation reduces to
    ``freq @ bits``. Bit i of the output is set iff the weighted count of
    one-bits exceeds half the total weight (acc > 0 in the ±1 form).
    ~40× faster than the round-1 per-word-numpy-alloc loop on web-page
    text; hashes are bit-identical (stability-tested)."""
    from collections import Counter

    words = _WORD_RE.findall(text.lower())
    if not words:
        return 0
    cnt = Counter(words)
    hs = np.fromiter(
        (hash_bytes(w.encode()) for w in cnt), dtype=np.uint64, count=len(cnt)
    )
    freq = np.fromiter(cnt.values(), dtype=np.int64, count=len(cnt))
    bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    ones = freq @ bits  # (64,) weighted count of set bits per position
    pos = ones * 2 > len(words)
    return int(np.packbits(pos, bitorder="little").view(np.uint64)[0])


def add_simhash(ds, text_col: str = "text", out_col: str = "simhash"):
    def fn(batch: pa.Table) -> pa.Table:
        vals = [
            None if t is None else simhash64(t) for t in batch.column(text_col).to_pylist()
        ]
        return batch.append_column(out_col, pa.array(vals, pa.uint64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def simhash_candidates(
    ds,
    id_col: str,
    text_col: str = "text",
    n_blocks: int = 4,
    max_bucket_size: int = DEFAULT_MAX_BUCKET,
):
    """Hamming-near candidates by block rotation: docs within Hamming
    distance < n_blocks share at least one exact 16-bit block (pigeonhole)
    → groupby (block_idx, block_value), per-bucket state capped."""
    bits = 64 // n_blocks

    def explode(batch: pa.Table) -> pa.Table:
        ids, blocks, vals = [], [], []
        for rid, t in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            if t is None:
                continue
            h = simhash64(t)
            for b in range(n_blocks):
                ids.append(rid)
                blocks.append(b)
                vals.append((h >> (b * bits)) & ((1 << bits) - 1))
        return pa.table(
            {
                id_col: pa.array(ids),
                "block": pa.array(blocks, pa.int32()),
                "block_val": pa.array(vals, pa.uint64()),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    return _collect_bucket_ids(
        exploded, id_col, ["block", "block_val"], max_bucket_size, unique_ids=True
    )


# -- near-dup clustering + survivor filter -----------------------------------


def dedup_near(
    ds,
    id_col: str,
    text_col: str = "text",
    threshold: float = 0.7,
    concurrency=(1, 8),
    drop_budget_rows: int = 1 << 22,
    n_buckets: int | None = None,
    **near_kwargs,
):
    """Keep one row per NEAR-duplicate cluster (min-``id_col`` survivor).

    Composition (the full web-scale near-dedup story):

    1. ``near_dup_pairs`` — MinHash-LSH banding + in-bucket verification
       (one band-key shuffle; pairs are dup_rate-bounded, << corpus).
    2. ``graph.connected_components`` — large-star/small-star over the pair
       list, so transitive near-dups (A~B, B~C, A!~C) collapse into ONE
       cluster instead of leaking a chain of survivors.
    3. anti-filter the corpus with the non-survivor ids (budget-aware
       broadcast / bucketed passes, ``decontam.filter_not_in_ds``).

    Rows never entering a verified pair (incl. null-text rows) are always
    kept. Same ``id_col`` uniqueness contract as ``dedup_exact``. Pair
    verification kwargs (``verify``, ``num_bands``, ...) pass through via
    ``near_kwargs``.
    """
    import ray.data as rd

    from medea_ray.engine.decontam import filter_not_in_ds
    from medea_ray.engine.graph import connected_components

    pairs = near_dup_pairs(
        ds,
        id_col,
        text_col=text_col,
        threshold=threshold,
        concurrency=concurrency,
        **near_kwargs,
    )
    if len(pairs) == 0:
        return ds
    labels = connected_components(
        rd.from_pandas(pairs[["id_a", "id_b"]]), "id_a", "id_b"
    )

    def non_survivors(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.not_equal(t.column("node"), t.column("cluster"))
        return pa.table({"drop_id": t.filter(keep).column("node")})

    dropped = labels.map_batches(non_survivors, batch_format="pyarrow")
    return filter_not_in_ds(
        ds,
        id_col,
        dropped,
        "drop_id",
        budget_rows=drop_budget_rows,
        n_buckets=n_buckets,
        concurrency=concurrency,
    )
