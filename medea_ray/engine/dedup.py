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
import re

import numpy as np
import pyarrow as pa

_WORD_RE = re.compile(r"\w+", re.UNICODE)

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


def add_content_hash(ds, text_col: str = "text", out_col: str = "content_md5"):
    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            out_col, pa.array(md5_hex(batch.column(text_col).to_pylist()), pa.string())
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def exact_dup_groups(ds, id_col: str, text_col: str = "text"):
    """(content_md5, n, keep_id): duplicate groups with the survivor
    (min id). One shuffle on the 16-byte hash, never on the text."""
    from ray.data.aggregate import Count, Min

    hashed = add_content_hash(ds, text_col).select_columns(["content_md5", id_col])
    return (
        hashed.groupby("content_md5")
        .aggregate(Count(alias_name="n"), Min(id_col, alias_name="keep_id"))
        .filter(expr="n > 1")
    )


def dedup_exact(ds, id_col: str, text_col: str = "text"):
    """Keep one row per distinct text: hash-partition + per-group first.
    Returns the deduplicated Dataset (all original columns)."""
    hashed = add_content_hash(ds, text_col)
    return hashed.groupby("content_md5").map_groups(
        lambda df: df.sort_values(id_col).head(1), batch_format="pandas"
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
    ):
        assert num_hashes % num_bands == 0
        self.id_col = id_col
        self.text_col = text_col
        self.num_hashes = num_hashes
        self.num_bands = num_bands
        self.rows_per_band = num_hashes // num_bands
        self.shingle_n = shingle_n
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
        ids, bands, keys = [], [], []
        rpb = self.rows_per_band
        for rid, text in zip(
            batch.column(self.id_col).to_pylist(), batch.column(self.text_col).to_pylist()
        ):
            if text is None:
                continue
            sig = self.signature(text)
            if sig is None:
                continue
            for b in range(self.num_bands):
                band_bytes = sig[b * rpb : (b + 1) * rpb].tobytes()
                ids.append(rid)
                bands.append(b)
                keys.append(hash_bytes(band_bytes + bytes([b])))
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "band": pa.array(bands, pa.int32()),
                "band_key": pa.array(np.array(keys, dtype=np.uint64), pa.uint64()),
            }
        )


def minhash_candidate_groups(
    ds,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 64,
    num_bands: int = 16,
    shingle_n: int = 3,
    concurrency=(1, 8),
):
    """Near-duplicate candidate groups: rows sharing any LSH band bucket.
    Returns (band_key, n, ids list) for buckets with ≥2 members — the
    shuffle moves only (id, band_key) pairs, b per row."""
    from ray.data.aggregate import AggregateFn

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

    collect_ids = AggregateFn(
        init=lambda _k: [],
        merge=lambda a, b: a + b,
        accumulate_block=lambda a, blk: a + blk.column(id_col).to_pylist(),
        finalize=lambda a: sorted(a),
        name="ids",
    )
    grouped = signed.groupby("band_key").aggregate(collect_ids)
    return grouped.map_batches(
        lambda df: df.assign(n=df["ids"].map(len))[df["ids"].map(len) > 1],
        batch_format="pandas",
    )


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
):
    """MinHash-LSH candidates + exact n-gram-Jaccard verification.

    Candidate ids from the banding shuffle are a small set; their texts are
    fetched with ONE filtered streaming pass over the corpus (broadcast id
    set, `pc.is_in` per batch — the corpus itself never materializes), and
    the pairwise verify runs on the driver over candidates only. Returns a
    pandas DataFrame (id_a, id_b, jaccard) with jaccard ≥ threshold."""
    import pandas as pd
    import pyarrow.compute as pc

    cand = minhash_candidate_groups(
        ds, id_col, text_col, num_hashes, num_bands, shingle_n, concurrency
    ).to_pandas()
    pairs: set[tuple] = set()
    if len(cand):
        for ids in cand["ids"]:
            for a in ids:
                for b in ids:
                    if a < b:
                        pairs.add((a, b))
    if not pairs:
        return pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64"),
             "jaccard": pd.Series([], dtype="float64")}
        )
    needed = sorted({x for p in pairs for x in p})
    id_set = pa.array(needed)

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column(id_col), value_set=id_set))

    texts_tbl = ds.map_batches(keep, batch_format="pyarrow").take_all()
    text_of = {r[id_col]: r[text_col] for r in texts_tbl}
    out = []
    for a, b in sorted(pairs):
        ta, tb = text_of.get(a), text_of.get(b)
        if ta is None or tb is None:
            continue
        j = jaccard(ta, tb, shingle_n)
        if j >= threshold:
            out.append((a, b, j))
    return pd.DataFrame(out, columns=["id_a", "id_b", "jaccard"])


# -- SimHash -----------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit simhash over word-level features (deterministic)."""
    acc = np.zeros(64, dtype=np.int64)
    for w in _WORD_RE.findall(text.lower()):
        h = hash_bytes(w.encode())
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def add_simhash(ds, text_col: str = "text", out_col: str = "simhash"):
    def fn(batch: pa.Table) -> pa.Table:
        vals = [
            None if t is None else simhash64(t) for t in batch.column(text_col).to_pylist()
        ]
        return batch.append_column(out_col, pa.array(vals, pa.uint64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def simhash_candidates(ds, id_col: str, text_col: str = "text", n_blocks: int = 4):
    """Hamming-near candidates by block rotation: docs within Hamming
    distance < n_blocks share at least one exact 16-bit block (pigeonhole)
    → groupby (block_idx, block_value)."""
    from ray.data.aggregate import AggregateFn

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
    collect = AggregateFn(
        init=lambda _k: [],
        merge=lambda a, b: a + b,
        accumulate_block=lambda a, blk: a + blk.column(id_col).to_pylist(),
        finalize=lambda a: sorted(set(a)),
        name="ids",
    )
    grouped = exploded.groupby(["block", "block_val"]).aggregate(collect)
    return grouped.map_batches(
        lambda df: df.assign(n=df["ids"].map(len))[df["ids"].map(len) > 1],
        batch_format="pandas",
    )
