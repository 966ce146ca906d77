"""Benchmark decontamination: drop (or tag) corpus rows whose content
hash appears in a banned/benchmark set.

Training corpora must not contain evaluation data; the standard first
line of defense is exact content-hash matching against the benchmark
suite. The banned side is small by nature (benchmarks are ~1e4-1e6
rows), so this is a broadcast anti-join on the digest: hash the banned
texts once, ``ray.put`` the digest set, and filter the (huge) corpus in
an embarrassingly parallel actor-pool stage — the corpus is never
shuffled and only 16-byte digests are ever broadcast.

Matching is on ``md5(key_of(text))`` where ``key_of`` defaults to the
full text; pass ``prefix_len`` to match on a text prefix instead (the
same normalization knob as exact dedup — near-identical boilerplate
variants of a benchmark row then also match). For fuzzy decontamination
compose with the MinHash near-dup family in ``dedup.py``.

The reference (juspay/medea) has no corpus surface; this comes from the
north rule's training-data engine scope.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc


def _digest(text: str, prefix_len: int | None) -> bytes:
    if prefix_len is not None:
        text = text[:prefix_len]
    return hashlib.md5(text.encode()).digest()


def banned_digests(banned_ds, text_col: str, prefix_len: int | None = None) -> set[bytes]:
    """Collect the banned side's text digests on the driver (small by the
    operator's contract — digests only, 16 bytes/row, never the texts)."""

    def to_digest(t: pa.Table) -> pa.Table:
        col = t.column(text_col).to_pylist()
        out = [_digest(x, prefix_len) for x in col if x is not None]
        return pa.table({"d": pa.array(out, pa.binary(16))})

    parts = banned_ds.map_batches(to_digest, batch_format="pyarrow").take_all()
    return {r["d"] for r in parts}


class _NotInFilter:
    """Actor-pool stage holding a broadcast value set once per actor
    (a plain-function stage would ``ray.get`` + deserialize the set on
    every batch)."""

    def __init__(self, values_ref, col: str):
        import ray

        self.values = values_ref if isinstance(values_ref, set) else ray.get(values_ref)
        self.col = col

    def __call__(self, t: pa.Table) -> pa.Table:
        mask = pa.array(
            [v not in self.values for v in t.column(self.col).to_pylist()],
            pa.bool_(),
        )
        return t.filter(mask)


def filter_not_in(ds, col: str, values: set, concurrency=(1, 8)):
    """Drop rows whose ``col`` value is in ``values`` — the generic
    broadcast anti-join filter (``decontaminate`` is this plus hashing)."""
    import ray

    ref = ray.put(set(values))
    return ds.map_batches(
        _NotInFilter,
        fn_constructor_kwargs=dict(values_ref=ref, col=col),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


class _Decontaminator:
    """Actor-pool stage holding the broadcast digest set."""

    def __init__(self, digests_ref, text_col: str, prefix_len, mode: str, tag_name: str):
        import ray

        self.digests = digests_ref if isinstance(digests_ref, set) else ray.get(digests_ref)
        self.text_col = text_col
        self.prefix_len = prefix_len
        self.mode = mode
        self.tag_name = tag_name

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column(self.text_col).to_pylist()
        hit = [
            x is not None and _digest(x, self.prefix_len) in self.digests
            for x in texts
        ]
        if self.mode == "tag":
            return t.append_column(self.tag_name, pa.array(hit, pa.bool_()))
        return t.filter(pc.invert(pa.array(hit, pa.bool_())))


def decontaminate(
    ds,
    text_col: str,
    banned_ds,
    banned_text_col: str | None = None,
    prefix_len: int | None = None,
    mode: str = "drop",
    tag_name: str = "contaminated",
    concurrency=(1, 8),
):
    """Remove (``mode="drop"``) or flag (``mode="tag"``) rows of ``ds``
    whose ``text_col`` digest appears in ``banned_ds``. Null texts never
    match (no content to leak) — with ``mode="drop"`` they are KEPT."""
    import ray

    if mode not in ("drop", "tag"):
        raise ValueError(f"mode must be 'drop' or 'tag', got {mode!r}")
    digests = banned_digests(banned_ds, banned_text_col or text_col, prefix_len)
    ref = ray.put(digests)
    return ds.map_batches(
        _Decontaminator,
        fn_constructor_kwargs=dict(
            digests_ref=ref, text_col=text_col, prefix_len=prefix_len,
            mode=mode, tag_name=tag_name,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
