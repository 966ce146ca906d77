"""Deterministic hash-based sampling and train/test splitting.

Training-data pipelines need REPRODUCIBLE row selection: the same row
must land in the same sample/split on every run, on any cluster size,
with no coordination — which rules out ``random_sample`` (RNG state per
task) and anything keyed on row position. The standard trick: hash a
stable id column and threshold the hex prefix. Embarrassingly parallel
(pure map_batches, no shuffle, no driver state), portable (the md5-hex
prefix comparison reproduces exactly in SQL:
``substr(md5(CAST(id AS VARCHAR)), 1, k) < 'xx'``).

md5 has no Arrow kernel, so the digest is a per-row Python loop — the
same accepted pattern as ``queries.doc_text_digests`` (hashing cost
dominates loop overhead; ~1M rows/s/core is plenty for a selection
stage, and it runs fully parallel across blocks).

The reference (juspay/medea) has no sampling surface; this comes from
the north rule's training-data engine scope.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

_HEX_RE = re.compile(r"[0-9a-fA-F]+")


def _require_hex(s: str) -> None:
    # int(s, 16) alone is too permissive: '0x40', '-1' and ' 8 ' all pass
    # it but compare lexicographically against lowercase hex digests,
    # silently sampling at the wrong rate
    if not (isinstance(s, str) and _HEX_RE.fullmatch(s)):
        raise ValueError(f"threshold must be bare hex digits, got {s!r}")


def _hex_prefixes(ids, prefix_len: int) -> list[str]:
    out = []
    for v in ids:
        if v is None:
            out.append(None)
        else:
            out.append(hashlib.md5(str(v).encode()).hexdigest()[:prefix_len])
    return out


def hash_sample(ds, id_col: str, threshold_hex: str):
    """Keep rows whose ``md5(str(id))`` hex prefix sorts strictly below
    ``threshold_hex``. Sampling rate ≈ int(threshold_hex, 16) / 16**len.
    Null ids are never sampled (no stable identity to hash)."""
    _require_hex(threshold_hex)
    threshold_hex = threshold_hex.lower()  # hexdigest() is lowercase
    k = len(threshold_hex)

    def sample(t: pa.Table) -> pa.Table:
        pref = _hex_prefixes(t.column(id_col).to_pylist(), k)
        mask = pa.array([p is not None and p < threshold_hex for p in pref], pa.bool_())
        return t.filter(mask)

    return ds.map_batches(sample, batch_format="pyarrow")


def stratified_hash_sample(ds, id_col: str, strata_col: str,
                           thresholds: dict[str, str],
                           default_threshold_hex: str = "0"):
    """Per-stratum deterministic sampling: each row keeps/drops by its
    id's md5-hex prefix against the threshold of ITS stratum (e.g.
    down-sample English heavily, keep all low-resource languages). A
    stratum not in ``thresholds`` uses ``default_threshold_hex``
    ("0" = drop). All thresholds must share one prefix length so a row's
    fate never depends on which stratum names appear elsewhere. Null
    strata use the default; null ids are never sampled."""
    thresholds = {k: v.lower() for k, v in thresholds.items()}
    default_threshold_hex = default_threshold_hex.lower()
    lens = {len(v) for v in thresholds.values()} | {len(default_threshold_hex)}
    if len(lens) != 1:
        raise ValueError(f"all thresholds must share one prefix length, got {lens}")
    for v in list(thresholds.values()) + [default_threshold_hex]:
        _require_hex(v)
    k = lens.pop()

    def sample(t: pa.Table) -> pa.Table:
        pref = _hex_prefixes(t.column(id_col).to_pylist(), k)
        strata = t.column(strata_col).to_pylist()
        mask = pa.array(
            [p is not None and p < thresholds.get(s, default_threshold_hex)
             for p, s in zip(pref, strata)],
            pa.bool_(),
        )
        return t.filter(mask)

    return ds.map_batches(sample, batch_format="pyarrow")


def train_test_split(ds, id_col: str, test_threshold_hex: str,
                     split_name: str = "split"):
    """Append a ``split`` column: 'test' where the id's md5-hex prefix
    sorts below ``test_threshold_hex``, else 'train' (test fraction ≈
    int(threshold, 16) / 16**len). Null ids get a null split. Disjoint
    and exhaustive by construction; stable across runs and cluster
    shapes."""
    _require_hex(test_threshold_hex)
    test_threshold_hex = test_threshold_hex.lower()  # hexdigest() is lowercase
    k = len(test_threshold_hex)

    def tag(t: pa.Table) -> pa.Table:
        pref = _hex_prefixes(t.column(id_col).to_pylist(), k)
        split = pa.array(
            [None if p is None else ("test" if p < test_threshold_hex else "train")
             for p in pref],
            pa.string(),
        )
        return t.append_column(split_name, split)

    return ds.map_batches(tag, batch_format="pyarrow")
