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


def mixture_rates(
    counts: dict,
    *,
    target_rows: int,
    weights: dict | None = None,
    temperature: float | None = None,
    prefix_len: int = 6,
) -> dict:
    """Per-source md5-prefix thresholds realizing a target corpus
    mixture (the data-mixing verb: Pile-style explicit ``weights``, or
    multilingual ``temperature`` reweighting p_s ∝ n_s^τ — τ<1
    upweights low-resource sources, XLM-R arXiv:1911.02116 §3.1).

    Desired take per source = ``target_rows * p_s``; the sampling rate
    is ``min(1, take/n_s)`` — hash sampling cannot upsample, so a
    capped source keeps everything and the realized total undershoots
    the target (deterministic closed form, NOT re-normalized; raise
    ``target_rows`` or adjust weights if the shortfall matters — the
    per-source expected takes are returned by the companion
    ``mixture_plan`` and logged).

    Thresholds are ``prefix_len``-digit hex strings for the standard
    ``md5-prefix < threshold`` rule; a full-keep source gets the
    sentinel ``"g"`` (lexicographically above every hex prefix, and
    replayable in SQL with the same ``<`` comparison)."""
    if (weights is None) == (temperature is None):
        raise ValueError("exactly one of weights / temperature required")
    if not counts:
        raise ValueError("mixture_rates: empty source counts")
    if not 1 <= prefix_len <= 32:
        raise ValueError(f"prefix_len must be in [1, 32], got {prefix_len}")
    if target_rows < 0:
        raise ValueError("target_rows must be >= 0")
    if weights is not None:
        unknown = set(weights) - set(counts)
        if unknown:
            raise ValueError(
                f"weights name sources absent from the data: {sorted(unknown)}"
            )
        if any(w < 0 for w in weights.values()):
            raise ValueError("weights must be >= 0")
        tot = float(sum(weights.values()))
        if tot <= 0:
            raise ValueError("weights must sum > 0")
        probs = {s: weights.get(s, 0.0) / tot for s in counts}
    else:
        if temperature < 0:
            raise ValueError("temperature must be >= 0")
        pw = {s: float(n) ** temperature for s, n in counts.items() if n > 0}
        tot = sum(pw.values())
        if tot <= 0:
            raise ValueError("mixture_rates: no source has rows")
        probs = {s: pw.get(s, 0.0) / tot for s in counts}

    scale = 16 ** prefix_len
    out = {}
    for s, n in counts.items():
        take = target_rows * probs[s]
        if n <= 0 or take <= 0:
            out[s] = "0" * prefix_len
        elif take >= n:
            out[s] = "g"  # keep-all sentinel (sorts above every hex prefix)
        else:
            out[s] = format(int(take / n * scale), "x").rjust(prefix_len, "0")
    return out


def mixture_plan(counts: dict, thresholds: dict, prefix_len: int = 6) -> dict:
    """Expected take per source under the given thresholds (exact
    expectation of the md5-prefix rule: rate = t/16^k, keep-all = n)."""
    scale = 16 ** prefix_len
    plan = {}
    for s, n in counts.items():
        t = thresholds[s]
        plan[s] = int(n) if t == "g" else int(n) * int(t, 16) // scale
    return plan


def mixture_sample(
    ds,
    id_col: str,
    source_col: str,
    *,
    target_rows: int,
    weights: dict | None = None,
    temperature: float | None = None,
    prefix_len: int = 6,
    batch_size: int = 8192,
):
    """Deterministically re-mix a corpus to a target per-source
    composition: one tiny integer groupby for the observed counts, then
    the embarrassingly-parallel md5-prefix filter (no shuffle of data,
    no RNG state — the same row keeps/drops on every run and cluster
    shape). Null sources and null ids are never sampled.

    CONSUMES ``ds`` TWICE (the count pass, then the filter pass on the
    returned dataset) — the same re-consumption contract as
    ``substr.mask_dup_spans``. Pass a materialized Dataset (as
    ``pretrain.prepare_corpus`` does): a lazy expensive upstream would
    re-execute in full, and a nondeterministic one could be counted on
    different rows than it filters."""
    import logging

    from ray.data.aggregate import Sum

    def cnt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # count only SAMPLEABLE rows (non-null id AND source) — a
        # null-id row can never be kept, so counting it would deflate
        # its source's rate below the requested mixture
        keep = pc.and_(
            pc.is_valid(t.column(source_col)), pc.is_valid(t.column(id_col))
        )
        vc = t.column(source_col).filter(keep).value_counts()
        return pa.table({"s": vc.field("values"), "n": vc.field("counts")})

    rows = (
        ds.map_batches(cnt, batch_format="pyarrow", batch_size=batch_size)
        .groupby("s")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    counts = {r["s"]: int(r["n"]) for r in rows}
    thresholds = mixture_rates(
        counts, target_rows=target_rows, weights=weights,
        temperature=temperature, prefix_len=prefix_len,
    )
    plan = mixture_plan(counts, thresholds, prefix_len)
    logging.getLogger(__name__).info(
        "mixture_sample: counts=%s expected_take=%s (total %d / target %d)",
        counts, plan, sum(plan.values()), target_rows,
    )

    def sample(t: pa.Table) -> pa.Table:
        pref = _hex_prefixes(t.column(id_col).to_pylist(), prefix_len)
        srcs = t.column(source_col).to_pylist()
        mask = pa.array(
            [
                p is not None and s is not None and p < thresholds.get(s, "0")
                for p, s in zip(pref, srcs)
            ],
            pa.bool_(),
        )
        return t.filter(mask)

    return ds.map_batches(sample, batch_format="pyarrow", batch_size=batch_size)


def score_weighted_sample(
    ds,
    id_col: str,
    num_col: str,
    denom_col: str | None = None,
    *,
    denom: int | None = None,
    prefix_len: int = 6,
    batch_size: int = 8192,
):
    """Quality-weighted acceptance sampling (the GPT-3 appendix-A verb,
    determinized): keep each row with probability ``num/denom`` where
    ``num`` is the row's integer score column and ``denom`` a per-row
    column or constant — higher-quality rows survive proportionally
    more often, but the decision is a pure function of the row (no RNG
    state, stable across runs and cluster shapes).

    Exact integer rule, replayable verbatim in SQL: keep iff
    ``int(md5(id)[:k], 16) * denom < num * 16**k`` (cross-multiplied,
    so no float boundary rows can flip between numpy and SQL). num <= 0
    never keeps, num >= denom always keeps; null ids, null scores and
    null/zero denominators never keep."""
    if (denom_col is None) == (denom is None):
        raise ValueError("exactly one of denom_col / denom required")
    if denom is not None and denom <= 0:
        raise ValueError("denom must be > 0")
    if not 1 <= prefix_len <= 32:
        # md5 hex is 32 chars: a longer prefix_len would silently compare
        # a 32-char prefix against a bigger scale (rate drifts to ~100%)
        raise ValueError(f"prefix_len must be in [1, 32], got {prefix_len}")
    scale = 16 ** prefix_len

    def sample(t: pa.Table) -> pa.Table:
        pref = _hex_prefixes(t.column(id_col).to_pylist(), prefix_len)
        nums = t.column(num_col).to_pylist()
        dens = (
            t.column(denom_col).to_pylist() if denom_col is not None
            else [denom] * len(t)
        )
        mask = pa.array(
            [
                p is not None and n is not None and d is not None and d > 0
                and int(p, 16) * d < n * scale
                for p, n, d in zip(pref, nums, dens)
            ],
            pa.bool_(),
        )
        return t.filter(mask)

    return ds.map_batches(sample, batch_format="pyarrow", batch_size=batch_size)
