"""Distribution-drift checks (KS / PSI) across warc_ts partitions
(SURVEY.md §2.5 E10).

Shape: one ``map_batches`` pass emits per-(day-bucket, bin) partial counts
(vectorized Arrow group_by per batch — a batch of 10^4 rows becomes ≤
n_buckets × n_bins partial rows), a small ``groupby().sum`` consolidates,
and the driver compares each bucket against the reference bucket on a table
whose size is independent of the data size. Categorical columns → PSI;
numeric columns → binned PSI + KS statistic on the binned e.c.d.f.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _day_bucket(ts: pa.ChunkedArray) -> pa.Array:
    # truncate timestamp[us] to day, render as string key (stable group key)
    return pc.strftime(ts, format="%Y-%m-%d")


def histogram_by_bucket(
    ds,
    value_col: str,
    ts_col: str = "warc_ts",
    numeric_bins: np.ndarray | None = None,
):
    """Dataset → (bucket, bin, n) consolidated histogram (small).

    Categorical when numeric_bins is None (bin = value as string, nulls →
    "<null>"); numeric otherwise (bin = right-open bin index as string).
    Rows with a null ``ts_col`` have no partition to drift against and are
    dropped (a null day bucket would otherwise poison the driver-side
    bucket sort with a None key).
    """
    from ray.data.aggregate import Sum

    _PARTIAL_SCHEMA = pa.schema(
        [("bucket", pa.string()), ("bin", pa.string()), ("n", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        if ts.null_count:
            batch = batch.filter(pc.is_valid(ts))
        if batch.num_rows == 0:
            # an all-null-ts block carries a null-typed ts column that no
            # strftime kernel accepts — emit a typed empty partial
            return _PARTIAL_SCHEMA.empty_table()
        bucket = _day_bucket(batch.column(ts_col))
        col = batch.column(value_col)
        if numeric_bins is None:
            vals = pc.cast(col, pa.string())
            vals = pc.fill_null(vals, "<null>")
        else:
            x = col.to_numpy(zero_copy_only=False).astype(np.float64)
            idx = np.digitize(np.nan_to_num(x, nan=-np.inf), numeric_bins)
            idx = np.where(np.isnan(x), -1, idx)
            vals = pa.array([str(i) for i in idx], pa.string())
        t = pa.table({"bucket": bucket, "bin": vals})
        g = t.group_by(["bucket", "bin"]).aggregate([([], "count_all")])
        return pa.table(
            {"bucket": g.column("bucket"), "bin": g.column("bin"), "n": g.column("count_all")}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["bucket", "bin"]).aggregate(Sum("n", alias_name="n"))


def _pivot(hist_rows: list[dict]) -> dict[str, dict[str, int]]:
    out: dict[str, dict[str, int]] = {}
    for r in hist_rows:
        out.setdefault(r["bucket"], {})[r["bin"]] = int(r["n"])
    return out


def psi(ref: dict[str, int], cur: dict[str, int], eps: float = 1e-6) -> float:
    """Population stability index between two count histograms."""
    bins = set(ref) | set(cur)
    nr = sum(ref.values()) or 1
    nc = sum(cur.values()) or 1
    s = 0.0
    for b in bins:
        p = max(ref.get(b, 0) / nr, eps)
        q = max(cur.get(b, 0) / nc, eps)
        s += (q - p) * math.log(q / p)
    return s


def ks_binned(ref: dict[str, int], cur: dict[str, int]) -> float:
    """KS statistic on the binned e.c.d.f.s (bins sorted by numeric index)."""
    bins = sorted(set(ref) | set(cur), key=lambda b: float(b))
    r = np.array([ref.get(b, 0) for b in bins], dtype=np.float64)
    c = np.array([cur.get(b, 0) for b in bins], dtype=np.float64)
    r_cdf = np.cumsum(r) / max(r.sum(), 1)
    c_cdf = np.cumsum(c) / max(c.sum(), 1)
    return float(np.max(np.abs(r_cdf - c_cdf)))


def drift_report(
    ds,
    value_col: str,
    ts_col: str = "warc_ts",
    numeric_bins: np.ndarray | None = None,
    reference_bucket: str | None = None,
) -> list[dict]:
    """Per-bucket drift vs the reference bucket (default: the earliest).
    Returns [{bucket, psi, ks (numeric only), n}] sorted by bucket."""
    hist = histogram_by_bucket(ds, value_col, ts_col, numeric_bins).take_all()
    table = _pivot(hist)
    if not table:
        return []
    ref_key = reference_bucket or min(table)
    ref = table[ref_key]
    out = []
    for bucket in sorted(table):
        cur = table[bucket]
        rec = {
            "bucket": bucket,
            "n": sum(cur.values()),
            "psi": psi(ref, cur),
        }
        if numeric_bins is not None:
            rec["ks"] = ks_binned(
                {k: v for k, v in ref.items() if k != "-1"},
                {k: v for k, v in cur.items() if k != "-1"},
            )
        out.append(rec)
    return out
