"""Declarative constraint-check suite — the engine's user-facing
"validation run" API (the north-star's "schema + constraint validation
engine (column stats, uniqueness, referential, distribution-drift
checks)" as ONE composable surface).

A suite is a list of small check declarations; ``run_checks`` plans
them into the minimum number of passes over the Dataset and returns
one verdict row per check: ``(check, target, metric, value, threshold,
passed)``. Pass planning:

- every stats-backed check (``not_null``, ``in_range``, ``row_count``)
  shares ONE ``stats.sketch_summary`` streaming pass (shuffle-free,
  tree-combined sketch states);
- every ``unique`` check shares ONE ``constraints.distinct_counts``
  digest exchange (all column sets ride the same (set_id, 16B) shuffle);
- every ``accepted_values`` check shares ONE map_batches violation-count
  pass (the small accepted sets broadcast once via ``ray.put``);
- ``referential`` delegates to ``referential.referential_check``
  (broadcast anti-join with the bucketed fallback), one per check;
- ``max_psi`` delegates to ``drift.drift_report`` (partial histograms →
  one groupby), one per (value_col, ts_col);
- ``matches_schema`` delegates to ``pipeline.validate_dataset`` (the
  Medea actor-pool kernel), one per schema.

Verdicts are deterministic and integer/float-exact (null fractions and
PSI are ratios of exact integer counts), so suites are reproducible
across cluster sizes and batch layouts.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


@dataclass(frozen=True)
class Check:
    kind: str
    target: str
    params: tuple = ()
    extra: Any = field(default=None, compare=False, hash=False)

    @property
    def name(self) -> str:
        return f"{self.kind}({self.target})"


def not_null(col: str, max_null_frac: float = 0.0) -> Check:
    return Check("not_null", col, (float(max_null_frac),))


def in_range(col: str, min=None, max=None) -> Check:
    if min is None and max is None:
        raise ValueError("in_range: at least one bound required")
    return Check("in_range", col, (min, max))


def unique(*cols: str) -> Check:
    if not cols:
        raise ValueError("unique: at least one column required")
    return Check("unique", ",".join(cols), tuple(cols))


def accepted_values(col: str, values) -> Check:
    vals = sorted(set(values))
    if not vals:
        raise ValueError("accepted_values: empty accepted set")
    return Check("accepted_values", col, tuple(vals))


def suite_columns(suite) -> list[str] | None:
    """Union of input-table columns a suite's checks touch (sorted), or
    None if any check's column set cannot be derived — callers use this
    to project the read (a suite over url/lang must not decode the text
    column). The referenced side of ``referential`` is a separate
    Dataset and does not appear here."""
    cols: set[str] = set()
    for c in suite:
        if c.kind in ("not_null", "in_range", "accepted_values", "referential"):
            cols.add(c.target)
        elif c.kind == "unique":
            cols.update(c.params)
        elif c.kind in ("max_psi", "matches_schema"):
            cols.add(c.target)
            cols.add(c.params[0])
        elif c.kind == "row_count":
            pass
        else:  # unknown kind: be safe, read everything
            return None
    return sorted(cols)


def row_count(min_rows: int | None = None, max_rows: int | None = None) -> Check:
    if min_rows is None and max_rows is None:
        raise ValueError("row_count: at least one bound required")
    return Check("row_count", "*", (min_rows, max_rows))


def referential(fk_col: str, referenced_ds, pk_col: str, max_orphans: int = 0) -> Check:
    return Check(
        "referential", fk_col, (pk_col, int(max_orphans)), extra=referenced_ds
    )


def max_psi(value_col: str, ts_col: str, threshold: float,
            numeric_bins=None) -> Check:
    return Check(
        "max_psi", value_col, (ts_col, float(threshold)), extra=numeric_bins
    )


def matches_schema(
    payload_col: str, schema_text: str, id_col: str, max_invalid_frac: float = 0.0
) -> Check:
    return Check(
        "matches_schema", payload_col, (id_col, float(max_invalid_frac)),
        extra=schema_text,
    )


def _verdict(check: Check, metric: str, value, threshold, passed: bool) -> dict:
    return {
        "check": check.name,
        "target": check.target,
        "metric": metric,
        "value": value,
        "threshold": threshold,
        "passed": bool(passed),
    }


def run_checks(ds, checks: list[Check], batch_size: int = 8192) -> pd.DataFrame:
    """Execute a suite with family-level pass sharing (module docstring).
    Returns one row per check, in the suite's order."""
    from medea_ray.engine import constraints, drift, referential as ref_mod, stats
    from medea_ray.engine.pipeline import validate_dataset

    _KNOWN = {
        "not_null", "in_range", "unique", "accepted_values", "row_count",
        "referential", "max_psi", "matches_schema",
    }
    unknown = sorted({c.kind for c in checks if c.kind not in _KNOWN})
    if unknown:
        # reject BEFORE any pass runs — a typo'd kind must not cost a
        # full validation/digest pass first
        raise ValueError(f"run_checks: unknown check kind(s) {unknown}")

    by_kind: dict[str, list[int]] = {}
    for i, c in enumerate(checks):
        by_kind.setdefault(c.kind, []).append(i)
    results: dict[int, dict] = {}

    # -- stats family: one sketch pass over the union of columns
    stats_cols = sorted(
        {checks[i].target for k in ("not_null", "in_range") for i in by_kind.get(k, ())}
    )
    summary = stats.sketch_summary(ds, stats_cols=stats_cols) if stats_cols else None

    _n_memo: list = []

    def get_n() -> int:
        # the sketch pass already knows the row count (n includes nulls);
        # only a stats-free suite pays for a count() execution of ds
        if not _n_memo:
            if summary is not None:
                _n_memo.append(int(summary[stats_cols[0]]["n"]))
            else:
                _n_memo.append(ds.count())
        return _n_memo[0]

    if summary is not None:
        for i in by_kind.get("not_null", ()):
            c = checks[i]
            s = summary[c.target]
            frac = (s["n_null"] / get_n()) if get_n() else 0.0
            results[i] = _verdict(
                c, "null_frac", frac, c.params[0], frac <= c.params[0]
            )
        for i in by_kind.get("in_range", ()):
            c = checks[i]
            s = summary[c.target]
            lo, hi = c.params
            ok = True
            if s["n"] - s["n_null"] > 0:
                if lo is not None and s["min"] is not None and s["min"] < lo:
                    ok = False
                if hi is not None and s["max"] is not None and s["max"] > hi:
                    ok = False
            results[i] = _verdict(
                c,
                "observed_range",
                f"[{s['min']}, {s['max']}]",
                f"[{lo}, {hi}]",
                ok,
            )
    for i in by_kind.get("row_count", ()):
        c = checks[i]
        n = get_n()
        lo, hi = c.params
        ok = (lo is None or n >= lo) and (hi is None or n <= hi)
        results[i] = _verdict(c, "row_count", n, f"[{lo}, {hi}]", ok)

    # -- unique family: one digest exchange for every column set
    uniq_idx = by_kind.get("unique", ())
    if uniq_idx:
        sets = [list(checks[i].params) for i in uniq_idx]
        counts = constraints.distinct_counts(ds, sets, batch_size=batch_size)
        for i, n_distinct in zip(uniq_idx, counts):
            c = checks[i]
            dups = get_n() - n_distinct
            results[i] = _verdict(c, "duplicate_tuples", dups, 0, dups == 0)

    # -- accepted_values family: one violation-count pass, sets broadcast
    av_idx = by_kind.get("accepted_values", ())
    if av_idx:
        import ray
        from ray.data.aggregate import Sum

        spec_ref = ray.put([(checks[i].target, list(checks[i].params)) for i in av_idx])

        def violations(t: pa.Table) -> pa.Table:
            spec = ray.get(spec_ref)
            ns = []
            for col, vals in spec:
                arr = t.column(col)
                bad = pc.and_(
                    pc.invert(pc.is_in(arr, value_set=pa.array(vals))),
                    pc.is_valid(arr),  # nulls are not_null's job
                )
                ns.append(pc.sum(pc.cast(bad, pa.int64())).as_py() or 0)
            return pa.table(
                {
                    "ci": pa.array(range(len(spec)), pa.int64()),
                    "bad": pa.array(ns, pa.int64()),
                }
            )

        per_check = (
            ds.map_batches(violations, batch_format="pyarrow", batch_size=batch_size)
            .groupby("ci")
            .aggregate(Sum("bad", alias_name="n_bad"))
            .take_all()
        )
        bad_by_ci = {int(r["ci"]): int(r["n_bad"]) for r in per_check}
        for pos, i in enumerate(av_idx):
            c = checks[i]
            n_bad = bad_by_ci.get(pos, 0)
            results[i] = _verdict(c, "unexpected_values", n_bad, 0, n_bad == 0)

    # -- referential / drift / schema: delegate per check
    for i in by_kind.get("referential", ()):
        c = checks[i]
        pk_col, max_orphans = c.params
        n_orph = ref_mod.referential_check(ds, c.target, c.extra, pk_col)["n_orphans"]
        results[i] = _verdict(c, "orphan_rows", n_orph, max_orphans, n_orph <= max_orphans)

    psi_memo: dict = {}  # one drift_report per (value_col, ts_col, bins)
    for i in by_kind.get("max_psi", ()):
        c = checks[i]
        ts_col, threshold = c.params
        bins_key = None if c.extra is None else tuple(c.extra)
        memo_key = (c.target, ts_col, bins_key)
        if memo_key not in psi_memo:
            rep = drift.drift_report(
                ds, c.target, ts_col=ts_col, numeric_bins=c.extra
            )
            psi_memo[memo_key] = max((r["psi"] for r in rep), default=0.0)
        worst = psi_memo[memo_key]
        results[i] = _verdict(c, "max_psi", worst, threshold, worst <= threshold)

    for i in by_kind.get("matches_schema", ()):
        c = checks[i]
        id_col, max_frac = c.params
        verdicts = validate_dataset(
            ds, c.extra, payload_col=c.target, id_col=id_col, batch_size=batch_size
        )

        # one execution: per-batch (rows, invalid) partials — a
        # filter+count would re-run the validator pool a second time
        # for the denominator
        def vparts(t: pa.Table) -> pa.Table:
            bad = pc.sum(
                pc.cast(pc.invert(t.column("valid")), pa.int64())
            ).as_py() or 0
            return pa.table(
                {
                    "n": pa.array([t.num_rows], pa.int64()),
                    "bad": pa.array([bad], pa.int64()),
                }
            )

        parts = verdicts.map_batches(vparts, batch_format="pyarrow").take_all()
        n_total = sum(p["n"] for p in parts)
        n_invalid = sum(p["bad"] for p in parts)
        frac = (n_invalid / n_total) if n_total else 0.0
        results[i] = _verdict(c, "invalid_frac", frac, max_frac, frac <= max_frac)

    # Internal invariant: the upfront _KNOWN guard already rejected
    # unknown kinds, so every index must have been filled by its family
    # pass above. A gap here is a run_checks bug, not a caller error.
    missing = [checks[i].kind for i in range(len(checks)) if i not in results]
    if missing:
        raise AssertionError(
            f"run_checks internal error: no result produced for check "
            f"kind(s) {sorted(set(missing))}"
        )
    return pd.DataFrame([results[i] for i in range(len(checks))])


def suggest_suite(
    ds,
    columns: list[str],
    *,
    enum_cap: int = 16,
    enum_max_len: int = 128,
    key_candidates: bool = True,
    range_slack: float = 0.0,
    batch_size: int = 8192,
) -> list[Check]:
    """Deequ-style suggestion loop: derive a check suite FROM the data,
    to be enforced on future data (run the result through ``run_checks``
    on tomorrow's partition). Two shared passes:

    - one ``sketch_summary`` pass: ``not_null`` for columns observed
      null-free, ``in_range`` for numeric columns (observed min/max,
      widened by ``range_slack`` fractionally on each side);
    - one ``distinct_counts`` digest exchange over all columns:
      ``unique`` for columns whose distinct count equals the row count
      (if ``key_candidates``), plus ``accepted_values`` for string
      columns with ≤ ``enum_cap`` distinct values, each value at most
      ``enum_max_len`` UTF-8 bytes (over-length values disqualify the
      column map-side so they never ride the exchange; the surviving
      values are collected via one extra tiny pass over just the
      qualifying columns).

    Every suggested check passes on the profiled data by construction
    (the same observed-bounds soundness argument as
    ``infer.induce_schema``)."""
    from medea_ray.engine import constraints, stats

    columns = list(columns)
    if not columns:
        raise ValueError("suggest_suite: no columns given")
    summary = stats.sketch_summary(ds, stats_cols=columns, batch_size=batch_size)
    # the sketch pass already carries the exact row count (n includes
    # nulls) — a separate ds.count() would execute the whole upstream
    # pipeline one extra time (the same class ff727e1 removed)
    n_rows = summary[columns[0]]["n"]
    if n_rows == 0:
        # nothing can be suggested from zero observations; failing loudly
        # beats emitting a row_count check that breaks the
        # passes-on-itself guarantee
        raise ValueError("suggest_suite: empty dataset")
    counts = constraints.distinct_counts(
        ds, [[c] for c in columns], batch_size=batch_size
    )
    distinct = dict(zip(columns, counts))

    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))

    def _is_numeric(c):
        t = types[c]
        return pa.types.is_integer(t) or pa.types.is_floating(t)

    def _is_string(c):
        t = types[c]
        return pa.types.is_string(t) or pa.types.is_large_string(t)

    suite: list[Check] = [row_count(min_rows=1)]
    enum_cols = []
    for c in columns:
        s = summary[c]
        if s["n_null"] == 0 and n_rows > 0:
            suite.append(not_null(c))
        if _is_numeric(c) and s["min"] is not None:
            lo, hi = s["min"], s["max"]
            # fuzz-found (round 5): ±inf observed bounds poison the pad
            # arithmetic — (inf - -inf) * slack and inf * 0.0 are both
            # NaN, and an in_range(nan, nan) check passes VACUOUSLY
            # (every comparison with NaN is False), silently asserting
            # nothing on tomorrow's data. Infinite endpoints are emitted
            # unpadded; a NaN endpoint (defensive — the sketch strips
            # NaN values) suppresses the range check entirely.
            import math as _math

            fl = [v for v in (lo, hi) if isinstance(v, float)]
            if any(_math.isnan(v) for v in fl):
                pass
            elif any(_math.isinf(v) for v in fl):
                suite.append(in_range(c, min=lo, max=hi))
            else:
                pad = (hi - lo) * range_slack
                suite.append(in_range(c, min=lo - pad, max=hi + pad))
        if key_candidates and distinct[c] == n_rows and n_rows > 0:
            suite.append(unique(c))
        # a null-free requirement is NOT implied: accepted_values
        # ignores nulls by design (not_null owns them)
        if _is_string(c) and 0 < distinct[c] - (1 if s["n_null"] else 0) <= enum_cap:
            enum_cols.append(c)

    if enum_cols:
        from ray.data.aggregate import Max

        max_len = enum_max_len

        def vals_partial(t: pa.Table) -> pa.Table:
            cols_out, vals_out, marks = [], [], []
            for c in enum_cols:
                uniq = pc.unique(pc.drop_null(t.column(c)))
                over = False
                for v in uniq.to_pylist():
                    if len(v.encode("utf-8", "surrogatepass")) > max_len:
                        # huge values disqualify the column MAP-side (the
                        # same enum_max_len rule as infer.profile_json) —
                        # they must never ride the exchange or the
                        # broadcast Check.params
                        over = True
                        continue
                    cols_out.append(c)
                    vals_out.append(v)
                    marks.append(1)
                if over:
                    cols_out.append(c)
                    vals_out.append("")
                    marks.append(2)  # over-length marker, drops the column
            return pa.table(
                {
                    "col": pa.array(cols_out, pa.string()),
                    "val": pa.array(vals_out, pa.large_string()),
                    "one": pa.array(marks, pa.int64()),
                }
            )

        rows = (
            ds.map_batches(vals_partial, batch_format="pyarrow", batch_size=batch_size)
            .groupby(["col", "val"])
            .aggregate(Max("one", alias_name="one"))
            .take_all()  # bounded: ≤ enum_cap + 1 rows per qualifying column
        )
        by_col: dict[str, list] = {c: [] for c in enum_cols}
        dropped = set()
        for r in rows:
            if r["one"] == 2:
                dropped.add(r["col"])
            else:
                by_col[r["col"]].append(r["val"])
        for c in enum_cols:
            if c not in dropped:
                suite.append(accepted_values(c, by_col[c]))
    return suite
