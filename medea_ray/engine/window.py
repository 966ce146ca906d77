"""Ordered / windowed operators over time-keyed streams: sessionization,
as-of join, interval (range) join, per-group top-k, tumbling and hopping
(overlapping) windows.

The reference (juspay/medea) is a single-document validation library with
no temporal operators; these come from the north rule's engine surface
(drift across warc_ts partitions implies time-keyed streams) and the
standard large-scale training-data pipeline toolkit (windowed aggregates,
as-of/range joins over event logs).

Scale shapes:

- ``sessionize`` / ``asof_join`` / ``top_k_per_group`` co-partition by a
  group key with ONE Ray groupby shuffle, then do vectorized (numpy over
  int64 timestamp views) per-group work inside ``map_groups``.
  Partitioning assumption: ONE group's rows fit in a worker heap — true
  for per-user event streams whose size is bounded by human activity, not
  corpus size. A degenerate hot group is truncated at ``max_group_size``
  deterministically with a logged drop count, same policy as dedup's
  bucket cap (no silent caps). Which rows are kept is per-operator:
  ``sessionize``/``top_k_per_group`` keep the earliest, while
  ``asof_join`` keeps the LATEST right-side timestamps so truncation can
  only null a match, never fabricate a stale one.
- ``interval_join`` broadcasts the (small) interval table once inside the
  task closure and scans each batch with one boolean mask per interval —
  no shuffle, O(n_intervals × batch) vectorized. Intervals may overlap
  (a row joins every interval containing it).
- ``tumbling_window`` is a pure ``map_batches`` bucketization (epoch
  floor-div) feeding the same partial-aggregating groupby shape as
  ``queries.events_daily``; the shuffle moves (window, partial) rows only.
  ``hopping_window`` is the overlapping variant: a vectorized k-way
  fan-out (k = width/hop) ahead of the same partial-combining aggregate.

Timestamps cross every API boundary as int64 epoch-microseconds (Arrow
``timestamp[us]`` casts to them zero-copy) so no float ever reaches an
oracle compare.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_log = logging.getLogger(__name__)

DEFAULT_MAX_GROUP = 2_000_000


def _ts_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """timestamp / int64 column → int64 epoch-microseconds numpy view.
    Non-us timestamp units are normalized first (a bare int64 cast would
    read ms/ns ticks as µs — off by 10^3/10^-3). Null entries are
    rejected: to_numpy would turn them into NaN and the int64 cast of NaN
    is garbage — sessions/matches would silently corrupt. Filter null
    timestamps upstream if the stream can contain them."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError(
            f"null timestamp/order values ({col.null_count} of {len(col)}) are "
            "not orderable; drop or fill them before the windowed operator"
        )
    if pa.types.is_timestamp(col.type):
        if col.type.unit != "us":
            col = col.cast(pa.timestamp("us", tz=col.type.tz))
        col = col.cast(pa.int64())
    return col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def _cap_sorted(order: np.ndarray, max_group_size: int, what: str, key) -> tuple[np.ndarray, int]:
    """Truncate a sort-order index array to the cap, logging the overflow."""
    dropped = 0
    if len(order) > max_group_size:
        dropped = len(order) - max_group_size
        _log.warning("%s group %r: %d rows capped to %d (dropped %d)",
                     what, key, len(order), max_group_size, dropped)
        order = order[:max_group_size]
    return order, dropped


def sessionize(
    ds,
    group_col: str,
    ts_col: str,
    gap_us: int,
    max_group_size: int = DEFAULT_MAX_GROUP,
):
    """Gap-based sessionization: per ``group_col``, sort by time and cut a
    new session whenever the gap to the previous event exceeds ``gap_us``.
    Returns one row per session: (group, session_n [1-based, in time
    order], start_us, end_us, n_events).

    Equal-timestamp ties need no tiebreak — a zero gap can never open a
    session, and start/end/count are order-invariant within a tie."""

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            group_col: t.column(group_col),
            "ts_us": pa.array(_ts_us(t.column(ts_col)), pa.int64()),
        })

    def per_group(t: pa.Table) -> pa.Table:
        key_type = t.schema.field(group_col).type
        schema = pa.schema([
            (group_col, key_type), ("session_n", pa.int64()),
            ("start_us", pa.int64()), ("end_us", pa.int64()),
            ("n_events", pa.int64()),
        ])
        if t.num_rows == 0:
            return schema.empty_table()
        key = t.column(group_col)[0].as_py()
        ts = np.sort(_ts_us(t.column("ts_us")))
        order, _ = _cap_sorted(np.arange(len(ts)), max_group_size, "sessionize", key)
        ts = ts[order]
        new_sess = np.empty(len(ts), dtype=bool)
        new_sess[0] = True
        np.greater(np.diff(ts), gap_us, out=new_sess[1:])
        starts = np.flatnonzero(new_sess)
        bounds = np.append(starts, len(ts))
        return pa.table({
            group_col: pa.array([key] * len(starts), key_type),
            "session_n": pa.array(np.arange(1, len(starts) + 1), pa.int64()),
            "start_us": pa.array(ts[starts], pa.int64()),
            "end_us": pa.array(ts[bounds[1:] - 1], pa.int64()),
            "n_events": pa.array(np.diff(bounds), pa.int64()),
        }, schema=schema)

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(per_group, batch_format="pyarrow")
    )


def asof_join(
    left_ds,
    right_ds,
    on: str,
    ts_col: str,
    left_cols: list[str],
    match_name: str = "asof_ts_us",
    how: str = "inner",
    max_group_size: int = DEFAULT_MAX_GROUP,
):
    """Backward as-of join: for each left row, the latest right row of the
    same ``on`` key with right ts <= left ts. Appends that right timestamp
    as ``match_name`` (int64 epoch-us). ``how="inner"`` drops left rows
    with no match; ``"left"`` keeps them with null.

    Only the matched TIMESTAMP is emitted (not a right-row id): when
    several right rows tie at the winning timestamp the timestamp is still
    unique, so the result is deterministic — SQL ASOF JOIN picks an
    arbitrary row among ties.

    Shape: both sides are projected to a shared (on, ts_us, side,
    left payload) schema, unioned (two plain map_batches branches — safe;
    unions of WIDE branches are the executor trap), and co-partitioned by
    ``on`` in one groupby; each group splits by side, sorts the right
    timestamps once, and resolves every left row with one searchsorted."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")

    left_schema = left_ds.schema()
    payload_fields = [(c, left_schema.base_schema.field(c).type) for c in left_cols]
    union_schema = pa.schema(
        [(on, left_schema.base_schema.field(on).type), ("ts_us", pa.int64()),
         ("side", pa.int8())] + payload_fields
    )
    out_schema = pa.schema(
        [(on, left_schema.base_schema.field(on).type), ("ts_us", pa.int64())]
        + payload_fields + [(match_name, pa.int64())]
    )

    def prep_left(t: pa.Table) -> pa.Table:
        cols = {
            on: t.column(on),
            "ts_us": pa.array(_ts_us(t.column(ts_col)), pa.int64()),
            "side": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
        }
        for c, typ in payload_fields:
            cols[c] = t.column(c).cast(typ)
        return pa.table(cols, schema=union_schema)

    def prep_right(t: pa.Table) -> pa.Table:
        cols = {
            on: t.column(on),
            "ts_us": pa.array(_ts_us(t.column(ts_col)), pa.int64()),
            "side": pa.array(np.ones(t.num_rows, np.int8), pa.int8()),
        }
        for c, typ in payload_fields:
            cols[c] = pa.nulls(t.num_rows, typ)
        return pa.table(cols, schema=union_schema)

    def per_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        key = t.column(on)[0].as_py()
        side = _ts_us(t.column("side"))
        ts = _ts_us(t.column("ts_us"))
        left_idx = np.flatnonzero(side == 0)
        if len(left_idx) == 0:
            return out_schema.empty_table()
        # cap in time order so a truncated hot group keeps the earliest rows
        left_idx = left_idx[np.argsort(ts[left_idx], kind="stable")]
        left_idx, _ = _cap_sorted(left_idx, max_group_size, "asof_join(left)", key)
        right_ts = np.sort(ts[side == 1])
        if len(right_ts) > max_group_size:
            # keep the LATEST right timestamps: the true backward match is
            # the largest right ts <= left ts, so a left row whose match
            # was truncated gets NO match — dropping the earliest instead
            # would silently hand it an older, wrong timestamp
            n_drop = len(right_ts) - max_group_size
            _log.warning(
                "asof_join(right) group %r: %d rows capped to %d (dropped %d "
                "earliest; affected left rows get no match, never a stale one)",
                key, len(right_ts), max_group_size, n_drop,
            )
            right_ts = right_ts[n_drop:]
        pos = np.searchsorted(right_ts, ts[left_idx], side="right") - 1
        matched = pos >= 0
        if how == "inner":
            left_idx = left_idx[matched]
            pos = pos[matched]
            match = pa.array(right_ts[pos] if len(pos) else
                             np.empty(0, np.int64), pa.int64())
        else:
            vals = np.where(matched, right_ts[np.maximum(pos, 0)] if len(right_ts)
                            else 0, 0)
            match = pa.array(vals, pa.int64(), mask=~matched)
        take = pa.array(left_idx, pa.int64())
        cols = {on: t.column(on).take(take), "ts_us": t.column("ts_us").take(take)}
        for c, _typ in payload_fields:
            cols[c] = t.column(c).take(take)
        cols[match_name] = match
        return pa.table(cols, schema=out_schema)

    left = left_ds.map_batches(prep_left, batch_format="pyarrow")
    right = right_ds.map_batches(prep_right, batch_format="pyarrow")
    return left.union(right).groupby(on).map_groups(per_group, batch_format="pyarrow")


def interval_join(
    ds,
    col: str,
    intervals: list[tuple[str, float, float]],
    label_name: str = "label",
    how: str = "inner",
):
    """Range join against a static interval table: emit one output row per
    (input row, interval) pair with ``lo <= value < hi``. Intervals
    ``(label, lo, hi)`` may overlap — a row matches all of them.
    ``how="left"`` additionally emits unmatched rows with a null label.

    The interval table is broadcast inside the task closure (it is tiny by
    the operator's contract — for a LARGE interval side use
    ``join.range_join``, the banded one-shuffle path with identical
    half-open semantics)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    labels = [lab for lab, _, _ in intervals]
    los = np.array([lo for _, lo, _ in intervals], np.float64)
    his = np.array([hi for _, _, hi in intervals], np.float64)

    def match(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [(f.name, f.type) for f in t.schema] + [(label_name, pa.string())]
        )
        vals = t.column(col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        v = vals.to_numpy(zero_copy_only=False).astype(np.float64)
        parts = []
        matched_any = np.zeros(len(v), dtype=bool)
        for i, lab in enumerate(labels):
            m = (v >= los[i]) & (v < his[i])
            matched_any |= m
            idx = np.flatnonzero(m)
            if len(idx):
                sub = t.take(pa.array(idx, pa.int64()))
                sub = sub.append_column(label_name, pa.array([lab] * len(idx), pa.string()))
                parts.append(sub)
        if how == "left":
            idx = np.flatnonzero(~matched_any)
            if len(idx):
                sub = t.take(pa.array(idx, pa.int64()))
                sub = sub.append_column(label_name, pa.nulls(len(idx), pa.string()))
                parts.append(sub)
        if not parts:
            return out_schema.empty_table()
        return pa.concat_tables(parts).cast(out_schema)

    return ds.map_batches(match, batch_format="pyarrow")


def top_k_per_group(
    ds,
    group_col: str,
    order_col: str,
    k: int,
    tiebreak_col: str,
    descending: bool = True,
):
    """Per-group top-k with a deterministic total order: sort each group by
    (``order_col`` desc|asc, ``tiebreak_col`` asc), keep the first k rows,
    and append ``rank`` (1-based). The SQL mirror is
    ``row_number() OVER (PARTITION BY g ORDER BY o DESC, t ASC) <= k``.

    One groupby shuffle; per-group cost is one lexsort — the group must
    fit in a worker heap (bounded-group assumption, see module doc)."""

    def per_group(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [(f.name, f.type) for f in t.schema] + [("rank", pa.int64())]
        )
        if t.num_rows == 0:
            return out_schema.empty_table()
        order = t.column(order_col)
        if isinstance(order, pa.ChunkedArray):
            order = order.combine_chunks()
        o = order.to_numpy(zero_copy_only=False)
        tie = t.column(tiebreak_col)
        if isinstance(tie, pa.ChunkedArray):
            tie = tie.combine_chunks()
        tb = tie.to_numpy(zero_copy_only=False)
        # rank the order key instead of negating it: works for any
        # comparable dtype (strings, ints at INT64_MIN) and puts NaN at
        # the greatest rank — matching the documented row_number() DESC
        # mirror, where NaN sorts above every number. SQL NULLs are a
        # separate case: DuckDB default is NULLS LAST under BOTH
        # directions, so null order values rank after every value (they
        # also must never reach np.unique — None in a string column raises)
        is_null = pc.is_null(order).to_numpy(zero_copy_only=False)
        if is_null.any():
            rank = np.empty(len(o), dtype=np.int64)
            valid = np.flatnonzero(~is_null)
            r = np.searchsorted(np.unique(o[valid]), o[valid]).astype(np.int64)
            rank[valid] = -r if descending else r
            rank[is_null] = np.iinfo(np.int64).max
        else:
            rank = np.searchsorted(np.unique(o), o).astype(np.int64)
            if descending:
                rank = -rank
        # np.lexsort: last key is primary; stable, so ties fall to tb asc
        idx = np.lexsort((tb, rank))[:k]
        out = t.take(pa.array(idx, pa.int64()))
        out = out.append_column("rank", pa.array(np.arange(1, len(idx) + 1), pa.int64()))
        return out.cast(out_schema)

    return ds.groupby(group_col).map_groups(per_group, batch_format="pyarrow")


def lag_per_group(
    ds,
    group_col: str,
    order_col: str,
    value_col: str,
    tiebreak_col: str,
    periods: int = 1,
    out_name: str = "lagged",
):
    """Per-group LAG (``periods`` > 0) / LEAD (``periods`` < 0) of
    ``value_col`` in (``order_col``, ``tiebreak_col``) order — the
    ``LAG(v, n) OVER (PARTITION BY g ORDER BY o, t)`` window shape. Rows
    with no row ``periods`` back/ahead get a null ``out_name``.
    ``order_col`` must be a timestamp or integer column. One groupby
    shuffle; per-group cost is one lexsort + one slice."""
    if periods == 0:
        raise ValueError("periods must be non-zero (positive=lag, negative=lead)")

    def per_group(t: pa.Table) -> pa.Table:
        vtype = t.schema.field(value_col).type
        out_schema = pa.schema(
            [(f.name, f.type) for f in t.schema] + [(out_name, vtype)]
        )
        if t.num_rows == 0:
            return out_schema.empty_table()
        o = _ts_us(t.column(order_col))
        tb = t.column(tiebreak_col)
        if isinstance(tb, pa.ChunkedArray):
            tb = tb.combine_chunks()
        idx = np.lexsort((tb.to_numpy(zero_copy_only=False), o))
        out = t.take(pa.array(idx, pa.int64()))
        v = out.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        n, p = len(v), periods
        if abs(p) >= n:
            lagged = pa.nulls(n, vtype)
        elif p > 0:
            lagged = pa.concat_arrays([pa.nulls(p, vtype), v.slice(0, n - p)])
        else:
            lagged = pa.concat_arrays([v.slice(-p, n + p), pa.nulls(-p, vtype)])
        return out.append_column(out_name, lagged).cast(out_schema)

    return ds.groupby(group_col).map_groups(per_group, batch_format="pyarrow")


def cumulative_per_group(
    ds,
    group_col: str,
    order_col: str,
    value_col: str,
    tiebreak_col: str,
    out_name: str = "running",
):
    """Running (cumulative) sum of ``value_col`` per group in
    (``order_col``, ``tiebreak_col``) order — the
    ``SUM(v) OVER (PARTITION BY g ORDER BY o, t ROWS UNBOUNDED PRECEDING)``
    window-function shape. ``value_col`` should be integer units (the
    running sum crosses result boundaries; float accumulation would not
    reproduce exactly) and non-null; ``order_col`` must be a timestamp or
    integer column. One groupby shuffle; per-group cost is one lexsort
    + one cumsum."""

    def per_group(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [(f.name, f.type) for f in t.schema] + [(out_name, pa.int64())]
        )
        if t.num_rows == 0:
            return out_schema.empty_table()
        o = _ts_us(t.column(order_col))
        tb = t.column(tiebreak_col)
        if isinstance(tb, pa.ChunkedArray):
            tb = tb.combine_chunks()
        idx = np.lexsort((tb.to_numpy(zero_copy_only=False), o))
        out = t.take(pa.array(idx, pa.int64()))
        v = out.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        running = np.cumsum(v.to_numpy(zero_copy_only=False).astype(np.int64))
        return out.append_column(out_name, pa.array(running, pa.int64())).cast(out_schema)

    return ds.groupby(group_col).map_groups(per_group, batch_format="pyarrow")


def hopping_window(
    ds, ts_col: str, width_us: int, hop_us: int, keep_cols: list[str]
):
    """Overlapping (hopping / sliding) windows: each event lands in EVERY
    window ``[s, s + width_us)`` whose start ``s`` is a multiple of
    ``hop_us`` — exactly ``k = width_us // hop_us`` windows per event
    (``width_us`` must be a positive multiple of ``hop_us``; ``k == 1``
    degenerates to :func:`tumbling_window`). Emits ``k`` rows per input
    row: (window_start_us, *keep_cols), ready for a groupby-aggregate.

    The fan-out is a pure vectorized ``map_batches`` (np.repeat index +
    tiled offsets — no per-row Python); window starts floor toward
    -inf so pre-epoch timestamps bucket consistently with
    :func:`tumbling_window`. Scale shape: rows multiply by ``k`` BEFORE
    the aggregate, but Ray's Count/Sum aggregate combines per block, so
    the exchange still moves (window, partial) rows only; keep ``k``
    small (2-4) or pre-aggregate inside the fan-out batch for large
    ``k``."""
    if width_us <= 0 or hop_us <= 0 or width_us % hop_us:
        raise ValueError(
            f"width_us ({width_us}) must be a positive multiple of "
            f"hop_us ({hop_us})"
        )
    k = width_us // hop_us
    hop = np.int64(hop_us)

    def fanout(t: pa.Table) -> pa.Table:
        ts = _ts_us(t.column(ts_col))
        base = ts // hop * hop  # numpy // floors toward -inf
        idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), k)
        offs = np.tile(np.arange(k, dtype=np.int64) * hop, t.num_rows)
        cols = {"window_start_us": pa.array(base[idx] - offs, pa.int64())}
        if keep_cols:
            taken = t.select(keep_cols).take(pa.array(idx, pa.int64()))
            for c in keep_cols:
                cols[c] = taken.column(c)
        return pa.table(cols)

    return ds.map_batches(fanout, batch_format="pyarrow")


def tumbling_window(ds, ts_col: str, width_us: int, keep_cols: list[str]):
    """Bucketize a time-keyed stream into fixed tumbling windows: appends
    ``window_start_us = ts_us - ts_us % width_us`` (int64) and projects to
    (window_start_us, *keep_cols) ready for a groupby-aggregate. The
    windowing itself is embarrassingly parallel; only the caller's
    aggregate shuffles (partial per block, tiny exchange)."""

    def bucketize(t: pa.Table) -> pa.Table:
        ts = _ts_us(t.column(ts_col))
        win = ts - ts % np.int64(width_us)
        cols = {"window_start_us": pa.array(win, pa.int64())}
        for c in keep_cols:
            cols[c] = t.column(c)
        return pa.table(cols)

    return ds.map_batches(bucketize, batch_format="pyarrow")
