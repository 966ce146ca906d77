"""Ordered/windowed operators (engine/window.py): sessionization gap
semantics, as-of join left/inner + tie handling, overlapping interval
join, top-k determinism, tumbling bucketization, hot-group caps."""

import numpy as np
import pyarrow as pa
import pytest

from medea_ray.engine import window

US = 1_000_000
HOUR = 3600 * US


def _events(rows):
    """rows: (user_id, ts_us[, value, event_id]) tuples → Dataset."""
    import ray.data as rd

    items = []
    for i, r in enumerate(rows):
        items.append({
            "user_id": r[0],
            "ts": r[1],
            "value": r[2] if len(r) > 2 else 0.0,
            "event_id": r[3] if len(r) > 3 else i,
        })
    return rd.from_items(items)


# -- sessionize --------------------------------------------------------------


def test_sessionize_gap_boundary(ray_session):
    # gaps: exactly gap (same session — strict >), gap+1us (new session)
    ds = _events([
        (1, 0), (1, HOUR), (1, 2 * HOUR + 1),      # u1: [0,1h] then [2h+1us]
        (2, 0),                                      # u2: singleton
    ])
    out = window.sessionize(ds, "user_id", "ts", gap_us=HOUR).take_all()
    by = {(r["user_id"], r["session_n"]): r for r in out}
    assert len(out) == 3
    assert by[(1, 1)]["n_events"] == 2 and by[(1, 1)]["end_us"] == HOUR
    assert by[(1, 2)]["n_events"] == 1 and by[(1, 2)]["start_us"] == 2 * HOUR + 1
    assert by[(2, 1)]["n_events"] == 1


def test_sessionize_tied_timestamps(ray_session):
    ds = _events([(1, 5), (1, 5), (1, 5)])
    out = window.sessionize(ds, "user_id", "ts", gap_us=1).take_all()
    assert len(out) == 1 and out[0]["n_events"] == 3
    assert out[0]["start_us"] == out[0]["end_us"] == 5


def test_sessionize_hot_group_cap_keeps_earliest(ray_session):
    # the drop-count warning fires in the worker process (visible in Ray
    # logs); the driver-side contract is the deterministic earliest-kept cut
    ds = _events([(1, i * US) for i in range(50)])
    out = window.sessionize(ds, "user_id", "ts", gap_us=10 * US,
                            max_group_size=10).take_all()
    assert sum(r["n_events"] for r in out) == 10
    assert max(r["end_us"] for r in out) == 9 * US  # earliest 10 kept


# -- asof_join ---------------------------------------------------------------


def _asof(left_rows, right_rows, how):
    left = _events(left_rows)
    right = _events(right_rows)
    return window.asof_join(
        left, right, on="user_id", ts_col="ts",
        left_cols=["event_id"], match_name="m", how=how,
    ).take_all()


def test_asof_inner_backward(ray_session):
    out = _asof(
        [(1, 100, 0.0, 7), (1, 10, 0.0, 8)],
        [(1, 50), (1, 99), (1, 101)],
        "inner",
    )
    # left ts=100 matches right 99; left ts=10 has no prior right → dropped
    assert [(r["event_id"], r["m"]) for r in out] == [(7, 99)]


def test_asof_left_keeps_unmatched_null(ray_session):
    out = _asof([(1, 10, 0.0, 7), (2, 10, 0.0, 8)], [(1, 10)], "left")
    by = {r["event_id"]: r["m"] for r in out}
    assert by == {7: 10, 8: None}  # ts equal matches (<=); no right side → null


def test_asof_right_ties_resolve_to_timestamp(ray_session):
    # two right rows at the winning ts: output is the ts itself, so
    # deterministic regardless of which row "wins"
    out = _asof([(1, 100, 0.0, 7)], [(1, 60), (1, 60)], "inner")
    assert out == [{"user_id": 1, "ts_us": 100, "event_id": 7, "m": 60}]


def test_asof_vs_duckdb_events(ray_session):
    import duckdb

    import ray.data as rd

    sf = "/root/testdata/sf0.001"
    clicks = rd.read_parquet(f"{sf}/events.parquet").filter(expr="event_type == 'click'")
    purch = rd.read_parquet(f"{sf}/events.parquet").filter(expr="event_type == 'purchase'")
    got = window.asof_join(clicks, purch, on="user_id", ts_col="ts",
                           left_cols=["event_id"], match_name="m", how="left").take_all()
    got = sorted((r["event_id"], r["m"]) for r in got)
    exp = duckdb.sql(f"""
        SELECT l.event_id, epoch_us(r.ts) FROM
          (SELECT * FROM read_parquet('{sf}/events.parquet') WHERE event_type='click') l
        ASOF LEFT JOIN
          (SELECT * FROM read_parquet('{sf}/events.parquet') WHERE event_type='purchase') r
        ON l.user_id = r.user_id AND l.ts >= r.ts
        ORDER BY 1
    """).fetchall()
    assert got == [(a, b) for a, b in exp]


# -- interval_join -----------------------------------------------------------


INTERVALS = [("a", 0.0, 10.0), ("b", 10.0, 20.0), ("wide", 5.0, 15.0)]


def test_interval_join_overlap_and_bounds(ray_session):
    ds = _events([(1, 0, 7.0, 1), (1, 0, 10.0, 2), (1, 0, 99.0, 3)])
    out = window.interval_join(ds, "value", INTERVALS, label_name="lab").take_all()
    got = sorted((r["event_id"], r["lab"]) for r in out)
    # 7.0 → a + wide; 10.0 → b + wide (lo inclusive, hi exclusive); 99 → none
    assert got == [(1, "a"), (1, "wide"), (2, "b"), (2, "wide")]


def test_interval_join_left_null_label(ray_session):
    ds = _events([(1, 0, 99.0, 3)])
    out = window.interval_join(ds, "value", INTERVALS, label_name="lab",
                               how="left").take_all()
    assert [(r["event_id"], r["lab"]) for r in out] == [(3, None)]


def test_interval_join_empty_match_block(ray_session):
    # every row unmatched with how="inner" → stage must emit a typed empty
    ds = _events([(1, 0, 99.0, 3), (1, 0, 88.0, 4)])
    out = window.interval_join(ds, "value", INTERVALS).take_all()
    assert out == []


# -- top_k_per_group ---------------------------------------------------------


def test_top_k_ties_and_short_groups(ray_session):
    ds = _events([
        (1, 0, 5.0, 11), (1, 0, 5.0, 10), (1, 0, 9.0, 12), (1, 0, 1.0, 13),
        (2, 0, 3.0, 20),
    ])
    out = window.top_k_per_group(ds, "user_id", "value", k=3,
                                 tiebreak_col="event_id").take_all()
    got = sorted((r["user_id"], r["rank"], r["event_id"]) for r in out)
    # u1: 9.0 → rank1; tie 5.0/5.0 broken by event_id asc (10 then 11)
    assert got == [(1, 1, 12), (1, 2, 10), (1, 3, 11), (2, 1, 20)]


def test_top_k_ascending(ray_session):
    ds = _events([(1, 0, 5.0, 1), (1, 0, 2.0, 2), (1, 0, 9.0, 3)])
    out = window.top_k_per_group(ds, "user_id", "value", k=1,
                                 tiebreak_col="event_id", descending=False).take_all()
    assert [(r["rank"], r["event_id"]) for r in out] == [(1, 2)]


# -- tumbling_window ---------------------------------------------------------


def test_tumbling_window_floor(ray_session):
    ds = _events([(1, 0), (1, HOUR - 1), (1, HOUR), (1, 5 * HOUR)])
    win = window.tumbling_window(ds, "ts", HOUR, ["user_id"])
    out = sorted(r["window_start_us"] for r in win.take_all())
    assert out == [0, 0, HOUR, 5 * HOUR]


# -- hopping_window ----------------------------------------------------------


def test_hopping_window_membership(ray_session):
    # width=2h, hop=1h → k=2 windows per event: floor(t/h)*h and that - h
    ds = _events([(1, 0), (1, HOUR + 1), (1, 3 * HOUR)])
    win = window.hopping_window(ds, "ts", 2 * HOUR, HOUR, ["user_id"])
    out = sorted(r["window_start_us"] for r in win.take_all())
    assert out == [-HOUR, 0, 0, HOUR, 2 * HOUR, 3 * HOUR]
    # every emitted window actually contains its event
    rows = window.hopping_window(ds, "ts", 2 * HOUR, HOUR, []).take_all()
    assert len(rows) == 6


def test_hopping_window_negative_ts_floor(ray_session):
    # pre-epoch timestamps must floor toward -inf, same as tumbling
    ds = _events([(1, -1)])
    win = window.hopping_window(ds, "ts", 2 * HOUR, HOUR, [])
    out = sorted(r["window_start_us"] for r in win.take_all())
    assert out == [-2 * HOUR, -HOUR]


def test_hopping_window_k1_is_tumbling(ray_session):
    ds = _events([(1, 0), (1, HOUR - 1), (1, 5 * HOUR)])
    hop = window.hopping_window(ds, "ts", HOUR, HOUR, ["user_id"]).take_all()
    tum = window.tumbling_window(ds, "ts", HOUR, ["user_id"]).take_all()
    assert sorted(r["window_start_us"] for r in hop) == sorted(
        r["window_start_us"] for r in tum
    )


def test_hopping_window_rejects_non_multiple():
    with pytest.raises(ValueError, match="multiple"):
        window.hopping_window(None, "ts", 3 * HOUR, 2 * HOUR, [])
    with pytest.raises(ValueError, match="multiple"):
        window.hopping_window(None, "ts", 0, HOUR, [])


# -- cumulative_per_group ----------------------------------------------------


def test_cumulative_order_and_ties(ray_session):
    ds = _events([
        (1, 20, 0.0, 5), (1, 10, 0.0, 9), (1, 10, 0.0, 2),
    ])

    def add_v(t):
        import pyarrow as pa
        return t.append_column("v", pa.array([100] * t.num_rows, pa.int64()))

    src = ds.map_batches(add_v, batch_format="pyarrow")
    out = window.cumulative_per_group(
        src, "user_id", order_col="ts", value_col="v",
        tiebreak_col="event_id", out_name="run",
    ).take_all()
    # order: ts=10/id=2, ts=10/id=9, ts=20/id=5 → running 100,200,300
    by = {r["event_id"]: r["run"] for r in out}
    assert by == {2: 100, 9: 200, 5: 300}


# -- pivot_counts (engine/reshape.py) ---------------------------------------


def test_pivot_counts_zero_fill_and_other(ray_session):
    from medea_ray.engine.reshape import pivot_counts

    ds = _events([
        (1, 0, 0.0, 1), (1, 0, 0.0, 2), (2, 0, 0.0, 3),
    ])

    def add_cat(t):
        import pyarrow as pa
        cats = {1: "a", 2: "b", 3: "weird"}
        return t.append_column(
            "cat", pa.array([cats[i] for i in t.column("event_id").to_pylist()])
        )

    src = ds.map_batches(add_cat, batch_format="pyarrow")
    out = pivot_counts(src, "user_id", "cat", ["a", "b"], other_name="other").take_all()
    by = {r["user_id"]: (r["n_a"], r["n_b"], r["n_other"]) for r in out}
    assert by == {1: (1, 1, 0), 2: (0, 0, 1)}
    # without other_name, unknown categories drop (documented)
    out2 = pivot_counts(src, "user_id", "cat", ["a", "b"]).take_all()
    by2 = {r["user_id"]: (r["n_a"], r["n_b"]) for r in out2}
    assert by2 == {1: (1, 1), 2: (0, 0)}


# -- review-fix regressions --------------------------------------------------


def test_sessionize_ms_unit_timestamps(ray_session):
    # a timestamp[ms] column must normalize to µs before gap comparison
    import ray.data as rd

    t = pa.table({
        "u": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array([0, 3600_000, 7200_001], pa.timestamp("ms")),
    })
    out = window.sessionize(rd.from_arrow(t), "u", "ts", gap_us=HOUR).take_all()
    # gaps: 1h (same session), 1h+1ms (new session)
    assert sorted(r["n_events"] for r in out) == [1, 2]
    assert max(r["end_us"] for r in out) == 7200_001_000


def test_top_k_string_order_column(ray_session):
    import ray.data as rd

    ds = rd.from_items([
        {"g": 1, "name": "beta", "id": 1},
        {"g": 1, "name": "alpha", "id": 2},
        {"g": 1, "name": "gamma", "id": 3},
    ])
    out = window.top_k_per_group(ds, "g", "name", k=1, tiebreak_col="id").take_all()
    assert [(r["rank"], r["name"]) for r in out] == [(1, "gamma")]


def test_top_k_nan_ranks_first_descending(ray_session):
    # NaN = greatest, matching the row_number() DESC oracle mirror
    ds = _events([(1, 0, float("nan"), 1), (1, 0, 5.0, 2)])
    out = window.top_k_per_group(ds, "user_id", "value", k=1,
                                 tiebreak_col="event_id").take_all()
    assert [r["event_id"] for r in out] == [1]


# -- lag_per_group -----------------------------------------------------------


def test_lag_per_group_basic_and_short(ray_session):
    ds = _events([
        (1, 10, 3.0, 1), (1, 20, 7.0, 2), (1, 30, 9.0, 3),
        (2, 5, 1.0, 9),
    ])
    out = window.lag_per_group(
        ds, "user_id", order_col="ts", value_col="value",
        tiebreak_col="event_id", out_name="prev",
    ).take_all()
    by = {r["event_id"]: r["prev"] for r in out}
    assert by == {1: None, 2: 3.0, 3: 7.0, 9: None}


def test_lead_per_group_negative_periods(ray_session):
    ds = _events([(1, 10, 3.0, 1), (1, 20, 7.0, 2)])
    out = window.lag_per_group(
        ds, "user_id", order_col="ts", value_col="value",
        tiebreak_col="event_id", periods=-1, out_name="next",
    ).take_all()
    by = {r["event_id"]: r["next"] for r in out}
    assert by == {1: 7.0, 2: None}


def test_lag_periods_beyond_group_size_all_null(ray_session):
    ds = _events([(1, 10, 3.0, 1), (1, 20, 7.0, 2)])
    out = window.lag_per_group(
        ds, "user_id", order_col="ts", value_col="value",
        tiebreak_col="event_id", periods=5, out_name="prev",
    ).take_all()
    assert all(r["prev"] is None for r in out)


def test_lag_zero_periods_raises(ray_session):
    import ray.data as rd

    with pytest.raises(ValueError, match="periods"):
        window.lag_per_group(rd.range(1), "id", "id", "id", "id", periods=0)


# -- null handling (round-3 hardening) ----------------------------------------


def test_top_k_null_order_values_rank_last(ray_session):
    # SQL mirror (DuckDB default NULLS LAST both directions): a null order
    # value never beats a real one, for floats AND strings
    import ray.data as rd

    ds = rd.from_items([
        {"g": 1, "v": None, "id": 1},
        {"g": 1, "v": 5.0, "id": 2},
        {"g": 1, "v": 1.0, "id": 3},
    ])
    out = window.top_k_per_group(ds, "g", "v", k=2, tiebreak_col="id").take_all()
    assert [(r["rank"], r["id"]) for r in out] == [(1, 2), (2, 3)]
    out_asc = window.top_k_per_group(
        ds, "g", "v", k=3, tiebreak_col="id", descending=False
    ).take_all()
    assert [r["id"] for r in out_asc] == [3, 2, 1]  # null still last

    str_ds = rd.from_items([
        {"g": 1, "name": None, "id": 1},
        {"g": 1, "name": "alpha", "id": 2},
    ])
    out_s = window.top_k_per_group(str_ds, "g", "name", k=1, tiebreak_col="id").take_all()
    assert [r["id"] for r in out_s] == [2]


def test_null_timestamp_rejected(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"user_id": 1, "ts": 5}, {"user_id": 1, "ts": None}])
    with pytest.raises(Exception, match="null timestamp"):
        window.sessionize(ds, "user_id", "ts", gap_us=1).take_all()


def test_asof_right_cap_never_fabricates_stale_match(ray_session):
    # right side capped to 2 → the EARLIEST right rows are dropped; a left
    # row whose true match survives still matches it, and a left row whose
    # only candidates were dropped gets NO match (never an older wrong one)
    out = _asof(
        [(1, 100, 0.0, 7), (1, 15, 0.0, 8)],
        [(1, 10), (1, 50), (1, 99)],
        "inner",
    )
    by_full = {r["event_id"]: r["m"] for r in out}
    assert by_full == {7: 99, 8: 10}
    capped = window.asof_join(
        _events([(1, 100, 0.0, 7), (1, 15, 0.0, 8)]),
        _events([(1, 10), (1, 50), (1, 99)]),
        on="user_id", ts_col="ts", left_cols=["event_id"],
        match_name="m", how="inner", max_group_size=2,
    ).take_all()
    by = {r["event_id"]: r["m"] for r in capped}
    # kept right ts = {50, 99} (latest two): event 7 matches 99 (true
    # match), event 8's true match (10) was dropped → absent, not stale
    assert by == {7: 99}
