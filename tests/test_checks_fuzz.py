"""Hypothesis fuzz for the suggest→enforce loop (VERDICT r4 item 8):
``suggest_suite`` over adversarial column profiles — NaN/±inf floats,
huge/empty/unicode strings, all-null columns, single rows, duplicate
rows, enum-cap boundaries — must always emit a suite that (a) builds,
and (b) PASSES on the data it was suggested from (the Deequ soundness
contract the docstring promises). The validator fast paths get the
same treatment in test_fastpath_codegen; this is the tabular twin.
"""

import math

import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from medea_ray.engine import checks as ck

# column generators: each draws a list of n cell values
_floats = st.floats(
    allow_nan=True, allow_infinity=True, width=64, min_value=None, max_value=None
)
_ints = st.integers(min_value=-(2**53), max_value=2**53)
_strings = st.one_of(
    st.text(max_size=6),
    st.text(alphabet="üñßøあ漢", min_size=1, max_size=4),
    st.just("x" * 200),  # over enum_max_len=128 bytes -> disqualifies
    st.just(""),
)


@st.composite
def _table(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    cols: dict = {}
    spec = []
    for name, vals, typ in (
        ("i", _ints, pa.int64()),
        ("f", _floats, pa.float64()),
        ("s", _strings, pa.string()),
    ):
        cells = draw(
            st.lists(st.one_of(st.none(), vals), min_size=n, max_size=n)
        )
        # occasionally duplicate the first row's value everywhere (kills
        # unique; exercises tiny enums) or null the whole column
        mode = draw(st.integers(min_value=0, max_value=3))
        if mode == 1:
            cells = [cells[0]] * n
        elif mode == 2:
            cells = [None] * n
        cols[name] = pa.array(cells, typ)
        spec.append(mode)
    return pa.table(cols), spec


@given(_table())
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_suggest_suite_passes_on_itself_fuzz(ray_session, data):
    import ray.data as rd

    t, _spec = data
    ds = rd.from_arrow(t)
    suite = ck.suggest_suite(ds, ["i", "f", "s"])
    assert suite, "suite must never be empty (row_count is always present)"
    res = ck.run_checks(rd.from_arrow(t), suite)
    assert isinstance(res, pd.DataFrame) and len(res) == len(suite)
    failed = res[~res["passed"]]
    assert failed.empty, (
        failed.to_string(),
        t.to_pydict(),
        [(c.kind, c.target, c.params) for c in suite],
    )
    # no suggested threshold may be NaN — a NaN bound silently passes or
    # fails by comparison semantics, not by the data
    for c in suite:
        for p in c.params:
            if isinstance(p, float):
                assert not math.isnan(p), (c.kind, c.target, c.params)


def test_suggest_suite_nan_column_sound(ray_session):
    """Regression anchor for the NaN case specifically: a float column
    containing NaN must yield a suite that still passes on itself."""
    import ray.data as rd

    t = pa.table({"f": pa.array([1.0, float("nan"), 2.5], pa.float64())})
    suite = ck.suggest_suite(rd.from_arrow(t), ["f"])
    res = ck.run_checks(rd.from_arrow(t), suite)
    assert res["passed"].all(), res.to_string()
    for c in suite:
        assert not any(
            isinstance(p, float) and math.isnan(p) for p in c.params
        ), (c.kind, c.params)


def test_suggest_suite_infinite_range_sound(ray_session):
    """±inf observed bounds with range_slack=0: (inf - -inf) * 0.0 is
    NaN in IEEE — the pad math must not poison the emitted bounds."""
    import ray.data as rd

    t = pa.table(
        {"f": pa.array([float("-inf"), 0.0, float("inf")], pa.float64())}
    )
    suite = ck.suggest_suite(rd.from_arrow(t), ["f"])
    res = ck.run_checks(rd.from_arrow(t), suite)
    assert res["passed"].all(), res.to_string()
    for c in suite:
        assert not any(
            isinstance(p, float) and math.isnan(p) for p in c.params
        ), (c.kind, c.params)
