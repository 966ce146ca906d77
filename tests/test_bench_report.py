"""Unit tests for bench.py's scaling_report tally semantics — pure file
reads over a synthetic scaling_runs.jsonl, no Ray."""

import importlib.util
import json
import sys


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _rec(pairing, raw, equal_load, ceiling):
    return {
        "when": "2026-08-18 00:00:00",
        "pairing": pairing,
        "raw": raw,
        "equal_load": equal_load,
        "pipeline_load": None,
        "docs_per_sec_small": 1.0,
        "docs_per_sec_large": 4.0,
        "membw_ceiling": ceiling,
        "n_pages": 1,
        "source": "test",
    }


def test_scaling_report_pairs_raw_with_its_own_window_ceiling(tmp_path, monkeypatch):
    """The memcpy-ceiling gate must compare each raw sample against its
    OWN same-window ceiling — best-raw vs minimum-ceiling would let a
    calm-window raw borrow a busy window's low ceiling."""
    bench = _load_bench()
    p = str(tmp_path / "runs.jsonl")
    # calm window: raw 0.575 under its 0.60 ceiling; busy window: raw
    # 0.40 under its 0.465 ceiling — NO sample meets its own ceiling,
    # though max(raw)=0.575 >= min(ceiling)=0.465 cross-window
    _write(p, [
        _rec("8->32", 0.575, 0.9, 0.60),
        _rec("8->32", 0.40, 0.85, 0.465),
    ])
    monkeypatch.setattr(bench, "SCALING_JSONL", p)
    rep = bench.scaling_report()
    pair = rep["pairings"]["8->32"]
    assert pair["n_raw_ceiling_pairs"] == 2
    assert pair["n_raw_ge_own_ceiling"] == 0
    assert pair["raw_at_or_above_ceiling"] is False
    assert pair["equal_load_pass"] is True  # 2/2 >= 0.8
    assert rep["pass"] is False  # ceiling gate fails despite equal-load

    # one sample meeting its own ceiling flips the gate
    _write(p, [
        _rec("8->32", 0.575, 0.9, 0.56),
        _rec("8->32", 0.40, 0.85, 0.465),
    ])
    rep2 = bench.scaling_report()
    pair2 = rep2["pairings"]["8->32"]
    assert pair2["n_raw_ge_own_ceiling"] == 1
    assert pair2["raw_at_or_above_ceiling"] is True
    assert rep2["pass"] is True


def test_scaling_report_majority_and_unpaired_defaults(tmp_path, monkeypatch):
    bench = _load_bench()
    p = str(tmp_path / "runs.jsonl")
    # minority of equal-load samples over the bar -> pairing fails; a
    # sample with no ceiling recorded contributes no pair (gate defaults
    # to True only when NO pairs exist at all)
    _write(p, [
        _rec("4->16", 0.7, 0.79, None),
        _rec("4->16", 0.7, 0.85, None),
        _rec("4->16", 0.7, 0.78, None),
    ])
    monkeypatch.setattr(bench, "SCALING_JSONL", p)
    rep = bench.scaling_report()
    pair = rep["pairings"]["4->16"]
    assert pair["n_equal_load_ge_bar"] == 1 and pair["equal_load_pass"] is False
    assert pair["n_raw_ceiling_pairs"] == 0
    assert pair["raw_at_or_above_ceiling"] is True
    assert rep["pass"] is False
