"""Pure-python pins for the registry perf tripwire's comparison logic
(`scripts/registry_bench.py`) — the round-9 review found the original
rule was blind to newly-erroring queries (a raise records a tiny sec,
which the timing rule reads as an improvement), so the err-transition
handling is worth its own fixture-free tests."""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from registry_bench import _FLAG_ABS_SEC, _FLAG_RATIO, compare  # noqa: E402


def _rec(sec: float, norm: float, err: str | None = None) -> dict:
    r = {"sec": sec, "norm": norm}
    if err:
        r["err"] = err
    return r


def test_timing_regression_needs_both_ratio_and_floor():
    prev = {"a": _rec(1.0, 3.0), "b": _rec(0.05, 0.15), "c": _rec(1.0, 3.0)}
    cur = {
        "a": _rec(2.5, 7.5),  # 2.5x AND +1.5s -> flagged
        "b": _rec(0.15, 0.45),  # 3x but +0.1s < floor -> jitter, not flagged
        "c": _rec(1.2, 3.6),  # +0.2s and 1.2x -> not flagged
    }
    flagged = compare(prev, cur)
    assert [f["query"] for f in flagged] == ["a"]
    assert flagged[0]["ratio"] == 2.5


def test_newly_erroring_is_flagged_despite_tiny_sec():
    prev = {"x": _rec(5.0, 15.0)}
    cur = {"x": _rec(0.05, 0.15, err="AnalysisException: boom")}
    flagged = compare(prev, cur)
    assert len(flagged) == 1 and "newly_erroring" in flagged[0]


def test_err_rows_excluded_from_timing_rule():
    # err -> err: already flagged when it broke, stays silent now;
    # err -> ok: surfaced as a recovery, never as a slowdown (the
    # tiny err-sec baseline would otherwise read any real time as 2x)
    prev = {"y": _rec(0.05, 0.15, err="boom"), "z": _rec(0.04, 0.12, err="boom")}
    cur = {"y": _rec(0.06, 0.18, err="boom"), "z": _rec(5.0, 15.0)}
    flagged = compare(prev, cur)
    assert [list(f)[1] for f in flagged] == ["recovered_from_err"]
    assert flagged[0]["query"] == "z"


def test_vanished_query_is_flagged():
    flagged = compare({"gone": _rec(1.0, 3.0)}, {})
    assert flagged == [{"query": "gone", "missing_from_latest_run": True}]


def test_flag_rule_constants_are_sane():
    assert _FLAG_RATIO >= 1.5 and 0 < _FLAG_ABS_SEC < 1.0
