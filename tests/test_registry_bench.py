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


# --- history-median self-adjudication (VERDICT r9 #5 / r10 #4) ------------

from registry_bench import _load_runs, _median, history_flags  # noqa: E402


def test_median_helper():
    assert _median([3.0]) == 3.0
    assert _median([1.0, 3.0]) == 2.0
    assert _median([2.73, 3.35, 2.85]) == 2.85
    assert _median([2.73, 3.35, 2.85, 6.01]) == 3.10


def test_history_rule_reproduces_recorded_ledger_verdicts():
    """The two live flags the pairwise rule raised were adjudicated by
    hand against cross-run history (SCALING.md round 9).  The encoded
    rule must reproduce both verdicts from the REAL run001-005 ledger:
    ann_lsh_topk's run004 spike (6.01 vs history median 2.85) flags —
    and SELF-CLEARS at run005 (2.48 vs 3.10) — while
    mixture_temperature_weights' run005 one-rep blip (1.68 vs a flat
    0.895 median, under 2x) never flags at all."""
    runs = _load_runs()
    assert list(runs)[:5] == ["run001", "run002", "run003", "run004", "run005"]
    r4 = history_flags(runs, "run004")
    assert [f["query"] for f in r4] == ["ann_lsh_topk"]
    assert r4[0]["history_median_norm"] == 2.85 and r4[0]["ratio"] == 2.11
    r5 = history_flags(runs, "run005")
    assert [f["query"] for f in r5] == [], r5
    # and the earlier runs are clean too (no retroactive noise)
    for rid in ("run002", "run003"):
        assert not history_flags(runs, rid)


def _runs(*run_queries) -> dict:
    return {
        f"run{i:03d}": {"header": None, "queries": q}
        for i, q in enumerate(run_queries, 1)
    }


def test_history_rule_err_transitions_stay_pairwise():
    runs = _runs(
        {"x": _rec(5.0, 15.0)},
        {"x": _rec(0.05, 0.15, err="boom")},
        {"x": _rec(5.2, 15.6)},
    )
    f2 = history_flags(runs, "run002")
    assert len(f2) == 1 and "newly_erroring" in f2[0]
    f3 = history_flags(runs, "run003")
    # recovery surfaces; the tiny err-sec must NOT feed the timing median
    assert len(f3) == 1 and "recovered_from_err" in f3[0]


def test_history_rule_new_query_and_vanished_query():
    runs = _runs({"old": _rec(1.0, 3.0)}, {"new": _rec(9.0, 27.0)})
    f = history_flags(runs, "run002")
    assert {"query": "old", "missing_from_latest_run": True} in f
    assert all(x["query"] != "new" or "missing" in str(x) for x in f)
    assert [x for x in f if x["query"] == "new"] == []  # no reference yet


def test_history_rule_excludes_err_rows_from_median():
    # history: one clean 1.0s run + two err runs (tiny secs); the
    # median must be computed over the clean row only, so a 1.2s
    # current run is NOT a 2x regression
    runs = _runs(
        {"y": _rec(1.0, 3.0)},
        {"y": _rec(0.05, 0.15, err="boom")},
        {"y": _rec(1.2, 3.6)},
    )
    f = history_flags(runs, "run003")
    assert [x for x in f if "ratio" in x] == []
