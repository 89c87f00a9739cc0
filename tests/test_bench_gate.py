"""Regression tests for bench.py's drift gate + host-noise flag.

The round-17 bench rounded drift to 2 decimals BEFORE the >2.0
comparison, so ann_ivf_topk's raw 2.0015 drift displayed as 2.0 and
was never flagged (VERDICT r17 "What's wrong" #1).  The gate must
compare the raw ratio and round only for display.
"""

from bench import _NOISE_FRACTION_GATE, _drift_gate, _host_noise

REF = {"q": {"reference_sec": 0.651}}


def test_raw_ratio_just_over_gate_is_flagged():
    # the exact r17 case: 1.303 / 0.651 = 2.00153... rounds to 2.0
    raw, flagged = _drift_gate({"q": 1.303}, REF)
    assert round(raw["q"], 2) == 2.0  # display value hides the breach
    assert flagged == ["q"]  # ...but the gate must still fire


def test_exactly_two_is_not_flagged():
    raw, flagged = _drift_gate({"q": 2 * 0.651}, REF)
    assert raw["q"] == 2.0
    assert flagged == []


def test_under_gate_not_flagged_and_unknown_names_ignored():
    raw, flagged = _drift_gate({"q": 1.0, "not_in_ref": 99.0}, REF)
    assert flagged == []
    assert "not_in_ref" not in raw


def test_host_noise_quiet_and_jittery_regimes():
    # quiet host: spreads a small fraction of the min -> no flag
    timings = {f"q{i}": 1.0 for i in range(18)}
    quiet = {f"q{i}": 0.1 for i in range(18)}
    assert _host_noise(timings, quiet) == (False, 0.0)
    # r17-shaped host: half the queries spread > 0.5x their min
    jittery = {f"q{i}": (0.9 if i % 2 else 0.1) for i in range(18)}
    suspected, frac = _host_noise(timings, jittery)
    assert suspected and frac == 0.5 and frac > _NOISE_FRACTION_GATE


def test_host_noise_empty_and_zero_min_safe():
    assert _host_noise({}, {}) == (False, 0.0)
    # a zero min must not divide-by-zero (filtered, not crashed)
    assert _host_noise({"q": 0.0}, {"q": 0.5}) == (False, 0.0)
