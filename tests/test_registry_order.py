"""Pins the driver-grading-window ordering contract (VERDICT r1 #1, r2 #1).

The round driver grades ``__spark_entry__.queries()`` in insertion
order with a ~50-entry cap.  ``grading_order`` must front-load (a)
regrades not yet proven, then (b) never-driver-proven queries —
earlier registration waves before later ones, oracle-backed before
rows-only within a wave — and push the already-proven set to the back.

Round 2's failure mode was hard-coding the round-1 proven snapshot,
which went stale the moment ``CORRECTNESS_r02.json`` landed.  These
tests derive every expectation from the live record files via
``_driver_proven()`` so they stay green as the driver writes new
records, and additionally pin the rotation against *synthetic* record
files (future-round states, malformed rows) in a tmp dir.
"""

from __future__ import annotations

import json

from awsbatch_mapreduce_spark.plans import QUERIES, grading_order
from awsbatch_mapreduce_spark.plans.registry import (
    PRIORITY_REGRADE,
    _driver_proven,
)

DRIVER_WINDOW = 50

PROVEN = _driver_proven()


def test_order_is_a_permutation_of_the_registry():
    order = grading_order(QUERIES)
    assert sorted(order) == sorted(QUERIES)


def test_pending_regrades_lead_the_window():
    pending = [n for n in PRIORITY_REGRADE if n not in PROVEN]
    order = grading_order(QUERIES)
    assert order[: len(pending)] == pending


def test_window_spends_no_slot_on_already_green_queries():
    """As long as >= DRIVER_WINDOW queries are unproven, the window must
    contain only unproven ones; once fewer remain, every unproven query
    must be in the window (no slot wasted either way)."""
    window = grading_order(QUERIES)[:DRIVER_WINDOW]
    unproven = [n for n in QUERIES if n not in PROVEN]
    if len(unproven) >= DRIVER_WINDOW:
        stale_green = [n for n in window if n in PROVEN]
        assert not stale_green, f"window wastes slots on green: {stale_green}"
    else:
        missing = set(unproven) - set(window)
        assert not missing, f"unproven queries left out of window: {missing}"


def test_ungraded_sort_by_wave_then_oracle_strength():
    """Within the never-proven class: earlier waves first (new queries
    must not displace older ungraded ones from the capped window), and
    oracle-backed before rows-only within a wave."""
    order = grading_order(QUERIES)
    pending_regrades = {n for n in PRIORITY_REGRADE if n not in PROVEN}
    ungraded = [
        n for n in order if n not in PROVEN and n not in pending_regrades
    ]
    keys = [(QUERIES[n].wave, QUERIES[n].oracle is None) for n in ungraded]
    assert keys == sorted(keys), "ungraded queries out of (wave, strength) order"


def test_round3_window_is_exactly_the_pre_r3_ungraded_set():
    """Round 3's contract (VERDICT r2 #2): the 50-slot window converts
    exactly the 50 pre-r3 ungraded queries into driver rows.  Wave-3+
    additions must all sort after them.  Skips once the driver has
    proven any pre-r3 query count other than 98 (i.e. after round 3)."""
    pre_r3_ungraded = [
        n for n in QUERIES if n not in PROVEN and QUERIES[n].wave <= 2
    ]
    if len(pre_r3_ungraded) != DRIVER_WINDOW:
        return  # post-r3 state: covered by the generic tests above
    window = grading_order(QUERIES)[:DRIVER_WINDOW]
    assert sorted(window) == sorted(pre_r3_ungraded)


def test_regrade_and_wave_names_are_valid():
    missing_p = set(PRIORITY_REGRADE) - set(QUERIES)
    assert not missing_p, f"regrade names not in registry: {missing_p}"
    assert all(QUERIES[n].wave >= 2 for n in QUERIES)


def test_proven_set_reflects_live_record_files():
    """Every fully-green row in the repo's CORRECTNESS_r*.json must be
    in PROVEN — the rotation self-maintains from the records."""
    import glob
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    expect: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if (
                row.get("rows_match") is True
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
                and row.get("err") is None
            ):
                expect.add(name)
    assert expect <= PROVEN


def test_synthetic_future_record_rotates_window(tmp_path):
    """Dropping a synthetic CORRECTNESS_r99.json in must rotate those
    queries to the back without any code edit (the r2 staleness bug)."""
    names = list(QUERIES)
    green = {
        n: {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
            "err": None,
        }
        for n in names[:60]
    }
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(green))
    proven = _driver_proven(root=str(tmp_path))
    assert proven == frozenset(names[:60])
    order = grading_order(QUERIES, proven=proven)
    back = order[len(names) - 60 :]
    assert set(back) == set(names[:60])


def test_malformed_record_rows_do_not_count_as_proven(tmp_path):
    """ADVICE r2: an empty/malformed row dict must NOT mark a query
    proven (it would silently drop it out of every future window).
    Rows-only records (hash/schema None) still count."""
    rows = {
        "a_malformed": {},
        "b_err": {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
            "err": "boom",
        },
        "c_rows_only": {
            "rows_match": True,
            "schema_match": None,
            "hash_match": None,
            "err": None,
        },
        "d_hash_fail": {
            "rows_match": True,
            "schema_match": True,
            "hash_match": False,
            "err": None,
        },
        "e_green": {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
            "err": None,
        },
    }
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(rows))
    proven = _driver_proven(root=str(tmp_path))
    assert proven == frozenset({"c_rows_only", "e_green"})


def test_no_records_falls_back_to_r01_snapshot(tmp_path):
    from awsbatch_mapreduce_spark.plans.registry import DRIVER_GREEN_R01

    assert _driver_proven(root=str(tmp_path)) == DRIVER_GREEN_R01


def test_proven_class_rotates_by_stalest_driver_grade():
    """VERDICT r9 #1: with the full live proven set, the already-proven
    class must be keyed on the LAST round each query was driver-green
    (stalest first), registration order as the tiebreak — so the capped
    window regrades the queries whose driver proof has aged the most,
    and every query gets re-proven every ~4-5 rounds."""
    from awsbatch_mapreduce_spark.plans.registry import _green_round_map

    last_green = _green_round_map()
    assert last_green is not None, "live repo must have record files"
    order = grading_order(QUERIES)
    proven_tail = [n for n in order if n in PROVEN]
    reg_pos = {n: i for i, n in enumerate(QUERIES)}
    keys = [(last_green.get(n, 0), reg_pos[n]) for n in proven_tail]
    assert keys == sorted(keys), "proven class not in stalest-first order"
    # Discrimination (multiple distinct staleness rounds) is a property
    # of the repository's data state, not of the code — if the records
    # were ever consolidated into one round the ordering above is still
    # correct; skip rather than fail on a degenerate live set and rely
    # on the synthetic-records test for the discrimination property
    # (ADVICE r10).
    if len({k[0] for k in keys}) <= 1:
        import pytest

        pytest.skip("live record set degenerate: one distinct green round")


def test_stalest_first_rotation_with_synthetic_records(tmp_path):
    """Pin the r10 rotation semantics against synthetic record files:
    a query last proven in r01 must sort before one last proven in r05,
    regardless of registration order; ties break by registration."""
    from awsbatch_mapreduce_spark.plans.registry import _green_round_map

    names = list(QUERIES)
    green = lambda ns: {  # noqa: E731
        n: {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
            "err": None,
        }
        for n in ns
    }
    # r01 proves everything; r05 re-proves the FIRST 100 registrations,
    # so the stalest grades are exactly the last 116 registered names.
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(green(names)))
    (tmp_path / "CORRECTNESS_r05.json").write_text(
        json.dumps(green(names[:100]))
    )
    last_green = _green_round_map(root=str(tmp_path))
    assert last_green is not None
    assert last_green[names[0]] == 5 and last_green[names[-1]] == 1
    order = grading_order(
        QUERIES, proven=frozenset(last_green), last_green=last_green
    )
    # stalest (r01-only) class leads, in registration order; the
    # re-proven r05 class trails, also in registration order.
    assert order == names[100:] + names[:100]


def test_injected_proven_without_rounds_keeps_registration_order():
    """Tests that inject ``proven`` alone (no round map) must still get
    the stable registration-order tail — the documented fallback."""
    proven = frozenset(list(QUERIES)[::2])
    order = grading_order(QUERIES, proven=proven)
    tail = [n for n in order if n in proven]
    assert tail == [n for n in QUERIES if n in proven]


def test_wave6_addition_sorts_after_all_unproven_lower_waves():
    """VERDICT r4 #7: a hypothetical wave-6 addition must sort after
    every unproven lower-wave query — the property that keeps each
    round's new queries from displacing older ungraded ones out of the
    capped window."""
    from awsbatch_mapreduce_spark.plans.registry import QuerySpec

    hypothetical = dict(QUERIES)
    hypothetical["zz_hypothetical_w6"] = QuerySpec(
        name="zz_hypothetical_w6",
        builder=lambda spark, sf_dir: None,
        oracle="SELECT 1 AS one",
        wave=6,
    )
    # exercise both the live proven set and a synthetic sparse one
    for proven in (PROVEN, frozenset(list(QUERIES)[::2])):
        order = grading_order(hypothetical, proven=proven)
        pos = order.index("zz_hypothetical_w6")
        unproven_lower = [
            n
            for n in QUERIES
            if n not in proven and QUERIES[n].wave < 6
        ]
        assert all(order.index(n) < pos for n in unproven_lower)
        # but it still precedes the entire proven class
        assert all(order.index(n) > pos for n in order if n in proven)


def test_realized_driver_window_matches_frozen_prediction():
    """VERDICT r10 #5 / r12 #2: live validation of the stalest-first
    rotation under driver conditions.  ``scripts/predict_window.py``
    freezes ``PREDICTED_WINDOW_r{N}.json`` BEFORE the driver run — the
    prediction cannot be recomputed afterwards because the record it
    predicts changes the union it is computed from.

    Generalized (r12 ask #2): the original hardcoded
    ``CORRECTNESS_r11.json``, which will never exist (the driver
    skipped round-11 grading and wrote r12 instead), stranding the
    validation forever.  Each frozen prediction is now compared
    against the EARLIEST driver record whose round >= the
    prediction's, and queries registered AFTER the freeze are
    tolerated: a post-freeze newcomer legitimately sorts ahead of the
    proven tail (never-proven-first is the rotation's core rule), so
    k newcomers displace exactly the prediction's last k names — the
    rest of the realized window must equal the predicted prefix
    verbatim.  Judge-verified against the r11 prediction + r12 record:
    49/50 match, the one diff being newcomer
    ``semdedup_codebook_adaptive`` displacing ``text_compression_ratio``.
    """
    import glob
    import json
    import os
    import re

    import pytest

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    preds = sorted(glob.glob(os.path.join(root, "PREDICTED_WINDOW_r*.json")))
    assert preds, "no frozen prediction on disk"
    recs = {}
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m:
            recs[int(m.group(1))] = p
    validated = 0
    for pred_path in preds:
        with open(pred_path) as f:
            pred = json.load(f)
        later = sorted(r for r in recs if r >= pred["round"])
        if not later:
            continue  # driver hasn't graded at-or-after this freeze yet
        with open(recs[later[0]]) as f:
            realized = list(json.load(f))
        predicted = pred["window"]
        newcomers = [n for n in realized if n not in set(predicted)]
        # every tolerated newcomer must be a real registered query that
        # the freeze could not have known about — i.e. absent from the
        # prediction entirely, present in the live registry
        assert all(n in QUERIES for n in newcomers), newcomers
        expect = predicted[: len(realized) - len(newcomers)]
        assert set(realized) - set(newcomers) == set(expect), {
            "prediction": os.path.basename(pred_path),
            "record": os.path.basename(recs[later[0]]),
            "unpredicted": sorted(
                set(realized) - set(newcomers) - set(expect)
            ),
            "missing": sorted(set(expect) - set(realized)),
        }
        validated += 1
    if not validated:
        pytest.skip("no driver record at-or-after any frozen prediction yet")
