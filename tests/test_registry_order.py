"""Pins the driver-grading-window ordering contract (VERDICT r1 #1).

The round driver grades ``__spark_entry__.queries()`` in insertion
order with a ~50-entry cap.  Round 1 graded only the first 50 of 127,
leaving 77 queries without a driver correctness row.  ``grading_order``
must therefore front-load (a) the round-1 hash-fail regrades and the
latent-HUGEINT fixes, then (b) never-graded oracle-backed queries, and
push the already-green set to the back.
"""

from __future__ import annotations

from awsbatch_mapreduce_spark.plans import QUERIES, grading_order
from awsbatch_mapreduce_spark.plans.registry import (
    DRIVER_GREEN_R01,
    PRIORITY_REGRADE,
)

DRIVER_WINDOW = 50


def test_order_is_a_permutation_of_the_registry():
    order = grading_order(QUERIES)
    assert sorted(order) == sorted(QUERIES)


def test_regrades_lead_the_window():
    order = grading_order(QUERIES)
    assert tuple(order[: len(PRIORITY_REGRADE)]) == PRIORITY_REGRADE


def test_window_spends_no_slot_on_already_green_queries():
    window = grading_order(QUERIES)[:DRIVER_WINDOW]
    stale_green = [
        n for n in window if n in DRIVER_GREEN_R01 and n not in PRIORITY_REGRADE
    ]
    assert not stale_green, f"window wastes slots on green queries: {stale_green}"


def test_window_prefers_oracle_backed_over_rows_only():
    """Rows-only entries give the driver only a weak rows>=0 check, so
    every oracle-backed ungraded query must be graded before any
    rows-only one consumes a slot."""
    order = grading_order(QUERIES)
    ungraded = [n for n in order if n not in DRIVER_GREEN_R01]
    first_rows_only = next(
        (i for i, n in enumerate(ungraded) if QUERIES[n].oracle is None),
        len(ungraded),
    )
    assert all(
        QUERIES[n].oracle is None for n in ungraded[first_rows_only:]
    ), "an oracle-backed ungraded query sorts after a rows-only one"


def test_green_set_names_exist():
    missing = DRIVER_GREEN_R01 - set(QUERIES)
    assert not missing, f"green-list names not in registry: {missing}"
    missing_p = set(PRIORITY_REGRADE) - set(QUERIES)
    assert not missing_p, f"regrade names not in registry: {missing_p}"
