"""Broadcast-hygiene helper for data-scaled join sides.

The sf1 rehearsal (SCALING.md, round 6) showed the failure mode this
guards against: ``dedup_minhash_lsh``'s verify join carried no explicit
strategy, so AQE's runtime size estimate upgraded a data-scaled
intermediate (the banded candidate set) to a driver-built broadcast at
10x data and the driver OOM'd — exactly the mechanism that kills a
100 TB run.  Broadcast is only ever safe for frames whose size is
*bounded by construction* (dimension tables, scalar/df-capped
aggregates, an explicit query batch); anything that grows with the
corpus must stay on the shuffle path no matter what the runtime size
estimate says.

``never_broadcast`` pins that decision into the logical plan: a
SHUFFLE_MERGE hint is honored by Catalyst's JoinSelection ahead of any
size-based broadcast choice, both at initial planning and at AQE
re-planning, so the join can never be upgraded to a broadcast.
Enforced by ``tests/test_scale_plans.py::test_dedup_ladder_never_broadcasts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def never_broadcast(df: DataFrame) -> DataFrame:
    """Mark a data-scaled frame as never broadcast-eligible.

    Joins against the returned frame plan as sort-merge joins (the
    strategy whose memory footprint is flat in the size of either side),
    regardless of static stats or AQE runtime estimates.  Use on
    candidate sets, shingle/token frames, per-doc size frames — anything
    O(corpus).  Do NOT use on bounded dims/aggregates, where broadcast
    is the correct scale plan.
    """
    return df.hint("merge")
