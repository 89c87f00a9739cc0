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


def never_broadcast_hash(df: DataFrame) -> DataFrame:
    """``never_broadcast`` with the SHUFFLED-HASH strategy instead of
    sort-merge (round 19, guide §3.1): still pinned off the broadcast
    path (a SHUFFLE_HASH hint is a shuffle join — AQE can never upgrade
    it to a driver-built broadcast, the same hygiene guarantee as the
    merge hint), but the join BUILDS a per-partition hash table from
    THIS side and streams the other side unsorted.  Use when the other
    side is an expanding/expanded frame that dwarfs this one: sort-merge
    would sort the giant streamed side per partition (the prefix-filter
    verify measured a 450M-row Sort at sf0.1 ahead of its (id_b, h)
    join), while shuffled-hash touches it exactly once.  The hinted
    side's per-partition bytes must fit execution memory — size is
    bytes/R with R the session's shuffle partitioning, which scales
    with the cluster conf; do NOT use when both sides are comparably
    giant (sort-merge spills gracefully, hash builds do not)."""
    return df.hint("shuffle_hash")
