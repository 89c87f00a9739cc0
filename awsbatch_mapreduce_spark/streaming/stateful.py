"""Custom stateful streaming operator via ``applyInPandasWithState``.

The windowed aggregates in ``streaming.windows`` cover what Spark's
built-in state machines express; this module is the escape hatch for
semantics they can't: an *unbounded, order-dependent* per-key
accumulator.  The example operator tracks per-user engagement:
cumulative event count, cumulative value, and the longest inactivity
gap ever observed — the gap requires remembering ``last_ts`` across
micro-batches, which no built-in window can do.

State design for scale: one fixed-width tuple per user (4 numbers), so
state size is O(#keys), independent of event volume; keys are hash-
partitioned by the groupBy, giving the same shuffle as a batch groupBy.
A production deployment sets watermark-based state TTL
(``GroupStateTimeout``) to reap idle users; here state lives for the
run (the fixture's key domain is small).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = "n BIGINT, total_cents BIGINT, last_us BIGINT, max_gap_us BIGINT"
_OUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, total_value DOUBLE, max_gap_us BIGINT"
)


def _update_user_state(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events (sorted by ts) into the per-user
    accumulator; emit the post-batch snapshot.

    Value is accumulated in integer cents (fixed-point) so the running
    total is order-stable — same rationale as ``functions.rounding``.
    """
    n, total_cents, last_us, max_gap = (
        state.get if state.exists else (0, 0, -1, 0)
    )
    for pdf in batches:
        pdf = pdf.sort_values("ts_us")
        for ts_us, cents in zip(pdf["ts_us"], pdf["cents"]):
            if last_us >= 0 and ts_us - last_us > max_gap:
                max_gap = int(ts_us - last_us)
            last_us = int(ts_us)
            n += 1
            total_cents += int(cents)
    state.update((n, total_cents, last_us, max_gap))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total_cents / 100.0],
            "max_gap_us": [max_gap],
        }
    )


def user_engagement_stateful(events: DataFrame) -> DataFrame:
    """Per-user running engagement over a stream (or batch) of events.

    Streaming: each micro-batch updates state and emits the latest
    snapshot per touched user (output mode ``update``); the final
    snapshot equals the batch fold over the same data — asserted by
    ``tests/test_streaming.py``.
    """
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_engagement_batch(events: DataFrame) -> DataFrame:
    """Batch twin of :func:`user_engagement_stateful`: same numbers from
    one window pass (lag for gaps) + groupBy — the cross-check oracle.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    prepared = events.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us")
    gaps = prepared.withColumn(
        "gap_us", F.col("ts_us") - F.lag("ts_us").over(w)
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum("cents") / 100.0).alias("total_value"),
        F.coalesce(F.max("gap_us"), F.lit(0)).cast("bigint").alias("max_gap_us"),
    )
