"""Stream-static enrichment join: a streaming event feed joined to a
batch dimension table.

The workhorse of streaming ETL — every event pipeline attaches slowly-
changing reference data (user profile, geo, product) before windowing.
Spark plans the static side as a broadcast against each micro-batch,
re-resolving it per batch, so a dimension refresh (overwrite of the
parquet path) is picked up without restarting the query.

Scale: the stream side never shuffles for the join (broadcast hash);
state is zero — enrichment is stateless row-at-a-time, so throughput
is bounded by the scan, not by any store.  Tests pin stream == batch
on the same inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_events_with_customer(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Attach customer attributes to events by user_id (user ids are
    custkeys in the fixtures).  Left join: events without a profile
    survive with NULL attributes rather than silently dropping.
    """
    dim = customer.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    return events.join(F.broadcast(dim), "user_id", "left").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "customer_name",
        "mktsegment",
    )
