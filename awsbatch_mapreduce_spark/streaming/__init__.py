from awsbatch_mapreduce_spark.streaming.codebook import (
    foreach_batch_codebook_admit_probe,
    foreach_batch_codebook_probe,
)
from awsbatch_mapreduce_spark.streaming.dedup import dedup_events_stream
from awsbatch_mapreduce_spark.streaming.enrich import enrich_events_with_customer
from awsbatch_mapreduce_spark.streaming.join import click_purchase_interval_join
from awsbatch_mapreduce_spark.streaming.upsert import (
    foreach_batch_upsert,
    latest_per_key,
)
from awsbatch_mapreduce_spark.streaming.stateful import (
    user_engagement_batch,
    user_engagement_stateful,
)
from awsbatch_mapreduce_spark.streaming.windows import (
    read_events_stream,
    session_aggregate,
    sliding_aggregate,
    tumbling_aggregate,
)

__all__ = [
    "click_purchase_interval_join",
    "dedup_events_stream",
    "enrich_events_with_customer",
    "foreach_batch_codebook_admit_probe",
    "foreach_batch_codebook_probe",
    "foreach_batch_upsert",
    "latest_per_key",
    "read_events_stream",
    "tumbling_aggregate",
    "sliding_aggregate",
    "session_aggregate",
    "user_engagement_stateful",
    "user_engagement_batch",
]
