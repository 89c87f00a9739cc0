from awsbatch_mapreduce_spark.streaming.windows import (
    read_events_stream,
    session_aggregate,
    sliding_aggregate,
    tumbling_aggregate,
)

__all__ = [
    "read_events_stream",
    "tumbling_aggregate",
    "sliding_aggregate",
    "session_aggregate",
]
