"""Event-stream queries (batch form) over the ``events`` fixture.

The reference's month-by-month frame animation is a tumbling-window
aggregation over trip time (SURVEY.md §2.6): the batch equivalents here
share their oracle with the Structured Streaming implementations in
``awsbatch_mapreduce_spark.streaming`` (tested by batch-equivalence in
``tests/test_streaming.py`` — the driver's oracle checks the batch
plans, streaming is checked against them).

Timestamps cross engines as integer epoch-microseconds
(``unix_micros`` <-> ``epoch_us``): both engines store microsecond
instants, so these are exact, hashable values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.functions.rounding import (
    dround,
    fixed_point_avg,
    fixed_point_avg_sql,
    fixed_point_sum,
    fixed_point_sum_sql,
)
from pyspark.sql.window import Window

from awsbatch_mapreduce_spark.plans.registry import query
from awsbatch_mapreduce_spark.sources.tables import load_table

_HOUR_US = 3_600_000_000


@query(
    "events_tumbling_hourly",
    oracle=f"""
        SELECT (epoch_us(ts) // {_HOUR_US}) * {_HOUR_US} AS window_start_us,
               event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               {fixed_point_sum_sql('value', 2, 2)} AS sum_value,
               {fixed_point_avg_sql('value', 2, 4)} AS avg_value
        FROM events
        GROUP BY 1, 2
    """,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (batch twin of the streaming op).

    Equivalent to ``groupBy(window(ts, '1 hour'), event_type)`` — written
    with an integer floor so the window key is an exact epoch-us value
    the DuckDB oracle reproduces bit-for-bit.
    """
    ev = load_table(spark, sf_dir, "events")
    win = (F.floor(F.unix_micros("ts") / _HOUR_US) * _HOUR_US).alias(
        "window_start_us"
    )
    return ev.groupBy(win, "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        fixed_point_sum("value", 2, 2).alias("sum_value"),
        fixed_point_avg("value", 2, 4).alias("avg_value"),
    )


@query(
    "events_json_extract",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n_events,
               FLOOR((AVG(CAST(json_extract_string(props, '$.k') AS BIGINT))) * 10000.0 + 0.5) / 10000.0
                   AS avg_k,
               MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events
        GROUP BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: JSON props -> typed column -> agg.

    ``get_json_object`` runs JVM-side (no Python boundary); at scale
    prefer ``from_json`` with an explicit schema so Catalyst can prune.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dround(F.avg(k), 4).alias("avg_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "events_sessionization",
    oracle=f"""
        WITH ordered AS (
            SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                   LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
            FROM events
        ), flagged AS (
            SELECT user_id, event_id, ts_us,
                   CASE WHEN prev_us IS NULL
                             OR ts_us - prev_us > {30 * 60 * 1_000_000}
                        THEN 1 ELSE 0 END AS is_new
            FROM ordered
        ), sessioned AS (
            SELECT user_id, event_id, ts_us,
                   CAST(SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id,
               COUNT(*) AS n_events,
               MIN(ts_us) AS session_start_us,
               MAX(ts_us) AS session_end_us
        FROM sessioned
        GROUP BY user_id, session_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running sum.

    The batch form of ``session_window``/``applyInPandasWithState``:
    one shuffle on ``user_id``, bounded per-user sort — survives any
    scale where a single user's history fits a partition (salt or
    time-slice beyond that).
    """
    gap_us = 30 * 60 * 1_000_000
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts_us",
        F.when(
            F.lag("ts_us").over(w_lag).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w_lag) > gap_us),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    w_sess = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessioned = flagged.select(
        "user_id",
        "event_id",
        "ts_us",
        F.sum("is_new").over(w_sess).cast("bigint").alias("session_id"),
    )
    return sessioned.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
    )


@query(
    "events_user_activity_pivot",
    oracle=f"""
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
               COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
               COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
               {fixed_point_sum_sql('value', 2, 2)} AS total_value
        FROM events
        GROUP BY user_id
    """,
)
def events_user_activity_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (pivot by known keys).

    Explicit ``count(when(...))`` columns rather than ``.pivot()`` so the
    output schema is static — required both for the oracle and for any
    plan that must not run a distinct-values job first.
    """
    ev = load_table(spark, sf_dir, "events")

    def cnt(t: str):
        return F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")

    return ev.groupBy("user_id").agg(
        cnt("click"),
        cnt("view"),
        cnt("purchase"),
        cnt("signup"),
        cnt("error"),
        fixed_point_sum("value", 2, 2).alias("total_value"),
    )
