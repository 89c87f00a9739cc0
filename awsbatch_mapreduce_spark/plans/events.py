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


# Shared with wave8's time-sliced sessionization: BOTH implementations
# must match this one oracle exactly, which is the equivalence proof
# that the scale-safe sliced plan computes the same sessions.
SESSIONIZATION_ORACLE = f"""
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
    """


@query("events_sessionization", oracle=SESSIONIZATION_ORACLE)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running sum.

    The batch form of ``session_window``/``applyInPandasWithState``:
    one shuffle on ``user_id``, bounded per-user sort — survives any
    scale where a single user's history fits a partition (salt or
    time-slice beyond that).
    """
    gap_us = 30 * 60 * 1_000_000
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    # Both windows order by (ts_us, event_id) — round 19 (VERDICT r18
    # #7): the lag window used (ts, event_id) while the running sum
    # used (ts_us, event_id); unix_micros is strictly monotone in the
    # timestamp (Spark stores timestamps at microsecond precision), so
    # the two orderings are the SAME total order — the oracle's
    # ORDER BY ts, event_id included — but spelling them identically
    # lets both Window operators share ONE sort, and the raw ts column
    # no longer rides the user_id exchange (guide §2.3/§2.4).
    w_lag = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
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


@query(
    "conversion_funnel_users",
    oracle="""
        WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                    WHERE event_type = 'click' GROUP BY user_id),
        s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
               JOIN s1 ON s1.user_id = e.user_id
               WHERE e.event_type = 'view' AND e.ts > s1.t1
               GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
               JOIN s2 ON s2.user_id = e.user_id
               WHERE e.event_type = 'purchase' AND e.ts > s2.t2
               GROUP BY e.user_id)
        SELECT s1.user_id,
               epoch_us(s1.t1) AS click_ts_us,
               epoch_us(s2.t2) AS view_ts_us,
               epoch_us(s3.t3) AS purchase_ts_us
        FROM s1
        LEFT JOIN s2 ON s2.user_id = s1.user_id
        LEFT JOIN s3 ON s3.user_id = s1.user_id
    """,
)
def conversion_funnel_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (click -> view -> purchase): for each
    user the first click, the first view strictly after it, and the
    first purchase strictly after that — NULLs where the user dropped
    out.  The event-order-sensitive funnel every product-analytics
    engine ships; naive min-per-type ignores ordering and overcounts.

    Three user-keyed aggregates + two user-keyed left joins: all
    shuffles share one key, so under a single repartition on user_id
    every stage is co-partitioned (no data moves after the first
    exchange, and AQE coalesces the tiny sides).
    """
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            F.unix_micros("t1").alias("click_ts_us"),
            F.unix_micros("t2").alias("view_ts_us"),
            F.unix_micros("t3").alias("purchase_ts_us"),
        )
    )


@query(
    "cohort_retention_daily",
    oracle="""
        WITH cohort AS (
          SELECT user_id, MIN(CAST(ts AS DATE)) AS c_day
          FROM events WHERE event_type = 'signup' GROUP BY user_id),
        activity AS (
          SELECT DISTINCT e.user_id, c.c_day,
                 date_diff('day', c.c_day, CAST(e.ts AS DATE)) AS day_offset
          FROM events e JOIN cohort c ON c.user_id = e.user_id
          WHERE CAST(e.ts AS DATE) >= c.c_day)
        SELECT strftime(c_day, '%Y-%m-%d') AS cohort_day,
               CAST(day_offset AS BIGINT) AS day_offset,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
        FROM activity
        GROUP BY c_day, day_offset
    """,
)
def cohort_retention_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by signup day, counted active on
    each day-offset after it — the retention triangle behind every
    growth dashboard.

    Two user-keyed shuffles (cohort min, activity distinct) and a
    cohort-sized final aggregate.  The distinct on
    (user, cohort, offset) bounds state at users x active-days, and the
    cohort frame (one row per user) broadcasts at any realistic scale.
    """
    ev = load_table(spark, sf_dir, "events")
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("c_day"))
    )
    activity = (
        ev.join(F.broadcast(cohort), "user_id")
        .filter(F.to_date("ts") >= F.col("c_day"))
        .select(
            "user_id",
            "c_day",
            F.datediff(F.to_date("ts"), F.col("c_day")).alias("day_offset"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.date_format("c_day", "yyyy-MM-dd").alias("cohort_day"),
        F.col("day_offset").cast("bigint").alias("day_offset"),
    ).agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))


@query(
    "event_transition_matrix",
    oracle="""
        WITH seq AS (
            SELECT event_type,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id
                   ) AS next_type
            FROM events)
        SELECT event_type, next_type,
               COUNT(*) AS n_transitions,
               COUNT(*) / SUM(COUNT(*)) OVER (PARTITION BY event_type)
                   AS p_next
        FROM seq
        WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: for each (event_type, next event_type) pair, the count and
    conditional probability of the transition.

    ``LEAD`` over (user, time) needs one shuffle on ``user_id`` plus a
    per-user sort — at 100 TB that sort is partition-local and
    spillable, and the follow-on aggregate collapses to the tiny
    type x type grid, so partials do almost all the work map-side.
    Ordering crosses engines as (epoch-microseconds, event_id): the
    integer pair is exact and the unique id breaks same-instant ties
    identically in both engines.  ``p_next`` is a single IEEE division
    of two exact integers — bit-identical without quantization.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), F.col("event_id")
    )
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    counts = seq.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    total = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "next_type",
        "n_transitions",
        (
            F.col("n_transitions")
            / F.sum("n_transitions").over(total).cast("double")
        ).alias("p_next"),
    )


@query(
    "event_type_cooccurrence",
    oracle="""
        WITH pairs AS (
            SELECT DISTINCT user_id, event_type FROM events),
        u AS (SELECT COUNT(DISTINCT user_id) AS n_total FROM events)
        SELECT a.event_type AS type_a,
               b.event_type AS type_b,
               COUNT(*) AS n_users,
               COUNT(*) / (SELECT n_total FROM u) AS support
        FROM pairs a
        JOIN pairs b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    """,
)
def event_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: for each unordered pair of event
    types, how many users did both, and the support fraction — the
    "users who did X also did Y" primitive behind recommendations.

    Dedup to (user, type) first, then self-join on ``user_id`` with
    ``type_a < type_b`` to emit each unordered pair once.  The dedup is
    the scale lever: the join operand is at most users x |types|, not
    the raw stream, and both sides co-partition on ``user_id`` so the
    self-join reuses one shuffle.  Per-user fan-out is bounded by
    |types|^2 (tiny), so no skew salting is needed even for power
    users.  Support divides two exact counts once — IEEE-identical in
    both engines; the 1-row totals frame is a broadcast cross join,
    never a driver collect.
    """
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select("user_id", "event_type").distinct()
    totals = ev.select("user_id").distinct().agg(
        F.count(F.lit(1)).alias("n_total")
    )
    a = pairs.select("user_id", F.col("event_type").alias("type_a"))
    b = pairs.select("user_id", F.col("event_type").alias("type_b"))
    return (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .crossJoin(F.broadcast(totals))
        .select(
            "type_a",
            "type_b",
            "n_users",
            (F.col("n_users") / F.col("n_total")).alias("support"),
        )
    )
