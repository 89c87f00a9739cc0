"""Full-outer join evidence + the two Arrow UDF aggregation surfaces
(GROUPED_AGG pandas_udf and ``applyInPandas`` grouped map) under the
oracle gate — completing the §2.5/§2.6 engine-parity matrix alongside
the scalar ``mapInPandas`` path in ``multimodal/binary.py``.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.functions.rounding import dround, dround_sql
from awsbatch_mapreduce_spark.plans.registry import query
from awsbatch_mapreduce_spark.sources.tables import load_table


@query(
    "full_outer_nation_coverage",
    oracle="""
        WITH cs AS (SELECT c_nationkey AS nk, COUNT(*) AS n_customers
                    FROM customer GROUP BY c_nationkey),
        sp AS (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
               FROM supplier GROUP BY s_nationkey)
        SELECT COALESCE(cs.nk, sp.nk) AS nationkey,
               COALESCE(cs.n_customers, 0) AS n_customers,
               COALESCE(sp.n_suppliers, 0) AS n_suppliers
        FROM cs FULL OUTER JOIN sp ON sp.nk = cs.nk
    """,
)
def full_outer_nation_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of customer vs supplier presence per nation —
    at sf0.001 suppliers cover only 10 of 25 nations, so the unmatched
    side is genuinely exercised (15 supplier-null rows).

    Both inputs are pre-aggregated to <=25 rows before the join: the
    full-outer shuffle is on aggregate cardinality, never fact rows.
    """
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cs = c.groupBy(F.col("c_nationkey").alias("nk_c")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    sp = s.groupBy(F.col("s_nationkey").alias("nk_s")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return cs.join(sp, cs.nk_c == sp.nk_s, "full_outer").select(
        F.coalesce("nk_c", "nk_s").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@query(
    "udaf_geomean_value",
    oracle=f"""
        SELECT event_type,
               COUNT(*) AS n,
               {dround_sql('EXP(AVG(LN(value)))', 4)} AS geomean_value
        FROM events
        GROUP BY event_type
    """,
)
def udaf_geomean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate via Arrow GROUPED_AGG pandas_udf: geometric mean
    of event value per type (values are strictly positive in fixture).

    The UDAF computes exp(mean(log(x))) in one Arrow batch per group —
    the same log-sum the oracle expresses as EXP(AVG(LN(v))).  At scale
    a GROUPED_AGG udf receives each group whole; for sum-decomposable
    aggregates like this, pre-combining with built-ins is the faster
    path (see oracle form) — the query exists to pin the UDAF surface.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v.to_numpy()).mean()))

    # Spark disallows mixing GROUPED_AGG pandas UDFs with JVM aggregates
    # in one agg() — the count rides along as a second pandas UDF.
    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        n_rows("value").alias("n"),
        dround(geomean("value"), 4).alias("geomean_value"),
    )


@query(
    "grouped_map_regression",
    oracle=f"""
        WITH t AS (
          SELECT event_type,
                 CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0 AS x,
                 value AS y
          FROM events)
        SELECT event_type,
               COUNT(*) AS n,
               {dround_sql('REGR_SLOPE(y, x)', 4)} AS slope_per_day,
               {dround_sql('REGR_INTERCEPT(y, x)', 4)} AS intercept
        FROM t
        GROUP BY event_type
    """,
)
def grouped_map_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS (value vs event-time in days) via ``applyInPandas``
    — the grouped-map surface where each group arrives as one pandas
    frame and returns an arbitrary-shape result.

    The slope/intercept use the same co-moment formula as SQL
    ``REGR_SLOPE``/``REGR_INTERCEPT`` so the oracle matches to 4dp;
    time is rescaled to days so the coefficients are O(1), not 1e-7
    (which would round to a vacuous 0).
    """

    def ols(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["x"].to_numpy()
        y = pdf["y"].to_numpy()
        xm, ym = x.mean(), y.mean()
        dx = x - xm
        slope = (dx * (y - ym)).sum() / (dx * dx).sum()
        inter = ym - slope * xm

        def dr(v: float) -> float:
            return math.floor(v * 10000.0 + 0.5) / 10000.0

        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [len(pdf)],
                "slope_per_day": [dr(slope)],
                "intercept": [dr(inter)],
            }
        )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.unix_micros("ts").cast("double") / F.lit(86400000000.0)).alias("x"),
        F.col("value").alias("y"),
    )
    return ev.groupBy("event_type").applyInPandas(
        ols, schema="event_type STRING, n BIGINT, slope_per_day DOUBLE, intercept DOUBLE"
    )


@query(
    "cogroup_user_activity_reconcile",
    oracle="""
        WITH ev AS (SELECT user_id, COUNT(*) AS n_events FROM events
                    GROUP BY user_id),
        od AS (SELECT o_custkey AS user_id, COUNT(*) AS n_orders FROM orders
               GROUP BY o_custkey)
        SELECT COALESCE(ev.user_id, od.user_id) AS user_id,
               COALESCE(ev.n_events, 0) AS n_events,
               COALESCE(od.n_orders, 0) AS n_orders,
               CASE WHEN ev.user_id IS NULL THEN 'orders_only'
                    WHEN od.user_id IS NULL THEN 'events_only'
                    ELSE 'both' END AS presence
        FROM ev FULL OUTER JOIN od ON od.user_id = ev.user_id
    """,
)
def cogroup_user_activity_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feed reconciliation via ``cogroup().applyInPandas`` — the
    remaining Arrow UDF surface (scalar mapInPandas, GROUPED_AGG, and
    grouped-map are covered elsewhere).  Each key's event rows and
    order rows arrive as two pandas frames in one call; the UDF counts
    both sides and labels the presence — the audit shape for "does the
    clickstream agree with the order system".

    Cogroup shuffles both inputs once on the shared key and never
    materializes a join product.  Two scale rules shape this plan:
    (1) reduce before you ship — both feeds are count-reduced JVM-side
    first, so Arrow carries one row per (user, side), never the raw
    fact rows; (2) cogroup on a BOUNDED bucket key (user_id % 64), not
    the raw user id — ``applyInPandas`` pays a per-group Python call,
    so a high-cardinality key degenerates to one interpreter call per
    entity (measured 36 s for ~15k singleton groups vs ~1 s for 64
    vectorized buckets at sf0.1; the reconcile inside each bucket is a
    vectorized pandas outer merge).  The SQL oracle is the equivalent
    aggregate-then-full-outer.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("bucket", F.col("user_id") % 64)
    )
    od = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("bucket", F.col("user_id") % 64)
    )

    def reconcile(key: tuple, ev_pdf: pd.DataFrame, od_pdf: pd.DataFrame) -> pd.DataFrame:
        m = ev_pdf[["user_id", "n"]].merge(
            od_pdf[["user_id", "n"]],
            on="user_id",
            how="outer",
            suffixes=("_ev", "_od"),
        )
        n_ev = m["n_ev"].fillna(0).astype("int64")
        n_od = m["n_od"].fillna(0).astype("int64")
        presence = pd.Series("both", index=m.index)
        presence[n_od == 0] = "events_only"
        presence[n_ev == 0] = "orders_only"
        return pd.DataFrame(
            {
                "user_id": m["user_id"].astype("int64"),
                "n_events": n_ev,
                "n_orders": n_od,
                "presence": presence,
            }
        )

    return (
        ev.groupBy("bucket")
        .cogroup(od.groupBy("bucket"))
        .applyInPandas(
            reconcile,
            "user_id BIGINT, n_events BIGINT, n_orders BIGINT, presence STRING",
        )
    )


@query(
    "sql_registered_udf_mercator",
    oracle="""
        SELECT c_custkey,
               FLOOR((((c_custkey % 360) - 180.0) * 6378137.0 * PI() / 180.0)
                     * 10000.0 + 0.5) / 10000.0 AS merc_x,
               FLOOR((6378137.0 * LN(TAN(PI() / 4.0
                     + (((ABS(c_acctbal) % 160.0) - 80.0)) * PI() / 360.0)))
                     * 10000.0 + 0.5) / 10000.0 AS merc_y
        FROM customer
    """,
)
def sql_registered_udf_mercator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-callable vectorized UDF surface: the Arrow pandas-UDF
    Mercator projection registered with ``spark.udf.register`` and
    invoked from pure SQL text over a temp view — the path by which
    SQL-only users reach Python extensions.

    Registration is idempotent per session; the UDF executes exactly
    as in the DataFrame API (one Arrow batch per Python call), so the
    SQL entry point costs nothing extra.  Same closed form and 4dp
    canonicalization as ``mercator_projection``.
    """
    from awsbatch_mapreduce_spark.operators.geo import mercator_pandas_udf

    spark.udf.register("merc_project", mercator_pandas_udf())
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_udf_v"
    )
    return spark.sql(
        """
        SELECT c_custkey,
               FLOOR(p.x * 10000.0D + 0.5D) / 10000.0D AS merc_x,
               FLOOR(p.y * 10000.0D + 0.5D) / 10000.0D AS merc_y
        FROM (SELECT c_custkey,
                     merc_project(CAST((c_custkey % 360) - 180.0 AS DOUBLE),
                                  CAST((ABS(c_acctbal) % 160.0) - 80.0
                                       AS DOUBLE)) AS p
              FROM customer_udf_v)
        """
    )
