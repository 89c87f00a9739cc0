"""Mercator projection query + data-quality validation report.

``mercator_projection`` upgrades reference-parity P2 from the affine
stand-in to the true EPSG:4326->3857 math (``operators.geo``), checked
against the same closed form in SQL.  ``data_quality_report`` is the
expectation-style validation pass a training-data pipeline runs before
ingest: null/range/referential checks in ONE scan per table, emitted as
a (check, n_violations, n_checked) report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.functions.rounding import dround
from awsbatch_mapreduce_spark.operators.geo import mercator_cols
from awsbatch_mapreduce_spark.plans.registry import query
from awsbatch_mapreduce_spark.sources.tables import load_table

# pseudo lat/lon derived deterministically from customer keys/balances:
# lon in [-180, 180), lat clamped well inside (-90, 90)
_LON = "(c_custkey % 360) - 180.0"
_LAT = "((ABS(c_acctbal) % 160.0) - 80.0)"

_MERCATOR_ORACLE = f"""
    SELECT c_custkey,
           FLOOR((({_LON}) * 6378137.0 * PI() / 180.0) * 10000.0 + 0.5)
             / 10000.0 AS merc_x,
           FLOOR((6378137.0 * LN(TAN(PI() / 4.0 + ({_LAT}) * PI() / 360.0)))
                 * 10000.0 + 0.5) / 10000.0 AS merc_y
    FROM customer
"""


@query("mercator_projection", oracle=_MERCATOR_ORACLE)
def mercator_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Web-Mercator reprojection (reference P2,
    ``src/awsbatch-map/main.py:67-72``) over pseudo-coordinates derived
    from the customer fixture; JVM closed form, checked against the
    identical SQL expression to 4 decimals (~0.1 mm).
    """
    c = load_table(spark, sf_dir, "customer")
    lon = (F.col("c_custkey") % 360) - F.lit(180.0)
    lat = (F.abs(F.col("c_acctbal")) % 160.0) - F.lit(80.0)
    x, y = mercator_cols(lon, lat)
    return c.select(
        "c_custkey",
        dround(x, 4).alias("merc_x"),
        dround(y, 4).alias("merc_y"),
    )


_QUALITY_ORACLE = """
    WITH li AS (SELECT * FROM lineitem)
    SELECT 'null_shipdate' AS check_name,
           COUNT(*) FILTER (WHERE l_shipdate IS NULL) AS n_violations,
           COUNT(*) AS n_checked
    FROM li
    UNION ALL
    SELECT 'nonpositive_price',
           COUNT(*) FILTER (WHERE l_extendedprice <= 0), COUNT(*)
    FROM li
    UNION ALL
    SELECT 'discount_out_of_range',
           COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.5), COUNT(*)
    FROM li
    UNION ALL
    SELECT 'orphan_orderkey',
           COUNT(*) FILTER (WHERE o_orderkey IS NULL), COUNT(*)
    FROM li LEFT JOIN orders ON o_orderkey = l_orderkey
"""


@query("data_quality_report", oracle=_QUALITY_ORACLE)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation checks as data: null, range, and referential
    integrity violations with denominators — the pre-ingest gate of a
    training-data pipeline.

    The three scalar checks share ONE scan (conditional aggregation,
    then unpivot); only the referential check joins.  At 100 TB each
    check stays a map-side counter; the report is 4 rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    scalar = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_shipdate").isNull(), 1).otherwise(0)).alias(
            "null_shipdate"
        ),
        F.sum(F.when(F.col("l_extendedprice") <= 0, 1).otherwise(0)).alias(
            "nonpositive_price"
        ),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.5), 1)
            .otherwise(0)
        ).alias("discount_out_of_range"),
    )
    checks = scalar.selectExpr(
        "stack(3, "
        "'null_shipdate', null_shipdate, "
        "'nonpositive_price', nonpositive_price, "
        "'discount_out_of_range', discount_out_of_range) "
        "AS (check_name, n_violations)",
        "n AS n_checked",
    ).select("check_name", F.col("n_violations").cast("bigint"), "n_checked")
    orphans = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left")
        .agg(
            F.lit("orphan_orderkey").alias("check_name"),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_violations"),
            F.count(F.lit(1)).alias("n_checked"),
        )
    )
    return checks.unionByName(orphans)
