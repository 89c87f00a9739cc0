"""Remaining SQL-surface coverage: GROUPING SETS, higher-order array
functions, map construction, and a CSV sink->source round trip —
completing the scalar/aggregate function library of SURVEY.md §7
Phase 2 beyond what ``relational``/``scalar_functions_showcase`` pin.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.functions.rounding import (
    dround,
    dround_sql,
    fixed_point_sum,
    fixed_point_sum_sql,
)
from awsbatch_mapreduce_spark.plans.registry import query
from awsbatch_mapreduce_spark.sources.tables import load_table


@query(
    "grouping_sets_revenue",
    oracle=f"""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n_lines,
               {fixed_point_sum_sql('l_extendedprice', 2, 2)} AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (detail, per-flag subtotal, grand total) —
    the general form of which rollup/cube (already covered) are sugar.

    One shuffle regardless of set count: Spark expands the sets before
    the hash aggregate, exactly like the oracle engine.
    """
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    # GROUPING SETS has no DataFrame-API form; SQL is the idiomatic path
    return spark.sql(
        f"""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n_lines,
               CAST({dround_sql("SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)) / 100.0", 2)}
                    AS DOUBLE) AS sum_price
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


@query(
    "higher_order_array_ops",
    oracle="""
        WITH e AS (
          SELECT vec_id,
                 len(list_filter(embedding, x -> x > 0)) AS n_positive,
                 FLOOR((list_sum(list_transform(embedding,
                        x -> CAST(ABS(x) AS DOUBLE)))) * 10000.0 + 0.5)
                   / 10000.0 AS l1_norm,
                 FLOOR((CAST(list_max(embedding) AS DOUBLE)) * 10000.0 + 0.5)
                   / 10000.0 AS max_component
          FROM embeddings)
        SELECT vec_id, CAST(n_positive AS INT) AS n_positive,
               l1_norm, max_component
        FROM e
    """,
)
def higher_order_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions JVM-side: filter (count positive
    components), transform+aggregate (L1 norm), array_max — no Python
    boundary, fully codegen'd per row.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        dround(
            F.aggregate(
                F.transform("embedding", lambda x: F.abs(x.cast("double"))),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            4,
        ).alias("l1_norm"),
        dround(F.array_max("embedding").cast("double"), 4).alias("max_component"),
    )


@query(
    "map_mktsegment_stats",
    oracle=f"""
        SELECT c_mktsegment,
               COUNT(*) AS n,
               {fixed_point_sum_sql('c_acctbal', 2, 2)} AS total_bal,
               {dround_sql('MAX(c_acctbal)', 2)} AS max_bal
        FROM customer
        GROUP BY c_mktsegment
    """,
)
def map_mktsegment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed intermediate: build map<segment, acctbal> per row via
    ``create_map``, explode it back, aggregate — pins map construction,
    ``map_keys``/``map_values`` access, and explode-of-map semantics
    (the comparison collapses to plain grouped stats the oracle can
    express; the map plumbing is the subject under test).
    """
    c = load_table(spark, sf_dir, "customer")
    mapped = c.select(
        F.create_map(F.col("c_mktsegment"), F.col("c_acctbal")).alias("m")
    )
    exploded = mapped.select(F.explode("m").alias("c_mktsegment", "bal"))
    return exploded.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        fixed_point_sum("bal", 2, 2).alias("total_bal"),
        dround(F.max("bal"), 2).alias("max_bal"),
    )


@query(
    "csv_roundtrip_part_summary",
    oracle=f"""
        SELECT p_brand,
               COUNT(*) AS n_parts,
               {dround_sql('AVG(p_retailprice)', 4)} AS avg_price
        FROM part
        GROUP BY p_brand
    """,
)
def csv_roundtrip_part_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink -> CSV source round trip (header + explicit schema on
    read), then aggregate; proves the text-format IO path is lossless
    for the types it can carry.  Prices are integer cents so the CSV
    decimal text round-trips exactly.
    """
    p = load_table(spark, sf_dir, "part")
    tmp = tempfile.mkdtemp(prefix="csv_roundtrip_")
    path = f"{tmp}/part_csv"
    p.select("p_partkey", "p_brand", "p_retailprice").write.mode(
        "overwrite"
    ).option("header", "true").csv(path)
    back = (
        spark.read.schema("p_partkey BIGINT, p_brand STRING, p_retailprice DOUBLE")
        .option("header", "true")
        .csv(path)
    )
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        dround(F.avg("p_retailprice"), 4).alias("avg_price"),
    )


@query(
    "orc_roundtrip_orders_summary",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_order,
               strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_order
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def orc_roundtrip_orders_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink -> ORC source round trip, then aggregate — the second
    columnar format besides parquet (SURVEY §2.1 S1/S5 family).
    Timestamps ride through ORC natively, which the date-bound
    aggregate would catch regressing.
    """
    o = load_table(spark, sf_dir, "orders")
    tmp = tempfile.mkdtemp(prefix="orc_roundtrip_")
    path = f"{tmp}/orders_orc"
    o.select("o_orderkey", "o_orderpriority", "o_orderdate").write.mode(
        "overwrite"
    ).orc(path)
    back = spark.read.orc(path)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_order"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_order"),
    )
