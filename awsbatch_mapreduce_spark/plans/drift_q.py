"""Schema-drift reader under the driver's oracle gate.

The one non-trivial data-model semantic in the reference is per-
partition column-alias resolution before union (2009 files say
``End_Lat``/``End_Lon``, later ones ``dropoff_latitude``/...;
``src/awsbatch-map/main.py:58-65``).  This query materializes that
exact situation from the lineitem fixture — two partition files with
drifted column names and a dropped column — reads them back through
``sources.drift.read_union_drift``, and aggregates; the oracle derives
the same numbers straight from the canonical table.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.functions.rounding import fixed_point_sum, fixed_point_sum_sql
from awsbatch_mapreduce_spark.plans.registry import query
from awsbatch_mapreduce_spark.sources.drift import read_union_drift
from awsbatch_mapreduce_spark.sources.tables import load_table

_DRIFT_ORACLE = f"""
    SELECT l_returnflag,
           COUNT(*) AS n_lines,
           {fixed_point_sum_sql('l_extendedprice', 2, 2)} AS sum_price,
           COUNT(CASE WHEN l_linenumber <= 2 THEN l_tax END) AS n_with_tax
    FROM lineitem
    GROUP BY l_returnflag
"""


@query("drift_union_normalize", oracle=_DRIFT_ORACLE)
def drift_union_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the drift scenario: write lineitem as two 'eras' —
    era A (line numbers 1-2) with renamed columns ``ext_price``/
    ``disc_pct``, era B with canonical names but no ``l_tax`` column —
    then read through the normalizing union reader and aggregate.

    A plain ``mergeSchema`` read of these files would yield four price/
    discount columns and silently null-split the data; the reader
    renames per source before ``unionByName(allowMissingColumns=True)``
    so the aggregate below hash-matches the canonical-table oracle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    tmp = tempfile.mkdtemp(prefix="drift_eras_")
    era_a, era_b = f"{tmp}/era_a", f"{tmp}/era_b"
    li.filter(F.col("l_linenumber") <= 2).withColumnsRenamed(
        {"l_extendedprice": "ext_price", "l_discount": "disc_pct"}
    ).write.mode("overwrite").parquet(era_a)
    li.filter(F.col("l_linenumber") > 2).drop("l_tax").write.mode(
        "overwrite"
    ).parquet(era_b)

    unified = read_union_drift(
        spark,
        [era_a, era_b],
        aliases={
            "l_extendedprice": ["ext_price"],
            "l_discount": ["disc_pct"],
        },
        required=["l_extendedprice"],
    )
    return unified.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_lines"),
        fixed_point_sum("l_extendedprice", 2, 2).alias("sum_price"),
        F.count("l_tax").alias("n_with_tax"),
    )
