"""JSON manifest sink + source round trip (SURVEY.md §2.1 S3op/S4).

The reference serializes its work manifest to ``jobData.json`` on S3
(``src/awsbatch-mapreduce/Implementation.cs:45-47``) and each map task
loads + validates it (``src/awsbatch-map/main.py:21-46``).  Here the
same manifest flows through ``df.write.json`` and ``spark.read.json``
with an explicit schema (the validation: a malformed row fails the
read instead of the reference's runtime asserts), and the round trip
is proven lossless by hash-matching the direct-derivation oracle.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from awsbatch_mapreduce_spark.plans.registry import QUERIES, query

_MANIFEST_SCHEMA = (
    "year_month STRING, iteration BIGINT, frame_name STRING, file_url STRING"
)


@query(
    "manifest_json_roundtrip",
    # identity round trip: the oracle is the manifest derivation itself
    oracle=None,  # set below to reuse month_manifest's oracle verbatim
)
def manifest_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """month manifest -> JSON sink -> JSON source (schema-validated).

    At scale the sink/source are the same code against ``s3a://`` URIs;
    a tiny manifest stays a single task either way (coalesce(1) mirrors
    the reference's single ``jobData.json`` object).
    """
    manifest = QUERIES["month_manifest"].builder(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="manifest_json_")
    path = f"{tmp}/jobData"
    manifest.coalesce(1).write.mode("overwrite").json(path)
    return spark.read.schema(_MANIFEST_SCHEMA).json(path).select(
        "year_month", "iteration", "frame_name", "file_url"
    )


# reuse the month_manifest oracle: a lossless round trip must equal it
object.__setattr__(
    QUERIES["manifest_json_roundtrip"],
    "oracle",
    QUERIES["month_manifest"].oracle,
)


@query(
    "pysource_month_manifest",
    oracle="""
        SELECT strftime(m, '%Y-%m') AS year_month,
               'https://example.com/trip-data/yellow_tripdata_'
                 || strftime(m, '%Y-%m') || '.parquet' AS file_url,
               CAST(ROW_NUMBER() OVER (ORDER BY m) - 1 AS INT) AS iteration
        FROM (SELECT unnest(generate_series(DATE '2009-01-01',
                                            DATE '2010-12-01',
                                            INTERVAL 1 MONTH)) AS m)
    """,
)
def pysource_month_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom Python data source (``sources/pysource.py``) read end
    to end: 24 manifest rows, one input partition per month — the
    reference's array-job fan-out (``Implementation.cs:54-58``) as a
    pluggable Spark source instead of a driver-side loop.
    """
    from awsbatch_mapreduce_spark.sources.pysource import (
        register_month_manifest_source,
    )

    register_month_manifest_source(spark)
    return spark.read.format("month_manifest").load()
