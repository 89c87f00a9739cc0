"""Custom Python data source (sources/pysource.py): partition planning
and option handling, beyond the oracle-checked default read."""

from __future__ import annotations

from awsbatch_mapreduce_spark.sources.pysource import (
    _month_range,
    register_month_manifest_source,
)


def test_month_range_inclusive_and_year_rollover():
    assert _month_range("2009-01", "2009-01") == ["2009-01"]
    assert _month_range("2009-11", "2010-02") == [
        "2009-11",
        "2009-12",
        "2010-01",
        "2010-02",
    ]
    assert len(_month_range("2009-01", "2010-12")) == 24


def test_source_partitions_one_per_month(spark):
    register_month_manifest_source(spark)
    df = (
        spark.read.format("month_manifest")
        .option("start", "2020-01")
        .option("end", "2020-06")
        .option("template", "s3://bucket/{ym}.parquet")
        .load()
    )
    assert df.rdd.getNumPartitions() == 6
    rows = {r.year_month: r for r in df.collect()}
    assert sorted(rows) == [f"2020-{m:02d}" for m in range(1, 7)]
    assert rows["2020-03"].file_url == "s3://bucket/2020-03.parquet"
    assert rows["2020-03"].iteration == 2
