"""Drift-tolerant union reader (SURVEY.md §1.3, main.py:58-65 semantics)."""

from __future__ import annotations

import pytest

from awsbatch_mapreduce_spark.sources.drift import normalize_columns, read_union_drift

ALIASES = {
    "dropoff_latitude": ["End_Lat"],
    "dropoff_longitude": ["End_Lon"],
}


@pytest.fixture(scope="module")
def drift_dirs(spark, tmp_path_factory):
    """Two parquet 'months': modern column names and 2009-legacy names."""
    base = tmp_path_factory.mktemp("drift")
    modern = spark.createDataFrame(
        [(40.7, -74.0, 1), (40.8, -73.9, 2)],
        "dropoff_latitude DOUBLE, dropoff_longitude DOUBLE, trip_id INT",
    )
    legacy = spark.createDataFrame(
        [(40.6, -74.1, 3)],
        "End_Lat DOUBLE, End_Lon DOUBLE, trip_id INT",
    )
    modern.write.parquet(str(base / "m1"))
    legacy.write.parquet(str(base / "m2"))
    return [str(base / "m1"), str(base / "m2")]


def test_union_normalizes_aliases(spark, drift_dirs):
    df = read_union_drift(spark, drift_dirs, ALIASES, required=["dropoff_latitude"])
    assert set(df.columns) == {"dropoff_latitude", "dropoff_longitude", "trip_id"}
    rows = {r.trip_id: (r.dropoff_latitude, r.dropoff_longitude) for r in df.collect()}
    assert rows[3] == (40.6, -74.1)  # legacy columns landed in canonical names
    assert len(rows) == 3


def test_missing_required_raises(spark, tmp_path):
    bad = spark.createDataFrame([(1,)], "trip_id INT")
    with pytest.raises(ValueError, match="dropoff_latitude"):
        normalize_columns(bad, ALIASES, required=["dropoff_latitude"])


def test_mergeschema_would_quadruple_columns(spark, drift_dirs):
    """Documents the trap the reader exists to avoid: a naive mergeSchema
    read keeps the alias columns distinct (4 coord columns, half null)."""
    naive = spark.read.option("mergeSchema", "true").parquet(*drift_dirs)
    coord_cols = {
        c
        for c in naive.columns
        if c in {"End_Lat", "End_Lon", "dropoff_latitude", "dropoff_longitude"}
    }
    assert len(coord_cols) == 4
