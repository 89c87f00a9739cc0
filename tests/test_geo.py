"""The Arrow pandas-UDF Mercator path must equal the JVM closed form."""

from __future__ import annotations

from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.operators.geo import mercator_cols, mercator_pandas_udf
from awsbatch_mapreduce_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_pandas_udf_matches_jvm_path(spark):
    c = load_table(spark, SF_DIR, "customer")
    lon = (F.col("c_custkey") % 360) - F.lit(180.0)
    lat = (F.abs(F.col("c_acctbal")) % 160.0) - F.lit(80.0)
    jx, jy = mercator_cols(lon, lat)
    project = mercator_pandas_udf()
    both = c.select(
        "c_custkey",
        jx.alias("jx"),
        jy.alias("jy"),
        project(lon, lat).alias("p"),
    ).select("c_custkey", "jx", "jy", F.col("p.x").alias("px"), F.col("p.y").alias("py"))
    # identical IEEE expression trees -> bit-equal, no tolerance needed
    bad = both.filter((F.col("jx") != F.col("px")) | (F.abs(F.col("jy") - F.col("py")) > 1e-6))
    assert bad.count() == 0


def test_crs_transform_fallback_is_closed_form(spark):
    """Without pyproj, the general CRS entry point must still serve the
    4326->3857 pair via the closed form (same numbers as the JVM path)."""
    from awsbatch_mapreduce_spark.operators.geo import crs_transform_pandas_udf

    project = crs_transform_pandas_udf(4326, 3857)
    df = spark.createDataFrame([(10.0, 20.0)], "lon DOUBLE, lat DOUBLE")
    x, y = mercator_cols(F.col("lon"), F.col("lat"))
    row = df.select(
        project(F.col("lon"), F.col("lat")).alias("p"), x.alias("jx"), y.alias("jy")
    ).collect()[0]
    try:
        import pyproj  # noqa: F401

        # pyproj's ellipsoidal pipeline for 3857 is the same spherical
        # formula; agree to sub-millimeter
        assert abs(row.p.x - row.jx) < 1e-3 and abs(row.p.y - row.jy) < 1e-3
    except ImportError:
        assert row.p.x == row.jx and abs(row.p.y - row.jy) < 1e-6


def test_crs_transform_unknown_pair_requires_pyproj():
    """Any pair but 4326->3857 must fail fast at construction when
    pyproj is absent (never mid-job on an executor)."""
    import pytest

    from awsbatch_mapreduce_spark.operators.geo import crs_transform_pandas_udf

    try:
        import pyproj  # noqa: F401

        pytest.skip("pyproj installed; unknown pairs are supported")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="pyproj"):
        crs_transform_pandas_udf(4326, 32633)


def test_known_point(spark):
    """Null Island and a textbook point: (0,0) -> (0,0); lat 45 N has
    y ~ 5621521.49 m (public web-mercator reference value)."""
    df = spark.createDataFrame([(0.0, 0.0), (0.0, 45.0)], "lon DOUBLE, lat DOUBLE")
    x, y = mercator_cols(F.col("lon"), F.col("lat"))
    rows = df.select(x.alias("x"), y.alias("y")).collect()
    assert rows[0].x == 0.0 and abs(rows[0].y) < 1e-6
    assert abs(rows[1].y - 5621521.486192) < 0.01
