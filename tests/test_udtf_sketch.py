"""Sketch error bounds vs exact values; UDTF covered by oracle parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.plans import QUERIES
from awsbatch_mapreduce_spark.sources.tables import load_table
from tests.conftest import SF_DIR_ORACLE


def test_sketches_within_error_bounds(spark):
    approx = {
        r.event_type: r
        for r in QUERIES["approx_sketches"].builder(spark, SF_DIR_ORACLE).collect()
    }
    ev = load_table(spark, SF_DIR_ORACLE, "events")
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("users"),
            F.expr("percentile(value, array(0.5, 0.95))").alias("p"),
        )
        .collect()
    }
    assert approx.keys() == exact.keys()
    for et, a in approx.items():
        e = exact[et]
        # HLL at rsd=0.05: allow 3 sigma
        assert abs(a.approx_users - e.users) <= max(3, 0.15 * e.users), et
        # percentile_approx with accuracy 10k on ~2k rows is near-exact
        for got, want in zip(a.approx_p50_p95, e.p):
            assert abs(got - want) <= 0.05 * max(abs(want), 1.0), (et, got, want)
