"""Sketch error bounds vs exact values; UDTF covered by oracle parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.plans import QUERIES
from awsbatch_mapreduce_spark.sources.tables import load_table
from tests.conftest import SF_DIR_ORACLE


def test_sketches_within_error_bounds(spark):
    """The registered query self-reports tolerance flags; re-derive the
    same bounds here from raw sketch aggregates so a flag regression in
    the query can't hide a genuinely-drifted sketch."""
    rows = {
        r.event_type: r
        for r in QUERIES["approx_sketches"].builder(spark, SF_DIR_ORACLE).collect()
    }
    ev = load_table(spark, SF_DIR_ORACLE, "events")
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("users"),
            F.approx_count_distinct("user_id", rsd=0.05).alias("approx_users"),
            F.expr("percentile(value, array(0.5, 0.95))").alias("p"),
            F.percentile_approx("value", [0.5, 0.95], 10_000).alias("ap"),
        )
        .collect()
    }
    assert rows.keys() == exact.keys()
    for et, a in rows.items():
        e = exact[et]
        assert a.exact_users == e.users, et
        # every in-query tolerance flag must be affirmatively 1
        assert (a.users_ok, a.p50_ok, a.p95_ok) == (1, 1, 1), (et, a)
        # HLL at rsd=0.05: allow 3 sigma
        assert abs(e.approx_users - e.users) <= max(3, 0.15 * e.users), et
        # percentile_approx with accuracy 10k on ~2k rows is near-exact
        for got, want in zip(e.ap, e.p):
            assert abs(got - want) <= 0.05 * max(abs(want), 1.0), (et, got, want)
