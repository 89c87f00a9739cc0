from __future__ import annotations

import os

import pytest

from awsbatch_mapreduce_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="awsbatch-mapreduce-spark-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


# The two shipped fixture scales for "both SFs" invariants.  NOTE:
# SF_DIR defaults to sf0.001 and "sf0.01" is NOT a substring of
# "sf0.001" — the old per-module `SF_DIR.replace("sf0.01", "sf0.001")`
# was a silent no-op that made both-SF loops test one fixture twice
# (round-9 review finding).
SF_BOTH = tuple(dict.fromkeys((SF_DIR, SF_DIR_ORACLE)))


def plan_of(df) -> str:
    """Formatted physical plan of a DataFrame (first block only) —
    shared by the plan-pinning test modules so the extraction logic
    has one home."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    ).split("\n\n")[0]


# Cross-module cache of collected query rows per (name, sf): the
# semdedup builders each pay a 5-iteration Lloyd fit, and the wave-9/10
# invariant modules consume the same frames repeatedly (round-9: the
# SF_BOTH fix made the sf0.01 legs real, which re-exposed the cost).
# Idempotency tests bypass this cache on purpose.
_QUERY_ROWS: dict = {}


def query_rows(spark, name: str, sf: str) -> list:
    from awsbatch_mapreduce_spark.plans import QUERIES

    key = (name, sf)
    if key not in _QUERY_ROWS:
        _QUERY_ROWS[key] = QUERIES[name].builder(spark, sf).collect()
    return _QUERY_ROWS[key]
