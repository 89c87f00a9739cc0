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
