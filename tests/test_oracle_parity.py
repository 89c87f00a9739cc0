"""The local twin of the driver's correctness gate: every registered
query vs its DuckDB oracle at the oracle scale factor (sf0.01)."""

from __future__ import annotations

import pytest

from awsbatch_mapreduce_spark.plans import QUERIES
from tests.conftest import SF_DIR_ORACLE
from tests.oracle_utils import check_query, duckdb_con


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_DIR_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    spec = QUERIES[name]
    problems = check_query(
        spark, con, name, spec.builder, spec.oracle, SF_DIR_ORACLE
    )
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_nonempty_or_known_empty(spark, con, name):
    """Every query should produce rows at sf0.01 (catches vacuous filters).

    anti_join may legitimately be empty; everything else must be
    non-empty for the oracle hash to be a meaningful signal.
    """
    allowed_empty = {"anti_join_customers_without_orders"}
    df = QUERIES[name].builder(spark, SF_DIR_ORACLE)
    n = df.count()
    if name not in allowed_empty:
        assert n > 0, f"{name} returned 0 rows at sf0.01"
