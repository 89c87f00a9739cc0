"""The local twin of the driver's correctness gate: every registered
query vs its DuckDB oracle at the oracle scale factor (sf0.01)."""

from __future__ import annotations

import pytest

from awsbatch_mapreduce_spark.plans import QUERIES
from tests.conftest import SF_DIR_ORACLE
from tests.oracle_utils import check_query, duckdb_con, oracle_frame


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_DIR_ORACLE)
    yield c
    c.close()


# Queries that may legitimately return zero rows at sf0.01; everything
# else must be non-empty for the oracle hash to be a meaningful signal
# (two empty frames hash-match vacuously).  The check rides inside
# check_query so each query executes ONCE — the standalone
# test_query_nonempty_or_known_empty duplicate re-executed all 200+
# queries for ~3 min of suite time (VERDICT r7 #7).
_ALLOWED_EMPTY = {"anti_join_customers_without_orders"}


# Built-DataFrame cache shared with the schema-safety sweep below: the
# eager builders (Lloyd fits + persisted-index writes) cost seconds per
# invocation, and the schema test needs only the frame the parity test
# already built (VERDICT r10 #6, suite wall time).  Idempotency tests
# bypass this on purpose (they exist to re-run builders).
_BUILT: dict = {}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    spec = QUERIES[name]
    df = spec.builder(spark, SF_DIR_ORACLE)
    _BUILT[name] = df
    problems = check_query(
        spark,
        con,
        name,
        lambda s, d: df,
        spec.oracle,
        SF_DIR_ORACLE,
        allow_empty=name in _ALLOWED_EMPTY,
    )
    assert not problems, f"{name}: " + "; ".join(problems)


def test_comparator_rejects_int_float_divergence():
    """The driver's value hash is dtype-sensitive: 3 (int64) != 3.0
    (float64).  The local gate must reject what the driver rejects —
    round 1 shipped two hash-fails because it didn't."""
    import pandas as pd

    from tests.oracle_utils import compare_frames

    a = pd.DataFrame({"k": [1, 2], "v": pd.Series([3, 4], dtype="int64")})
    b = pd.DataFrame({"k": [1, 2], "v": pd.Series([3.0, 4.0], dtype="float64")})
    problems = compare_frames(a, b)
    assert problems and "dtype class" in problems[0]
    assert not compare_frames(a, a.copy())


def test_oracles_have_no_uncast_integer_aggregates(con):
    """Sweep: every oracle's exposed columns must not materialize as
    float64 when the Spark side is integer-typed.  Proxy check that is
    cheap and engine-only: run each oracle, flag float64 columns whose
    values are all integral — those are almost always an uncast
    SUM/list_sum/COUNT over BIGINT (DuckDB HUGEINT -> float64)."""
    import numpy as np

    suspicious: list[str] = []
    for name in sorted(QUERIES):
        oracle = QUERIES[name].oracle
        if oracle is None:
            continue
        pdf = oracle_frame(con, oracle)
        for c in pdf.columns:
            s = pdf[c]
            if s.dtype.kind != "f" or len(s) == 0:
                continue
            vals = s.dropna().to_numpy()
            if len(vals) and np.all(vals == np.floor(vals)) and np.all(np.abs(vals) < 2**53):
                suspicious.append(f"{name}.{c}")
    allowed = ALLOWED_INTEGRAL_FLOAT_COLUMNS
    unexpected = [s for s in suspicious if s not in allowed]
    assert not unexpected, (
        "oracle columns materialize as integral float64 (likely uncast "
        f"SUM/list_sum -> HUGEINT): {unexpected}"
    )


# Columns that are genuinely float-typed on BOTH sides but happen to be
# integer-valued on the sf0.01 fixture (rounded metrics landing on .0000,
# double quantity sums, nullable-bigint -> float64 on both engines).
# Each entry verified by the dtype-strict test_query_matches_oracle run.
ALLOWED_INTEGRAL_FLOAT_COLUMNS: set[str] = {
    "asof_join_purchase_attribution.purchase_id",
    "asof_join_purchase_attribution.purchase_ts_us",
    "bbox_filter_project.y",
    "bbox_summary_stats.y_min",
    "bbox_summary_stats.y_max",
    # fixture embeddings are unit-normalized (FIXTURES.md), so every
    # l2_norm rounds to 1.0000 and their fixed-point average lands
    # integral; both engines emit float64 (driver hash green in r2)
    "doc_embedding_join_profile.avg_l2_norm",
    "embedding_norms.l2_norm",
    "event_type_cooccurrence.support",
    "orders_with_lineitem_stats.sum_qty",
    "q18_large_orders.sum_qty",
    "q1_pricing_summary.sum_qty",
    "scd2_user_value_intervals.valid_to_us",
    "stats_numeric_profile.p90_qty",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_output_schema_is_comparator_safe(spark, name):
    """Repo convention: oracle-gated outputs carry only scalar
    hash-stable types.  Raw TIMESTAMP/DATE materialize with different
    pandas units/objects per engine (emit epoch_us bigint or a
    formatted string instead); BINARY/STRUCT/MAP/ARRAY have no stable
    cross-engine hash.  Rows-only queries are exempt (count check
    only)."""
    import pyspark.sql.types as T

    if QUERIES[name].oracle is None:
        return
    df = _BUILT.get(name)
    if df is None:  # standalone module run / -k selection
        df = QUERIES[name].builder(spark, SF_DIR_ORACLE)
    offenders = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if isinstance(
            f.dataType,
            (
                T.TimestampType,
                T.TimestampNTZType,
                T.DateType,
                T.BinaryType,
                T.StructType,
                T.MapType,
                T.ArrayType,
                T.DecimalType,
            ),
        )
    ]
    assert not offenders, f"{name} outputs comparator-unsafe columns: {offenders}"


def test_nonempty_check_is_wired_into_check_query():
    """The per-query zero-row guard lives INSIDE check_query (one
    execution per query instead of two — suite wall-time guard); this
    canary keeps it from being silently dropped in a refactor."""
    class _Con:
        def execute(self, _):
            raise AssertionError("oracle must not run for empty frame")

    class _DF:
        def toPandas(self):
            import pandas as pd

            return pd.DataFrame({"a": []})

    problems = check_query(
        None, _Con(), "canary", lambda s, d: _DF(), None, "sfX"
    )
    assert problems and "0 rows" in problems[0]
    assert not check_query(
        None, _Con(), "canary", lambda s, d: _DF(), None, "sfX", allow_empty=True
    )
