"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side by side, then
compares row count, column names, and (order-insensitively) values —
the same contract as CORRECTNESS_r{N}.json, so a green
``tests/test_oracle_parity.py`` predicts a green driver run.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from awsbatch_mapreduce_spark.sources.tables import TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


# Memo of oracle result frames per (connection, SQL text): the parity
# test and the integral-float sweep both execute every registered
# oracle on the same module-scoped connection — without the memo the
# unrolled Lloyd/pca CTE chains ran twice per suite (VERDICT r10 #6).
# Consumers never mutate the returned frame (compare_frames copies in
# _normalize; the sweep only reads dtypes/values).
_ORACLE_MEMO: dict = {}


def oracle_frame(con, sql: str) -> pd.DataFrame:
    key = (id(con), sql)
    if key not in _ORACLE_MEMO:
        _ORACLE_MEMO[key] = con.execute(sql).fetchdf()
    return _ORACLE_MEMO[key]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


# numpy dtype.kind -> the coarse type class the driver's value hash
# distinguishes.  int-vs-float divergence (DuckDB HUGEINT -> float64 vs
# Spark int64) hash-fails at the driver even when values are equal, so
# the local gate must reject it too (VERDICT r1 §What's wrong #3).
_KIND_CLASS = {
    "i": "int",
    "u": "int",
    "b": "bool",
    "f": "float",
    "M": "datetime",
    "m": "timedelta",
    "O": "object",
    "S": "object",
    "U": "object",
}


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    for c in sorted(spark_pdf.columns):
        ka = _KIND_CLASS.get(spark_pdf[c].dtype.kind, spark_pdf[c].dtype.kind)
        kb = _KIND_CLASS.get(oracle_pdf[c].dtype.kind, oracle_pdf[c].dtype.kind)
        if ka != kb:
            problems.append(
                f"column {c!r}: dtype class mismatch "
                f"spark={spark_pdf[c].dtype}({ka}) oracle={oracle_pdf[c].dtype}({kb})"
                " — driver value-hash is type-sensitive"
            )
    if problems:
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row counts differ: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems
    a = _normalize(spark_pdf)
    b = _normalize(oracle_pdf)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            both_nan = np.isnan(av) & np.isnan(bv)
            close = np.isclose(av, bv, rtol=1e-9, atol=1e-9) | both_nan
            if not close.all():
                i = int(np.argmin(close))
                problems.append(
                    f"column {c!r}: {int((~close).sum())} value mismatches, "
                    f"first at row {i}: spark={av[i]!r} oracle={bv[i]!r}"
                )
        else:
            eq = (a[c].to_numpy() == b[c].to_numpy()) | (a[c].isna() & b[c].isna()).to_numpy()
            if not eq.all():
                i = int(np.argmin(eq))
                problems.append(
                    f"column {c!r}: {int((~eq).sum())} value mismatches, "
                    f"first at row {i}: spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r}"
                )
    return problems


def check_query(
    spark,
    con,
    name: str,
    builder,
    oracle: str | None,
    sf_dir: str,
    allow_empty: bool = False,
) -> list[str]:
    """Compare a query against its oracle AND assert non-emptiness in
    the same execution (suite wall-time guard, VERDICT r7 #7: the
    separate nonempty test re-executed every query — ~3 min of pure
    duplication; two empty frames hash-match vacuously, so the zero-row
    check is part of what makes the hash meaningful)."""
    sdf = builder(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    problems: list[str] = []
    if len(spark_pdf) == 0 and not allow_empty:
        problems.append(f"{name} returned 0 rows at {sf_dir}")
    if oracle is None:
        return problems
    oracle_pdf = oracle_frame(con, oracle)
    if math.isnan(len(spark_pdf)):  # pragma: no cover - defensive
        return problems + ["spark produced no frame"]
    return problems + compare_frames(spark_pdf, oracle_pdf)
