"""Deterministic cross-engine rounding.

Spark's ``round`` is HALF_UP; DuckDB's is round-half-even.  On values
whose decimal expansion terminates exactly one digit past the rounding
precision (common here: 2-decimal prices times 1.1, 4-decimal ratios
times 0.3) the two engines disagree by one ulp of the last kept digit,
which breaks value-hash comparison.

``dround`` instead computes ``floor(x * 10^p + 0.5) / 10^p`` — every op
is a deterministic IEEE-754 primitive, so any engine evaluating the same
expression tree over the same input produces bit-identical output.  The
oracle SQL uses the textually identical formula (``dround_sql``).

Semantics: round-half-up toward +infinity (ties on negatives go up,
e.g. -0.5 -> 0).  That's acceptable for a *comparison* canonicalization;
it is not exposed as a user-facing rounding function.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dround(col: Column | str, p: int) -> Column:
    """floor(col * 10^p + 0.5) / 10^p as a double."""
    if isinstance(col, str):
        col = F.col(col)
    scale = float(10**p)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def fixed_point_avg(col: Column | str, data_decimals: int, p: int) -> Column:
    """Order-independent mean: quantize each value to ``data_decimals``
    fixed-point integers, sum exactly in int64, divide once.

    Float sums depend on accumulation order (partial aggregation!), so
    two engines — or two runs — can disagree by 1 ulp and fall on
    different sides of a rounding boundary.  Integer sums are exact and
    associative, so this form is bit-stable everywhere.  Requires
    ``sum(|x|) * 10^data_decimals < 2^63``.
    """
    if isinstance(col, str):
        col = F.col(col)
    scale = float(10**data_decimals)
    q = F.floor(col * F.lit(scale) + F.lit(0.5)).cast("bigint")
    return dround(F.sum(q) / (F.lit(scale) * F.count(q)), p)


def fixed_point_avg_sql(expr: str, data_decimals: int, p: int) -> str:
    """SQL twin of :func:`fixed_point_avg`."""
    scale = float(10**data_decimals)
    inner = (
        f"SUM(CAST(FLOOR(({expr}) * {scale!r} + 0.5) AS BIGINT))"
        f" / ({scale!r} * COUNT(({expr})))"
    )
    return dround_sql(inner, p)


def fixed_point_sum(col: Column | str, data_decimals: int, p: int) -> Column:
    """Order-independent sum via fixed-point int64 (see fixed_point_avg)."""
    if isinstance(col, str):
        col = F.col(col)
    scale = float(10**data_decimals)
    q = F.floor(col * F.lit(scale) + F.lit(0.5)).cast("bigint")
    return dround(F.sum(q) / F.lit(scale), p)


def fixed_point_sum_sql(expr: str, data_decimals: int, p: int) -> str:
    scale = float(10**data_decimals)
    inner = f"SUM(CAST(FLOOR(({expr}) * {scale!r} + 0.5) AS BIGINT)) / {scale!r}"
    return dround_sql(inner, p)


def dround_sql(expr: str, p: int) -> str:
    """The textually identical SQL form for the DuckDB oracle."""
    scale = float(10**p)
    return f"FLOOR(({expr}) * {scale!r} + 0.5) / {scale!r}"
