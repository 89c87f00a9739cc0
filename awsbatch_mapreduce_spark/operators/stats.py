"""Summary statistics (A2-A4): count / mean / min / max over columns.

The reference prints these per-month for eyeball verification
(``src/awsbatch-map/local.py:23,33-37,50-58``).  Here they are a single
``agg`` — one partial+final aggregation pass, no driver loop, and all
columns' stats computed in the same job (the reference made one pandas
call per stat).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.functions.rounding import (
    dround,
    dround_sql,
    fixed_point_avg,
    fixed_point_avg_sql,
)


def summary_stats(
    df: DataFrame,
    cols: Sequence[str],
    round_to: int = 4,
    data_decimals: dict[str, int] | None = None,
) -> DataFrame:
    """One-row frame: ``n_rows`` plus ``{c}_mean/{c}_min/{c}_max`` per col.

    Means are rounded (default 4 dp, deterministic cross-engine
    ``dround``); columns listed in ``data_decimals`` use exact
    fixed-point integer accumulation so the mean is independent of
    aggregation order (see ``functions.rounding``).
    """
    dd = data_decimals or {}
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        if c in dd:
            aggs.append(fixed_point_avg(c, dd[c], round_to).alias(f"{c}_mean"))
        else:
            aggs.append(dround(F.avg(c), round_to).alias(f"{c}_mean"))
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return df.agg(*aggs)


def summary_stats_sql(
    table_expr: str,
    cols: Sequence[str],
    round_to: int = 4,
    data_decimals: dict[str, int] | None = None,
) -> str:
    """DuckDB-oracle twin of :func:`summary_stats`."""
    dd = data_decimals or {}
    parts = ["COUNT(*) AS n_rows"]
    for c in cols:
        if c in dd:
            parts.append(f"{fixed_point_avg_sql(c, dd[c], round_to)} AS {c}_mean")
        else:
            parts.append(f"{dround_sql(f'AVG({c})', round_to)} AS {c}_mean")
        parts.append(f"MIN({c}) AS {c}_min")
        parts.append(f"MAX({c}) AS {c}_max")
    return f"SELECT {', '.join(parts)} FROM {table_expr}"
