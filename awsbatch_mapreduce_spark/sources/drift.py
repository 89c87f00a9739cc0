"""Drift-tolerant partitioned reader.

The reference handles schema evolution across month partitions by hand:
2009-era taxi files name the dropoff columns ``End_Lat``/``End_Lon``,
later files ``dropoff_latitude``/``dropoff_longitude``; each map task
resolves the alias at runtime and errors if neither exists
(``src/awsbatch-map/main.py:58-65``).  A naive ``mergeSchema`` read would
materialize all four as distinct columns — so we normalize names
per-source *before* ``unionByName`` (SURVEY.md §1.3).

At scale this stays a metadata-only operation: each source keeps its own
parquet scan (pushdown + pruning intact), the renames are projections,
and the union is a plan-level concat — no shuffle.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession


def normalize_columns(
    df: DataFrame,
    aliases: Mapping[str, Sequence[str]],
    required: Sequence[str] = (),
) -> DataFrame:
    """Rename drift aliases to canonical names.

    ``aliases`` maps canonical name -> candidate source names in priority
    order (the canonical name itself is implicitly first).  Mirrors the
    column-existence resolve of ``main.py:58-65``: picks the first
    candidate present; if a ``required`` canonical column resolves to
    nothing, raises — same contract as the reference's ``Exception('...
    could not be found')``.
    """
    cols = set(df.columns)
    renames: dict[str, str] = {}
    for canonical, candidates in aliases.items():
        if canonical in cols:
            continue
        found = next((c for c in candidates if c in cols), None)
        if found is not None:
            renames[found] = canonical
        elif canonical in required:
            raise ValueError(
                f"required column {canonical!r} not found; tried {list(candidates)}"
            )
    if renames:
        df = df.withColumnsRenamed(renames)
    return df


def read_union_drift(
    spark: SparkSession,
    paths: Sequence[str],
    aliases: Mapping[str, Sequence[str]],
    required: Sequence[str] = (),
) -> DataFrame:
    """Read many parquet partitions with per-source name normalization,
    then ``unionByName(allowMissingColumns=True)``.

    Replaces the reference's per-array-task drift resolve + the implicit
    UNION ALL of 24 monthly tables (SURVEY.md §2.5): one lazy plan whose
    scans stay independently prunable.
    """
    if not paths:
        raise ValueError("read_union_drift needs at least one path")
    frames = [
        normalize_columns(spark.read.parquet(p), aliases, required) for p in paths
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out
