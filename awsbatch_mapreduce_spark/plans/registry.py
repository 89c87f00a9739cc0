"""Central registry mapping query name -> (Spark builder, DuckDB oracle).

The driver contract (``__spark_entry__.py``) needs ``queries()`` and
``oracle_sql()`` dicts whose column names match exactly — the comparator
sorts columns by name before hashing values.  Keeping both halves of each
pair side by side in one ``@query`` registration makes that invariant
reviewable locally (``tests/test_oracle_parity.py`` runs the same
comparison as the driver).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, doc=fn.__doc__ or ""
        )
        return fn

    return wrap
