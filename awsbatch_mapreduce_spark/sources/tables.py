"""Parquet table sources over the TPC-H-ish fixtures.

Maps the reference's scans (SURVEY.md §2.1 S1/S2): ``pd.read_parquet``
(``src/awsbatch-map/main.py:56``, ``local.py:21,49``) becomes
``spark.read.parquet`` — Catalyst pushes column pruning and raw-column
predicates into the scan, so the hand-written ``columns=[...]`` pruning
of ``local.py:21`` is automatic here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (lazy scan).

    ``events.parquet`` has shipped with two encodings of ``ts``:
    TIMESTAMP(NANOS), which Spark's parquet reader rejects by default —
    read as long (``nanosAsLong``) and rebuilt with *integer* division
    (``div 1000``) so the truncation matches DuckDB's TIMESTAMP_NS ->
    TIMESTAMP cast exactly — and plain TIMESTAMP(MICROS), which Spark
    reads as TIMESTAMP_NTZ and we cast to TIMESTAMP (session tz is UTC,
    so the cast is value-preserving and matches DuckDB's read).  Detect
    which from the scanned schema so both fixture generations load.
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
