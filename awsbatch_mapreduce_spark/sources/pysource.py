"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API):
the reference's partition-manifest generator as a first-class source.

The reference's setup stage enumerates months 2009-01..2010-12, builds
a ``{YearMonth, FileUrl}`` manifest row per month, and fans out one
task per row (``src/awsbatch-mapreduce/Implementation.cs:16-47``,
``Models.cs:3-7``).  Here the same generator is a pluggable Spark
source: ``spark.read.format("month_manifest").option(...)`` — with one
*input partition per month*, so Spark's scheduler replays the
reference's array-job fan-out (one Batch array task per manifest row,
``Implementation.cs:54-58``) as ordinary partition-parallel scan tasks.

Demonstrates the engine's source-extension surface: schema declaration,
option handling, partition planning (``partitions()``), and
per-partition row generation — the same hooks a real connector (REST
catalog, object-store listing, message queue) would implement.  The
generator math lives driver-side only in ``partitions()``; row
synthesis runs distributed in ``read()``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_DEFAULT_TEMPLATE = "https://example.com/trip-data/yellow_tripdata_{ym}.parquet"


def _month_range(start: str, end: str) -> list[str]:
    """Inclusive yyyy-MM sequence, ``Implementation.cs:20-28``'s loop."""
    sy, sm = int(start[:4]), int(start[5:7])
    ey, em = int(end[:4]), int(end[5:7])
    months = []
    y, m = sy, sm
    while (y, m) <= (ey, em):
        months.append(f"{y:04d}-{m:02d}")
        m += 1
        if m == 13:
            y, m = y + 1, 1
    return months


@dataclass
class _MonthPartition(InputPartition):
    iteration: int
    year_month: str


class MonthManifestReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.start = options.get("start", "2009-01")
        self.end = options.get("end", "2010-12")
        self.template = options.get("template", _DEFAULT_TEMPLATE)

    def partitions(self) -> list[InputPartition]:
        return [
            _MonthPartition(i, ym)
            for i, ym in enumerate(_month_range(self.start, self.end))
        ]

    def read(self, partition: _MonthPartition) -> Iterator[tuple]:
        yield (
            partition.year_month,
            self.template.format(ym=partition.year_month),
            partition.iteration,
        )


class MonthManifestDataSource(DataSource):
    """``format("month_manifest")`` — options: start, end (yyyy-MM,
    inclusive), template (``{ym}`` placeholder)."""

    @classmethod
    def name(cls) -> str:
        return "month_manifest"

    def schema(self) -> str:
        return "year_month STRING, file_url STRING, iteration INT"

    def reader(self, schema) -> MonthManifestReader:
        return MonthManifestReader(self.options)


def register_month_manifest_source(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(MonthManifestDataSource)
