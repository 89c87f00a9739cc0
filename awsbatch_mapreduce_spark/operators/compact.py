"""Small-file compaction with optional sort-on-write clustering.

Streaming sinks, incremental upserts, and over-parallel writers all
degrade a table into thousands of small files; scan throughput then
dies on open/footer overhead instead of bytes.  Compaction rewrites
the table into size-targeted files, optionally range-clustered on a
key so parquet min/max stats prune whole files for range predicates —
the poor man's Z-order, and the single highest-leverage maintenance
job on a 100 TB lake.

The rewrite goes to a staging directory and swaps in with a rename
(same discipline as ``streaming/upsert.py``): never overwrite a path
you are lazily reading.  On object stores the swap becomes a table-
format commit; the plan (repartitionByRange + sortWithinPartitions)
is unchanged.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    cluster_by: str | None = None,
    n_files: int | None = None,
) -> DataFrame:
    """Rewrite the parquet table at ``path`` into ~``target_file_mb``
    files (or exactly ``n_files`` when given); with ``cluster_by``,
    range-partition + sort on that column so each output file covers a
    disjoint key range.

    Returns the compacted table (re-read from the swapped path).
    """
    if n_files is None:
        n_files = max(1, _dir_bytes(path) // (target_file_mb << 20))
    df = spark.read.parquet(path)
    if cluster_by is not None:
        out = df.repartitionByRange(n_files, F.col(cluster_by)).sortWithinPartitions(
            cluster_by
        )
    else:
        out = df.repartition(n_files)
    staging = f"{path.rstrip('/')}.compacting"
    out.write.mode("overwrite").parquet(staging)
    shutil.rmtree(path)
    os.rename(staging, path)
    return spark.read.parquet(path)
