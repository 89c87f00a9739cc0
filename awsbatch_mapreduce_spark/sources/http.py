"""HTTP(S) parquet source: fetch remote parquet into a local staging
dir, then hand it to the normal DataFrame reader.

Reference parity: the reference's map stage reads each month's parquet
over a CloudFront URL straight into pandas
(``src/awsbatch-map/main.py:56``, URL template
``Implementation.cs:16-18``).  Spark's parquet reader wants a
Hadoop-visible filesystem, so the Spark-first equivalent is a staged
read: resolve the URL list from the month manifest, download each file
once into a content-addressed staging dir (drivers/executors of a real
cluster would use a shared scratch FS or `SparkFiles`), then
``spark.read.parquet`` over the staged paths — which preserves column
pruning, predicate pushdown, and parallel row-group scans that a
stream-into-pandas read gives up.

Scale notes: downloads are per-file and resumable by re-run (the cache
key is the URL's md5, so a repeated build skips completed fetches); a
1000-executor cluster would instead mount the bucket (s3a/viewfs) —
this module is the honest fallback for plain-HTTP endpoints, which is
exactly the reference's production path.  urllib is stdlib, so no
dependency gate is needed; the unit test serves the fixture dir over a
loopback ``http.server``.
"""

from __future__ import annotations

import hashlib
import os
import urllib.request

from pyspark.sql import DataFrame, SparkSession


def stage_http_files(urls: list[str], staging_dir: str) -> list[str]:
    """Download each URL into ``staging_dir`` (content-addressed by URL
    md5 + basename; already-present files are not re-fetched) and
    return the local paths in input order."""
    os.makedirs(staging_dir, exist_ok=True)
    out: list[str] = []
    for url in urls:
        key = hashlib.md5(url.encode()).hexdigest()[:16]
        base = os.path.basename(url.rstrip("/")) or "part.parquet"
        dest = os.path.join(staging_dir, f"{key}-{base}")
        if not os.path.exists(dest):
            tmp = dest + ".tmp"
            with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
                while True:
                    chunk = r.read(1 << 20)
                    if not chunk:
                        break
                    f.write(chunk)
            os.replace(tmp, dest)  # atomic: no partial file is ever visible
        out.append(dest)
    return out


def read_parquet_http(
    spark: SparkSession, urls: list[str], staging_dir: str
) -> DataFrame:
    """Read one DataFrame over the union of the staged parquet files.

    The staged paths go through the standard parquet source, so the
    scan keeps PushedFilters/ReadSchema behavior identical to a local
    read (pinned in tests/test_http_source.py).
    """
    return spark.read.parquet(*stage_http_files(urls, staging_dir))
