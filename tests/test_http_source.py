"""HTTP parquet source (SURVEY S1's remote half): serve the fixture
dir over loopback HTTP, stage + read through the real reader, and pin
that staging preserves pushdown."""

from __future__ import annotations

import http.server
import os
import socket
import threading

import pytest

from awsbatch_mapreduce_spark.sources.http import (
    read_parquet_http,
    stage_http_files,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def http_root():
    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=SF_DIR, **kw
    )
    with socket.socket() as probe:
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", port), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def test_http_read_matches_local(spark, http_root, tmp_path):
    url = f"{http_root}/region.parquet"
    df = read_parquet_http(spark, [url], str(tmp_path / "stage"))
    local = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    assert sorted(df.collect()) == sorted(local.collect())


def test_http_multi_file_union_and_cache(spark, http_root, tmp_path):
    urls = [f"{http_root}/region.parquet", f"{http_root}/nation.parquet"]
    staged1 = stage_http_files([urls[0]], str(tmp_path / "stage"))
    mtime = os.path.getmtime(staged1[0])
    staged2 = stage_http_files(urls, str(tmp_path / "stage"))
    assert staged2[0] == staged1[0]
    assert os.path.getmtime(staged2[0]) == mtime  # cache hit, no re-fetch
    assert len(staged2) == 2 and all(os.path.getsize(p) > 0 for p in staged2)


def test_http_staged_scan_keeps_pushdown(spark, http_root, tmp_path):
    from pyspark.sql import functions as F

    df = read_parquet_http(
        spark, [f"{http_root}/nation.parquet"], str(tmp_path / "stage")
    ).filter(F.col("n_regionkey") == 0).select("n_name")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    import re

    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("n_regionkey" in p for p in pushed), plan[:1500]
    schemas = re.findall(r"ReadSchema: ([^\n]*)", plan)
    assert any("n_name" in s and "n_comment" not in s for s in schemas), plan[:1500]
