"""Small-file compaction operator."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from awsbatch_mapreduce_spark.operators.compact import compact_parquet
from awsbatch_mapreduce_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _data_files(path: str) -> list[str]:
    return [
        f
        for f in glob.glob(f"{path}/*.parquet")
        if not f.rsplit("/", 1)[-1].startswith(("_", "."))
    ]


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    li = load_table(spark, SF_DIR, "lineitem")
    li.repartition(40).write.parquet(src)
    assert len(_data_files(src)) == 40
    before = li.count()
    out = compact_parquet(spark, src, target_file_mb=128)
    assert out.count() == before
    assert len(_data_files(src)) <= 4


def test_compact_clustering_gives_disjoint_ranges(spark, tmp_path):
    """With cluster_by, each output file must cover a key range that
    does not overlap any other file's — the property that lets parquet
    min/max stats prune whole files for range predicates."""
    src = str(tmp_path / "clustered")
    li = load_table(spark, SF_DIR, "lineitem")
    li.repartition(16).write.parquet(src)
    compact_parquet(spark, src, cluster_by="l_orderkey", n_files=4)
    files = _data_files(src)
    assert len(files) >= 2
    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["l_orderkey"])["l_orderkey"]
        if len(t):
            ranges.append((t[0].as_py(), t[-1].as_py()))  # sorted within file
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {ranges}"
