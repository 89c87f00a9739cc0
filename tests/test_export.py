"""Corpus export writer: deterministic layout, losslessness, and
partition pruning on the consumed side."""

from __future__ import annotations

import re

from awsbatch_mapreduce_spark.operators.export import (
    assign_split_and_shard,
    export_corpus,
)
from awsbatch_mapreduce_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_export_layout_and_losslessness(spark, tmp_path):
    out = str(tmp_path / "corpus")
    docs = load_table(spark, SF_DIR, "documents")
    export_corpus(docs, out, n_shards=4)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # every doc keeps its full payload
    assert sorted(back.columns) == sorted(docs.columns + ["split", "shard"])
    # hive layout: split=<s>/shard=<k>
    parts = {
        (r.split, r.shard) for r in back.select("split", "shard").distinct().collect()
    }
    assert {s for s, _ in parts} == {"train", "val", "test"}
    assert all(0 <= k < 4 for _, k in parts)


def test_export_assignment_is_stable(spark):
    """Same ids -> same placement, independent of partitioning/order —
    the append-stability contract (re-exports never move old docs)."""
    docs = load_table(spark, SF_DIR, "documents")
    a = {
        r.doc_id: (r.split, r.shard)
        for r in assign_split_and_shard(docs).select(
            "doc_id", "split", "shard"
        ).collect()
    }
    b = {
        r.doc_id: (r.split, r.shard)
        for r in assign_split_and_shard(docs.repartition(17).sortWithinPartitions("text"))
        .select("doc_id", "split", "shard")
        .collect()
    }
    assert a == b


def test_export_reader_prunes_to_split(spark, tmp_path):
    out = str(tmp_path / "corpus2")
    export_corpus(load_table(spark, SF_DIR, "documents"), out, n_shards=2)
    df = spark.read.parquet(out).filter("split = 'test'")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "split" in m.group(1), plan[:2000]
    assert df.count() > 0
