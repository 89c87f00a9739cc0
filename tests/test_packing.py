"""Sequence packing + compression-ratio operators.

``corpus_pack_sequences`` has a full SQL oracle (parity suite); here we
pin its packing invariants instead.  ``text_compression_ratio``'s
oracle covers byte length + sanity flags; the zlib values themselves
are pinned here as exact agreement with direct ``zlib`` calls.
"""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.plans import QUERIES
from awsbatch_mapreduce_spark.plans.packing import compression_ratios
from awsbatch_mapreduce_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_pack_sequences_offsets_are_contiguous(spark):
    """Within each shard, ordered by doc_id, every document must start
    exactly where the previous one ended — the defining invariant of
    concatenate-and-cut packing."""
    out = (
        QUERIES["corpus_pack_sequences"]
        .builder(spark, SF_DIR)
        .orderBy("shard", "doc_id")
        .collect()
    )
    assert out
    pos = {}
    for r in out:
        assert r.start_offset == pos.get(r.shard, 0), r
        pos[r.shard] = r.start_offset + r.n_tokens
        assert r.seq_id == r.start_offset // 512


def test_compression_ratio_matches_direct_zlib(spark):
    """Every (n_bytes, n_compressed) pair must equal len(utf8) and
    len(zlib.compress(utf8, 6)) exactly — the UDF is a distribution
    mechanism, not an approximation."""
    table = load_table(spark, SF_DIR, "documents")
    docs = {
        r.doc_id: r.text for r in table.select("doc_id", "text").collect()
    }
    out = compression_ratios(table).collect()
    assert len(out) == len(docs)
    for r in out:
        raw = docs[r.doc_id].encode("utf-8")
        assert r.n_bytes == len(raw)
        assert r.n_compressed == len(zlib.compress(raw, 6))
        assert 0 < r.ratio < 1.5
    # and the registered (gated) shape must report every flag green
    gated = QUERIES["text_compression_ratio"].builder(spark, SF_DIR).collect()
    assert len(gated) == len(docs)
    assert all(r.comp_ok == 1 and r.ratio_ok == 1 for r in gated)


def test_compression_ratio_flags_repetition(spark):
    """Sanity on the signal itself: the most repetitive tail of the
    corpus must compress better (lower ratio) than the average doc."""
    df = compression_ratios(load_table(spark, SF_DIR, "documents"))
    lo, avg = df.agg(
        F.min("ratio"), F.avg("ratio")
    ).first()
    assert lo < avg
