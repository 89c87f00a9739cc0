"""Stream==batch pins for the streaming codebook admission operators
(`streaming/codebook.py`).

The streaming path must be the registered batch semantics, micro-batch
by micro-batch:

- probe-only stream over N chunks == ONE batch probe of their union
  (per-row independence given a static index);
- probe-then-admit stream == the two driver-proven registry queries,
  compositionally: batch-0 rows equal `semdedup_codebook_adaptive`'s
  output restricted to the first chunk's ids (probe against the build
  only), batch-1 rows equal `semdedup_codebook_adaptive_append`'s
  output verbatim (probe against build + first chunk admitted);
- both sinks replay-safe: the probe partition rewrites itself, the
  admission watermark makes a replayed admit a no-op.
"""

from __future__ import annotations

import time as _time

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.plans import QUERIES
from awsbatch_mapreduce_spark.plans.iterative import _quantize
from awsbatch_mapreduce_spark.plans.wave11 import (
    _index_tables,
    _mod_centroid_init,
    _persist_two_level,
    _probe_batch,
)
from awsbatch_mapreduce_spark.sources.tables import load_table
from awsbatch_mapreduce_spark.streaming.codebook import (
    foreach_batch_codebook_admit_probe,
    foreach_batch_codebook_probe,
)
from tests.conftest import SF_DIR


def _bounds(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    b = emb.agg(F.min("vec_id").alias("lo"), F.max("vec_id").alias("hi")).first()
    mid = (b.lo + b.hi) // 2
    return emb, mid, (mid + b.hi) // 2


def _build_index(spark, kind: str):
    emb, mid, q3 = _bounds(spark)
    base, coarse, fine, mem = _index_tables(spark, SF_DIR, kind)
    _persist_two_level(
        spark,
        emb.filter(F.col("vec_id") <= F.lit(mid)),
        _mod_centroid_init,
        base,
        coarse,
        fine,
        mem,
    )
    return emb, mid, q3, coarse, fine, mem


@pytest.fixture(scope="module")
def emb_chunks(spark, tmp_path_factory):
    """The new half split at q3 into two parquet chunk files with
    increasing mtimes (the file source processes files in
    modification-time order), so maxFilesPerTrigger=1 yields
    batch 0 = (mid, q3], batch 1 = (q3, hi]."""
    _, mid, q3 = _bounds(spark)
    out = tmp_path_factory.mktemp("emb_stream")
    table = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    import pyarrow.compute as pc

    vid = table.column("vec_id")
    chunk1 = table.filter(
        pc.and_(pc.greater(vid, mid), pc.less_equal(vid, q3))
    )
    chunk2 = table.filter(pc.greater(vid, q3))
    pq.write_table(chunk1, str(out / "chunk-0.parquet"))
    _time.sleep(1.1)
    pq.write_table(chunk2, str(out / "chunk-1.parquet"))
    return str(out)


def _drain(spark, chunks_dir, fn, ckpt):
    emb_schema = load_table(spark, SF_DIR, "embeddings").schema
    q = (
        spark.readStream.schema(emb_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(chunks_dir)
        .writeStream.foreachBatch(fn)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)


def _rows(df, drop=("batch_id",)):
    cols = [c for c in sorted(df.columns) if c not in drop]
    return sorted(map(tuple, df.select(*cols).collect()))


def test_stream_probe_equals_batch_probe(spark, emb_chunks, tmp_path):
    """Probe-only: union of per-micro-batch probes == one batch probe
    of the whole new half against the same static index."""
    emb, mid, _, coarse, fine, mem = _build_index(spark, "strm")
    out = str(tmp_path / "probe_out")
    _drain(
        spark,
        emb_chunks,
        foreach_batch_codebook_probe(coarse, fine, mem, out),
        str(tmp_path / "ckpt"),
    )
    got = spark.read.parquet(out)
    # both micro-batches actually fired
    assert got.select("batch_id").distinct().count() == 2
    new = emb.filter(F.col("vec_id") > F.lit(mid)).select(
        "vec_id", _quantize(F.col("embedding")).alias("vq")
    )
    want = _probe_batch(spark, new, coarse, fine, mem)
    assert _rows(got) == _rows(want)


def test_stream_probe_replay_is_idempotent(spark, emb_chunks, tmp_path):
    """Re-invoking the probe on a replayed micro-batch rewrites its own
    batch_id partition instead of duplicating rows."""
    emb, mid, q3, coarse, fine, mem = _build_index(spark, "strm")
    out = str(tmp_path / "probe_out")
    fn = foreach_batch_codebook_probe(coarse, fine, mem, out)
    batch1 = emb.filter(
        (F.col("vec_id") > F.lit(mid)) & (F.col("vec_id") <= F.lit(q3))
    ).select("vec_id", "embedding")
    fn(batch1, 0)
    once = _rows(spark.read.parquet(out), drop=())
    fn(batch1, 0)  # at-least-once redelivery
    assert _rows(spark.read.parquet(out), drop=()) == once and once


def test_admit_probe_matches_registered_queries(spark, emb_chunks, tmp_path):
    """The compositional pin: the probe-then-admit stream's batch-0
    output equals the driver-proven adaptive query restricted to the
    first chunk (probe vs build only), and its batch-1 output equals
    the driver-proven append query verbatim (probe vs build + chunk-0
    admitted).  Builds are deterministic (same seen half, same mod
    init, integer arithmetic), so cross-kind comparison is exact."""
    _, mid, q3, coarse, fine, mem = _build_index(spark, "strm2")
    out = str(tmp_path / "admit_out")
    _drain(
        spark,
        emb_chunks,
        foreach_batch_codebook_admit_probe(coarse, fine, mem, out),
        str(tmp_path / "ckpt"),
    )
    got = spark.read.parquet(out)
    got0 = got.filter(F.col("batch_id") == 0)
    got1 = got.filter(F.col("batch_id") == 1)
    ada = QUERIES["semdedup_codebook_adaptive"].builder(spark, SF_DIR)
    assert _rows(got0) == _rows(ada.filter(F.col("vec_id") <= F.lit(q3)))
    app = QUERIES["semdedup_codebook_adaptive_append"].builder(spark, SF_DIR)
    assert _rows(got1) == _rows(app)
    assert got0.count() > 0 and got1.count() > 0


def test_double_admission_offsets_compose(spark, tmp_path):
    """Two sequential admissions (the multi-day path): the SECOND
    batch's sub offsets must clear the subs the FIRST admission added,
    not just the build's — per coarse cell the three generations'
    sub ranges are pairwise disjoint and the <= cap bound holds on the
    twice-grown members table."""
    from awsbatch_mapreduce_spark.plans.wave11 import _CAP
    from awsbatch_mapreduce_spark.plans.wave12 import _admit_batch

    emb, mid, q3, coarse, fine, mem = _build_index(spark, "strm3")
    hi = emb.agg(F.max("vec_id")).first()[0]
    q7 = (q3 + hi) // 2
    def _q(lo_ex, hi_in):
        return emb.filter(
            (F.col("vec_id") > F.lit(lo_ex)) & (F.col("vec_id") <= F.lit(hi_in))
        ).select("vec_id", _quantize(F.col("embedding")).alias("vq"))

    _admit_batch(spark, _q(mid, q3), coarse, fine, mem)
    _admit_batch(spark, _q(q3, q7), coarse, fine, mem)
    m = spark.table(mem)
    per_cell = m.groupBy("cell", "sub").count().agg(F.max("count")).first()[0]
    assert per_cell <= _CAP, f"cap broken after double admission: {per_cell}"
    gens = (
        m.withColumn(
            "gen",
            F.when(F.col("seen_id") <= F.lit(mid), 0)
            .when(F.col("seen_id") <= F.lit(q3), 1)
            .otherwise(2),
        )
        .groupBy("cell", "gen")
        .agg(F.min("sub").alias("lo"), F.max("sub").alias("hi"))
    )
    rows = gens.collect()
    by_cell: dict = {}
    for r in rows:
        by_cell.setdefault(r["cell"], {})[r["gen"]] = (r["lo"], r["hi"])
    saw_three = 0
    for cell, g in by_cell.items():
        spans = [g[k] for k in sorted(g)]
        for a, b in zip(spans, spans[1:]):
            assert a[1] < b[0], (cell, g)  # strictly increasing ranges
        if len(g) == 3:
            saw_three += 1
    assert saw_three > 0, "no cell received both admissions on the fixture"
    # fine book grew consistently with the grown members
    fine_rows = spark.table(fine).select("cell", "sub").distinct().count()
    assert fine_rows == m.select("cell", "sub").distinct().count()


def test_admit_replay_skipped_by_watermark(spark, emb_chunks, tmp_path):
    """Admission mutates the index, so a replayed batch id must be a
    no-op: the members table must not grow on the second call."""
    emb, mid, q3, coarse, fine, mem = _build_index(spark, "strm")
    out = str(tmp_path / "admit_out")
    fn = foreach_batch_codebook_admit_probe(coarse, fine, mem, out)
    batch1 = emb.filter(
        (F.col("vec_id") > F.lit(mid)) & (F.col("vec_id") <= F.lit(q3))
    ).select("vec_id", "embedding")
    fn(batch1, 0)
    n_once = spark.table(mem).count()
    results_once = _rows(spark.read.parquet(out), drop=())
    fn(batch1, 0)  # redelivered micro-batch
    assert spark.table(mem).count() == n_once
    assert _rows(spark.read.parquet(out), drop=()) == results_once
