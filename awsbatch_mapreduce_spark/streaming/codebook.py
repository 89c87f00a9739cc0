"""Streaming semantic-novelty admission over the persisted adaptive
codebook (round 13): the real-time shape of the daily-append path.

A production ingestion pipeline at 100 TB does not batch a day and
re-run a job; new embeddings arrive continuously and each micro-batch
must be (a) checked against everything admitted so far and (b) become
part of "everything admitted so far" for the next batch.  Structured
Streaming's ``foreachBatch`` hands each micro-batch to the exact batch
operators the driver already proves:

- ``foreach_batch_codebook_probe`` — PROBE-ONLY: each micro-batch is
  quantized and pushed through ``wave11._probe_batch`` against a
  static persisted index (coarse broadcast assign, fine sort-merge
  assign, <= cap membership cosines).  Because the probe is per-row
  independent given a static index, the union of per-batch outputs is
  row-identical to the one-shot batch probe — the stream==batch pin.
  Results land partitioned by ``batch_id`` with dynamic partition
  overwrite, so an at-least-once replay of a batch rewrites its own
  partition instead of duplicating rows (idempotent sink, the
  ``foreach_batch_upsert`` discipline).

- ``foreach_batch_codebook_admit_probe`` — PROBE-THEN-ADMIT: the
  micro-batch is first probed against the index AS OF all previously
  admitted batches (a vector never matches its own batch — batch
  self-dedup is a different operator), then admitted through
  ``wave12._admit_batch`` (rank-chunked into NEW <= cap sub-cells,
  fine book + members bucket-APPENDED — the cap bound survives every
  admission by construction).  Admission mutates the index, so replay
  safety needs more than an idempotent sink: a driver-side batch-id
  WATERMARK file next to the output skips any batch id at or below
  the last admitted one (the standard exactly-once-state-over-
  at-least-once-delivery pattern; a real deployment replaces the
  marker file with the transactional commit of a table format, and
  the admission append with its MERGE).

Scale shape per micro-batch: probe cost is the measured wave-11 probe
(coarse k0-row broadcast, growing sides sort-merge off their bucket
specs, REHEARSAL_r13.jsonl: slope 0.99/decade at 100x); admission cost
is O(|batch|) (measured at ~zero against the shared probe at both
sf0.1 and 100x).  Nothing in either body collects to the driver.

Stream==batch equivalence and the compositional pin against the
driver-proven ``semdedup_codebook_adaptive`` / ``_append`` registry
queries live in ``tests/test_streaming_codebook.py``.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.plans.iterative import _quantize
from awsbatch_mapreduce_spark.plans.wave11 import _probe_batch
from awsbatch_mapreduce_spark.plans.wave12 import _admit_batch


def _write_probe_partition(res: DataFrame, out_dir: str, batch_id: int) -> None:
    """Idempotent per-batch result write: dynamic partition overwrite
    on batch_id — a replayed batch rewrites its own partition."""
    (
        res.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out_dir)
    )


def foreach_batch_codebook_probe(
    coarse_tbl: str, fine_tbl: str, mem_tbl: str, out_dir: str
) -> Callable[[DataFrame, int], None]:
    """Probe-only streaming novelty: each (vec_id, embedding)
    micro-batch is checked against a STATIC persisted two-level index;
    per-batch results land under ``out_dir/batch_id=N``."""

    def probe(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        new = batch_df.select(
            "vec_id", _quantize(F.col("embedding")).alias("vq")
        )
        res = _probe_batch(
            batch_df.sparkSession, new, coarse_tbl, fine_tbl, mem_tbl
        )
        _write_probe_partition(res, out_dir, batch_id)

    return probe


def foreach_batch_codebook_admit_probe(
    coarse_tbl: str, fine_tbl: str, mem_tbl: str, out_dir: str
) -> Callable[[DataFrame, int], None]:
    """Probe-then-admit streaming lifecycle: the micro-batch is probed
    against the index as of all PREVIOUSLY admitted batches, then
    admitted as new <= cap sub-cells.  A batch-id watermark file makes
    the index mutation replay-safe (module docstring)."""
    watermark_path = os.path.join(out_dir, "_ADMITTED_WATERMARK")

    def _watermark() -> int:
        try:
            with open(watermark_path) as fh:
                return int(fh.read().strip())
        except (OSError, ValueError):
            return -1

    def admit_probe(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _watermark():
            return  # replayed batch: index already contains it
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        new = batch_df.select(
            "vec_id", _quantize(F.col("embedding")).alias("vq")
        )
        # probe FIRST (against previously admitted only), then admit;
        # the quantized frame has two consumers and admission must see
        # the pre-admission sub offsets -> localCheckpoint inside
        # _admit_batch handles the offset snapshot, but `new` itself is
        # recomputed per consumer (cheap: one projection over the
        # micro-batch)
        res = _probe_batch(spark, new, coarse_tbl, fine_tbl, mem_tbl)
        _write_probe_partition(res, out_dir, batch_id)
        _admit_batch(spark, new, coarse_tbl, fine_tbl, mem_tbl)
        os.makedirs(out_dir, exist_ok=True)
        tmp = f"{watermark_path}.tmp"
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, watermark_path)

    return admit_probe
