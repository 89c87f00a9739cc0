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
  admission by construction).  Admission mutates the index across TWO
  table-append job commits, so replay safety needs more than an
  idempotent sink.  The round-13 watermark file alone left a crash
  window between the appends and the watermark write (ADVICE r13): a
  replay of that window would probe an index already containing the
  batch and re-admit it.  Round 14 closes the window with an
  INTENT/WATERMARK pair around the admission:

      probe -> write probe partition -> write INTENT(batch_id)
            -> append fine -> append members
            -> write WATERMARK(batch_id) -> clear INTENT

  Both markers are atomic renames.  On entry, ``batch_id <=
  watermark`` is a committed replay (no-op), and a live INTENT for the
  incoming batch id means a previous attempt crashed INSIDE the
  admission window — the handler then repairs before proceeding,
  ALL-OR-REPAIR (a FileOutputCommitter job commit is a sequence of
  renames, not one atomic step, so a crash mid-commitJob can leave a
  PARTIALLY visible members append — ADVICE r14): if ALL of the
  batch's rows are in the members table the admission had fully
  committed (the members append is the protocol's commit point), so
  the watermark fast-forwards and the batch is skipped; if SOME are
  (mid-commit crash) the partial member rows are purged first; then
  the orphaned fine rows (fine cells with no member rows — build and
  admission keep the two tables 1:1 by construction) are dropped,
  restoring the pre-admission state before the normal probe + admit
  re-runs.  Both repairs rewrite via a crash-safe sibling-directory
  swap (``_swap_rewrite``): the live table stays intact until the
  swap, and the one window between the two renames fails LOUDLY
  (missing table location) rather than silently exposing a truncated
  table.  Every crash position therefore replays to the clean-run
  state or a loud error (test-pinned per window in
  ``tests/test_streaming_codebook.py``).  A real deployment replaces
  the marker files with a table format's transactional commit and the
  two appends with one MERGE; the protocol here is what plain-parquet
  tables can guarantee, stated exactly.

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


def foreach_batch_codebook_probe_current(
    sf_dir: str, pointer_path: str, out_dir: str, adc: bool = False
) -> Callable[[DataFrame, int], None]:
    """Probe-only streaming novelty against WHATEVER index generation
    the pointer names — the zero-downtime reader side of the wave-13
    refit/cutover loop.  The pointer is re-resolved at each micro-batch
    boundary, so a `cutover_generation` landing mid-stream takes effect
    on the NEXT batch with no stream restart, and each individual batch
    probes exactly one generation (`probe_current_generation` resolves
    once at plan-build time; the superseded generation stays immutable
    until vacuumed, so a batch in flight during the cutover still reads
    a complete index).  Same idempotent batch-id-partitioned sink as
    the static-index probe; a replayed batch re-resolves the pointer,
    so after a cutover its rewritten partition reflects the CURRENT
    generation — the at-least-once contract is "probed against the
    admitted corpus", which both generations of one refit satisfy (the
    refit is probe-equivalent by the wave-13 oracle proof).

    ``adc=True`` (round 16) serves each micro-batch through the
    generation's IVFPQ path instead (``probe_current_generation(adc=
    True)``: ADC over the bucketed codes, exact cosine on the
    top-rerank survivors), refusing loudly at the batch boundary if
    the pointer's generation carries no ``pq`` flag; because the
    pointer is re-resolved per batch, a cutover that dropped the flag
    surfaces as a failed batch, never a silent fallback to the
    full-vector membership join."""

    def probe(batch_df: DataFrame, batch_id: int) -> None:
        from awsbatch_mapreduce_spark.plans.wave13 import (
            probe_current_generation,
        )

        if batch_df.isEmpty():
            return
        new = batch_df.select(
            "vec_id", _quantize(F.col("embedding")).alias("vq")
        )
        res = probe_current_generation(
            batch_df.sparkSession, sf_dir, pointer_path, new, adc=adc
        )
        _write_probe_partition(res, out_dir, batch_id)

    return probe


# Admission sizing rule (round 14, SCALING.md): per-micro-batch cost
# on the measured local[32] host fits batch_sec ~ FLOOR + rows/MARGINAL
# with <7% residuals across 30k-570k-row batches; the fixed floor is
# per-batch planning/scheduling (~30 small jobs per admission) and does
# not shrink with batch size, so the TRIGGER INTERVAL is the valve: a
# 5 s trigger can never reach steady state (floor > trigger), while the
# rule's 30 s ceiling (20.0k vec/s predicted) measured 19.8k vec/s.
# Marginal cost inflates with refit-starved index growth (2.5x at 46x
# growth) — wave 13's refit_from_members is the reset.
_BATCH_FLOOR_SEC = 6.0
_MARGINAL_VEC_PER_SEC = 25_000


def admission_max_rate(
    trigger_secs: float,
    floor_sec: float = _BATCH_FLOOR_SEC,
    marginal_vec_per_sec: float = _MARGINAL_VEC_PER_SEC,
) -> float:
    """Max sustainable ingestion rate (vec/s) for a trigger interval
    under the measured per-batch cost model: each trigger of T seconds
    must process rate*T vectors in <= T, so
    ``rate <= (T - floor)/T * marginal``.  Returns 0.0 when the floor
    alone exceeds the trigger (no steady state exists).  Host-specific
    constants default to the round-14 local[32] fit; re-fit them from
    ``scripts/codebook_stream_throughput.py``'s batches_rows_ms pairs
    for a different host or index size."""
    if trigger_secs <= floor_sec:
        return 0.0
    return (trigger_secs - floor_sec) / trigger_secs * marginal_vec_per_sec


def min_trigger_secs(
    rate_vec_per_sec: float,
    floor_sec: float = _BATCH_FLOOR_SEC,
    marginal_vec_per_sec: float = _MARGINAL_VEC_PER_SEC,
) -> float:
    """Inverse of ``admission_max_rate``: the smallest trigger interval
    that sustains ``rate_vec_per_sec``.  Raises ValueError at or past
    the marginal-throughput asymptote (no trigger can help there —
    that regime needs a faster host, a smaller index, or a refit)."""
    if rate_vec_per_sec >= marginal_vec_per_sec:
        raise ValueError(
            f"rate {rate_vec_per_sec} >= marginal throughput"
            f" {marginal_vec_per_sec} vec/s: unreachable at any trigger"
        )
    return floor_sec / (1.0 - rate_vec_per_sec / marginal_vec_per_sec)


def refit_due(
    n_now: int, n_fit: int, tolerated_inflation: float = 2.0
) -> bool:
    """The refit CADENCE rule (round 14, measured by
    ``scripts/codebook_refit_reset.py``): the sizing rule's marginal
    constant holds for a RECENTLY-REFIT index; under continued
    admission the probe's fine-argmin degree is subs-per-coarse-cell
    ~ n/(k0*cap), and with k0 frozen at its fit-time value
    sqrt(n_fit/cap) the degree — and with it the per-vector marginal
    cost — scales like n_now/n_fit.  (Measured: ~21x marginal at 67x
    refit-starved growth, back to ~1x after the refit.)  So the refit
    is due when the corpus has grown past the tolerated inflation
    factor since the current generation was fitted:

        refit_due  <=>  n_now / n_fit > tolerated_inflation

    At a sustained admission rate R that means one refit every
    n_fit * (tolerated_inflation - 1) / R seconds — for the measured
    38 s refit at 71k members this prices well under one trigger
    interval of amortized cost per day at any rate the trigger rule
    admits.  ``n_fit`` is the members count at the last refit (the
    generation pointer's fit-time size); callers that track only the
    live members table can snapshot it at cutover."""
    if n_fit <= 0:
        raise ValueError(f"n_fit must be positive, got {n_fit}")
    if tolerated_inflation < 1.0:
        raise ValueError(
            f"tolerated_inflation must be >= 1.0, got {tolerated_inflation}"
        )
    return n_now / n_fit > tolerated_inflation


def recommend_nprobe(
    vec_recall_bp: int,
    current_nprobe: int,
    floor_bp: int,
    max_nprobe: int = 4,
) -> int:
    """The recall ACTUATOR (round 16, VERDICT r15 #3): turn a live
    recall snapshot into a knob step.  The supervisor measures
    per-generation vec-recall on live traffic (`_recall_snapshot`) and
    the offline sweep prices the surface (`wave14`: ~+19 pts vec-recall
    per nprobe step at production caps, at a bounded ~1x-per-step probe
    constant and ZERO extra exchange); this rule connects them: a
    snapshot below ``floor_bp`` recommends one nprobe step, capped at
    ``max_nprobe`` (the sweep's measured range — beyond it the next
    lever is a cap re-fit, which the cadence rule already owns).  One
    step per snapshot, not a jump to max: each generation's snapshot
    re-measures before the next step, so the knob converges on the
    cheapest setting that clears the floor instead of overshooting to
    the most expensive one.  ``floor_bp <= 0`` disarms the actuator
    (measurement-only, the round-15 behavior)."""
    if floor_bp <= 0:
        return current_nprobe
    if vec_recall_bp < floor_bp and current_nprobe < max_nprobe:
        return current_nprobe + 1
    return current_nprobe


def _read_marker(path: str) -> int:
    try:
        with open(path) as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        return -1


def _write_marker(path: str, batch_id: int) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp"
    with open(tmp, "w") as fh:
        fh.write(str(batch_id))
    os.replace(tmp, path)


def _batch_admitted_count(spark, new: DataFrame, mem_tbl: str) -> int:
    """How many of the batch's rows the members table holds.  A members
    append is normally one atomic FileOutputCommitter job commit, but
    that commit is itself a SEQUENCE of renames — a crash mid-commitJob
    leaves a PARTIALLY visible append (ADVICE r14), so the repair path
    must distinguish all (committed), none (only the fine append can
    have landed), and partial (mid-commit crash) instead of treating
    any visible row as proof of commit."""
    ids = new.select(F.col("vec_id").alias("seen_id"))
    return (
        spark.table(mem_tbl)
        .join(F.broadcast(ids), "seen_id", "semi")
        .count()
    )


def _table_location(spark, tbl: str) -> str:
    loc = (
        spark.sql(f"DESC EXTENDED {tbl}")
        .filter(F.col("col_name") == "Location")
        .first()["data_type"]
    )
    return loc.removeprefix("file:")


def _complete_pending_swap(spark, tbl: str) -> None:
    """Finish (or loudly refuse past) a ``_swap_rewrite`` that crashed
    between its two renames.  ADVICE r15: Spark's InMemoryFileIndex
    tolerates a missing root path and returns an EMPTY scan for a
    catalog table, so the mid-swap window is not self-announcing — a
    replay that reads the members table as empty would misclassify
    "nothing landed", rewrite the fine book to empty, and silently
    truncate the index.  The window is, however, always COMPLETABLE:
    the sibling ``__repair`` dir was fully written (its saveAsTable
    committed) before the first rename ran, so if the live location is
    missing and ``__repair`` exists, the second rename is simply
    re-issued.  A missing location with NO repair sibling is real
    corruption — raise rather than let an empty scan masquerade as an
    empty table.  Idempotent; called before every read-dependent
    repair decision and at ``_swap_rewrite`` entry (so a pending swap
    is never swept as a stale leftover)."""
    import shutil

    location = _table_location(spark, tbl)
    if os.path.isdir(location):
        return
    repair_loc, old_loc = f"{location}__repair", f"{location}__old"
    if not os.path.isdir(repair_loc):
        raise RuntimeError(
            f"table {tbl!r} location {location!r} is missing and no"
            " __repair sibling exists to complete the swap — refusing"
            " to read what Spark would surface as an empty table"
        )
    os.rename(repair_loc, location)
    shutil.rmtree(old_loc, ignore_errors=True)
    spark.catalog.refreshTable(tbl)


def _swap_rewrite(
    spark,
    tbl: str,
    kept: DataFrame,
    bucket_cols: list[str] | None,
    sort_cols: tuple[str, ...] = ("cell", "sub"),
    n_buckets: int = 8,
) -> None:
    """Crash-safe rewrite of a bucketed external table with the kept
    rows: write them to a SIBLING directory, then swap directories with
    two renames (ADVICE r14 — a bare ``mode('overwrite')`` deletes the
    live files before the rewrite commits, so a crash mid-overwrite
    loses the whole table and the next replay silently proceeds against
    the truncated remainder).  Crash positions here: before the first
    rename the live table is untouched (the replay simply redoes the
    repair); between the two renames the table's location is MISSING —
    and because Spark reads a missing location as an EMPTY table rather
    than an error (ADVICE r15), every repair entry point first runs
    ``_complete_pending_swap``, which re-issues the second rename from
    the fully-written ``__repair`` sibling; after the second rename the
    repair is complete and the stale ``__old`` dir is swept on the next
    entry."""
    import shutil

    _complete_pending_swap(spark, tbl)
    location = _table_location(spark, tbl)
    repair_loc, old_loc = f"{location}__repair", f"{location}__old"
    # sweep leftovers of a previously crashed/completed repair
    shutil.rmtree(repair_loc, ignore_errors=True)
    shutil.rmtree(old_loc, ignore_errors=True)
    tmp_tbl = f"{tbl}__rp"
    spark.sql(f"DROP TABLE IF EXISTS {tmp_tbl}")
    # ``bucket_cols=None`` rewrites an UNBUCKETED table (round 18: the
    # tombstone set and the LSH band index reuse this protocol);
    # ``sort_cols`` parameterizes the bucketed layout's sort key (the
    # codebook tables sort on (cell, sub), the band index on bk)
    writer = kept.write
    if bucket_cols:
        writer = writer.bucketBy(n_buckets, *bucket_cols).sortBy(*sort_cols)
    (
        writer.option("path", repair_loc)
        .mode("overwrite")
        .saveAsTable(tmp_tbl)
    )
    spark.sql(f"DROP TABLE {tmp_tbl}")  # external: files stay in place
    os.rename(location, old_loc)
    os.rename(repair_loc, location)  # same bucket spec, same file layout
    shutil.rmtree(old_loc, ignore_errors=True)
    spark.catalog.refreshTable(tbl)


def _drop_orphan_fine(spark, fine_tbl: str, mem_tbl: str) -> None:
    """Repair a crash between the fine and members appends: drop fine
    rows whose (cell, sub) has no member rows.  Build and admission
    keep fine<->members 1:1 per (cell, sub) by construction, so an
    orphaned fine cell can only be the fine half of an uncommitted
    admission.  Rewrites the fine book (same bucket spec, crash-safe
    sibling-swap — ``_swap_rewrite``) only when an orphan actually
    exists — the zero-orphan probe is one semi-join over the k0-bounded
    book, and the rewrite runs only on the rare crash-replay path."""
    fine = spark.table(fine_tbl)
    keys = spark.table(mem_tbl).select("cell", "sub").distinct()
    kept = fine.join(keys, ["cell", "sub"], "semi").localCheckpoint()
    if kept.count() == fine.count():
        return
    _swap_rewrite(spark, fine_tbl, kept, ["cell"])


def _drop_partial_members(spark, new: DataFrame, mem_tbl: str) -> None:
    """Repair a crash INSIDE the members append's job commit (the
    mid-commitJob window — ADVICE r14): some but not all of the batch's
    member rows are visible.  Drop every member row belonging to the
    batch (anti-join on the batch's bounded id set), restoring the
    members table to its pre-admission state via the same crash-safe
    sibling-swap as the fine repair.  Corpus-sized rewrite — acceptable
    because it runs only on the mid-commit-crash replay path, which a
    table format's transactional commit removes entirely."""
    ids = new.select(F.col("vec_id").alias("seen_id"))
    kept = (
        spark.table(mem_tbl)
        .join(F.broadcast(ids), "seen_id", "anti")
        .localCheckpoint()
    )
    _swap_rewrite(spark, mem_tbl, kept, ["cell", "sub"])


def _drop_batch_codes(spark, new: DataFrame, codes_tbl: str) -> None:
    """Repair the codes half of an uncommitted admission (round 16):
    drop every codes row belonging to the batch (anti-join on the
    batch's bounded id set, crash-safe sibling-swap).  The codes append
    runs BETWEEN the fine and members appends, so on any replay where
    the members append did not fully commit the batch's codes rows —
    none, partial, or all of them — are uncommitted and must go before
    the re-admission re-encodes them.  The zero-row probe is one
    bounded semi-join; the rewrite runs only when batch codes actually
    landed."""
    ids = new.select(F.col("vec_id").alias("seen_id"))
    codes = spark.table(codes_tbl)
    n_in = codes.join(F.broadcast(ids), "seen_id", "semi").count()
    if n_in == 0:
        return
    kept = codes.join(F.broadcast(ids), "seen_id", "anti").localCheckpoint()
    _swap_rewrite(spark, codes_tbl, kept, ["cell", "sub"])


def foreach_batch_codebook_admit_probe(
    coarse_tbl: str,
    fine_tbl: str,
    mem_tbl: str,
    out_dir: str,
    codes_tbl: str | None = None,
    pqcb_tbl: str | None = None,
    cap: int | None = None,
    pointer_path: str | None = None,
    tombs_tbl: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """Probe-then-admit streaming lifecycle: the micro-batch is probed
    against the index as of all PREVIOUSLY admitted batches, then
    admitted as new <= cap sub-cells.  The intent/watermark marker
    pair + the repair path make the two-append index mutation
    replay-safe for a crash at ANY point (module docstring).

    ``codes_tbl``/``pqcb_tbl`` (round 16): bind the admission to a
    PQ-carrying generation — admitted members are additionally encoded
    against the generation's persisted PQ codebook and their codes
    bucket-appended (order fine -> codes -> members; the members append
    stays the commit point), and the replay-repair path purges the
    batch's uncommitted codes rows alongside the orphan fine rows.
    ``cap`` binds the admission's rank-chunking to the GENERATION'S
    fine-cell capacity (round 16: the quality-triggered refit escalates
    it); None keeps the registered fixture default.

    ``pointer_path`` (round 17, VERDICT r16 #1): when given, each
    batch's NOVELTY PROBE runs at the pointer's current ``nprobe=N``
    token (re-read per batch, like the pointer-following readers) —
    the admission-time probe was the last serving surface stuck at
    nprobe=1 after the actuator stepped the knob.  The ADMISSION
    arithmetic is nprobe-independent (rank-chunking reads only the
    coarse assignment); only the reported novelty verdicts widen."""
    from awsbatch_mapreduce_spark.plans.wave11 import _CAP

    if cap is None:
        cap = _CAP
    watermark_path = os.path.join(out_dir, "_ADMITTED_WATERMARK")
    intent_path = os.path.join(out_dir, "_ADMIT_INTENT")

    def admit_probe(batch_df: DataFrame, batch_id: int) -> int:
        # returns the number of rows THIS call admitted (0 for a
        # replay no-op / empty batch / repair fast-forward), so the
        # supervisor's running cadence counter never re-counts the
        # micro-batch source (VERDICT r16 hygiene #3)
        wm = _read_marker(watermark_path)
        if batch_id <= wm:
            return 0  # committed replay: index already contains it
        intent = _read_marker(intent_path)
        if -1 < intent <= wm:
            # stale intent of a batch whose watermark DID land (crash
            # between the watermark write and the intent clear)
            os.remove(intent_path)
            intent = -1
        if intent != -1 and intent != batch_id:
            # an uncommitted admission of a DIFFERENT batch is pending;
            # the checkpoint contract redelivers that batch first, so
            # this means the checkpoint and the index dir disagree —
            # refuse rather than risk double-admission
            raise RuntimeError(
                f"admission intent for batch {intent} is pending but the"
                f" stream delivered batch {batch_id}; the checkpoint does"
                f" not match the index state under {out_dir!r} — repair"
                " manually (restore the matching checkpoint, or drop the"
                " orphaned fine rows and the intent marker)"
            )
        if batch_df.isEmpty():
            return 0
        spark = batch_df.sparkSession
        new = batch_df.select(
            "vec_id", _quantize(F.col("embedding")).alias("vq")
        )
        if intent == batch_id:
            # a previous attempt crashed inside the admission window.
            # Before ANY read-dependent repair decision, complete a
            # swap the previous repair may itself have crashed inside
            # (ADVICE r15: a missing table root reads as EMPTY, which
            # would turn n_in==0 into a silent index truncation).
            _complete_pending_swap(spark, mem_tbl)
            _complete_pending_swap(spark, fine_tbl)
            if codes_tbl is not None:
                _complete_pending_swap(spark, codes_tbl)
            # All-or-repair (ADVICE r14): the members append commits via
            # a sequence of renames, so a mid-commitJob crash leaves a
            # PARTIAL append — only a complete id set proves commit.
            n_in = _batch_admitted_count(spark, new, mem_tbl)
            if n_in == new.count():
                # both appends fully committed (and the codes append,
                # which precedes the members commit point); only the
                # watermark is missing (the probe partition committed
                # before the intent did) — fast-forward and skip
                _write_marker(watermark_path, batch_id)
                os.remove(intent_path)
                return 0
            if n_in > 0:
                # mid-commit crash: purge the partial member rows first
                _drop_partial_members(spark, new, mem_tbl)
            if codes_tbl is not None:
                # the batch's codes rows (none/partial/all may have
                # landed before the members crash) are uncommitted
                _drop_batch_codes(spark, new, codes_tbl)
            # at most the fine append landed: restore pre-admission
            # state, then fall through to the normal path
            _drop_orphan_fine(spark, fine_tbl, mem_tbl)
        # probe FIRST (against previously admitted only), then admit;
        # the quantized frame has two consumers and admission must see
        # the pre-admission sub offsets -> localCheckpoint inside
        # _admit_batch handles the offset snapshot, but `new` itself is
        # recomputed per consumer (cheap: one projection over the
        # micro-batch)
        np_ = 1
        if pointer_path is not None:
            from awsbatch_mapreduce_spark.plans.wave13 import (
                read_generation_nprobe,
            )

            np_ = read_generation_nprobe(pointer_path)
        # the NOVELTY PROBE serves the live member set (round 18):
        # tombstoned members must stop matching at the admission
        # surface too.  The ADMISSION below keeps the raw mem_tbl —
        # sub-cell offsets are physical-row accounting and deleted
        # members still occupy their slots until the next refit.
        probe_mem = mem_tbl
        if tombs_tbl is not None:
            from awsbatch_mapreduce_spark.plans.wave17 import _live_view

            probe_mem = _live_view(
                spark, mem_tbl, tombs_tbl, "live",
                pointer_path=pointer_path,
            )
        if np_ == 1:
            res = _probe_batch(spark, new, coarse_tbl, fine_tbl, probe_mem)
        else:
            from awsbatch_mapreduce_spark.plans.wave13 import (
                _multiprobe_batch,
            )

            res = _multiprobe_batch(
                spark, new, coarse_tbl, fine_tbl, probe_mem, nprobe=np_
            )
        _write_probe_partition(res, out_dir, batch_id)
        _write_marker(intent_path, batch_id)  # admission window opens
        n_admitted = _admit_batch(
            spark, new, coarse_tbl, fine_tbl, mem_tbl,
            codes_tbl=codes_tbl, pqcb_tbl=pqcb_tbl, cap=cap,
        )
        _write_marker(watermark_path, batch_id)  # admission committed
        os.remove(intent_path)
        return n_admitted

    return admit_probe
