"""Wave 15 (round 16, VERDICT r15 #1): the PQ codes table becomes a
per-generation artifact OWNED by the self-driving index lifecycle.

Round 15 built the IVFPQ-style ADC path (`codebook_pq_rerank_probe`)
but its codes + PQ-codebook tables were built only inside that query —
neither ``refit_and_cutover`` nor the streaming supervisor knew they
existed, so the first automatic refit would have stranded any
production ADC reader on a vacuumed generation's codes: the exact gap
class round 15 closed for the full-vector pointer path.  Round 16
folds the PQ artifacts into the generation machinery end to end:

- ``cutover_generation(with_pq=True)`` verifies the codes/pqcb tables
  and records a ``pq`` capability flag on the pointer's third line
  (same atomic rename as the kind and n_fit);
- ``refit_and_cutover`` INHERITS the flag by default and rebuilds the
  codes beside the new generation's coarse/fine/members — from the new
  members table alone (the refit self-containment property extends to
  the PQ path) — BEFORE any pointer motion;
- ``vacuum_generation`` reclaims the codes/pqcb with the generation,
  and the supervisor's startup recovery sweep keys on all five
  generation table-name patterns;
- streaming admission on a PQ generation appends the admitted members'
  codes per batch (encoded against the PERSISTED codebook, broadcast —
  never retrained), order fine -> codes -> members so the members
  append stays the protocol's commit point and the replay-repair path
  purges uncommitted batch codes alongside orphan fine rows;
- ``probe_current_generation(adc=True)`` serves the two-stage ADC
  probe through the pointer and REFUSES a generation without the flag.

``codebook_pointer_lifecycle_adc`` drives the operational sequence as
a driver-gated query: fit generation A WITH codes -> cutover (pq
flag) -> admit yesterday's batch (codes appended in the same intent
window) -> guarded refit-and-cutover to generation B (codes rebuilt,
flag inherited) -> vacuum A (five tables reclaimed) -> ADC-probe
today's batch THROUGH the pointer.  The oracle is a from-scratch
adaptive fit over the grown corpus + the wave-14 PQ program at the q3
boundary, so the driver's value hash proves: the lifecycle's ADC
reader sees exactly what one clean fit-plus-encode would serve.  The
equivalence compounds three proven identities — refitted members ==
clean-fit members (wave 13), PQ codebook == residue-class means over
that member set (a pure function of it), codes == argmin encoding of
each member against that codebook.

Scale shape: unchanged from the pinned wave-13/14 plans — the refit
is the measured members-only rebuild (282 s at 100x), the codes build
is one members-table pass per generation (amortized, measured inside
the r15 PQ probe), the per-batch codes append is O(|batch|) against a
broadcast bounded codebook, and the ADC probe reads the codes table
exchange-free on its (cell, sub) bucket spec with full vectors fetched
only for the top-rerank survivors.

Reference parity: the reference rebuilds and re-uploads its complete
job manifest on every run (`Implementation.cs:32-77`) rather than
letting derived artifacts drift from their source — the codes table is
exactly such a derived artifact, rebuilt with its generation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.plans.iterative import _kmeans_cte, _quantize
from awsbatch_mapreduce_spark.plans.registry import query
from awsbatch_mapreduce_spark.plans.wave11 import (
    _CAP,
    _index_tables,
    _mod_centroid_init,
    _persist_two_level,
    _probe_ctes,
    _split_ctes,
    _SPLIT_CTES,
)
from awsbatch_mapreduce_spark.plans.wave12 import _admit_batch, _Q3_SQL
from awsbatch_mapreduce_spark.plans.wave13 import (
    _GROWN_SRC,
    _K0_GROWN_SQL,
    cutover_generation,
    probe_current_generation,
    read_generation_cap,
    refit_and_cutover,
    vacuum_generation,
)
from awsbatch_mapreduce_spark.plans.wave14 import (
    _persist_pq_codes,
    _pq_rerank_ctes,
    _pq_tables,
)
from awsbatch_mapreduce_spark.sources.tables import load_table

# From-scratch adaptive fit over the grown corpus (the wave-13 refit
# oracle's prefix) + the wave-14 PQ two-stage program at the q3 probe
# boundary: codebook trained on the clean fit's members, every member
# encoded, ADC over codes, exact cosine on the top-rerank survivors.
_ADC_LIFECYCLE_ORACLE = (
    _kmeans_cte(
        5,
        source=_GROWN_SRC,
        cell_expr=f"CAST(vec_id % {_K0_GROWN_SQL} AS INT)",
    )
    + _SPLIT_CTES
    + _pq_rerank_ctes(_Q3_SQL)
)


@query("codebook_pointer_lifecycle_adc", oracle=_ADC_LIFECYCLE_ORACLE, wave=16)
def codebook_pointer_lifecycle_adc(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The OPERATIONAL ADC path, driver-gated (module docstring):
    fit generation A over the seen half WITH its PQ codes -> cutover
    (pointer names A, ``pq`` flag set) -> admit yesterday's batch into
    A with codes appended in the same intent window -> guarded
    ``refit_and_cutover`` into generation B (flag inherited, codes
    rebuilt from B's members before the pointer moves) -> vacuum A
    (coarse/fine/members/codes/pqcb all reclaimed) -> ADC-probe
    today's batch THROUGH the pointer
    (``probe_current_generation(adc=True)``).

    Output schema matches the probe family (vec_id, cell, sub,
    n_seen_dups, max_cos_bp, is_novel), dup counts capped at the
    rerank depth and every flagged dup exact — the wave-14 PQ probe's
    contract, now served through the generation pointer.  Oracle: a
    from-scratch fit + encode over the grown corpus, so the driver's
    value hash proves the whole operational sequence (codes-carrying
    cutover, admission-time codes append, inherited refit, vacuum)
    lands an ADC reader on exactly what one clean build would serve.

    Idempotent per run: the pointer file and both generations are
    rebuilt from scratch (the pointer is removed first so the vacuum
    refusal rule cannot trip on a stale pointer from a prior run)."""
    from awsbatch_mapreduce_spark.plans.wave5 import _scratch_dir

    emb = load_table(spark, sf_dir, "embeddings")
    b = emb.agg(
        F.min("vec_id").alias("lo"), F.max("vec_id").alias("hi")
    ).first()
    mid = (b.lo + b.hi) // 2  # oracle: (MIN + MAX) // 2, ids positive
    q3 = (mid + b.hi) // 2  # oracle: (mid + MAX) // 2

    ptr_dir = _scratch_dir("awsbatch_semdedup_ptradc", sf_dir)
    pointer = os.path.join(ptr_dir, "CURRENT_GENERATION")
    if os.path.exists(pointer):
        os.remove(pointer)  # fresh lifecycle per run

    # generation A: fit the seen half + its PQ artifacts, make it
    # current with the pq capability flag
    base_a, coarse_a, fine_a, mem_a = _index_tables(spark, sf_dir, "qla")
    _persist_two_level(
        spark,
        emb.filter(F.col("vec_id") <= F.lit(mid)),
        _mod_centroid_init,
        base_a,
        coarse_a,
        fine_a,
        mem_a,
    )
    codes_a, pqcb_a = _pq_tables(spark, sf_dir, "qla")
    _persist_pq_codes(spark, mem_a, base_a, codes_a, pqcb_a)
    cutover_generation(spark, sf_dir, pointer, "qla", with_pq=True)

    # yesterday's batch admitted into the CURRENT generation — codes
    # appended inside the same admission (the ADC candidate set stays
    # complete between refits)
    batch = emb.filter(
        (F.col("vec_id") > F.lit(mid)) & (F.col("vec_id") <= F.lit(q3))
    ).select("vec_id", _quantize(F.col("embedding")).alias("vq"))
    _admit_batch(
        spark, batch, coarse_a, fine_a, mem_a,
        codes_tbl=codes_a, pqcb_tbl=pqcb_a,
    )

    # the weekly reset: the pq flag is INHERITED — generation B gets
    # fresh codes built from its own members before the pointer moves
    old = refit_and_cutover(spark, sf_dir, pointer, "qlb")
    vacuum_generation(spark, sf_dir, pointer, old)

    # today's batch ADC-probes through the pointer only
    probe = emb.filter(F.col("vec_id") > F.lit(q3)).select(
        "vec_id", _quantize(F.col("embedding")).alias("vq")
    )
    return probe_current_generation(spark, sf_dir, pointer, probe, adc=True)


# ---------------------------------------------------------------------------
# QUALITY-TRIGGERED CAP ESCALATION (round 16, follow-on to the recall
# actuator): the nprobe step is the CHEAP recall knob (bounded probe
# constant, zero extra exchange) but it saturates — the wave-14 sweep
# measured the other axis: cap 16 -> 512 moved vec-recall 0.367 ->
# 0.996 at nprobe=1.  When a live snapshot is below the floor with
# nprobe at its max, the supervisor's next lever is a REFIT AT A
# LARGER CAP (`run_supervised_admission`: marker reason `recall`, cap
# * recall_cap_step bounded by recall_cap_max).  The cap rides the
# generation pointer as a `cap=N` token — the same atomic rename as
# the kind/n_fit/pq flag — because admission must rank-chunk at the
# cap the generation was FITTED with to preserve the <= cap bound.
# This query drives the escalated-refit arithmetic end to end against
# a from-scratch oracle at the larger cap.
# ---------------------------------------------------------------------------

# the registered fixture cap x the supervisor's default recall_cap_step
# (ADVICE r16: derived from _CAP, not hardcoded, so the query tracks the
# fixture cap and admission always rank-chunks at the fitted capacity)
_ESCALATED_CAP = _CAP * 4


def _k0_grown_sql(cap: int) -> str:
    """k0 = ceil(sqrt(ceil(n/cap))) over the grown corpus — the
    wave-13 ``_K0_GROWN_SQL`` generalized to the escalated cap."""
    return (
        f"(SELECT CAST(CEIL(SQRT(CEIL(COUNT(*) / {cap}.0))) AS BIGINT)"
        f" FROM {_GROWN_SRC} s0)"
    )


# From-scratch adaptive fit over the grown corpus AT THE ESCALATED CAP
# + the shared probe program at the q3 boundary: the escalation is "one
# clean fit at the new cap" by construction, and the driver's value
# hash checks exactly that.
_QUALITY_REFIT_ORACLE = (
    _kmeans_cte(
        5,
        source=_GROWN_SRC,
        cell_expr=f"CAST(vec_id % {_k0_grown_sql(_ESCALATED_CAP)} AS INT)",
    )
    + _split_ctes(_ESCALATED_CAP)
    + _probe_ctes(_Q3_SQL)
)


@query(
    "codebook_quality_refit_lifecycle",
    oracle=_QUALITY_REFIT_ORACLE,
    wave=16,
)
def codebook_quality_refit_lifecycle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The quality-triggered CAP-ESCALATION refit, driver-gated
    (section comment): fit generation A at cap={cap0} -> cutover (the
    pointer records ``cap={cap0}``) -> admit yesterday's batch
    rank-chunked at the GENERATION'S cap (read back from the pointer,
    the <= cap bound invariant) -> guarded ``refit_and_cutover`` at
    cap={cap1} (the escalation the supervisor performs on a
    below-floor snapshot with nprobe exhausted; the new cap rides the
    pointer's atomic rename) -> vacuum A -> probe today's batch
    through the pointer.

    Oracle: a from-scratch adaptive fit over the grown corpus AT
    cap={cap1} probed at the same boundary — the driver's value hash
    proves the escalated refit-from-members lands the index exactly
    where one clean fit at the new cap would have: the escalation is
    a metadata decision plus the refit already scheduled, never a
    corpus re-read.

    Idempotent per run: pointer + both generations rebuilt from
    scratch."""
    from awsbatch_mapreduce_spark.plans.wave5 import _scratch_dir

    emb = load_table(spark, sf_dir, "embeddings")
    b = emb.agg(
        F.min("vec_id").alias("lo"), F.max("vec_id").alias("hi")
    ).first()
    mid = (b.lo + b.hi) // 2  # oracle: (MIN + MAX) // 2, ids positive
    q3 = (mid + b.hi) // 2  # oracle: (mid + MAX) // 2

    ptr_dir = _scratch_dir("awsbatch_semdedup_ptrqr", sf_dir)
    pointer = os.path.join(ptr_dir, "CURRENT_GENERATION")
    if os.path.exists(pointer):
        os.remove(pointer)  # fresh lifecycle per run

    # generation A at the base cap, recorded on the pointer
    base_a, coarse_a, fine_a, mem_a = _index_tables(spark, sf_dir, "qra")
    _persist_two_level(
        spark,
        emb.filter(F.col("vec_id") <= F.lit(mid)),
        _mod_centroid_init,
        base_a,
        coarse_a,
        fine_a,
        mem_a,
    )
    cutover_generation(spark, sf_dir, pointer, "qra", cap=_CAP)

    # yesterday's batch, rank-chunked at the generation's OWN cap
    batch = emb.filter(
        (F.col("vec_id") > F.lit(mid)) & (F.col("vec_id") <= F.lit(q3))
    ).select("vec_id", _quantize(F.col("embedding")).alias("vq"))
    _admit_batch(
        spark, batch, coarse_a, fine_a, mem_a,
        cap=read_generation_cap(pointer),
    )

    # the quality escalation: refit at the larger cap, pointer carries
    # the new capacity through the same atomic rename
    old = refit_and_cutover(
        spark, sf_dir, pointer, "qrb", cap=_ESCALATED_CAP
    )
    vacuum_generation(spark, sf_dir, pointer, old)

    probe = emb.filter(F.col("vec_id") > F.lit(q3)).select(
        "vec_id", _quantize(F.col("embedding")).alias("vq")
    )
    return probe_current_generation(spark, sf_dir, pointer, probe)


codebook_quality_refit_lifecycle.__doc__ = (
    codebook_quality_refit_lifecycle.__doc__.format(
        cap0=_CAP, cap1=_ESCALATED_CAP
    )
)
