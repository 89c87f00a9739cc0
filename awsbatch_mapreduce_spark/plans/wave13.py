"""Wave 13 (round 14, VERDICT r13 #1): the codebook REFIT — the last
unbuilt step of the persisted-index lifecycle.

The incremental semantic family now covers build (wave 11, adaptive
two-level fit, 100x-measured), daily append (wave 12, cap bound
preserved without refit), and continuous ingestion (round-13 streaming
admission, keep-up boundary measured).  What bounds all three is the
REFIT: appends and admissions grow the fine book by one ceil-grade
generation per batch (the round-13 load test measured 20-45x
refit-starved growth), and k0 stays sized for the corpus at FIT time —
so the per-probe coarse/fine balance k0 ~ sqrt(n/cap) drifts until a
refit recomputes it.  Until this wave that refit existed only as prose
(wave-12 module docstring); ``semdedup_codebook_refit`` executes it.

Lifecycle under test, end to end over the vec_id quarters
[build half | three append terciles | probe quarter]:

1. BUILD the adaptive two-level index over the seen half (shared
   ``wave11._persist_two_level``, mod-hash init, k0 =
   ceil(sqrt(ceil(n/cap)))).
2. APPEND three batches through ``wave12._admit_batch`` — each adds a
   GENERATION of new fine sub-cells (>= 1 per touched coarse cell even
   for tiny batches: the ceil overhead the refit exists to collapse).
3. REFIT: recompute k0 over the GROWN corpus and rebuild the three
   tables as a fresh index generation — sourced from the members table
   ALONE (``refit_from_members``).  The index is self-contained: its
   ``vq`` rows are ``_quantize(embedding)`` by construction, so the
   refit never re-reads the raw corpus (at 100 TB the raw corpus may
   be cold storage; the members table is the index's own bucketed
   parquet).  The quantized Lloyd path iterates on integers identical
   to a from-scratch fit's — proof below.
4. PROBE today's batch against the REFITTED index (shared
   ``wave11._probe_batch``).

Equivalence proof (a): the ORACLE is the from-scratch adaptive program
over the grown corpus — the identical unrolled Lloyd chain
(``iterative._kmeans_cte`` with the mod-init cell expression over
``vec_id <= q3``) + the shared split CTEs + the shared probe program
(``wave11._probe_ctes``, boundary q3).  The driver's value hash
therefore checks exactly the claim: probing the index the LIFECYCLE
produced (build -> 3 appends -> refit-from-members) equals probing a
from-scratch fit of the same corpus.  ``tests/test_wave13.py``
additionally pins the Spark-side twin (refit-from-members vs
from-scratch-from-embeddings, frame-equal) and collapse proof (b):
the refitted fine book is back at ceil(n/cap)-grade (<= ceil(n/cap) +
k0' rows — one ceil overhead per coarse cell), with the <= cap member
bound holding by construction.

Reference parity: the refit is the reference's own rhythm applied to
the index — the reference rebuilds its work manifest from scratch on
every job run (`Implementation.cs:35-47`: LoadAllDates -> jobData.json
-> re-upload) rather than patching the previous one; here the weekly
refit rebuilds the codebook generation the daily appends patched.

Scale read: the refit costs one adaptive fit over n (the wave-11
measured 100x point, 136.7 s clean) and runs weekly; the append path
it resets costs ~zero per batch (REHEARSAL_r13.jsonl).  The refit
writes a NEW generation (distinct table tag) and the probe cut over
atomically by name — no in-place mutation of tables a concurrent
probe might be reading, which is also what makes the read-own-writes
hazard of refitting FROM the members table a non-issue (the source
generation is immutable during the refit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.plans.iterative import _kmeans_cte, _quantize
from awsbatch_mapreduce_spark.plans.registry import query
from awsbatch_mapreduce_spark.plans.wave11 import (
    _CAP,
    _index_tables,
    _mod_centroid_init,
    _persist_two_level,
    _probe_batch,
    _probe_ctes,
    _SPLIT_CTES,
)
from awsbatch_mapreduce_spark.plans.wave12 import _admit_batch, _Q3_SQL
from awsbatch_mapreduce_spark.sources.tables import load_table

# The grown corpus: everything at or below the 3/4 point — the build
# half plus the three appended terciles.  Matches the Spark scalars
# (integer floor-division on positive ids) exactly.
_GROWN_SRC = f"(SELECT * FROM embeddings WHERE vec_id <= {_Q3_SQL})"

# k0 recomputed over the GROWN corpus — the same adaptive sizing rule
# as wave 11's fit, evaluated at refit time.
_K0_GROWN_SQL = (
    f"(SELECT CAST(CEIL(SQRT(CEIL(COUNT(*) / {_CAP}.0))) AS BIGINT)"
    f" FROM {_GROWN_SRC} s0)"
)

# From-scratch adaptive program over the grown corpus: THIS being the
# oracle is equivalence proof (a) — the driver hash-compares the
# lifecycle's probe output against a clean fit's (module docstring).
_REFIT_ORACLE = (
    _kmeans_cte(
        5,
        source=_GROWN_SRC,
        cell_expr=f"CAST(vec_id % {_K0_GROWN_SQL} AS INT)",
    )
    + _SPLIT_CTES
    + _probe_ctes(_Q3_SQL)
)


def refit_from_members(
    spark: SparkSession,
    src_mem_tbl: str,
    base: str,
    coarse_tbl: str,
    fine_tbl: str,
    mem_tbl: str,
) -> None:
    """Rebuild the three-table two-level index as a NEW generation from
    an existing members table alone (no raw-corpus re-read): k0 is
    recomputed from the grown member count, the quantized Lloyd fit
    runs over the members' own ``vq`` rows (``kmeans_fit`` quantized
    path — identical integers to a from-scratch fit, since ``vq`` ==
    ``_quantize(embedding)`` by construction), and the rank-chunk
    capacity split + bucket specs are the shared build's.  The source
    generation is left untouched; callers cut over by table name."""
    grown = spark.table(src_mem_tbl).select(
        F.col("seen_id").alias("vec_id"), F.col("vq_s").alias("vq")
    )
    _persist_two_level(
        spark,
        grown,
        lambda c: _mod_centroid_init(c, quantized=True),
        base,
        coarse_tbl,
        fine_tbl,
        mem_tbl,
        quantized=True,
    )


@query("semdedup_codebook_refit", oracle=_REFIT_ORACLE, wave=13)
def semdedup_codebook_refit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full index lifecycle ending in a REFIT (module docstring):
    build the adaptive codebook over the seen half, admit three append
    generations (each growing the fine book past ceil-grade), refit —
    recompute k0 = ceil(sqrt(ceil(n/cap))) over the grown corpus and
    rebuild coarse/fine/members as a fresh generation from the members
    table alone — then probe today's batch against the refitted index.

    Output: the standard codebook-probe row per probe vector (vec_id,
    coarse cell, fine sub, count of seen duplicates at cosine >= eps,
    max duplicate cosine, novelty flag).  Oracle = the from-scratch
    adaptive program over the grown corpus, so the driver's value hash
    IS the probe-equivalence proof: append generations + refit must
    land the index exactly where one clean fit would have.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    b = emb.agg(F.min("vec_id").alias("lo"), F.max("vec_id").alias("hi")).first()
    mid = (b.lo + b.hi) // 2  # oracle: (MIN + MAX) // 2, ids positive
    q3 = (mid + b.hi) // 2  # oracle: (mid + MAX) // 2

    # 1. BUILD over the seen half (pre-refit generation, kind "rfa").
    base_a, coarse_a, fine_a, mem_a = _index_tables(spark, sf_dir, "rfa")
    _persist_two_level(
        spark,
        emb.filter(F.col("vec_id") <= F.lit(mid)),
        _mod_centroid_init,
        base_a,
        coarse_a,
        fine_a,
        mem_a,
    )

    # 2. Three APPEND generations over the (mid, q3] terciles — the "N
    # appends" whose accumulated ceil overhead the refit collapses.
    # Tercile bounds are driver-side integers; the oracle never sees
    # them (a from-scratch fit is append-structure-blind, which is the
    # point of the equivalence).
    t1 = mid + (q3 - mid) // 3
    t2 = mid + (2 * (q3 - mid)) // 3
    for lo_b, hi_b in ((mid, t1), (t1, t2), (t2, q3)):
        batch = emb.filter(
            (F.col("vec_id") > F.lit(lo_b)) & (F.col("vec_id") <= F.lit(hi_b))
        ).select("vec_id", _quantize(F.col("embedding")).alias("vq"))
        _admit_batch(spark, batch, coarse_a, fine_a, mem_a)

    # 3. REFIT from the grown members table into a new generation.
    base_r, coarse_r, fine_r, mem_r = _index_tables(spark, sf_dir, "rft")
    refit_from_members(spark, mem_a, base_r, coarse_r, fine_r, mem_r)

    # 4. PROBE today's batch against the refitted index.
    probe = emb.filter(F.col("vec_id") > F.lit(q3)).select(
        "vec_id", _quantize(F.col("embedding")).alias("vq")
    )
    return _probe_batch(spark, probe, coarse_r, fine_r, mem_r)
