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

import contextlib as _contextlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.plans.hints import never_broadcast
from awsbatch_mapreduce_spark.plans.iterative import (
    _kmeans_cte,
    _quantize,
    _sq_dist_fp,
    assign_topk_cells_collected,
)
from awsbatch_mapreduce_spark.plans.registry import query
from awsbatch_mapreduce_spark.plans.wave9 import _NO_PEER_BP, _SEMDEDUP_EPS_BP
from awsbatch_mapreduce_spark.plans.wave11 import (
    _CAP,
    _index_tables,
    _K0_SQL,
    _MID_BOUNDARY,
    _mod_centroid_init,
    _persist_two_level,
    _probe_batch,
    _probe_ctes,
    _SEEN_SRC,
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
    cap: int = _CAP,
    tombs_tbl: str | None = None,
) -> None:
    """Rebuild the three-table two-level index as a NEW generation from
    an existing members table alone (no raw-corpus re-read): k0 is
    recomputed from the grown member count, the quantized Lloyd fit
    runs over the members' own ``vq`` rows (``kmeans_fit`` quantized
    path — identical integers to a from-scratch fit, since ``vq`` ==
    ``_quantize(embedding)`` by construction), and the rank-chunk
    capacity split + bucket specs are the shared build's.  The source
    generation is left untouched; callers cut over by table name.
    ``cap`` (round 16): the NEW generation's fine-cell capacity — the
    quality-triggered refit escalates it (the recall knob the wave-14
    sweep priced: cap 16 -> 512 moved vec-recall 0.37 -> 0.996 at
    nprobe=1), and since the fit reads only (vec_id, vq) the
    escalation costs nothing beyond the refit already running."""
    src = spark.table(src_mem_tbl)
    if tombs_tbl is not None and spark.catalog.tableExists(tombs_tbl):
        # DELETION becomes structural here (round 18): tombstoned
        # members are excluded from the new generation's fit — k0 and
        # every centroid are computed as if they never existed.  The
        # anti-join broadcasts the bounded tombstone set; the members
        # scan keeps its distribution.
        src = src.join(
            F.broadcast(spark.table(tombs_tbl)), "seen_id", "left_anti"
        )
    grown = src.select(
        F.col("seen_id").alias("vec_id"), F.col("vq_s").alias("vq")
    )
    _persist_two_level(
        spark,
        grown,
        lambda c: _mod_centroid_init(c, quantized=True, cap=cap),
        base,
        coarse_tbl,
        fine_tbl,
        mem_tbl,
        quantized=True,
        cap=cap,
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


# ---------------------------------------------------------------------------
# MULTI-PROBE (nprobe=2): the production recall knob of every IVF-shaped
# index (FAISS `nprobe`), applied to the adaptive two-level codebook.
# The single-probe novelty check misses duplicates that straddle a
# coarse-cell boundary (the wave-11 module docstring's measured recall
# cost); probing the TWO nearest coarse cells checks the union of two
# fine cells' members instead of one, trading a bounded 2x probe
# constant (2*k0 coarse distances evaluate anyway; + a second fine
# argmin + <= cap extra membership cosines) for the boundary recall.
# The asymptotic shape is unchanged: O(nprobe * sqrt(n/cap) * d) per
# vector with nprobe fixed at 2.
# ---------------------------------------------------------------------------

_NPROBE = 2

# The nprobe=2 probe program over the shared fitted-index CTEs
# (q/c5/mfin/fc from _kmeans_cte + _SPLIT_CTES): identical text to
# wave11._probe_ctes except the coarse argmin (`an`) becomes a top-2
# rank and the fine argmin / membership check run per (vec_id, rank),
# aggregating duplicates over the UNION of the probed fine cells.  The
# reported (cell, sub) is the PRIMARY (rank-1) assignment — identical
# to the single-probe output — so the two variants' rows differ only
# in the dup columns, which is what makes the superset property
# directly testable.
_MULTIPROBE_CTES = f""",
    qn AS MATERIALIZED (
      SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0 + 0.5)
                  AS BIGINT) AS vq
      FROM embeddings
      WHERE vec_id > {_MID_BOUNDARY}),
    dn AS MATERIALIZED (
      SELECT qn.vec_id, c.cell,
             SUM(CAST(FLOOR((qn.vq / 1000000.0 - c.c) * (qn.vq / 1000000.0 - c.c)
                            * 1000000000000.0 + 0.5) AS BIGINT)) AS dfp
      FROM qn JOIN c5 c ON c.pos = qn.pos
      GROUP BY 1, 2),
    an AS MATERIALIZED (
      SELECT vec_id, cell, rnk FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dfp, cell)
                 AS rnk
        FROM dn) t
      WHERE rnk <= {_NPROBE}),
    dfine AS MATERIALIZED (
      SELECT qn.vec_id, an.rnk, f.cell, f.sub,
             SUM(CAST(FLOOR((qn.vq / 1000000.0 - f.c) * (qn.vq / 1000000.0 - f.c)
                            * 1000000000000.0 + 0.5) AS BIGINT)) AS dfp
      FROM qn JOIN an ON an.vec_id = qn.vec_id
      JOIN fc f ON f.cell = an.cell AND f.pos = qn.pos
      GROUP BY 1, 2, 3, 4),
    afine AS MATERIALIZED (
      SELECT vec_id, rnk,
             FIRST(cell ORDER BY dfp, sub) AS cell,
             FIRST(sub ORDER BY dfp, sub) AS sub
      FROM dfine GROUP BY vec_id, rnk),
    nrm_s AS (SELECT vec_id, SUM(vq * vq) AS nn FROM q GROUP BY 1),
    nrm_n AS (SELECT vec_id, SUM(vq * vq) AS nn FROM qn GROUP BY 1),
    pr AS MATERIALIZED (
      SELECT a.vec_id AS id_new, s.vec_id AS id_seen,
             SUM(qn.vq * qs.vq) AS dot
      FROM afine a
      JOIN mfin s ON s.cell = a.cell AND s.sub = a.sub
      JOIN qn ON qn.vec_id = a.vec_id
      JOIN q qs ON qs.vec_id = s.vec_id AND qs.pos = qn.pos
      GROUP BY 1, 2),
    sim AS MATERIALIZED (
      SELECT id_new,
             CAST(FLOOR(dot / (sqrt(na.nn) * sqrt(nb.nn)) * 10000.0 + 0.5)
                  AS BIGINT) AS cos_bp
      FROM pr
      JOIN nrm_n na ON na.vec_id = id_new
      JOIN nrm_s nb ON nb.vec_id = id_seen
      WHERE na.nn > 0 AND nb.nn > 0),
    agg AS MATERIALIZED (
      SELECT id_new AS vec_id, COUNT(*) AS n_seen_dups,
             MAX(cos_bp) AS max_cos_bp
      FROM sim WHERE cos_bp >= {_SEMDEDUP_EPS_BP} GROUP BY 1)
    SELECT CAST(n.vec_id AS BIGINT) AS vec_id,
           CAST(n.cell AS INT) AS cell,
           CAST(n.sub AS INT) AS sub,
           CAST(COALESCE(a.n_seen_dups, 0) AS BIGINT) AS n_seen_dups,
           CAST(COALESCE(a.max_cos_bp, {_NO_PEER_BP}) AS BIGINT) AS max_cos_bp,
           CAST(CASE WHEN a.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
             AS is_novel
    FROM (SELECT vec_id, cell, sub FROM afine WHERE rnk = 1) n
    LEFT JOIN agg a ON a.vec_id = n.vec_id
"""

# Same adaptive fit as `semdedup_codebook_adaptive` (identical Lloyd
# chain + capacity-split text), probed with nprobe=2.
_MULTIPROBE_ORACLE = (
    _kmeans_cte(
        5,
        source=_SEEN_SRC,
        cell_expr=f"CAST(vec_id % {_K0_SQL} AS INT)",
    )
    + _SPLIT_CTES
    + _MULTIPROBE_CTES
)


def _assign_fine_multi(
    spark: SparkSession,
    new,
    coarse_tbl: str,
    fine_tbl: str,
    nprobe: int,
) -> DataFrame:
    """The multiprobe ASSIGNMENT half, extracted from
    ``_multiprobe_batch`` in round 17 so the ADC path
    (``wave14._pq_rerank_probe``) shares the identical rank-k plan:
    coarse-assign each (vec_id, vq) batch vector to its ``nprobe``
    nearest coarse cells (rank r = the r-th struct-min aggregate over
    the broadcast k0 book with ranks 1..r-1 excluded — zero extra
    exchange, see ``_multiprobe_batch``), then fine-argmin per
    (vec_id, rank).  Returns (vec_id, rnk, cell, sub, vq, nn_n) —
    ``_assign_fine``'s shape keyed one level wider."""
    # Rank-k coarse assignment as ONE literal-codebook expression
    # (round 19, guide §2.4): the r-th "struct-min with ranks 1..r-1
    # excluded" winner IS the r-th element of the per-row (d_fp, cell)
    # lexicographic sort (cells are distinct), so array_sort + slice
    # over the collected bounded book replaces nprobe crossJoin/
    # aggregate rounds — nprobe batch-sized exchanges and nprobe-1
    # broadcast builds gone, identical (vec_id, rnk, cell) output.
    probes = assign_topk_cells_collected(
        new, spark.table(coarse_tbl), nprobe
    ).select(
        "vec_id", "vq", F.col("cell").cast("int").alias("cell"), "rnk"
    )
    # fine argmin per (vec_id, rank) — the same struct-min aggregate as
    # the single-probe plan, keyed one level wider
    return (
        probes.join(never_broadcast(spark.table(fine_tbl)), "cell")
        .select(
            "vec_id",
            "rnk",
            "vq",
            "cell",
            "sub",
            _sq_dist_fp(F.col("vq"), F.col("centroid")).alias("d_fp"),
        )
        .groupBy("vec_id", "rnk")
        .agg(
            F.first("vq").alias("vq"),
            F.first("cell").alias("cell"),  # constant per (vec, rank)
            F.min(F.struct(F.col("d_fp"), F.col("sub"))).alias("b"),
        )
        .select(
            "vec_id",
            "rnk",
            "cell",
            F.col("b.sub").alias("sub"),
            "vq",
            F.aggregate(
                "vq", F.lit(0).cast("bigint"), lambda acc, v: acc + v * v
            ).alias("nn_n"),
        )
    )


def _multiprobe_batch(
    spark: SparkSession,
    new,
    coarse_tbl: str,
    fine_tbl: str,
    mem_tbl: str,
    nprobe: int = _NPROBE,
) -> DataFrame:
    """nprobe=k PROBE over a fitted two-level index: coarse-assign each
    batch vector to its k nearest coarse cells, fine-argmin within
    each, exact membership cosine against the union of the (up to) k
    fine cells' <= cap members, report dup stats over the union with
    the PRIMARY (rank-1) cell/sub.  Generalized from the fixed
    nprobe=2 of round 14 (VERDICT r14 #2) — the registered
    ``semdedup_codebook_multiprobe`` keeps ``_NPROBE`` (2); the
    wave-14 recall/cost sweep probes 1/2/4.

    Scale shape matches ``wave11._probe_batch``: rank r is the r-th
    struct-min aggregate over a re-evaluation of the bounded k0 coarse
    distances with the ranks-(1..r-1) cells excluded (r x the
    broadcast-side compute, ZERO extra exchange, one row per vector
    crossing each aggregate) — not a row_number window over the
    |batch| x k0 candidate blow-up, the exchange the
    argmin-as-aggregate discipline exists to avoid.  Ties match the
    oracle's ROW_NUMBER(ORDER BY dfp, cell): each struct-min takes the
    lexicographically smallest (d_fp, cell) of the remaining cells.
    The growing fine book and members sides stay
    `never_broadcast`-pinned sort-merge joins reading their bucket
    specs.  With fewer than nprobe coarse cells the exclusion filter
    empties and the higher ranks contribute no rows — matching the
    oracle's rnk <= nprobe."""
    assigned = _assign_fine_multi(spark, new, coarse_tbl, fine_tbl, nprobe)
    members = spark.table(mem_tbl)
    dot = F.aggregate(
        F.zip_with(F.col("vq"), F.col("vq_s"), lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    # membership cosines over the UNION of the probed fine cells: a
    # seen vector lives in exactly one (cell, sub), and the two probed
    # cells differ by construction, so no pair is counted twice
    hits = (
        assigned.join(never_broadcast(members), ["cell", "sub"])
        .filter((F.col("nn_n") > 0) & (F.col("nn_s") > 0))
        .select(
            "vec_id",
            F.floor(
                dot / (F.sqrt("nn_n") * F.sqrt("nn_s")) * F.lit(10000.0)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("cos_bp"),
        )
        .filter(F.col("cos_bp") >= F.lit(_SEMDEDUP_EPS_BP))
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_seen_dups"),
            F.max("cos_bp").alias("max_cos_bp"),
        )
        .withColumn("hit", F.lit(1))
    )
    return (
        assigned.filter(F.col("rnk") == 1)
        .select("vec_id", "cell", "sub")
        .join(never_broadcast(hits), "vec_id", "left")
        .select(
            F.col("vec_id").cast("bigint").alias("vec_id"),
            "cell",
            "sub",
            F.coalesce("n_seen_dups", F.lit(0))
            .cast("bigint")
            .alias("n_seen_dups"),
            F.coalesce("max_cos_bp", F.lit(_NO_PEER_BP))
            .cast("bigint")
            .alias("max_cos_bp"),
            F.when(F.col("hit").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("is_novel"),
        )
    )


@query("semdedup_codebook_multiprobe", oracle=_MULTIPROBE_ORACLE, wave=13)
def semdedup_codebook_multiprobe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Semantic novelty against the adaptive two-level codebook probed
    at nprobe={nprobe} — the boundary-recall knob (section comment).
    Build: the identical adaptive fit as `semdedup_codebook_adaptive`
    (k0 = ceil(sqrt(ceil(n/cap))) mod-init Lloyd, <= {cap} rank-chunk
    split, three persisted tables).  Probe: each new vector is checked
    against the members of its TWO nearest coarse cells' assigned fine
    cells — duplicates straddling the rank-1 cell boundary, invisible
    to the single-probe variant by construction, are found at a fixed
    2x probe constant.

    Output schema matches the single-probe variants: (vec_id, PRIMARY
    cell, PRIMARY sub, n_seen_dups at cosine >= {eps} bp over the
    probed union, max_cos_bp, is_novel).  Superset property (pinned in
    tests/test_wave13.py): every rank-1 hit survives, so n_seen_dups
    >= the single-probe count and is_novel <= its flag, row for row.

    Reference parity: the reference repo (161-line pandas/datashader
    pipeline, `local.py` / `Reduce.ps1`) has no dedup surface; this
    extends the LLM-pipeline operator family the build brief makes
    first-class, mirroring FAISS's nprobe on the same persisted layout.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    b = emb.agg(
        F.min("vec_id").alias("lo"), F.max("vec_id").alias("hi")
    ).first()
    mid = (b.lo + b.hi) // 2  # oracle: (MIN + MAX) // 2, ids positive

    base, coarse_tbl, fine_tbl, mem_tbl = _index_tables(spark, sf_dir, "mp2")
    _persist_two_level(
        spark,
        emb.filter(F.col("vec_id") <= F.lit(mid)),
        _mod_centroid_init,
        base,
        coarse_tbl,
        fine_tbl,
        mem_tbl,
    )
    new = emb.filter(F.col("vec_id") > F.lit(mid)).select(
        "vec_id", _quantize(F.col("embedding")).alias("vq")
    )
    return _multiprobe_batch(spark, new, coarse_tbl, fine_tbl, mem_tbl)


semdedup_codebook_multiprobe.__doc__ = (
    semdedup_codebook_multiprobe.__doc__.format(
        nprobe=_NPROBE, cap=_CAP, eps=_SEMDEDUP_EPS_BP
    )
)


# ---------------------------------------------------------------------------
# RECALL EVAL: the QA harness for the codebook probes — the semantic
# twin of `ann_recall_eval` / `minhash_lsh_eval`.  Per probed vector of
# a BOUNDED panel, brute-force integer-cosine truth (same fixed-point
# arithmetic as the probes, so truth and probe can never disagree on a
# cosine value — only on which pairs the index made visible) is
# compared against the nprobe=1 and nprobe=2 probe programs over ONE
# shared fit.  At 100 TB this runs on a sampled panel on a schedule
# (one brute-force pass per panel vector), exactly like the ANN evals —
# it is how an operator re-tunes nprobe/cap from measurements.
# ---------------------------------------------------------------------------

# Panel width: vec_id in (mid, mid + _PANEL] — bounded by construction
# (a literal id range), so broadcasting it into the truth cross join is
# the registered scalar-batch pattern, never data x data.  Widened
# 64 -> 256 in round 15 (VERDICT r14 #3): at 64 the recall quantum was
# ~150-300 bp per boundary vector — too coarse to rank adjacent knob
# settings; at 256 it is ~40-80 bp (panel-width sensitivity recorded in
# SCALING.md round-15).  The wave-14 sweep uses an md5-sampled panel of
# the same width for its unbiased variant.
_PANEL = 256

_RECALL_EVAL_CTES = f""",
    qn AS MATERIALIZED (
      SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0 + 0.5)
                  AS BIGINT) AS vq
      FROM embeddings
      WHERE vec_id > {_MID_BOUNDARY}
        AND vec_id <= {_PANEL} + {_MID_BOUNDARY}),
    dn AS MATERIALIZED (
      SELECT qn.vec_id, c.cell,
             SUM(CAST(FLOOR((qn.vq / 1000000.0 - c.c) * (qn.vq / 1000000.0 - c.c)
                            * 1000000000000.0 + 0.5) AS BIGINT)) AS dfp
      FROM qn JOIN c5 c ON c.pos = qn.pos
      GROUP BY 1, 2),
    an1 AS MATERIALIZED (
      SELECT vec_id, FIRST(cell ORDER BY dfp, cell) AS cell
      FROM dn GROUP BY vec_id),
    an2 AS MATERIALIZED (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dfp, cell)
                 AS rnk
        FROM dn) t
      WHERE rnk <= {_NPROBE}),
    dfine AS MATERIALIZED (
      SELECT qn.vec_id, f.cell, f.sub,
             SUM(CAST(FLOOR((qn.vq / 1000000.0 - f.c) * (qn.vq / 1000000.0 - f.c)
                            * 1000000000000.0 + 0.5) AS BIGINT)) AS dfp
      FROM qn JOIN an2 a ON a.vec_id = qn.vec_id
      JOIN fc f ON f.cell = a.cell AND f.pos = qn.pos
      GROUP BY 1, 2, 3),
    afine AS MATERIALIZED (
      SELECT vec_id, cell, FIRST(sub ORDER BY dfp, sub) AS sub
      FROM dfine GROUP BY vec_id, cell),
    nrm_s AS (SELECT vec_id, SUM(vq * vq) AS nn FROM q GROUP BY 1),
    nrm_n AS (SELECT vec_id, SUM(vq * vq) AS nn FROM qn GROUP BY 1),
    prx AS MATERIALIZED (
      SELECT a.vec_id AS id_new, a.cell, s.vec_id AS id_seen,
             SUM(qn.vq * qs.vq) AS dot
      FROM afine a
      JOIN mfin s ON s.cell = a.cell AND s.sub = a.sub
      JOIN qn ON qn.vec_id = a.vec_id
      JOIN q qs ON qs.vec_id = s.vec_id AND qs.pos = qn.pos
      GROUP BY 1, 2, 3),
    simx AS MATERIALIZED (
      SELECT id_new, cell,
             CAST(FLOOR(dot / (sqrt(na.nn) * sqrt(nb.nn)) * 10000.0 + 0.5)
                  AS BIGINT) AS cos_bp
      FROM prx
      JOIN nrm_n na ON na.vec_id = id_new
      JOIN nrm_s nb ON nb.vec_id = id_seen
      WHERE na.nn > 0 AND nb.nn > 0),
    hitsx AS MATERIALIZED (
      SELECT id_new, cell, COUNT(*) AS n
      FROM simx WHERE cos_bp >= {_SEMDEDUP_EPS_BP} GROUP BY 1, 2),
    h2 AS (SELECT id_new, SUM(n) AS n FROM hitsx GROUP BY 1),
    h1 AS (
      SELECT hx.id_new, hx.n
      FROM hitsx hx JOIN an1 a1
        ON a1.vec_id = hx.id_new AND a1.cell = hx.cell),
    tdot AS MATERIALIZED (
      SELECT qn.vec_id AS id_new, q.vec_id AS id_seen,
             SUM(qn.vq * q.vq) AS dot
      FROM qn JOIN q ON q.pos = qn.pos
      GROUP BY 1, 2),
    tsim AS MATERIALIZED (
      SELECT id_new,
             CAST(FLOOR(dot / (sqrt(na.nn) * sqrt(nb.nn)) * 10000.0 + 0.5)
                  AS BIGINT) AS cos_bp
      FROM tdot
      JOIN nrm_n na ON na.vec_id = id_new
      JOIN nrm_s nb ON nb.vec_id = id_seen
      WHERE na.nn > 0 AND nb.nn > 0),
    truth AS MATERIALIZED (
      SELECT id_new AS vec_id, COUNT(*) AS c
      FROM tsim WHERE cos_bp >= {_SEMDEDUP_EPS_BP} GROUP BY 1),
    tt AS (SELECT COUNT(*) AS tv, COALESCE(SUM(c), 0) AS tp FROM truth),
    v1 AS (SELECT COUNT(*) AS dv, COALESCE(SUM(n), 0) AS dp FROM h1),
    v2 AS (SELECT COUNT(*) AS dv, COALESCE(SUM(n), 0) AS dp FROM h2)
    SELECT CAST(variant AS VARCHAR) AS variant,
           CAST(tv AS BIGINT) AS n_truth_vecs,
           CAST(tp AS BIGINT) AS n_truth_pairs,
           CAST(dv AS BIGINT) AS n_detected_vecs,
           CAST(dp AS BIGINT) AS n_detected_pairs,
           CAST(CASE WHEN tv = 0 THEN 0 ELSE dv * 10000 // tv END
                AS BIGINT) AS vec_recall_bp,
           CAST(CASE WHEN tp = 0 THEN 0 ELSE dp * 10000 // tp END
                AS BIGINT) AS pair_recall_bp
    FROM (
      SELECT 'nprobe1' AS variant, v1.dv, v1.dp, tt.tv, tt.tp FROM v1, tt
      UNION ALL
      SELECT 'nprobe2' AS variant, v2.dv, v2.dp, tt.tv, tt.tp FROM v2, tt)
"""

_RECALL_EVAL_ORACLE = (
    _kmeans_cte(
        5,
        source=_SEEN_SRC,
        cell_expr=f"CAST(vec_id % {_K0_SQL} AS INT)",
    )
    + _SPLIT_CTES
    + _RECALL_EVAL_CTES
)


def _probe_stats(res: DataFrame, variant: str) -> DataFrame:
    """(vec_id, ..., n_seen_dups, is_novel) probe rows -> one stats row
    (variant, n_detected_vecs, n_detected_pairs)."""
    return res.agg(
        F.sum(F.lit(1) - F.col("is_novel")).cast("bigint").alias("dv"),
        F.sum("n_seen_dups").cast("bigint").alias("dp"),
    ).select(F.lit(variant).alias("variant"), "dv", "dp")


@query("semdedup_codebook_recall_eval", oracle=_RECALL_EVAL_ORACLE, wave=13)
def semdedup_codebook_recall_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Duplicate-recall of the codebook probes vs brute-force truth
    over a bounded {panel}-vector panel (section comment) — ONE adaptive
    fit, probed at nprobe=1 and nprobe={nprobe}, scored against the
    exact integer-cosine pair set.  Output: one row per variant with
    (n_truth_vecs, n_truth_pairs, n_detected_vecs, n_detected_pairs,
    vec_recall_bp, pair_recall_bp) — the numbers an operator reads
    before choosing nprobe (measured r14 on the full new half: 0.35 ->
    0.54 vec-recall at the fixture's deliberately tight cap=16).

    Scale shape: the probes are the already-pinned two-level plans; the
    truth join crosses the BOUNDED panel (broadcast, a literal id
    range) against the seen half — one brute-force scan per panel
    vector, the sampled-schedule QA cost every recall eval in the repo
    pays (`ann_recall_eval`, `minhash_lsh_eval`), never data x data.
    Zero false positives by construction (the membership check is an
    exact cosine), so recall is the only number that can move.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    b = emb.agg(
        F.min("vec_id").alias("lo"), F.max("vec_id").alias("hi")
    ).first()
    mid = (b.lo + b.hi) // 2  # oracle: (MIN + MAX) // 2, ids positive

    base, coarse_tbl, fine_tbl, mem_tbl = _index_tables(spark, sf_dir, "rce")
    seen = emb.filter(F.col("vec_id") <= F.lit(mid))
    _persist_two_level(
        spark, seen, _mod_centroid_init, base, coarse_tbl, fine_tbl, mem_tbl
    )
    panel = emb.filter(
        (F.col("vec_id") > F.lit(mid))
        & (F.col("vec_id") <= F.lit(mid + _PANEL))
    ).select("vec_id", _quantize(F.col("embedding")).alias("vq"))

    # brute-force truth: bounded panel broadcast against the seen half
    seen_q = seen.select(
        F.col("vec_id").alias("sid"),
        _quantize(F.col("embedding")).alias("vqs"),
    ).withColumn(
        "nns",
        F.aggregate("vqs", F.lit(0).cast("bigint"), lambda a, v: a + v * v),
    )
    pnl = panel.withColumn(
        "nnn",
        F.aggregate("vq", F.lit(0).cast("bigint"), lambda a, v: a + v * v),
    )
    dot = F.aggregate(
        F.zip_with(F.col("vq"), F.col("vqs"), lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda a, v: a + v,
    )
    truth_tot = (
        seen_q.crossJoin(F.broadcast(pnl))
        .filter((F.col("nnn") > 0) & (F.col("nns") > 0))
        .select(
            F.floor(
                dot / (F.sqrt("nnn") * F.sqrt("nns")) * F.lit(10000.0)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("cos_bp"),
            "vec_id",
        )
        .filter(F.col("cos_bp") >= F.lit(_SEMDEDUP_EPS_BP))
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("tv"),
            F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("tp"),
        )
    )

    stats = _probe_stats(
        _probe_batch(spark, panel, coarse_tbl, fine_tbl, mem_tbl), "nprobe1"
    ).unionByName(
        _probe_stats(
            _multiprobe_batch(spark, panel, coarse_tbl, fine_tbl, mem_tbl),
            "nprobe2",
        )
    )
    return stats.crossJoin(F.broadcast(truth_tot)).select(
        "variant",
        F.col("tv").alias("n_truth_vecs"),
        F.col("tp").alias("n_truth_pairs"),
        F.col("dv").alias("n_detected_vecs"),
        F.col("dp").alias("n_detected_pairs"),
        # zero-guarded on BOTH sides (ADVICE r14): a degenerate panel
        # with no true duplicates must yield recall 0, not NULL/error
        F.expr(
            "CAST(CASE WHEN tv = 0 THEN 0 ELSE dv * 10000 div tv END"
            " AS BIGINT)"
        ).alias("vec_recall_bp"),
        F.expr(
            "CAST(CASE WHEN tp = 0 THEN 0 ELSE dp * 10000 div tp END"
            " AS BIGINT)"
        ).alias("pair_recall_bp"),
    )


semdedup_codebook_recall_eval.__doc__ = (
    semdedup_codebook_recall_eval.__doc__.format(panel=_PANEL, nprobe=_NPROBE)
)


# ---------------------------------------------------------------------------
# GENERATION CUTOVER + VACUUM: the operational tail of the refit.
# `refit_from_members` writes a NEW generation (distinct kind tag) and
# leaves the source generation untouched — that immutability is what
# makes the refit crash-safe, but it also means every refit doubles the
# index footprint until something (a) atomically repoints readers at
# the new generation and (b) reclaims the superseded one.  At 100 TB
# the members table IS the corpus-scale artifact, so an unreclaimed
# generation is a corpus-sized storage leak per weekly refit.  The
# pointer uses the same atomic-rename marker discipline as the
# streaming admission's intent/watermark pair (`streaming/codebook.py`):
# readers resolve the pointer at probe start, so a probe sees the old
# generation or the new one, never a mix, and a crash between refit
# and cutover leaves the pointer on the still-intact old generation.
# Reference parity: the reference swaps its whole output prefix per run
# (`Implementation.cs:45-47` re-uploads jobData.json) rather than
# patching in place — the pointer is that swap applied to the index.
# ---------------------------------------------------------------------------


def _generation_names(sf_dir: str, kind: str) -> tuple[str, str, str]:
    """The three table names of a generation — the pure-name half of
    ``wave11._index_tables`` (which also sweeps and drops: wrong for a
    reader that must not mutate)."""
    from awsbatch_mapreduce_spark.plans.wave5 import _scratch_tag

    tag = _scratch_tag(sf_dir)
    return tuple(
        f"semdedup_{kind}_{part}_{tag}"
        for part in ("coarse", "fine", "members")
    )


def _pq_generation_names(sf_dir: str, kind: str) -> tuple[str, str]:
    """The two PQ table names of a generation — codes (per-member PQ
    codes, bucketed exactly like the members table) and the bounded
    per-subspace PQ codebook.  Round 16 (VERDICT r15 #1): the PQ
    artifacts are generation-scoped, owned by the same fit/refit/
    cutover/vacuum machinery as coarse/fine/members."""
    from awsbatch_mapreduce_spark.plans.wave5 import _scratch_tag

    tag = _scratch_tag(sf_dir)
    return tuple(
        f"semdedup_{kind}_{part}_{tag}" for part in ("codes", "pqcb")
    )


def read_generation_pointer(pointer_path: str) -> str | None:
    """The kind tag of the current index generation, or None if no
    cutover has happened yet."""
    return read_generation_meta(pointer_path)[0]


def read_generation_state(
    pointer_path: str,
) -> tuple[str | None, int | None, frozenset[str]]:
    """ONE snapshot read of the pointer file -> (kind, n_fit, flags).
    The pointer is a single atomically-renamed file precisely so that
    every property of the current generation is consistent with every
    other; a reader that opens the file once per property (ADVICE r16:
    ``probe_current_generation(adc=True)`` read it twice) can pair one
    generation's kind with another's flags when a cutover lands between
    the opens — a spurious refusal or a missing-codes-table error.  All
    the single-property readers below derive from this one snapshot.

    Line format: line 1 = kind, line 2 = n_fit (may be empty; pointers
    written before round 15 have no second line), line 3 =
    space-separated flag tokens (``pq``, ``cap=N``, ``nprobe=N``;
    pointers written before round 16 have no flag line)."""
    try:
        with open(pointer_path) as fh:
            lines = fh.read().splitlines()
    except OSError:
        return None, None, frozenset()
    kind = lines[0].strip() if lines else ""
    if not kind:
        return None, None, frozenset()
    try:
        n_fit = int(lines[1].strip())
    except (IndexError, ValueError):
        n_fit = None
    flags = frozenset(lines[2].split()) if len(lines) >= 3 else frozenset()
    return kind, n_fit, flags


def read_generation_meta(pointer_path: str) -> tuple[str | None, int | None]:
    """(kind, n_fit) of the current generation — ``n_fit`` is the
    members count at fit/cutover time (the denominator of the
    ``refit_due`` cadence rule), carried as the pointer file's second
    line so it rides the SAME atomic rename as the kind (round 15: a
    separate n_fit marker would reopen the crash window between the
    swap and the marker write).  Pointers written before round 15 have
    no second line — n_fit comes back None and callers fall back to a
    live count."""
    kind, n_fit, _ = read_generation_state(pointer_path)
    return kind, n_fit


def read_generation_flags(pointer_path: str) -> frozenset[str]:
    """Capability flags of the current generation (pointer line 3,
    space-separated tokens) — riding the same atomic rename as the
    kind and n_fit.  ``pq`` means the generation carries codes +
    PQ-codebook tables, so ``probe_current_generation(adc=True)`` may
    serve from it; ``cap=N`` records the generation's fine-cell
    capacity (``read_generation_cap`` parses it); ``nprobe=N`` the
    serving probe width (``read_generation_nprobe``).  Pointers written
    before round 16 have no flag line — an empty set comes back."""
    return read_generation_state(pointer_path)[2]


def _int_flag(flags: frozenset[str], prefix: str, default: int) -> int:
    """Parse a ``name=N`` token out of one flag snapshot (so callers
    that already hold a snapshot never re-open the pointer)."""
    for tok in flags:
        if tok.startswith(prefix):
            try:
                return int(tok[len(prefix):])
            except ValueError:
                pass
    return default


def read_generation_cap(pointer_path: str) -> int:
    """The current generation's fine-cell capacity, from the pointer's
    ``cap=N`` flag token (round 16: the quality-triggered refit
    escalates cap, so the generation's cap is state the admission path
    must read back — its rank-chunking preserves the <= cap bound only
    if it chunks at the SAME cap the generation was fitted with).
    Pointers without the token (pre-escalation generations) return the
    registered fixture default."""
    from awsbatch_mapreduce_spark.plans.wave11 import _CAP

    return _int_flag(read_generation_flags(pointer_path), "cap=", _CAP)


def read_generation_nprobe(pointer_path: str) -> int:
    """The current generation's SERVING probe width, from the pointer's
    ``nprobe=N`` flag token (round 17, VERDICT r16 #1): the recall
    actuator's step must reach what production actually serves, so the
    knob rides the pointer's atomic rename exactly like ``cap=N`` —
    ``probe_current_generation`` (full-vector AND ADC) and the
    streaming pointer readers honor it, and ``set_generation_nprobe``
    is the actuator's write side.  Pointers without the token serve
    single-probe (nprobe=1), the pre-round-17 behavior."""
    return _int_flag(read_generation_flags(pointer_path), "nprobe=", 1)


@_contextlib.contextmanager
def _pointer_write_lock(pointer_path: str):
    """Serialize pointer read-modify-write cycles (VERDICT r17 wrong
    #3): the rename is atomic but the RMW around it is not — two
    concurrent writers can lose an update (both read the same snapshot,
    last rename wins, the other's token vanishes) or collide on the
    fixed ``pointer_path + ".tmp"`` sibling (one ``os.replace`` steals
    the other's tmp file -> FileNotFoundError).  Today the supervisor
    is the single writer, but that contract was implicit; an exclusive
    ``flock`` on a ``.lock`` sibling makes it enforced instead of
    assumed, at the cost of one syscall per mutation (pointer writes
    are O(refits + actuator steps) per run — never hot).  Readers stay
    lock-free: they only ever open the complete, atomically-renamed
    pointer file."""
    import fcntl
    import os as _os

    lock_path = f"{pointer_path}.lock"
    _os.makedirs(_os.path.dirname(lock_path) or ".", exist_ok=True)
    fd = _os.open(lock_path, _os.O_CREAT | _os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        _os.close(fd)


def set_generation_nprobe(pointer_path: str, nprobe: int) -> None:
    """The recall actuator's WRITE side (round 17, VERDICT r16 #1):
    record ``nprobe=N`` on the current generation's pointer — same
    single-file atomic rename as every other pointer mutation, with the
    kind, n_fit, and every other flag token carried over from one
    snapshot read.  Takes effect on the NEXT pointer resolution: the
    next ``probe_current_generation`` call, the next micro-batch of a
    pointer-following stream (they re-resolve per batch), the next
    QA snapshot — no stream restart, no refit.  The knob is serving
    metadata, not index structure, which is why stepping it is the
    CHEAP recall lever (probe cost ~x nprobe, zero extra exchange,
    measured by the wave-14 sweep) and why it must never require the
    refit machinery."""
    import os as _os

    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    with _pointer_write_lock(pointer_path):
        kind, n_fit, flags = read_generation_state(pointer_path)
        if kind is None:
            raise RuntimeError(
                f"no current generation under {pointer_path!r}: nothing"
                " to set nprobe on — fit and cut over first"
            )
        kept = sorted(t for t in flags if not t.startswith("nprobe="))
        lines = [kind, "" if n_fit is None else str(n_fit),
                 " ".join(kept + [f"nprobe={nprobe}"])]
        tmp = f"{pointer_path}.tmp"
        with open(tmp, "w") as fh:
            fh.write("\n".join(lines))
        _os.replace(tmp, pointer_path)


def cutover_generation(
    spark,
    sf_dir: str,
    pointer_path: str,
    kind: str,
    n_fit: int | None = None,
    with_pq: bool = False,
    cap: int | None = None,
    nprobe: int | None = None,
) -> str | None:
    """Atomically repoint readers at generation ``kind``: verify all
    tables of the target generation exist (a half-written generation
    must never become current), then rename-swap the pointer file.
    Returns the previous kind (None on first cutover).  The old
    generation's tables are left intact — reclaim is a separate,
    explicitly-ordered step (``vacuum_generation``), so a crash between
    cutover and vacuum costs storage, never correctness.  ``n_fit``
    (the generation's fit-time members count) is recorded in the same
    atomic write when given — the ``refit_due`` denominator the
    streaming supervisor reads back at stream start.  ``with_pq``
    (round 16) additionally verifies the generation's codes + PQ
    codebook tables and records the ``pq`` capability flag on the
    pointer's third line (same atomic rename) — the signal
    ``probe_current_generation(adc=True)`` reads before serving ADC.
    ``cap`` records the generation's fine-cell capacity as a ``cap=N``
    token on the same line — the quality-triggered refit escalates it,
    and the admission path must rank-chunk at the generation's own cap
    to preserve the <= cap bound (``read_generation_cap``).
    ``nprobe`` (round 17) records the SERVING probe width as an
    ``nprobe=N`` token — the knob the recall actuator steps
    (``set_generation_nprobe``) and every pointer-resolving probe
    honors (``read_generation_nprobe``)."""
    import os as _os

    required = list(_generation_names(sf_dir, kind))
    if with_pq:
        required += list(_pq_generation_names(sf_dir, kind))
    missing = [t for t in required if not spark.catalog.tableExists(t)]
    if missing:
        raise RuntimeError(
            f"cutover to generation {kind!r} refused: tables {missing}"
            " do not exist (refit incomplete or not run)"
        )
    with _pointer_write_lock(pointer_path):
        prev = read_generation_pointer(pointer_path)
        tmp = f"{pointer_path}.tmp"
        lines = [kind]
        flags = (
            (["pq"] if with_pq else [])
            + ([f"cap={cap}"] if cap is not None else [])
            + ([f"nprobe={nprobe}"] if nprobe is not None else [])
        )
        if n_fit is not None or flags:
            lines.append("" if n_fit is None else str(n_fit))
        if flags:
            lines.append(" ".join(flags))
        with open(tmp, "w") as fh:
            fh.write("\n".join(lines))
        _os.replace(tmp, pointer_path)
    return prev


def vacuum_generation(spark, sf_dir: str, pointer_path: str, kind: str) -> int:
    """Reclaim a superseded generation: drop its three tables and
    delete their external data dir.  REFUSES to vacuum the generation
    the pointer currently names — the only state this function may
    destroy is one no reader can resolve anymore.  Returns the number
    of tables dropped (0 if the generation was already gone, making
    vacuum idempotent for a crash-replay of the reclaim step)."""
    import shutil

    from awsbatch_mapreduce_spark.plans.wave5 import _scratch_dir

    current = read_generation_pointer(pointer_path)
    if kind == current:
        raise RuntimeError(
            f"vacuum of generation {kind!r} refused: it is the CURRENT"
            f" generation under {pointer_path!r} — cut over first"
        )
    dropped = 0
    # codes + pqcb vacuumed WITH the generation (round 16, VERDICT r15
    # #1): dropped unconditionally — a generation without a PQ path
    # simply has neither table and the loop no-ops over them.  The
    # tombstone table (round 18) dies with its generation the same way
    # (its data lives under the generation's scratch base, so the
    # rmtree below reclaims the files).
    from awsbatch_mapreduce_spark.plans.wave17 import _tombstone_name

    tables = (
        _generation_names(sf_dir, kind)
        + _pq_generation_names(sf_dir, kind)
        + (_tombstone_name(sf_dir, kind),)
    )
    for t in tables:
        if spark.catalog.tableExists(t):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            dropped += 1
    shutil.rmtree(
        _scratch_dir(f"awsbatch_semdedup_{kind}_idx", sf_dir),
        ignore_errors=True,
    )
    return dropped


def refit_and_cutover(
    spark,
    sf_dir: str,
    pointer_path: str,
    new_kind: str,
    with_pq: bool | None = None,
    cap: int | None = None,
    nprobe: int | None = None,
) -> str:
    """The guarded refit->cutover sequence: refit a fresh generation
    ``new_kind`` from the CURRENT generation's members table, then cut
    the pointer over — REFUSING the cutover if the source generation's
    members changed while the refit ran.

    Why the guard exists: the refit reads the members table once (its
    snapshot); an admission committed into the OLD generation after
    that snapshot exists ONLY in the old generation, so cutting over
    and vacuuming would silently drop it — the one data-loss window
    the pointer protocol otherwise closes.  The contract is therefore
    "quiesce admissions into the current generation for the duration"
    (for the streaming operator: stop the admit stream, run this,
    restart it bound to the new generation — exactly what the
    ``streaming.supervisor`` auto-refit loop does); this function turns
    a violated contract into a loud error instead of lost vectors.  The
    guard is checked TWICE: once after the refit (cheap refusal before
    any pointer motion) and once again AFTER the pointer swap — an
    admission landing between the first recount and the swap (the
    TOCTOU gap, ADVICE r14) is caught by the second check, which rolls
    the pointer back to the still-complete old generation and raises.
    Residual window: a hard crash exactly between the swap and the
    second recount leaves the pointer on the new generation while the
    old one holds unrefitted admissions — quiescing is still the
    contract; the guard is a best-effort backstop, not a license to
    admit concurrently.  On refusal the new generation is left on disk
    for inspection — re-run after quiescing; `_index_tables` sweeps it
    on the retry.  Returns the previous generation's kind tag (the
    argument to a subsequent ``vacuum_generation``).

    ``with_pq`` (round 16, VERDICT r15 #1): True rebuilds the codes +
    PQ-codebook tables beside the new generation's coarse/fine/members
    BEFORE the cutover, so an ADC reader resolving the pointer never
    sees a generation without its codes; None (the default) INHERITS
    the current generation's ``pq`` flag — the supervisor's automatic
    refits keep whatever capability surface the generation had.

    ``cap`` (round 16): the new generation's fine-cell capacity — None
    inherits the current generation's (``read_generation_cap``); the
    quality-triggered refit passes an ESCALATED cap, the growth-
    triggered one inherits.  The cap rides the pointer as a ``cap=N``
    token so admissions into the new generation rank-chunk at the cap
    it was fitted with.

    ``nprobe`` (round 17): the new generation's SERVING probe width —
    None inherits the current pointer's ``nprobe=N`` token (a routine
    refit must never silently reset production recall); the
    supervisor's quality-escalated refit passes its configured BASE,
    because the cap escalation structurally fixes what the nprobe
    steps were papering over (body comment)."""
    # one pointer snapshot: kind/n_fit/flags must be mutually consistent
    # (the same single-read discipline as probe_current_generation)
    current, cur_n_fit, cur_flags = read_generation_state(pointer_path)
    if current is None:
        raise RuntimeError(
            f"no current generation under {pointer_path!r}: nothing to"
            " refit from — fit and cut over a first generation directly"
        )
    cur_cap = _int_flag(cur_flags, "cap=", _CAP)
    # the serving nprobe is INHERITED by default (round 17): a routine
    # refit changes index structure, not the actuator-owned serving
    # knob — a generation swap must never silently reset production
    # recall.  An EXPLICIT ``nprobe`` overrides: the supervisor's
    # quality-escalated refit passes the configured base, because the
    # cap escalation is the STRUCTURAL fix for the recall the nprobe
    # steps were papering over — serving the escalated generation at
    # the stopgap width would pay max-nprobe x probe cost forever on
    # an index that no longer needs it (the next snapshot re-converges
    # the knob from base if the new geometry still falls short).
    old_nprobe = _int_flag(cur_flags, "nprobe=", 0) or None
    new_nprobe = nprobe if nprobe is not None else old_nprobe
    if with_pq is None:
        with_pq = "pq" in cur_flags
    if cap is None:
        cap = cur_cap
    _, _, src_mem = _generation_names(sf_dir, current)
    # refresh BEFORE the snapshot: streamed admissions commit through
    # the micro-batch's cloned session, so this session's cached file
    # listing can predate them — an unrefreshed refit would silently
    # fit the stale listing (the double-recount guard below caught
    # exactly this in the round-15 supervisor tests)
    spark.catalog.refreshTable(src_mem)
    n_snapshot = spark.table(src_mem).count()
    # DELETION propagates at refit (round 18, VERDICT r17 #2): the
    # current generation's tombstones (if any) are excluded from the
    # new fit, and the new generation starts with NO tombstone table —
    # the clear is structural.  The tombstone count joins the quiesce
    # guard below: a delete landing mid-refit would be cleared WITHOUT
    # being excluded (silent resurrection), so it refuses the cutover
    # exactly like a concurrent admission.
    from awsbatch_mapreduce_spark.plans.wave17 import _tombstone_name

    tombs_tbl = _tombstone_name(sf_dir, current)
    has_tombs = spark.catalog.tableExists(tombs_tbl)
    n_tombs_snapshot = (
        spark.table(tombs_tbl).count() if has_tombs else 0
    )
    base, coarse_tbl, fine_tbl, mem_tbl = _index_tables(
        spark, sf_dir, new_kind
    )
    refit_from_members(
        spark, src_mem, base, coarse_tbl, fine_tbl, mem_tbl, cap=cap,
        tombs_tbl=tombs_tbl if has_tombs else None,
    )
    # the NEW generation's fit-time size is the SURVIVOR count (what
    # it actually fitted) — the refit_due denominator must price the
    # fitted set, not the pre-deletion source
    n_fit_new = (
        spark.table(mem_tbl).count() if has_tombs else n_snapshot
    )
    if with_pq:
        # codes + PQ codebook are per-generation artifacts: rebuilt
        # from the NEW generation's members table (the codes build is
        # members-only by construction — the refit self-containment
        # property extends to the PQ path), before any pointer motion
        from awsbatch_mapreduce_spark.plans.wave14 import _pq_tables

        codes_tbl, pqcb_tbl = _pq_tables(spark, sf_dir, new_kind)
        from awsbatch_mapreduce_spark.plans.wave14 import _persist_pq_codes

        _persist_pq_codes(spark, mem_tbl, base, codes_tbl, pqcb_tbl)

    def _recount() -> tuple[int, int]:
        spark.catalog.refreshTable(src_mem)
        n_t = 0
        if spark.catalog.tableExists(tombs_tbl):
            spark.catalog.refreshTable(tombs_tbl)
            n_t = spark.table(tombs_tbl).count()
        return spark.table(src_mem).count(), n_t

    def _refuse(n_now: int, n_t_now: int) -> None:
        what = (
            f"grew from {n_snapshot} to {n_now} members"
            if n_now != n_snapshot
            else f"tombstones moved {n_tombs_snapshot} -> {n_t_now}"
        )
        raise RuntimeError(
            f"cutover to {new_kind!r} refused: generation {current!r}"
            f" {what} while the refit ran — those mutations exist only"
            " in the old generation and would be lost (or silently"
            " resurrected) at vacuum. Quiesce admissions and deletions"
            " into the current generation and re-run."
        )

    n_now, n_t_now = _recount()
    if n_now != n_snapshot or n_t_now != n_tombs_snapshot:
        _refuse(n_now, n_t_now)
    # the new generation's fit-time size IS what it fitted — record
    # it in the pointer's atomic write (the refit_due denominator)
    cutover_generation(
        spark, sf_dir, pointer_path, new_kind, n_fit=n_fit_new,
        with_pq=with_pq, cap=cap, nprobe=new_nprobe,
    )
    n_after, n_t_after = _recount()
    if n_after != n_snapshot or n_t_after != n_tombs_snapshot:
        # an admission slipped into the old generation between the
        # first recount and the swap: roll the pointer back (the old
        # generation is intact — nothing vacuumed yet) and refuse.
        # The rollback restores the OLD generation's own nprobe, not
        # the override meant for the generation that never went live.
        cutover_generation(
            spark, sf_dir, pointer_path, current, n_fit=cur_n_fit,
            with_pq="pq" in cur_flags, cap=cur_cap, nprobe=old_nprobe,
        )
        _refuse(n_after, n_t_after)
    return current


def probe_current_generation(
    spark, sf_dir: str, pointer_path: str, new, adc: bool = False
) -> DataFrame:
    """Probe a quantized (vec_id, vq) batch against whatever generation
    the pointer names — the reader-side half of the cutover contract.
    The pointer is resolved ONCE, at plan-build time, so one probe
    never mixes generations even if a cutover lands mid-execution (the
    old generation's tables are immutable until vacuumed).

    ``adc=True`` (round 16) serves the IVFPQ two-stage path instead —
    ADC over the generation's bucketed CODES table, exact cosine on the
    top-rerank survivors only — and REFUSES loudly when the pointer
    does not carry the ``pq`` flag: a generation without codes must
    never silently fall back to the full-vector membership join an ADC
    reader chose this path to avoid.

    The SERVING probe width is the pointer's ``nprobe=N`` token (round
    17, VERDICT r16 #1): both paths honor it — full-vector via the
    rank-k multiprobe program, ADC via its multiprobe generalization —
    so the recall actuator's ``set_generation_nprobe`` step changes
    what production serves, not just what the QA snapshot measures.
    Probe cost ~x nprobe on the broadcast-side coarse compute, zero
    extra exchange (the wave-14 sweep's measured price)."""
    # ONE pointer snapshot (ADVICE r16): kind, flags, and the serving
    # nprobe must come from the same atomic file read, or a cutover
    # landing between two opens pairs one generation's kind with
    # another's flags
    kind, _, flags = read_generation_state(pointer_path)
    if kind is None:
        raise RuntimeError(
            f"no current generation under {pointer_path!r}: run a fit"
            " and cut over before probing"
        )
    nprobe = _int_flag(flags, "nprobe=", 1)
    coarse_tbl, fine_tbl, mem_tbl = _generation_names(sf_dir, kind)
    # DELETION reaches every serving path (round 18, VERDICT r17 #2):
    # when the generation carries tombstones, the probes read the LIVE
    # members (and codes) view — members minus the tombstone set, a
    # broadcast anti-join bounded by deletion volume that preserves
    # the big side's bucket distribution (zero new exchange)
    from awsbatch_mapreduce_spark.plans.wave17 import (
        live_codes_name,
        live_members_name,
    )

    mem_tbl = live_members_name(
        spark, sf_dir, kind, mem_tbl, pointer_path=pointer_path
    )
    if not adc:
        if nprobe == 1:
            return _probe_batch(spark, new, coarse_tbl, fine_tbl, mem_tbl)
        return _multiprobe_batch(
            spark, new, coarse_tbl, fine_tbl, mem_tbl, nprobe=nprobe
        )
    if "pq" not in flags:
        raise RuntimeError(
            f"ADC probe refused: generation {kind!r} under"
            f" {pointer_path!r} carries no 'pq' flag — fit or refit it"
            " with with_pq=True before serving ADC readers"
        )
    from awsbatch_mapreduce_spark.plans.wave14 import _pq_rerank_probe

    codes_tbl, pqcb_tbl = _pq_generation_names(sf_dir, kind)
    codes_tbl = live_codes_name(
        spark, sf_dir, kind, codes_tbl, pointer_path=pointer_path
    )
    return _pq_rerank_probe(
        spark, new, coarse_tbl, fine_tbl, mem_tbl, codes_tbl, pqcb_tbl,
        nprobe=nprobe,
    )
