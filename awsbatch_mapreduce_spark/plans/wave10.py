"""Wave 10 (round 9): sampled SemDeDup calibration + the persisted
semantic codebook — the two rungs VERDICT r8 asked for (#3, #4).

1. ``semdedup_eps_curve_sampled`` — at 100 TB you price the SemDeDup
   eps threshold on a sample, not the full corpus.  The naive design
   (md5-bucket sample of DOCUMENTS, as the lexical ladder samples) is
   statistically wrong for a PAIR statistic: a duplicate survives the
   sample only if its peer does too, so pair density thins by rate^2
   while the denominator thins by rate, and the curve overstates
   retention — measured on the fixture: +31-33 retention points at a
   40% doc sample.  The unbiased estimator samples whole k-means CELLS
   (drop decisions are cell-local by construction — no pair ever
   crosses a cell — so sampled cells carry their EXACT pair
   structure): measured deviation <=1.6 retention points at a 50% cell
   sample on both fixture SFs (tolerance pinned in
   ``tests/test_wave10.py``).  The linear cluster step still sees the
   full corpus (it is needed for the eventual prune anyway); only the
   quadratic-ish intra-cell pair pass is priced on the sample.

2. ``semdedup_codebook_novelty`` — completes the lifecycle symmetry
   VERDICT r8 named: the lexical ladder has batch dedup AND a
   persisted-index incremental probe (``lsh_band_index_lifecycle``);
   the semantic ladder had only batch.  The seen half's k-means
   codebook (final Lloyd centroids) and per-cell quantized members are
   PERSISTED once (members bucketed on cell); a new batch is assigned
   to cells via the broadcast codebook and checked by exact intra-cell
   cosine against persisted members only — zero seen-side recompute
   (pinned by plan test), only the day's batch shuffles.

Both oracle-gated: the sampled curve reuses the wave-9 shared sim CTE
with the cell filter (``_semdedup_sim_cte(cell_rate)``), and the
novelty oracle reuses the unrolled Lloyd chain over the seen half
(``_kmeans_cte(5, source=...)``) plus the exact-int cosine recipe, so
the cluster/cosine arithmetic cannot drift from the batch queries the
driver already proved.

Reference parity note: the reference repo (161-line pandas/datashader
pipeline) has no dedup surface; these extend the LLM-pipeline operator
family the build brief makes first-class.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.plans.hints import never_broadcast
from awsbatch_mapreduce_spark.plans.iterative import (
    _centroids_of,
    _kmeans_cte,
    _quantize,
    assign_to_cells_collected,
    kmeans_fit,
    label_centroid_init,
)
from awsbatch_mapreduce_spark.plans.registry import query
from awsbatch_mapreduce_spark.plans.wave9 import (
    _NO_PEER_BP,
    _SEMDEDUP_EPS_BP,
    _semdedup_curve_oracle,
    _semdedup_sim,
    retention_curve_frame,
)
from awsbatch_mapreduce_spark.sources.tables import load_table

# --- cell-sampled eps-retention curve ------------------------------------

# md5 bucket rate (percent) for CELL sampling.  50 keeps 6 of the
# fixture's 10 cells (~290-310 vectors); measured curve deviation vs
# the full corpus: <=14,693 ppm (sf0.001) / <=15,463 ppm (sf0.01) —
# under 1.6 retention points, vs 190,000-326,000 ppm for doc-sampling
# at comparable rates.
_SEMDEDUP_CELL_RATE = 50


@query(
    "semdedup_eps_curve_sampled",
    oracle=_semdedup_curve_oracle(_SEMDEDUP_CELL_RATE),
    wave=10,
)
def semdedup_eps_curve_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup eps calibration on a deterministic 50% CELL sample:
    cluster the full corpus (linear — the step a prune needs anyway),
    keep only cells whose md5 bucket < {rate}, run the exact intra-cell
    pair pipeline on those cells alone, and report the same
    (eps_bp, n_dropped, n_total, retention_ppm) curve as
    ``semdedup_eps_retention_curve`` with the SAMPLE as denominator.

    Why cells, not documents: retention is a PAIR statistic.  A
    md5-sampled document set thins pairs by rate^2 against a
    denominator thinned by rate, overstating retention (measured
    +31-33 points at 40% doc-sampling on the fixture).  Cell sampling
    is cluster sampling: no pair crosses a cell, so each sampled cell
    contributes its exact pair structure and the estimator is unbiased
    over the cell draw — measured <=1.6 points deviation at both
    fixture SFs (tolerance test-pinned vs the full curve).

    Scale shape: identical to the full curve's (shared
    ``_semdedup_sim`` pipeline — shard-capped, ``never_broadcast``
    pair join, in-array dot products) except the pair pass runs over
    ~rate% of cells: at 100 TB the calibration costs ~rate% of the
    prune's candidate volume while the cluster step is the linear
    pass already measured in SCALING.md round 8.  The sample is
    deterministic (md5 of the cell id), so the curve is reproducible
    and DuckDB-oracle-checkable end to end.
    """
    m, sim = _semdedup_sim(spark, sf_dir, cell_rate=_SEMDEDUP_CELL_RATE)
    t = m.agg(F.count(F.lit(1)).alias("n_total"))
    return retention_curve_frame(spark, sim, t)


semdedup_eps_curve_sampled.__doc__ = semdedup_eps_curve_sampled.__doc__.format(
    rate=_SEMDEDUP_CELL_RATE
)


# --- persisted semantic codebook: incremental novelty probe ---------------

_CODEBOOK_NOVELTY_ORACLE = (
    _kmeans_cte(
        5,
        source=(
            "(SELECT * FROM embeddings WHERE vec_id <="
            " (SELECT (MIN(vec_id) + MAX(vec_id)) // 2 FROM embeddings))"
        ),
    )
    + f""",
    c5 AS MATERIALIZED (
      SELECT a.cell, q.pos,
             CAST(SUM(q.vq) AS DOUBLE) / (1000000.0 * COUNT(*)) AS c
      FROM a5 a JOIN q ON q.vec_id = a.vec_id
      GROUP BY 1, 2),
    qn AS MATERIALIZED (
      SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0 + 0.5)
                  AS BIGINT) AS vq
      FROM embeddings
      WHERE vec_id > (SELECT (MIN(vec_id) + MAX(vec_id)) // 2
                      FROM embeddings)),
    dn AS MATERIALIZED (
      SELECT qn.vec_id, c.cell,
             SUM(CAST(FLOOR((qn.vq / 1000000.0 - c.c) * (qn.vq / 1000000.0 - c.c)
                            * 1000000000000.0 + 0.5) AS BIGINT)) AS dfp
      FROM qn JOIN c5 c ON c.pos = qn.pos
      GROUP BY 1, 2),
    an AS MATERIALIZED (
      SELECT vec_id, FIRST(cell ORDER BY dfp, cell) AS cell
      FROM dn GROUP BY vec_id),
    nrm_s AS (SELECT vec_id, SUM(vq * vq) AS nn FROM q GROUP BY 1),
    nrm_n AS (SELECT vec_id, SUM(vq * vq) AS nn FROM qn GROUP BY 1),
    pr AS MATERIALIZED (
      SELECT n.vec_id AS id_new, s.vec_id AS id_seen,
             SUM(qn.vq * qs.vq) AS dot
      FROM an n JOIN a5 s ON s.cell = n.cell
      JOIN qn ON qn.vec_id = n.vec_id
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
           CAST(COALESCE(a.n_seen_dups, 0) AS BIGINT) AS n_seen_dups,
           CAST(COALESCE(a.max_cos_bp, {_NO_PEER_BP}) AS BIGINT) AS max_cos_bp,
           CAST(CASE WHEN a.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
             AS is_novel
    FROM an n LEFT JOIN agg a ON a.vec_id = n.vec_id
"""
)


@query("semdedup_codebook_novelty", oracle=_CODEBOOK_NOVELTY_ORACLE, wave=10)
def semdedup_codebook_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental semantic novelty against a PERSISTED codebook: the
    seen half (vec_id <= mid) is k-means-clustered once (the exact
    wave-9 Lloyd pipeline, k from the label init) and persisted as two
    tables — the final codebook (k rows) and the per-cell quantized
    members (bucketed on cell, written in two generations: initial
    build + a bucketed APPEND of the second quarter, the per-batch
    admission path between codebook refits); the new batch (vec_id >
    mid) is then
    assigned to cells via the broadcast codebook and checked by EXACT
    intra-cell cosine against persisted members only.  Output: one row
    per new vector — (cell, count of seen duplicates at cosine >=
    {eps} bp, max duplicate cosine, is_novel flag) — the semantic twin
    of ``lsh_band_index_lifecycle``'s lexical probe, completing the
    batch/incremental symmetry for the semantic dedup ladder.

    Zero seen-side recompute (test-pinned): the probe plan's seen side
    is parquet scans of the two persisted tables — no Lloyd iteration,
    no posexplode, no centroid arithmetic.  At 100 TB this converts
    "re-cluster history every day" into one amortized build plus a
    per-batch probe, exactly as the band index did for MinHash.

    Determinism: same integer-quantized arithmetic as wave 9
    (components at 1e-6, squared distances at 1e-12, cosine rounded
    once to bp; the only floats are single IEEE ops over identical
    operands in both engines), so the persisted path is oracle-exact
    against the unrolled seen-half Lloyd CTE.

    Scale shape: probe cost is |batch| x k for assignment (codebook
    broadcast — k rows, bounded) plus |batch| x avg-cell-size for the
    membership check — the IVF-probe cost model (``ann_ivf_topk``),
    with the members join bucketed on cell so the (large, growing)
    seen side never exchanges; only the day's batch shuffles.  The
    members join is data-scaled on the seen side -> pinned sort-merge
    (``never_broadcast``).  Production bounds cell size by growing k
    with the corpus; k is fixed here by the shared-oracle contract
    (same documented trade as wave 9's shard cap).
    """
    from awsbatch_mapreduce_spark.plans.wave5 import (
        _scratch_dir,
        _scratch_tag,
        _table_names,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    b = emb.agg(F.min("vec_id").alias("lo"), F.max("vec_id").alias("hi")).first()
    mid = (b.lo + b.hi) // 2  # oracle: (MIN + MAX) // 2, ids positive

    tag = _scratch_tag(sf_dir)
    base = _scratch_dir("awsbatch_semdedup_idx", sf_dir)
    mem_tbl = f"semdedup_members_{tag}"
    cb_tbl = f"semdedup_codebook_{tag}"
    for t in _table_names(spark):
        if (
            t.startswith(("semdedup_members_", "semdedup_codebook_"))
            and not t.endswith(tag)
        ):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.sql(f"DROP TABLE IF EXISTS {mem_tbl}")
    spark.sql(f"DROP TABLE IF EXISTS {cb_tbl}")

    seen = emb.filter(F.col("vec_id") <= F.lit(mid))
    assigned, _ = kmeans_fit(
        seen.select("vec_id", "embedding"), label_centroid_init(seen), n_iter=5
    )
    # the BUILD (amortized, once per corpus generation): final Lloyd
    # codebook + per-cell quantized members with precomputed norms
    (
        _centroids_of(assigned)
        .write.option("path", os.path.join(base, cb_tbl))
        .mode("overwrite")
        .saveAsTable(cb_tbl)
    )
    members_frame = assigned.select(
        F.col("vec_id").alias("seen_id"),
        F.col("cell").cast("int").alias("cell"),
        F.col("vq").alias("vq_s"),
        F.aggregate(
            "vq", F.lit(0).cast("bigint"), lambda acc, v: acc + v * v
        ).alias("nn_s"),
    )
    # two generations, as the band index does: initial build (first
    # quarter of vec_ids) + a bucketed APPEND of the second quarter
    # ("yesterday's admitted batch") — the per-batch admission path a
    # production pipeline runs between codebook refits; the bucket
    # spec must match the table's, so the probe keeps reading the
    # grown index exchange-free
    q1 = (b.lo + mid) // 2  # plan-internal build/append boundary
    (
        members_frame.filter(F.col("seen_id") <= F.lit(q1))
        .write.bucketBy(8, "cell")
        .sortBy("cell")
        .option("path", os.path.join(base, mem_tbl))
        .mode("overwrite")
        .saveAsTable(mem_tbl)
    )
    (
        members_frame.filter(F.col("seen_id") > F.lit(q1))
        .write.bucketBy(8, "cell")
        .sortBy("cell")
        .mode("append")
        .saveAsTable(mem_tbl)
    )
    # the build is on disk; the probe reads only the tables, so the
    # fit's cached assignment frame would otherwise stay pinned for
    # the session (one dead copy per builder call under bench's reps)
    assigned.unpersist()

    # the PROBE (per batch): assign via broadcast codebook, exact
    # cosine against persisted members of the assigned cell only
    new = emb.filter(F.col("vec_id") > F.lit(mid)).select(
        "vec_id", _quantize(F.col("embedding")).alias("vq")
    )
    assigned_new = assign_to_cells_collected(new, spark.table(cb_tbl)).select(
        "vec_id",
        F.col("cell").cast("int").alias("cell"),
        "vq",
        F.aggregate(
            "vq", F.lit(0).cast("bigint"), lambda acc, v: acc + v * v
        ).alias("nn_n"),
    )
    members = spark.table(mem_tbl)
    dot = F.aggregate(
        F.zip_with(F.col("vq"), F.col("vq_s"), lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    hits = (
        assigned_new.join(never_broadcast(members), "cell")
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
        assigned_new.select("vec_id", "cell")
        .join(never_broadcast(hits), "vec_id", "left")
        .select(
            F.col("vec_id").cast("bigint").alias("vec_id"),
            "cell",
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


semdedup_codebook_novelty.__doc__ = semdedup_codebook_novelty.__doc__.format(
    eps=_SEMDEDUP_EPS_BP
)
