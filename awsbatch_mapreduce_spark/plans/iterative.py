"""Iterative algorithms on the engine: Lloyd k-means over embeddings.

The class of computation the driver's oracle gate can't express in one
SQL statement (genuinely iterative; registered rows-only, per the
contract's carve-out).  Each iteration is pure DataFrame algebra —
assign = broadcast-codebook argmin, update = posexplode + grouped avg —
so the per-iteration cost model is identical to the IVF build in
``plans.similarity`` and scales the same way: the corpus is scanned
once per iteration, centroids stay tiny and broadcast.

Convergence (monotone non-increasing inertia) is asserted in
``tests/test_iterative.py`` — the property that matters, since cluster
ids themselves are init-dependent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from awsbatch_mapreduce_spark.functions.rounding import dround
from awsbatch_mapreduce_spark.plans.registry import query
from awsbatch_mapreduce_spark.sources.tables import load_table


def _sq_dist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _centroids_of(assigned: DataFrame) -> DataFrame:
    """cell assignment -> per-cell mean vector (posexplode + grouped avg
    + ordered re-assembly)."""
    flat = assigned.select(
        "cell", F.posexplode("embedding").alias("pos", "v")
    ).groupBy("cell", "pos").agg(F.avg(F.col("v").cast("double")).alias("cv"))
    return flat.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cv"))), lambda s: s["cv"]
        ).alias("centroid")
    )


def kmeans_fit(
    corpus: DataFrame, k_init: DataFrame, n_iter: int = 5
) -> tuple[DataFrame, list[float]]:
    """Run ``n_iter`` Lloyd iterations; return (final assignment,
    per-iteration inertia trace).

    Driver holds only the loop counter and inertia scalars; data never
    leaves the cluster.  Each iteration persists its assignment and
    unpersists the previous one so the lineage (and recomputation) does
    not grow with the iteration count — the standard Spark iterative-
    algorithm pattern.
    """
    centroids = k_init
    assigned_prev = None
    inertia_trace: list[float] = []
    for _ in range(n_iter):
        w = Window.partitionBy("vec_id").orderBy(F.asc("d"), F.asc("cell"))
        assigned = (
            corpus.crossJoin(F.broadcast(centroids))
            .select(
                "vec_id",
                "embedding",
                "cell",
                _sq_dist(F.col("embedding"), F.col("centroid")).alias("d"),
            )
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .drop("rk")
            .persist()
        )
        inertia_trace.append(
            assigned.agg(F.sum("d").alias("i")).collect()[0]["i"]
        )
        centroids = _centroids_of(assigned)
        if assigned_prev is not None:
            assigned_prev.unpersist()
        assigned_prev = assigned
    return assigned_prev, inertia_trace


@query("kmeans_embeddings", oracle=None)  # iterative: rows-only check
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5 Lloyd iterations, k=10, init = per-label centroids (deterministic).

    Output: per-cluster size and rounded inertia contribution — stable
    aggregate shape for the rows-only gate.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", "embedding")
    init = (
        emb.select(F.col("label").cast("int").alias("cell"),
                   F.posexplode("embedding").alias("pos", "v"))
        .groupBy("cell", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("cv"))
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                lambda s: s["cv"],
            ).alias("centroid")
        )
    )
    assigned, _ = kmeans_fit(corpus, init, n_iter=5)
    return assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_members"),
        dround(F.sum("d"), 4).alias("inertia"),
    )


_CANONICAL_ORACLE = """
    WITH RECURSIVE pairs AS (
      -- near-dup relation: shared 24-char prefix; emit only CONSECUTIVE
      -- ids per group so the closure must chain A-B-C (diameter > 1)
      SELECT prev AS id_a, doc_id AS id_b FROM (
        SELECT doc_id,
               LAG(doc_id) OVER (PARTITION BY substr(text, 1, 24)
                                 ORDER BY doc_id) AS prev
        FROM documents)
      WHERE prev IS NOT NULL),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
    reach(node, root) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node),
    comp AS (SELECT node, MIN(root) AS canonical FROM reach GROUP BY node)
    SELECT CAST(node AS BIGINT) AS doc_id,
           CAST(canonical AS BIGINT) AS canonical_id
    FROM comp
    WHERE node <> canonical
"""


@query("dedup_canonical_assignment", oracle=_CANONICAL_ORACLE)
def dedup_canonical_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one dedup: map every duplicate document to the minimum
    doc_id of its connected component.  The pair generator (shared
    24-char prefix here; exact/MinHash/embedding pairs in production)
    emits only consecutive-id edges per group, so components CHAIN —
    A~B, B~C implies {A,B,C} even though A~C was never emitted, which
    is exactly why dedup needs a closure, not a pairwise join.

    Spark side: iterative min-label propagation over the edge list
    with POINTER DOUBLING — each round a node adopts the min of its
    neighbours' labels and of its label's own label, so the frontier
    distance doubles per round and an L-node chain converges in
    O(log L) rounds, not L (8 rounds covers 256-hop chains).  Each
    round's labels are localCheckpoint-ed: caching alone keeps the
    DATA but Catalyst still re-analyzes the k-deep logical plan every
    round, which dominates (measured 33 s -> ~5 s at sf0.1);
    truncating lineage per round is the same discipline GraphFrames
    applies to its iterative algorithms.  The
    oracle walks the same closure with a recursive CTE.  At 100 TB
    this is the standard "dedup keep-one" reduce after any pair
    generator (exact, MinHash, embedding).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w_grp = Window.partitionBy(F.substring("text", 1, 24)).orderBy("doc_id")
    pairs = (
        docs.withColumn("prev", F.lag("doc_id").over(w_grp))
        .filter(F.col("prev").isNotNull())
        .select(F.col("prev").alias("src"), F.col("doc_id").alias("dst"))
    )
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()

    # label propagation to fixpoint: label(node) = min reachable id
    labels = (
        edges.select("src")
        .distinct()
        .select(F.col("src").alias("node"), F.col("src").alias("label"))
        .localCheckpoint()
    )
    for _ in range(8):  # covers chains up to 2^8 hops via doubling
        one_hop = edges.join(labels, edges.src == labels.node).select(
            F.col("dst").alias("node"), "label"
        )
        # pointer doubling: every label value is itself a node key, so
        # label(label) is always defined
        doubled = (
            labels.alias("a")
            .join(labels.alias("b"), F.col("a.label") == F.col("b.node"))
            .select(F.col("a.node").alias("node"), F.col("b.label").alias("label"))
        )
        prop = (
            one_hop.unionByName(labels)
            .unionByName(doubled)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            prop.alias("p")
            .join(labels.alias("l"), "node")
            .filter(F.col("p.label") != F.col("l.label"))
            .limit(1)
            .count()
        )
        labels = prop
        if changed == 0:
            break
    edges.unpersist()
    return labels.filter(F.col("node") != F.col("label")).select(
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("label").cast("bigint").alias("canonical_id"),
    )
