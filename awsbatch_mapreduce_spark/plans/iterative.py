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
