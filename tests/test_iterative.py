"""k-means convergence: inertia must be monotone non-increasing."""

from __future__ import annotations

from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.plans import QUERIES
from awsbatch_mapreduce_spark.plans.iterative import kmeans_fit
from awsbatch_mapreduce_spark.sources.tables import load_table
from tests.conftest import SF_DIR_ORACLE


def test_kmeans_inertia_monotone(spark):
    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    corpus = emb.select("vec_id", "embedding")
    init = (
        emb.select(
            F.col("label").cast("int").alias("cell"),
            F.posexplode("embedding").alias("pos", "v"),
        )
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
    assigned, trace = kmeans_fit(corpus, init, n_iter=4)
    assert len(trace) == 4
    assert all(b <= a + 1e-9 for a, b in zip(trace, trace[1:])), trace
    assert trace[-1] < trace[0]  # labels are weak clusters; must improve
    assigned.unpersist()


def test_kmeans_query_shape(spark):
    df = QUERIES["kmeans_embeddings"].builder(spark, SF_DIR_ORACLE)
    rows = df.collect()
    assert sum(r.n_members for r in rows) == 500
    assert all(r.inertia >= 0 for r in rows)
