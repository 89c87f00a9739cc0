"""Similarity search over the ``embeddings`` fixture (64-dim float vecs).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant is the 100 TB scale path (candidate generation via sign-random-
projection buckets instead of the full cross join).  All vector math is
JVM-side (``zip_with``/``aggregate`` fold in double precision) — no
Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.functions.rounding import dround
from pyspark.sql.window import Window

from awsbatch_mapreduce_spark.plans.registry import query
from awsbatch_mapreduce_spark.sources.tables import load_table


def _dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two float array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm2(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


@query(
    "embedding_norms",
    oracle="""
        WITH e AS (SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
                          unnest(embedding) AS v
                   FROM embeddings)
        SELECT vec_id, CAST(MAX(label) AS INT) AS label,
               COUNT(*) AS dim,
               FLOOR((SQRT(SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) * 10000.0 + 0.5) / 10000.0 AS l2_norm
        FROM e GROUP BY vec_id
    """,
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector dimensionality + L2 norm (sanity/scale primitive)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.col("label").cast("int").alias("label"),
        F.size("embedding").cast("bigint").alias("dim"),
        dround(_norm2(F.col("embedding")), 4).alias("l2_norm"),
    )


_KNN_ORACLE = """
    WITH q AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                      unnest(embedding) AS v
               FROM embeddings WHERE vec_id < 8),
    d AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                 unnest(embedding) AS v
          FROM embeddings),
    dots AS (
      SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
             SUM(CAST(q.v AS DOUBLE) * CAST(d.v AS DOUBLE)) AS dot,
             SUM(CAST(q.v AS DOUBLE) * CAST(q.v AS DOUBLE)) AS qq,
             SUM(CAST(d.v AS DOUBLE) * CAST(d.v AS DOUBLE)) AS dd
      FROM q JOIN d ON q.i = d.i AND q.vec_id <> d.vec_id
      GROUP BY 1, 2)
    SELECT query_id, neighbor_id,
           FLOOR((dot / (SQRT(qq) * SQRT(dd))) * 10000.0 + 0.5) / 10000.0 AS cosine,
           CAST(ROW_NUMBER() OVER (
                PARTITION BY query_id
                ORDER BY FLOOR((dot / (SQRT(qq) * SQRT(dd))) * 10000.0 + 0.5) / 10000.0 DESC, neighbor_id)
                AS BIGINT) AS rk
    FROM dots
    QUALIFY rk <= 5
"""


@query("knn_bruteforce_cosine", oracle=_KNN_ORACLE)
def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for query vectors (vec_id < 8).

    Query side is broadcast (tiny); the corpus scan streams once.  Rank
    on *rounded* cosine with neighbor-id tie-break so the top-k set is
    engine-independent.  At 100 TB the same plan holds: broadcast the
    query batch, one corpus pass, per-query heap via window-limit.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    d = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("dv"))
    pairs = d.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    cosine = dround(
        _dot(F.col("qv"), F.col("dv")) / (_norm2(F.col("qv")) * _norm2(F.col("dv"))),
        4,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        pairs.select("query_id", "neighbor_id", cosine.alias("cosine"))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 5)
    )


@query(
    "embedding_centroid_per_label",
    oracle="""
        WITH e AS (SELECT label, generate_subscripts(embedding, 1) AS i,
                          unnest(embedding) AS v
                   FROM embeddings)
        SELECT CAST(label AS INT) AS label, CAST(i AS INT) AS dim_idx,
               FLOOR((AVG(CAST(v AS DOUBLE))) * 10000.0 + 0.5) / 10000.0 AS centroid_val,
               COUNT(*) AS n_vecs
        FROM e WHERE i <= 4 GROUP BY label, i
    """,
)
def embedding_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components (first 4 dims) — the reduce step of
    IVF coarse quantization / k-means, expressed as posexplode + agg."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        F.col("label").cast("int").alias("label"),
        F.posexplode("embedding").alias("pos", "v"),
    ).filter(F.col("pos") < 4)
    return (
        e.groupBy("label", (F.col("pos") + 1).cast("int").alias("dim_idx"))
        .agg(
            dround(F.avg(F.col("v").cast("double")), 4).alias("centroid_val"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
    )
