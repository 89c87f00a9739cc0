"""Python UDTF surface + approximate-sketch aggregates.

The UDTF (table function) is the last UDF shape the engine had not
pinned: one input row -> many output rows with arbitrary schema,
executed Arrow-batched per partition.  The sketch query covers the
approximate aggregates a 100 TB deployment actually uses
(``approx_count_distinct`` HLL, ``percentile_approx`` KLL-ish) —
oracle-gated via exact counts + within-tolerance flags, since the
estimates themselves are engine-specific by design; the accompanying
test additionally bounds their error against exact values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.plans.registry import query
from awsbatch_mapreduce_spark.sources.tables import load_table

_WORDS_ORACLE = """
    WITH w AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) AS word_idx,
             unnest(string_split(text, ' ')) AS word
      FROM documents)
    SELECT doc_id, CAST(word_idx AS INT) AS word_idx, word,
           CAST(len(word) AS INT) AS word_len
    FROM w
"""


@query("udtf_word_explode", oracle=_WORDS_ORACLE)
def udtf_word_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode documents into (word, ordinal) rows via a Python UDTF —
    the lateral table-function shape (one row in, N rows out, own
    schema).  Splitting on a single space matches the oracle's
    ``string_split`` exactly (both keep empty strings on runs).

    For a pure split, ``posexplode(split(...))`` would stay JVM-side
    and be faster; the UDTF exists to pin the extension point where
    per-row Python fan-out is genuinely needed (parsers, tokenizers).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id BIGINT, word_idx INT, word STRING, word_len INT")
    class WordExplode:
        def eval(self, doc_id: int, text: str):
            for i, w in enumerate(text.split(" "), start=1):
                yield doc_id, i, w, len(w)

    spark.udtf.register("word_explode", WordExplode)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        "SELECT w.* FROM docs_for_udtf, LATERAL word_explode(doc_id, text) AS w"
    )


_SKETCH_ORACLE = """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(1 AS BIGINT) AS users_ok,
           CAST(1 AS BIGINT) AS p50_ok,
           CAST(1 AS BIGINT) AS p95_ok
    FROM events GROUP BY event_type
"""


@query("approx_sketches", oracle=_SKETCH_ORACLE)
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct users + approximate percentiles of value per event
    type — the sketch aggregates that replace exact distinct/percentile
    at 100 TB (mergeable, bounded memory, one pass).

    Sketch estimates are engine-specific, so the oracle contract is the
    QA-harness shape: exact row/distinct counts (integer, hash-exact in
    both engines) plus within-tolerance flags — Spark compares its OWN
    estimate against the exact value computed in the same query (HLL at
    rsd=0.05 gets a 3-sigma/15% band; percentile_approx at accuracy 10k
    is compared element-to-element against the max-accuracy discrete
    percentile, with a band of 5% of magnitude plus the 45-55 / 93-97
    bracket gap so sparse value regions near the quantile cannot flip
    the flag), while DuckDB emits the exact values and
    literal 1 flags.  The exact twins exist only as the comparison
    baseline; a 100 TB deployment runs the sketch columns alone.
    Tighter error-bound pins stay in ``tests/test_udtf_sketch.py``.
    """
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("approx_users"),
        F.percentile_approx("value", 0.5, 10_000).alias("approx_p50"),
        F.percentile_approx("value", 0.95, 10_000).alias("approx_p95"),
        # Discrete (element-valued) baselines: percentile_approx always
        # returns an actual data element, so comparing it against an
        # INTERPOLATED exact percentile can exceed any fixed band on
        # sparse/bimodal data.  At accuracy 1e6 the rank error is
        # < n/1e6 rows — exact order statistics at these fixture sizes.
        # The 45/55 (93/97) brackets bound the value gap a rank-window
        # around the quantile can introduce.
        F.percentile_approx(
            "value", F.array(F.lit(0.45), F.lit(0.5), F.lit(0.55)), 1_000_000
        ).alias("disc50"),
        F.percentile_approx(
            "value", F.array(F.lit(0.93), F.lit(0.95), F.lit(0.97)), 1_000_000
        ).alias("disc95"),
    ).select(
        "*",
        F.col("disc50")[1].alias("exact_p50"),
        F.col("disc95")[1].alias("exact_p95"),
        (F.col("disc50")[2] - F.col("disc50")[0]).alias("gap50"),
        (F.col("disc95")[2] - F.col("disc95")[0]).alias("gap95"),
    )

    def within(approx: str, exact: str, tol: str):
        return F.expr(
            f"CAST(abs({approx} - {exact}) <= {tol} AS BIGINT)"
        )

    return g.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("exact_users").cast("bigint").alias("exact_users"),
        within(
            "approx_users", "exact_users", "greatest(3.0, 0.15 * exact_users)"
        ).alias("users_ok"),
        within(
            "approx_p50",
            "exact_p50",
            "0.05 * greatest(abs(exact_p50), 1.0) + gap50",
        ).alias("p50_ok"),
        within(
            "approx_p95",
            "exact_p95",
            "0.05 * greatest(abs(exact_p95), 1.0) + gap95",
        ).alias("p95_ok"),
    )
