"""Python UDTF surface + approximate-sketch aggregates.

The UDTF (table function) is the last UDF shape the engine had not
pinned: one input row -> many output rows with arbitrary schema,
executed Arrow-batched per partition.  The sketch query covers the
approximate aggregates a 100 TB deployment actually uses
(``approx_count_distinct`` HLL, ``percentile_approx`` KLL-ish) —
registered rows-only since approximation is engine-specific by design;
the accompanying test bounds their error against exact values instead.
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


@query("approx_sketches", oracle=None)  # approximation is engine-specific
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct users + approximate percentiles of value per event
    type — the sketch aggregates that replace exact distinct/percentile
    at 100 TB (mergeable, bounded memory, one pass).

    Rows-only under the gate; ``tests/test_udtf_sketch.py`` bounds the
    estimates against exact values (HLL rsd<=5%, KLL within rank
    tolerance), which is the meaningful correctness statement for a
    sketch.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.05).alias("approx_users"),
        F.percentile_approx("value", [0.5, 0.95], 10_000).alias("approx_p50_p95"),
        F.count(F.lit(1)).alias("n"),
    )
