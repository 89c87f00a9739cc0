"""Catalog / lifecycle operators: snapshot diffing, inverted-index
build, language-ID evaluation, and column-statistics profiling.

These are the "run the data platform" capabilities around the core
query surface: detect what changed between corpus versions, build the
retrieval index, evaluate a classifier against labels, and collect the
per-column statistics a cost-based optimizer (or a data catalog) wants.

Scale notes (100 TB): the snapshot diff is a single full-outer
hash-join on the id with md5 content compare — bodies never shuffle
(16-byte digests do).  The inverted index shuffles (term, doc_id)
pairs once and truncates posting heads engine-side.  The confusion
matrix and stats profile are one-scan hash aggregates with bounded
output keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.plans.registry import query
from awsbatch_mapreduce_spark.sources.tables import load_table

# Snapshot B, derived deterministically from snapshot A (= documents):
# every 97th doc removed, every 13th doc's text revised, every 89th doc
# cloned as a new id.  The same derivation runs in both engines.
_SNAP_B_SQL = """
      SELECT doc_id,
             CASE WHEN doc_id % 13 = 0 THEN text || ' rev2' ELSE text END
               AS text
      FROM documents WHERE doc_id % 97 <> 0
      UNION ALL
      SELECT doc_id + 100000, text FROM documents WHERE doc_id % 89 = 0
"""

_DIFF_ORACLE = f"""
    WITH b AS ({_SNAP_B_SQL}),
    a AS (SELECT doc_id, md5(text) AS fp FROM documents),
    b2 AS (SELECT doc_id, md5(text) AS fp FROM b),
    j AS (SELECT COALESCE(a.doc_id, b2.doc_id) AS doc_id,
                 CASE WHEN a.doc_id IS NULL THEN 'added'
                      WHEN b2.doc_id IS NULL THEN 'removed'
                      WHEN a.fp <> b2.fp THEN 'changed'
                      ELSE 'unchanged' END AS status
          FROM a FULL OUTER JOIN b2 ON a.doc_id = b2.doc_id)
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM j GROUP BY status
"""


@query("dataset_snapshot_diff", oracle=_DIFF_ORACLE)
def dataset_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-version diff: added / removed / changed / unchanged
    counts between snapshot A and a deterministically derived
    snapshot B — the audit step before promoting a new training-data
    build.

    Contents are compared by md5 digest, so the full-outer join
    shuffles (id, 16-byte fp) pairs only, never document bodies; at
    100 TB the diff costs one id-keyed shuffle regardless of doc size.
    """
    docs = load_table(spark, sf_dir, "documents")
    a = docs.select("doc_id", F.md5("text").alias("fp"))
    b_kept = docs.filter(F.col("doc_id") % 97 != 0).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 13 == 0, F.concat("text", F.lit(" rev2"))
            ).otherwise(F.col("text"))
        ).alias("fp"),
    )
    b_new = docs.filter(F.col("doc_id") % 89 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), F.md5("text").alias("fp")
    )
    b = b_kept.unionByName(b_new)
    j = a.alias("a").join(
        b.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"), "full_outer"
    )
    status = (
        F.when(F.col("a.doc_id").isNull(), "added")
        .when(F.col("b.doc_id").isNull(), "removed")
        .when(F.col("a.fp") != F.col("b.fp"), "changed")
        .otherwise("unchanged")
    )
    return (
        j.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").alias("n_docs"))
    )


_INDEX_ORACLE = """
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents)
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS df,
           array_to_string(list_slice(list_sort(list(doc_id)), 1, 10), ',')
             AS postings_head
    FROM toks
    GROUP BY term
"""


@query("inverted_index_postings", oracle=_INDEX_ORACLE)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: per-term document frequency and the head
    of the sorted posting list (first 10 ids) — the retrieval-side
    index a RAG/search pipeline derives from the corpus.

    One shuffle of distinct (term, doc_id) pairs; posting lists are
    assembled per term and truncated engine-side, so the output stays
    bounded however large the corpus (a real deployment shards the
    full postings by term range — same plan shape, bigger slice).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).distinct()
    return toks.groupBy("term").agg(
        F.count("*").alias("df"),
        F.concat_ws(
            ",",
            F.slice(F.sort_array(F.collect_list("doc_id")), 1, 10).cast(
                "array<string>"
            ),
        ).alias("postings_head"),
    )


_CONFUSION_ORACLE = """
    SELECT lang AS lang_true,
           CASE WHEN len(list_filter(string_split(text, ' '),
                                     x -> x IN ('the', 'a', 'of', 'and'))) >= 2
                THEN 'en'
                WHEN len(list_filter(string_split(text, ' '),
                                     x -> x IN ('el', 'la', 'de', 'y'))) >= 2
                THEN 'es'
                ELSE 'unknown' END AS lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY 1, 2
"""


@query("lang_id_confusion", oracle=_CONFUSION_ORACLE)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword language-ID heuristic
    (``text_language_id``) against the fixture's ``lang`` labels —
    the evaluation rollup that decides whether a classifier gates
    ingest.

    Same predictor expression as ``text_language_id``; one scan, one
    hash aggregate on a (true, pred) key of bounded cardinality.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    en_hits = F.size(F.filter(toks, lambda x: x.isin("the", "a", "of", "and")))
    es_hits = F.size(F.filter(toks, lambda x: x.isin("el", "la", "de", "y")))
    pred = (
        F.when(en_hits >= 2, "en")
        .when(es_hits >= 2, "es")
        .otherwise("unknown")
    )
    return (
        docs.select(F.col("lang").alias("lang_true"), pred.alias("lang_pred"))
        .groupBy("lang_true", "lang_pred")
        .agg(F.count("*").alias("n_docs"))
    )


_STATS_ORACLE = """
    WITH s AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(*) FILTER (WHERE o_orderpriority IS NULL) AS nn_pri,
             COUNT(DISTINCT o_orderpriority) AS ndv_pri,
             CAST(MIN(o_orderpriority) AS VARCHAR) AS mn_pri,
             CAST(MAX(o_orderpriority) AS VARCHAR) AS mx_pri,
             COUNT(*) FILTER (WHERE o_custkey IS NULL) AS nn_cust,
             COUNT(DISTINCT o_custkey) AS ndv_cust,
             CAST(MIN(o_custkey) AS VARCHAR) AS mn_cust,
             CAST(MAX(o_custkey) AS VARCHAR) AS mx_cust,
             COUNT(*) FILTER (WHERE o_orderstatus IS NULL) AS nn_st,
             COUNT(DISTINCT o_orderstatus) AS ndv_st,
             CAST(MIN(o_orderstatus) AS VARCHAR) AS mn_st,
             CAST(MAX(o_orderstatus) AS VARCHAR) AS mx_st
      FROM orders)
    SELECT 'o_orderpriority' AS col_name, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(nn_pri AS BIGINT) AS n_nulls, CAST(ndv_pri AS BIGINT) AS ndv,
           mn_pri AS min_value, mx_pri AS max_value FROM s
    UNION ALL
    SELECT 'o_custkey', n_rows, nn_cust, ndv_cust, mn_cust, mx_cust FROM s
    UNION ALL
    SELECT 'o_orderstatus', n_rows, nn_st, ndv_st, mn_st, mx_st FROM s
"""


@query("analyze_table_stats", oracle=_STATS_ORACLE)
def analyze_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics (rows, nulls, exact NDV,
    min/max) for a column set, emitted as one catalog-shaped report —
    what a cost-based optimizer ingests to pick join orders and a
    data catalog shows users.

    All columns profile in ONE scan (Spark expands the multi-distinct
    aggregate internally); min/max are stringified so the report has a
    uniform schema across column types.  At 100 TB swap exact NDV for
    ``approx_count_distinct`` — same plan, sketch merge instead of
    expand (documented trade, exact here to stay oracle-checkable).
    """
    o = load_table(spark, sf_dir, "orders")
    agg = o.agg(
        F.count("*").alias("n_rows"),
        *[
            e
            for c, tag in [
                ("o_orderpriority", "pri"),
                ("o_custkey", "cust"),
                ("o_orderstatus", "st"),
            ]
            for e in (
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias(f"nn_{tag}"),
                F.countDistinct(c).alias(f"ndv_{tag}"),
                F.min(F.col(c)).cast("string").alias(f"mn_{tag}"),
                F.max(F.col(c)).cast("string").alias(f"mx_{tag}"),
            )
        ],
    )
    return agg.selectExpr(
        "stack(3, "
        "'o_orderpriority', nn_pri, ndv_pri, mn_pri, mx_pri, "
        "'o_custkey', nn_cust, ndv_cust, mn_cust, mx_cust, "
        "'o_orderstatus', nn_st, ndv_st, mn_st, mx_st) "
        "AS (col_name, n_nulls, ndv, min_value, max_value)",
        "n_rows",
    ).select("col_name", "n_rows", "n_nulls", "ndv", "min_value", "max_value")
