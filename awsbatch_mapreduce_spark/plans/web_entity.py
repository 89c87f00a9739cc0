"""Web-corpus curation operators: URL/domain profiling, blocked entity
resolution, and unigram language-model quality scoring.

The fixture corpus contains no URLs and no dirty entity variants
(FIXTURES.md), so both are PLANTED deterministically from fixture
columns — the identical expression in both engines — keeping the
operators non-vacuous and oracle-checkable.

Scale notes (100 TB): URL extraction is a zero-shuffle map + one hash
aggregate keyed by domain (bounded cardinality).  Entity resolution
never goes quadratic — candidates come from a block-key equi-join
(the canonical record-linkage blocking strategy) and only candidates
pay the levenshtein verify, all JVM-side.  The unigram model is a
31-row broadcast; token streams never shuffle until the per-doc rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from awsbatch_mapreduce_spark.functions.rounding import dround
from awsbatch_mapreduce_spark.plans.registry import query
from awsbatch_mapreduce_spark.sources.tables import load_table

# Every doc gains one source-derived URL; every 3rd doc a mirror URL.
_URL_RE = "https?://[a-z0-9.-]+/[a-z0-9]+"

_URL_ORACLE = f"""
    WITH a AS (
      SELECT doc_id,
             text || ' see https://' || source || '.example.org/d' || doc_id
             || CASE WHEN doc_id % 3 = 0
                     THEN ' or https://mirror.example.net/d' || doc_id
                     ELSE '' END AS aug
      FROM documents),
    u AS (SELECT doc_id, unnest(regexp_extract_all(aug, '{_URL_RE}')) AS url
          FROM a)
    SELECT regexp_extract(url, 'https?://([a-z0-9.-]+)/', 1) AS domain,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM u
    GROUP BY 1
"""


@query("url_domain_stats", oracle=_URL_ORACLE)
def url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain URL profile of the corpus — the link-analysis pass a
    web-scrape pipeline runs for domain allow/deny lists.

    ``regexp_extract_all`` + ``parse_url(HOST)`` are JVM built-ins; the
    whole query is one scan, one explode, one hash aggregate on a
    bounded domain key — no Python, no quadratic step, shuffles only
    (domain, partial-count) pairs.
    """
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        "text",
        F.lit(" see https://"),
        "source",
        F.lit(".example.org/d"),
        F.col("doc_id").cast("string"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" or https://mirror.example.net/d"),
                F.col("doc_id").cast("string"),
            ),
        ).otherwise(""),
    )
    urls = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(aug, F.lit(_URL_RE), 0)).alias("url"),
    )
    return (
        urls.select("doc_id", F.parse_url("url", F.lit("HOST")).alias("domain"))
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        )
    )


# Dirty variant: char 10 of c_name (first digit) overwritten with 'X'
# for every 10th customer -> levenshtein 1 from its source record.
_ER_ORACLE = """
    WITH dirty AS (
      SELECT c_custkey AS dirty_key,
             substr(c_name, 1, 9) || 'X' || substr(c_name, 11) AS dirty_name,
             right(c_name, 4) AS blk
      FROM customer WHERE c_custkey % 10 = 0),
    clean AS (SELECT c_custkey AS clean_key, c_name, right(c_name, 4) AS blk
              FROM customer),
    cand AS (
      SELECT dirty_key, clean_key,
             CAST(levenshtein(dirty_name, c_name) AS BIGINT) AS edit_distance
      FROM dirty JOIN clean USING (blk)
      WHERE levenshtein(dirty_name, c_name) <= 2)
    SELECT dirty_key, clean_key AS matched_key, edit_distance
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY dirty_key
            ORDER BY edit_distance, clean_key) AS rk
          FROM cand)
    WHERE rk = 1
"""


@query("entity_resolution_blocked", oracle=_ER_ORACLE)
def entity_resolution_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage with blocking: dirty records (planted 1-char
    corruptions) match back to clean customers via a block-key
    equi-join (last 4 name chars) + levenshtein <= 2 verify, keeping
    the best match per dirty record.

    The blocking join is the scale story: candidates are
    per-block cross products (block size O(1) here), never the
    |dirty| x |clean| cross — the same bucket-then-verify shape as
    every near-dup path in this engine.  ``levenshtein`` is a JVM
    built-in evaluated only on candidates.
    """
    cust = load_table(spark, sf_dir, "customer")
    dirty = cust.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("dirty_key"),
        F.concat(
            F.substring("c_name", 1, 9),
            F.lit("X"),
            F.expr("substr(c_name, 11)"),
        ).alias("dirty_name"),
        F.expr("right(c_name, 4)").alias("blk"),
    )
    clean = cust.select(
        F.col("c_custkey").alias("clean_key"),
        "c_name",
        F.expr("right(c_name, 4)").alias("blk"),
    )
    cand = (
        dirty.join(clean, "blk")
        .withColumn(
            "edit_distance",
            F.levenshtein("dirty_name", "c_name").cast("bigint"),
        )
        .filter(F.col("edit_distance") <= 2)
    )
    w = Window.partitionBy("dirty_key").orderBy("edit_distance", "clean_key")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("dirty_key", F.col("clean_key").alias("matched_key"), "edit_distance")
    )


# Per-token log-probs are quantized to integer micro-units BEFORE the
# per-doc sum: summing k/1e6 doubles is accumulation-order-dependent,
# summing the int64 micro-units is exact ([[cross-engine-determinism]]).
_LM_ORACLE = """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    wc AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT SUM(c) AS total FROM wc),
    lp AS (SELECT tok,
                  CAST(FLOOR(ln(c * 1.0 / total) * 1000000.0 + 0.5) AS BIGINT)
                    AS lp_micro
           FROM wc, tot)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           FLOOR(((SUM(lp_micro) * 1.0 / 1000000.0) / COUNT(*)) * 10000.0
                 + 0.5) / 10000.0 AS avg_logprob
    FROM toks JOIN lp USING (tok)
    GROUP BY doc_id
"""


@query("text_unigram_logprob", oracle=_LM_ORACLE)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score: per-doc mean log
    probability under the corpus unigram distribution — the cheap
    KenLM-perplexity stand-in used for quality filtering.

    The model (vocab -> log-prob) is tiny and BROADCAST; the corpus
    total comes from a one-row aggregate cross-joined in (the
    broadcast-scalar pattern, never a global window).  Tokens stay in
    their input partitions until the per-doc rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    wc = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = wc.agg(F.sum("c").alias("total"))
    lp = wc.crossJoin(F.broadcast(total)).select(
        "tok",
        F.floor(F.log(F.col("c") * 1.0 / F.col("total")) * 1000000.0 + 0.5)
        .cast("bigint")
        .alias("lp_micro"),
    )
    joined = toks.join(F.broadcast(lp), "tok")
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        dround(
            (F.sum("lp_micro") * 1.0 / 1000000.0) / F.count("*"), 4
        ).alias("avg_logprob"),
    )
