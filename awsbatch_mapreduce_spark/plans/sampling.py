"""Deterministic sampling / dataset-split operators for training-data
pipelines.

Random sampling (``df.sample``, ``sampleBy``, ``TABLESAMPLE``) is
engine- and partitioning-dependent — useless for a reproducible corpus
build and impossible to oracle-check.  The industry-standard fix is
*hash bucketing*: bucket = ``md5(stable_id) mod N``, which is (a)
deterministic across engines, runs, and cluster sizes, (b) uniform,
(c) stable under appends — a document keeps its split forever, so
train/test contamination can't creep in when the corpus grows.  Both
queries here are single narrow projections + filters: at 100 TB they
are one scan with zero shuffles (the aggregate in the split report is
map-side partial over a 15-row key domain).

The reference has no sampling surface (SURVEY.md §2 — none); this is
part of the LLM-data-pipeline extension mandated by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from awsbatch_mapreduce_spark.plans.registry import query
from awsbatch_mapreduce_spark.sources.tables import load_table


def md5_bucket(col: Column | str, n_buckets: int = 100) -> Column:
    """Deterministic uniform bucket in [0, n_buckets) from a stable id.

    First 8 hex chars of md5 → 32-bit uint → mod.  Identical maths in
    any engine with md5 (DuckDB twin: ``('0x' || substr(md5(x),1,8))::
    UBIGINT % n``).
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % n_buckets
    )


@query(
    "train_val_test_split",
    oracle="""
        SELECT CASE WHEN b < 80 THEN 'train'
                    WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split,
               lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        FROM (SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                     % 100 AS b,
                     lang,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              FROM documents)
        GROUP BY 1, 2
    """,
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test split by md5 bucket of doc_id, reported
    as per-(split, lang) doc and token counts.

    The split is a pure function of the document id: reproducible on
    any engine, any partitioning, any corpus size — the property that
    keeps eval sets uncontaminated across corpus versions.
    """
    docs = load_table(spark, sf_dir, "documents")
    b = md5_bucket("doc_id", 100)
    return (
        docs.select(
            F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias(
                "split"
            ),
            "lang",
            F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


@query(
    "stratified_sample_by_lang",
    oracle="""
        SELECT doc_id, lang
        FROM (SELECT doc_id, lang,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                     % 100 AS b
              FROM documents)
        WHERE b < CASE WHEN lang = 'en' THEN 20 ELSE 60 END
    """,
)
def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsample with per-language rates (en 20%, others
    60%) — the corpus-balancing move that upweights low-resource
    languages.  Same md5-bucket determinism as the splitter, so the
    exact kept-set is engine-independent (checked doc-by-doc, not just
    counts).
    """
    docs = load_table(spark, sf_dir, "documents")
    b = md5_bucket("doc_id", 100)
    rate = F.when(F.col("lang") == "en", F.lit(20)).otherwise(F.lit(60))
    return docs.filter(b < rate).select("doc_id", "lang")


@query(
    "corpus_shard_plan",
    oracle="""
        SELECT shard,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        FROM (SELECT CAST((ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                              doc_id) - 1)
                          % 8 AS BIGINT) AS shard,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              FROM documents)
        GROUP BY shard
    """,
)
def corpus_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export sharding: deterministically shuffle the corpus (order by
    md5 of the id — a reproducible random permutation) and deal docs
    round-robin into 8 shards; report per-shard doc/token totals.

    The report shows the balance an exporter gets from hash-shuffled
    round-robin — within a few percent on token totals without any
    bin-packing.  At scale the same expression feeds
    ``repartitionByRange``/``partitionBy('shard')`` for the actual
    write.

    The global rank is computed two-level so no single partition ever
    holds the whole corpus: md5 order is lexicographic, so bucket =
    first 2 hex chars partitions the permutation into 256 contiguous
    runs.  Rank within bucket is a *partitioned* window; bucket start
    offsets come from a 256-row count rollup joined triangle-style
    (broadcast, non-equi) — bounded work independent of corpus size.
    global_rank = offset[bucket] + rank_in_bucket, identical to the
    oracle's single ROW_NUMBER.
    """
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        F.md5(F.col("doc_id").cast("string")).alias("pkey"),
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    ).withColumn("bucket", F.substring("pkey", 1, 2))
    wb = Window.partitionBy("bucket").orderBy("pkey", "doc_id")
    ranked = keyed.withColumn("rk", F.row_number().over(wb))
    counts = keyed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    prior = counts.select(F.col("bucket").alias("pb"), F.col("n").alias("pn"))
    offsets = (
        counts.join(F.broadcast(prior), F.col("pb") < F.col("bucket"), "left")
        .groupBy("bucket")
        .agg(F.coalesce(F.sum("pn"), F.lit(0)).alias("off"))
    )
    return (
        ranked.join(F.broadcast(offsets), "bucket")
        .select(
            ((F.col("off") + F.col("rk") - 1) % 8).cast("bigint").alias("shard"),
            "n_tokens",
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


@query(
    "corpus_mixture_epochs",
    oracle="""
        SELECT source,
               CAST(epochs AS BIGINT) AS epochs,
               COUNT(*) AS n_rows_mixed,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_mixed
        FROM (
          SELECT source,
                 CAST(substr(source, 4) AS INT) % 3 + 1 AS epochs,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 unnest(generate_series(1, CAST(substr(source, 4) AS INT) % 3 + 1))
                     AS epoch
          FROM documents)
        GROUP BY source, epochs
    """,
)
def corpus_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-weighted corpus mixing: each source repeats for its epoch
    weight (derived here from the source id; a mixture config in
    production), the standard up-weighting move when composing a
    training mix from sources of unequal quality.

    The explode multiplies *rows* before the shuffle-free aggregate;
    in a real export the same sequence+explode feeds the shard writer,
    so a 3-epoch source appears three times in the output corpus.  The
    blow-up factor is bounded by max(epochs) — plan row-count estimates
    stay accurate, unlike a join against a weights table with skew.
    """
    docs = load_table(spark, sf_dir, "documents")
    weighted = docs.select(
        "source",
        (F.substring("source", 4, 10).cast("int") % 3 + 1).alias("epochs"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    exploded = weighted.select(
        "source",
        "epochs",
        "n_tokens",
        F.explode(F.sequence(F.lit(1), F.col("epochs"))).alias("epoch"),
    )
    return exploded.groupBy("source", F.col("epochs").cast("bigint").alias("epochs")).agg(
        F.count(F.lit(1)).alias("n_rows_mixed"),
        F.sum("n_tokens").alias("n_tokens_mixed"),
    )


@query(
    "domain_cap_sample",
    oracle="""
        SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
        FROM (SELECT doc_id, source,
                     ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
              FROM documents)
        WHERE rk <= 10
    """,
)
def domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap: keep at most 10 documents per source, chosen in
    deterministic md5 order — the standard defence against a handful
    of giant domains dominating a crawl-derived corpus.  Unlike a
    fraction-based downsample, a cap bounds every domain's contribution
    absolutely, and the md5 order makes the kept set a stable pseudo-
    random draw (append-stable: new docs only displace losers, never
    reshuffle winners... a doc's md5 rank among its peers is fixed).

    Scale shape: rank-within-domain plans as WindowGroupLimit — each
    task keeps <=10 candidates per domain before the shuffle, so the
    exchange carries O(domains x 10), not the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 10)
    )


@query(
    "token_budget_threshold",
    oracle="""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 CAST(len(list_distinct(string_split(text, ' '))) * 1000000
                      // len(string_split(text, ' ')) AS BIGINT) AS score
          FROM documents),
        c AS (
          SELECT doc_id, score, n_tokens,
                 SUM(n_tokens) OVER (
                   ORDER BY score DESC, doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum_tokens,
                 SUM(n_tokens) OVER () AS total_tokens
          FROM t)
        SELECT doc_id, score, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
        FROM c WHERE 2 * cum_tokens <= total_tokens
    """,
)
def token_budget_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-threshold calibration: keep the best documents (by
    unique-token-ratio score, integer-scaled so ordering is exact) in
    score order until half the corpus token budget is spent — how a
    curation pipeline picks the score cut that hits a target token
    count, instead of guessing a threshold.

    Scale shape: the naive form is a global ORDER BY score cumulative
    sum — one partition holding the corpus.  Here the cumsum is
    two-level: (1) bucket docs by score band (score div 10000, <=101
    bands), (2) per-band token totals (tiny) meet in a broadcast
    triangle join that yields each band's prefix offset, (3) the
    within-band cumsum windows partition on the band key.  Identical
    result to the global window — score bands are contiguous ranges of
    the global order — but every exchange is either hash-on-band or a
    broadcast of <=101 rows.  All-integer maths, so the ``2*cum <=
    total`` cut is engine-exact.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    t = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.expr(
            "CAST(size(array_distinct(split(text, ' '))) * 1000000L"
            " div size(split(text, ' ')) AS BIGINT)"
        ).alias("score"),
    ).withColumn("band", F.expr("score div 10000"))

    per_band = t.groupBy("band").agg(F.sum("n_tokens").alias("band_tokens"))
    # prefix offset per band = total tokens of strictly better bands
    hi = per_band.select(
        F.col("band").alias("hi_band"), F.col("band_tokens").alias("hi_tokens")
    )
    offsets = (
        per_band.join(
            F.broadcast(hi), F.col("hi_band") > F.col("band"), "left"
        )
        .groupBy("band")
        .agg(F.coalesce(F.sum("hi_tokens"), F.lit(0)).alias("band_offset"))
    )
    total = t.agg(F.sum("n_tokens").alias("total_tokens"))

    w = (
        Window.partitionBy("band")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.join(F.broadcast(offsets), "band")
        .withColumn(
            "cum_tokens",
            (F.sum("n_tokens").over(w) + F.col("band_offset")).cast("bigint"),
        )
        .crossJoin(F.broadcast(total))
        .filter(2 * F.col("cum_tokens") <= F.col("total_tokens"))
        .select("doc_id", "score", "n_tokens", "cum_tokens")
    )
