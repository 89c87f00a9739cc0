"""Round-6 (wave 7) additions: scale-observability queries.

Round 6 turned the dedup/ANN scale story from pinned claims into
measured results (SCALING.md "sf1 rehearsal").  These queries make the
two quantities that *govern* those measurements first-class, oracle-
gated outputs of the engine itself, so a pipeline operator can watch
them drift as the corpus grows instead of re-deriving them ad hoc:

- ``lsh_band_load_histogram`` — the band-bucket load distribution of
  the MinHash-LSH index.  Candidate volume is exactly
  ``sum_buckets s*(s-1)/2``; a fattening tail here is the earliest
  warning that banding parameters need re-tuning before the candidate
  join blows up.
- ``token_df_heavy_hitters`` — the document-frequency heavy hitters
  that the df-cap escape valves (``minhash_lsh_eval``'s df>64 cut,
  ``dedup_prefix_filter``'s rare-token prefixes) are sized against.

Both are pure JVM-side integer plans over the same shingle/token
frames the ladders use, with DuckDB oracles built from the shared SQL
fragments so the two engines can't drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.plans.llm_text import (
    _N_BANDS,
    _N_HASHES,
    _SH_SQL,
    _shingles,
)
from awsbatch_mapreduce_spark.plans.registry import query
from awsbatch_mapreduce_spark.sources.tables import load_table

_BAND_HIST_ORACLE = f"""
    WITH {_SH_SQL},
    sig AS (
      SELECT doc_id,
        {", ".join(f"min(substr(md5(shingle || '#{i}'), 1, 16)) AS h{i}" for i in range(_N_HASHES))}
      FROM sh GROUP BY doc_id),
    bands AS (
      {" UNION ALL ".join(f"SELECT doc_id, md5(h{2 * b} || h{2 * b + 1} || '/{b}') AS bk FROM sig" for b in range(_N_BANDS))}),
    loads AS (SELECT bk, COUNT(*) AS s FROM bands GROUP BY bk)
    SELECT CAST(s AS BIGINT) AS bucket_size,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(COUNT(*) * (s * (s - 1) // 2) AS BIGINT) AS candidate_pairs
    FROM loads GROUP BY s
"""


@query("lsh_band_load_histogram", oracle=_BAND_HIST_ORACLE, wave=7)
def lsh_band_load_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-bucket load histogram of the MinHash-LSH index: for each
    bucket size ``s``, how many band buckets hold exactly ``s``
    documents, and the candidate pairs they imply (``s*(s-1)/2`` per
    bucket).  The sum of ``candidate_pairs`` IS the candidate-join
    volume of :func:`~awsbatch_mapreduce_spark.plans.llm_text.
    dedup_minhash_lsh` before the distinct — the quantity the sf1
    rehearsal measures indirectly via shuffle bytes, here as an exact
    per-load breakdown.

    Scale shape: identical index build as the dedup query (shingle ->
    signature groupBy -> band-key explode), then two hash aggregates
    on tiny keys; no joins at all, so the plan is strictly cheaper
    than the dedup it instruments.  At 100 TB this is the cheap daily
    health probe that says whether banding parameters still hold
    before anyone pays for the candidate join.
    """
    sh = _shingles(spark, sf_dir)
    aggs = [
        F.min(
            F.substring(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}"))), 1, 16)
        ).alias(f"h{i}")
        for i in range(_N_HASHES)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    band_keys = F.array(
        *[
            F.md5(
                F.concat(F.col(f"h{2 * b}"), F.col(f"h{2 * b + 1}"), F.lit(f"/{b}"))
            )
            for b in range(_N_BANDS)
        ]
    )
    loads = (
        sig.select(F.explode(band_keys).alias("bk"))
        .groupBy("bk")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    return loads.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets")
    ).select(
        F.col("s").cast("bigint").alias("bucket_size"),
        "n_buckets",
        F.expr("CAST(n_buckets * (s * (s - 1) div 2) AS BIGINT)").alias(
            "candidate_pairs"
        ),
    )


_HEAVY_HITTERS_ORACLE = """
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents),
    df AS (SELECT token, COUNT(*) AS df FROM toks GROUP BY token)
    SELECT token, CAST(df AS BIGINT) AS df
    FROM df
    QUALIFY ROW_NUMBER() OVER (ORDER BY df DESC, token) <= 20
"""


@query("token_df_heavy_hitters", oracle=_HEAVY_HITTERS_ORACLE, wave=7)
def token_df_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens by document frequency — the boilerplate set that
    df-cap escape valves are sized against (``minhash_lsh_eval`` cuts
    shingles at df > 64; ``dedup_prefix_filter`` keeps only the RAREST
    tokens in its prefixes).  Watching this tail tells an operator
    whether a cap chosen at sf0.1 still holds after the corpus grows.

    Scale shape: distinct-token explode -> token-keyed df rollup ->
    global top-20 as orderBy+limit, which Catalyst plans as
    TakeOrderedAndProject (per-partition heaps, no global sort, no
    single-partition window) — the same distributed top-k discipline
    ``test_global_topk_is_take_ordered_not_window`` pins elsewhere.
    Ties break on the token string so the cut is engine-independent.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .distinct()
    )
    df = toks.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    return df.orderBy(F.desc("df"), F.asc("token")).limit(20)
