"""End-to-end training-data curation pipeline: the BASELINE.json
north-star composition as ONE Spark job behind a CLI subcommand.

``python -m awsbatch_mapreduce_spark curate --out <dir>`` runs

    load -> exact-dedup (keep lowest id per md5) -> quality gate
    (token-count + unique-token ratio) -> language allowlist ->
    split/shard assignment -> hive-layout parquet export + manifest

mirroring what ``corpus_curation_funnel`` measures as a query, but
materializing the survivors the way a real pre-training data build
does (reference parity: the reference's only composed artifact is the
frames->video reduce, ``Reduce.ps1:3-10``; this is the text-corpus
equivalent).

Scale: every stage is a map-side filter except the dedup (one shuffle
of 16-byte digests) and the final partitioned write; split/shard come
from ``operators/export.py``'s md5 bucketing — deterministic,
append-stable, directory-prunable on read.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from awsbatch_mapreduce_spark.operators.export import export_corpus
from awsbatch_mapreduce_spark.sources.tables import load_table

_LANG_ALLOW = ("en", "de", "es", "fr")
_MIN_TOKENS = 12
_MIN_UNIQUE_RATIO = 0.5


def _dedup_exact_keep_one(docs: DataFrame) -> DataFrame:
    """Keep the lowest doc_id per exact content digest.

    Rank within the digest partition (hash-shuffles digests, not
    bodies); the md5 is dropped after the winner is chosen.
    """
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def run_curation_pipeline(
    spark: SparkSession, sf_dir: str, out_dir: str | Path, n_shards: int = 8
) -> dict:
    """Run the composed curation build; returns (and writes) the
    manifest with per-stage survivor counts — the funnel report the
    build is accepted or rejected on."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    docs = load_table(spark, sf_dir, "documents")
    n_input = docs.count()

    deduped = _dedup_exact_keep_one(docs)
    n_dedup = deduped.count()

    toks = F.split("text", " ")
    quality = deduped.filter(
        (F.size(toks) >= _MIN_TOKENS)
        & (
            F.size(F.array_distinct(toks)) * F.lit(1.0) / F.size(toks)
            >= _MIN_UNIQUE_RATIO
        )
    )
    n_quality = quality.count()

    kept = quality.filter(F.col("lang").isin(*_LANG_ALLOW))
    n_lang = kept.count()

    export_dir = str(out / "corpus")
    export_corpus(kept, export_dir, n_shards=n_shards)

    shard_counts = {
        f"{r['split']}/{r['shard']}": r["n"]
        for r in spark.read.parquet(export_dir)
        .groupBy("split", "shard")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    manifest = {
        "sf_dir": sf_dir,
        "stages": {
            "input": n_input,
            "exact_dedup": n_dedup,
            "quality_gate": n_quality,
            "lang_filter": n_lang,
        },
        "export_dir": export_dir,
        "n_shards": n_shards,
        "shard_counts": dict(sorted(shard_counts.items())),
    }
    (out / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return manifest
