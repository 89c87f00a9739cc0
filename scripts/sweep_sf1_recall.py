"""Measure the cap=512 recall column at a scale where cap=512 is REAL
(round 16, VERDICT r15 #4).

At sf0.1 the cap=512 sweep row is exhaustive-search parity: the seen
half is ~30k vectors, so k0 = ceil(sqrt(ceil(n/512))) = 2 coarse cells
and nprobe >= 2 probes everything (SCALING.md round-15 states the
caveat).  An operator pricing a production cap needs at least one
point where k0 >> nprobe.  This script runs the registered
``codebook_recall_sweep_cap512`` (and optionally the other caps)
against the 10x rehearsal tiling (~sf1, seen half ~300k vectors ->
k0 = ceil(sqrt(ceil(300k/512))) = 25 cells), where nprobe in {1,2,4}
probes 4-16% of the corpus instead of all of it — the production
read.  The tiling's orthogonal-transform replicas preserve
within-replica cosine structure exactly (rehearse_sf1 docstring), so
recall numbers are comparable with sf0.1's, not artifacts of new
geometry.

Output: one JSON line per (cap, nprobe) row — the recall surface
values, plus wall seconds per cap — for SCALING.md's round-16 table.

Usage::

    python scripts/sweep_sf1_recall.py            # cap=512 only
    SWEEP_CAPS=16,64,512 python scripts/sweep_sf1_recall.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(
    0, os.path.dirname(os.path.abspath(__file__))
)

from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.plans import QUERIES
from awsbatch_mapreduce_spark.session import get_spark

CAPS = [
    int(c) for c in os.environ.get("SWEEP_CAPS", "512").split(",") if c
]


def main() -> None:
    from rehearse_sf1 import TILED, build_tiled

    spark = get_spark(
        app_name="sweep-sf1-recall",
        extra_conf={
            "spark.driver.memory": "16g",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    built = build_tiled(spark)
    if built:
        print(json.dumps({"note": "tiling built in this session"}), flush=True)

    emb = spark.read.parquet(f"{TILED}/embeddings.parquet")
    b = emb.agg(
        F.min("vec_id").alias("lo"), F.max("vec_id").alias("hi")
    ).first()
    n_seen = emb.filter(F.col("vec_id") <= (b.lo + b.hi) // 2).count()
    print(
        json.dumps({"tiled": TILED, "n_seen_half": n_seen}), flush=True
    )

    for cap in CAPS:
        import math

        k0 = math.ceil(math.sqrt(math.ceil(n_seen / cap)))
        name = f"codebook_recall_sweep_cap{cap}"
        t0 = time.perf_counter()
        rows = QUERIES[name].builder(spark, TILED).collect()
        wall = round(time.perf_counter() - t0, 2)
        for r in sorted(rows, key=lambda r: r["nprobe"]):
            print(
                json.dumps(
                    {
                        "scale": "sf1-tiled",
                        "cap": cap,
                        "k0": k0,
                        "nprobe": int(r["nprobe"]),
                        "n_truth_vecs": int(r["n_truth_vecs"]),
                        "n_truth_pairs": int(r["n_truth_pairs"]),
                        "n_detected_vecs": int(r["n_detected_vecs"]),
                        "n_detected_pairs": int(r["n_detected_pairs"]),
                        "vec_recall_bp": int(r["vec_recall_bp"]),
                        "pair_recall_bp": int(r["pair_recall_bp"]),
                        "wall_sec_all_nprobes": wall,
                    }
                ),
                flush=True,
            )

    spark.stop()


if __name__ == "__main__":
    main()
