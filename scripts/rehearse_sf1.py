"""sf1.0 scale rehearsal for the heavy dedup/ANN ladders (VERDICT r4 #2).

No sf1 fixture ships, so this builds a 10x tiling of sf0.1 under /tmp:

- ``documents``: 10 replicas; replica k suffixes every token with
  ``_r{k}`` (k>0), a per-replica bijective vocabulary rename.  Within-
  replica Jaccard/shingle structure is EXACTLY sf0.1's; cross-replica
  token sets are disjoint, so the true near-dup pair set is exactly
  10x sf0.1's.  Any super-linear growth in candidates, shuffles, or
  wall time is therefore the algorithm's, not the data's.
- ``embeddings``: 10 replicas; replica k rolls vector components by k
  and flips the sign of every second component on odd k — orthogonal
  transforms, so within-replica cosine structure is exactly sf0.1's.

Run: ``python scripts/rehearse_sf1.py`` (~15-25 min, dominated by the
exact prefix-filter join at sf1).  Prints one JSON line per
(query, scale) with wall seconds, output rows, and shuffle bytes
(delta of total shuffle-write across stages, from the local REST API),
then a summary with the sf0.1 -> sf1 scaling exponent
``log10(t_sf1 / t_sf01)`` (1.0 = linear).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.plans import QUERIES
from awsbatch_mapreduce_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
# Tiling factor: 10 -> ~sf1, 100 -> ~sf10 (REHEARSE_REPLICAS env).
# Three measured points (sf0.1 native, 10x, 100x) turn the pairwise
# ratios into a two-decade scaling curve.
REPLICAS = int(os.environ.get("REHEARSE_REPLICAS", "10"))
# ADVICE r6: REPLICAS=1 would make decades=log10(1)=0 and divide the
# exponent summary by zero; 0/negative would build an empty tiling.
assert REPLICAS >= 2, "REHEARSE_REPLICAS must be >= 2 (one real decade step)"
# Version of the tiling transforms (vocab rename + embedding roll/flip;
# v3 adds key-offset tiling of the relational/events facts + verbatim
# dim copies).  Encoded with REPLICAS into the tiled path so changing
# either rebuilds instead of silently reusing stale data (ADVICE r5): a
# stale tile would invalidate every scaling exponent this script exists
# to measure.
TILE_VERSION = "v3"
_TILE_TAG = f"r{REPLICAS}_{TILE_VERSION}"
_TILE_PREFIX = "awsbatch_sf1_tiled"
TILED = os.path.join(
    os.environ.get("TMPDIR", "/tmp"), f"{_TILE_PREFIX}_{_TILE_TAG}"
)

REHEARSAL = [
    "dedup_minhash_lsh",
    "dedup_prefix_filter",
    "containment_near_dup",
    "minhash_lsh_eval",
    "ann_ivf_topk",
    "ann_pq_adc_topk",
    "corpus_curation_funnel",
    # wave-7 observability/QA queries (round 6): the band-load probes
    # must stay cheap relative to the dedup they instrument, the exact
    # pair consumers inherit the inverted-index plan, and the
    # calibration query adds two signature lookups on the candidate set
    "lsh_band_load_histogram",
    "df_cap_candidate_curve",
    "near_dup_source_matrix",
    "minhash_calibration",
    # the df-cap escape valve: bounded cost where the exact prefix
    # filter is output-bound (its whole reason to exist)
    "dedup_prefix_filter_capped",
    # relational + events families (round 6, tiling v3): facts tiled by
    # key offset with IDENTICAL per-replica structure (dims copied
    # verbatim — at 100 TB facts grow, dims don't), so q1's sums scale
    # exactly 10x, per-customer/per-user work partitions by disjoint
    # keys, and the top-k outputs stay k rows
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q10_returned_revenue",
    "window_top_orders_per_customer",
    "events_sessionization",
    "events_top_sessions",
    "range_join_error_context",
]

# Resume/partition support: REHEARSE_ONLY="a,b" runs a subset, so an
# interrupted run (the heavy exact-dedup queries dominate wall time)
# can be completed without re-measuring what already finished.
_only = os.environ.get("REHEARSE_ONLY")
if _only:
    REHEARSAL = [n for n in REHEARSAL if n in set(_only.split(","))]


def _sweep_stale_tiles() -> None:
    """Remove tiled generations with a different tag (old REPLICAS /
    transform version, or the pre-tag ``awsbatch_sf1_tiled`` dir), so
    rerunning the rehearsal leaves exactly one ~10x generation on disk
    (VERDICT r5 #5 — same hygiene as the zorder scratch sweep)."""
    import shutil

    root = os.environ.get("TMPDIR", "/tmp")
    keep = os.path.basename(TILED)
    try:
        for entry in os.listdir(root):
            if entry.startswith(_TILE_PREFIX) and entry != keep:
                shutil.rmtree(os.path.join(root, entry), ignore_errors=True)
    except OSError:
        pass


def _assert_keys_below(df, keys: list[str], offset: int) -> None:
    """Tiling-safety guard (ADVICE r6): every offset key column must fit
    strictly below the replica offset or replica key spaces overlap."""
    row = df.agg(*[F.max(k).alias(k) for k in keys]).first()
    for k in keys:
        assert row[k] is None or row[k] < offset, (
            f"tiling offset too small: max({k})={row[k]} >= {offset}"
        )


def build_tiled(spark) -> None:
    _sweep_stale_tiles()
    if os.path.exists(os.path.join(TILED, "_SUCCESS_TILED")):
        return
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    # ADVICE r6: the k*offset tiling silently produces OVERLAPPING key
    # spaces (breaking the disjoint-replica invariant every exponent
    # relies on) if a base fixture ever carries keys >= the offset —
    # check once per build, cheap next to the write it guards.
    _assert_keys_below(docs, ["doc_id"], 10_000_000)
    parts = []
    for k in range(REPLICAS):
        d = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(k * 10_000_000)
        )
        if k > 0:
            # bijective per-replica vocabulary rename: suffix every
            # whitespace token (split/transform/join stays JVM-side)
            d = d.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda w: F.concat(w, F.lit(f"_r{k}")),
                    ),
                    " ",
                ),
            )
        parts.append(d)
    tiled_docs = parts[0]
    for p in parts[1:]:
        tiled_docs = tiled_docs.unionAll(p)
    tiled_docs.repartition(32).write.mode("overwrite").parquet(
        f"{TILED}/documents.parquet"
    )

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    _assert_keys_below(emb, ["vec_id"], 10_000_000)
    dim = len(emb.select("embedding").first()[0])
    parts = []
    for k in range(REPLICAS):
        e = emb.withColumn(
            "vec_id", F.col("vec_id") + F.lit(k * 10_000_000)
        )
        if k > 0:
            roll = k % dim
            e = e.withColumn(
                "embedding",
                F.transform(
                    F.concat(
                        F.slice("embedding", roll + 1, dim - roll),
                        F.slice("embedding", 1, roll),
                    ),
                    lambda v, i: F.when(
                        F.lit(k % 2 == 1) & (i % 2 == 1), -v
                    ).otherwise(v),
                ),
            )
        parts.append(e)
    tiled_emb = parts[0]
    for p in parts[1:]:
        tiled_emb = tiled_emb.unionAll(p)
    tiled_emb.repartition(8).write.mode("overwrite").parquet(
        f"{TILED}/embeddings.parquet"
    )

    # Relational + events facts (tiling v3): offset every key column by
    # k*10^8 so replica key spaces are disjoint — per-customer windows,
    # per-user sessions, and order->lineitem joins keep EXACTLY sf0.1's
    # within-replica structure, so output structure scales linearly by
    # construction.  Timestamps/amounts are untouched (time-keyed aggs
    # legitimately grow counts, not groups).  Dims are copied verbatim:
    # the 100 TB shape is growing facts against fixed dims.
    from awsbatch_mapreduce_spark.sources.tables import load_table

    _OFF = 100_000_000
    fact_keys = {
        "customer": ["c_custkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey"],
        "events": ["event_id", "user_id"],
    }
    for table, keys in fact_keys.items():
        base = load_table(spark, SF01, table)
        _assert_keys_below(base, keys, _OFF)
        parts = []
        for k in range(REPLICAS):
            d = base
            for col in keys:
                d = d.withColumn(col, F.col(col) + F.lit(k * _OFF))
            parts.append(d)
        tiled = parts[0]
        for p in parts[1:]:
            tiled = tiled.unionAll(p)
        tiled.repartition(32).write.mode("overwrite").parquet(
            f"{TILED}/{table}.parquet"
        )
    for dim in ("region", "nation", "supplier", "part"):
        load_table(spark, SF01, dim).write.mode("overwrite").parquet(
            f"{TILED}/{dim}.parquet"
        )
    with open(os.path.join(TILED, "_SUCCESS_TILED"), "w") as f:
        f.write("ok")


def shuffle_write_bytes(spark) -> int:
    """Total shuffle-write bytes across all completed stages (REST)."""
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return -1
    try:
        with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
            app_id = json.load(r)[0]["id"]
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            stages = json.load(r)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return -1


def main() -> None:
    # Rehearsal session hardening (VERDICT r5 #1a / the r5 crash):
    # - explicit driver heap: the default (1g) is what OOM'd the r5 run
    #   when AQE upgraded a data-scaled frame to a driver-built
    #   broadcast; 16g gives the MEASUREMENT margin (the sandbox has
    #   128 GiB) — the plan-level fix is the merge-hint pinning in the
    #   dedup/ANN ladders (plans/hints.py), which this run validates.
    # - AQE runtime broadcast upgrades off: a size-misestimated upgrade
    #   mid-measurement would change the executed plan between scales
    #   and OOM exactly like r5; static dim broadcasts are unaffected.
    spark = get_spark(
        app_name="awsbatch-sf1-rehearsal",
        extra_conf={
            "spark.driver.memory": "16g",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_tiled(spark)

    results: dict[str, dict[str, dict]] = {}
    for name in REHEARSAL:
        results[name] = {}
        tiled_label = f"sf{REPLICAS / 10:g}"
        for label, sf_dir in (("sf0.1", SF01), (tiled_label, TILED)):
            sw0 = shuffle_write_bytes(spark)
            t0 = time.perf_counter()
            # one failure must not lose the rest of the run's data
            # (ADVICE r5): record the error and keep measuring
            try:
                df = QUERIES[name].builder(spark, sf_dir)
                n_rows = df.count()
                err = None
            except Exception as exc:  # noqa: BLE001 — recorded, not hidden
                n_rows = None
                err = f"{type(exc).__name__}: {str(exc).splitlines()[0][:200]}"
            dt = round(time.perf_counter() - t0, 1)
            sw1 = shuffle_write_bytes(spark)
            rec = {
                "sec": dt,
                "rows": n_rows,
                "shuffle_mb": (
                    round((sw1 - sw0) / 1e6, 1) if sw0 >= 0 else None
                ),
            }
            if err is not None:
                rec["error"] = err
            results[name][label] = rec
            print(json.dumps({"query": name, "scale": label, **rec}), flush=True)

    import math

    # exponents are per decade of data growth, so 10x and 100x runs
    # report on the same scale (1.0 = linear in data)
    decades = math.log10(REPLICAS)
    tl = f"sf{REPLICAS / 10:g}"
    summary = {}
    for name, r in results.items():
        if any(rec.get("error") for rec in r.values()):
            summary[name] = {"error": True}
            continue
        e_t = (
            math.log10(max(r[tl]["sec"], 0.1) / max(r["sf0.1"]["sec"], 0.1))
            / decades
        )
        e_rows = (
            math.log10(max(r[tl]["rows"], 1) / max(r["sf0.1"]["rows"], 1))
            / decades
            if r["sf0.1"]["rows"]
            else None
        )
        summary[name] = {
            "time_exponent": round(e_t, 2),
            "rows_exponent": None if e_rows is None else round(e_rows, 2),
        }
    print(json.dumps({"summary": summary}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
