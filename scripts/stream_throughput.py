"""Structured-Streaming load test (round 7, VERDICT r6 #7).

The streaming surface is correctness-proven (batch==stream equivalence
tests, r2-r3) but was never load-tested.  This drives the `rate`
source — synthetic events at a configured rows/sec — through the SAME
window transformations the file-source pipelines use
(`streaming/windows.py:tumbling_aggregate` / `session_aggregate`), a
noop sink, and records from each micro-batch's progress:

- input vs processed rows/sec (sustained throughput; processed >=
  input means the pipeline keeps up at that rate),
- batch duration,
- state-store rows + memory, against an advancing watermark (short
  windows scaled to the test duration so state EXPIRES during the
  run — a flat state curve is the evidence the watermark actually
  bounds state, which is what survives an unbounded stream).

Usage: ``python scripts/stream_throughput.py``
Env: STREAM_RATES="20000,100000" (rows/sec), STREAM_SECS=45 per point.
Prints one JSON line per (pipeline, rate) + a summary line; paste into
SCALING.md's streaming section.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.session import get_spark
from awsbatch_mapreduce_spark.streaming.windows import (
    session_aggregate,
    tumbling_aggregate,
)

RATES = [int(r) for r in os.environ.get("STREAM_RATES", "20000,100000").split(",")]
SECS = int(os.environ.get("STREAM_SECS", "45"))
_TYPES = ["view", "click", "cart", "purchase", "search", "login", "logout", "error"]


def _synthetic_events(spark, rows_per_sec: int):
    """rate source -> the events shape the window operators consume.
    Event time == arrival time, so the watermark advances in real time
    and windows close DURING the test."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .option("numPartitions", 8)
        .load()
    )
    return rate.select(
        F.col("timestamp").alias("ts"),
        (F.col("value") % 100_000).cast("bigint").alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in _TYPES]),
            (F.col("value") % 8 + 1).cast("int"),
        ).alias("event_type"),
        ((F.col("value") % 10_000) / 100.0).alias("value"),
    )


def _drive(spark, name: str, stream_df, rate: int, mode: str = "update") -> dict:
    import shutil

    ckpt = os.path.join(
        os.environ.get("TMPDIR", "/tmp"),
        f"stream_tp_ckpt_{name}_{rate}_{os.getpid()}",
    )
    q = (
        stream_df.writeStream.format("noop")
        .outputMode(mode)
        .trigger(processingTime="5 seconds")
        .option("checkpointLocation", ckpt)
        .start()
    )
    time.sleep(SECS)
    # recentProgress yields StreamingQueryProgress objects in PySpark 4
    # (raw JSON strings in some 3.x versions) — normalize via .json
    progress = [
        json.loads(p.json if hasattr(p, "json") else p)
        for p in q.recentProgress
    ]
    q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)  # scratch hygiene (r5)
    # skip the first 2 batches (JIT + state-store cold start)
    steady = [p for p in progress[2:] if p.get("numInputRows", 0) > 0]
    if not steady:
        return {"pipeline": name, "rate": rate, "error": "no steady batches"}
    proc = [p["processedRowsPerSecond"] for p in steady]
    dur = [p["batchDuration"] for p in steady]
    state = [
        (
            p["stateOperators"][0].get("numRowsTotal"),
            p["stateOperators"][0].get("memoryUsedBytes"),
        )
        for p in steady
        if p.get("stateOperators")
    ]
    rec = {
        "pipeline": name,
        "rate_rows_per_sec": rate,
        "n_batches": len(steady),
        "processed_rows_per_sec_median": round(sorted(proc)[len(proc) // 2]),
        "processed_rows_per_sec_min": round(min(proc)),
        "batch_duration_ms_max": max(dur),
        "keeps_up": round(min(proc)) >= rate,
        "state_rows_first": state[0][0] if state else None,
        "state_rows_last": state[-1][0] if state else None,
        "state_mb_last": (
            round(state[-1][1] / 1e6, 1) if state and state[-1][1] else None
        ),
    }
    return rec


def main() -> None:
    spark = get_spark(app_name="stream-throughput")
    spark.sparkContext.setLogLevel("ERROR")
    # windows scaled to the test duration so state closes mid-run:
    # 10 s tumbling windows / 15 s watermark; 5 s session gap
    results = []
    for rate in RATES:
        ev = _synthetic_events(spark, rate)
        for name, df in (
            (
                "tumbling_10s",
                tumbling_aggregate(ev, window="10 seconds", watermark="15 seconds"),
            ),
            (
                "session_5s_gap",
                session_aggregate(ev, gap="5 seconds", watermark="15 seconds"),
            ),
        ):
            # session windows only support append mode on streams
            rec = _drive(
                spark, name, df, rate,
                mode="append" if name.startswith("session") else "update",
            )
            results.append(rec)
            print(json.dumps(rec), flush=True)
    print(
        json.dumps(
            {
                "summary": {
                    f"{r['pipeline']}@{r.get('rate_rows_per_sec')}": r.get(
                        "keeps_up"
                    )
                    for r in results
                }
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
