"""Idle min-of-3 adjudication of the headline bench set (VERDICT r17
ask #1): the r17 round-close bench read 18.728 s vs 13.113 s (r16) with
EVERY headline query drifting up a near-uniform 1.15-1.6x, including
plans untouched since round 2 — the environmental signature.  The
repo's rule is flag-then-adjudicate; the headline set never got its
idle row.  This script IS that row's instrument.

Protocol = bench.py's headline phase, exactly: same session config,
ERROR log level, BOTH calibration probes first (CPU codegen + I/O
parquet-scan — the r17 gap was that the CPU probe read fast while the
contention was I/O-shaped), then per query one untimed warm-up +
min-of-3 timed noop-format writes.  Prints one JSON line with per-query
min, spread, and drift vs BASELINE_QUERIES.json; the SCALING.md
adjudication row quotes it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from awsbatch_mapreduce_spark.plans import QUERIES
from awsbatch_mapreduce_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_REPS = int(os.environ.get("ADJUDICATE_REPS", "3"))


def main() -> None:
    import bench  # repo-root bench.py — reuse probes + headline list

    spark = get_spark(app_name="awsbatch-headline-adjudication")
    spark.sparkContext.setLogLevel("ERROR")
    calibration = bench._calibration_sec(spark)
    calibration_io = bench._calibration_io_sec(spark, SF_DIR)

    samples: dict[str, list[float]] = {}
    for name in bench.HEADLINE:  # untimed warm-up pass
        QUERIES[name].builder(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
    for _ in range(N_REPS):
        for name in bench.HEADLINE:
            t0 = time.perf_counter()
            QUERIES[name].builder(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )

    timings = {n: min(s) for n, s in samples.items()}
    spread = {n: round(max(s) - min(s), 3) for n, s in samples.items()}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BASELINE_QUERIES.json")) as fh:
        reference = json.load(fh)["queries"]
    drift_raw, flagged = bench._drift_gate(timings, reference)
    noise, frac = bench._host_noise(timings, spread)
    print(
        json.dumps(
            {
                "probe": "headline_idle_adjudication",
                "calibration_sec": calibration,
                "calibration_io_sec": calibration_io,
                "total_sec": round(sum(timings.values()), 3),
                "queries": timings,
                "spread": spread,
                "drift_vs_reference": {
                    n: round(d, 2) for n, d in drift_raw.items()
                },
                "drift_flagged": flagged,
                "host_noise_suspected": noise,
                "noisy_fraction": frac,
                "reps": N_REPS,
                "sf_dir": SF_DIR,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
