"""Per-query job/stage profile (guide §1: measure first).

For each named query: one untimed warm-up noop write, then one timed
rep whose Spark jobs are grouped via setJobGroup; afterwards the UI
REST API is read for per-job wall time and per-stage executor/shuffle
metrics, so the wall-clock can be attributed to operators instead of
guessed.  Prints one JSON line per query.

Usage: python scripts/profile_query.py q1_pricing_summary dedup_minhash_lsh ...
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     PROFILE_REPS (default 1 timed rep), PROFILE_NO_WARMUP=1
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from awsbatch_mapreduce_spark.plans import QUERIES
from awsbatch_mapreduce_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("PROFILE_REPS", "1"))
NO_WARMUP = os.environ.get("PROFILE_NO_WARMUP") == "1"


def _rest(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}") as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark(app_name="profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    for name in names:
        if not NO_WARMUP:
            QUERIES[name].builder(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        best = None
        for rep in range(REPS):
            group = f"prof_{name}_{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            QUERIES[name].builder(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            if best is None or wall < best[0]:
                best = (wall, group)
        wall, group = best
        jobs = [
            j
            for j in _rest(spark, "jobs")
            if j.get("jobGroup") == group
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = {}
        for s in _rest(spark, "stages"):
            if s["stageId"] in stage_ids and s["status"] != "SKIPPED":
                stages[s["stageId"]] = {
                    "name": s["name"].split("\n")[0][:80],
                    "tasks": s["numCompleteTasks"],
                    "runTimeMs": s.get("executorRunTime", 0),
                    "cpuTimeMs": int(s.get("executorCpuTime", 0) / 1e6),
                    "shufWriteMB": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
                    "shufReadMB": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
                    "inMB": round(s.get("inputBytes", 0) / 1e6, 2),
                    "wallMs": None,
                }
                try:
                    import datetime as dt

                    f = "%Y-%m-%dT%H:%M:%S.%fGMT"
                    sub = dt.datetime.strptime(s["firstTaskLaunchedTime"], f)
                    done = dt.datetime.strptime(s["completionTime"], f)
                    stages[s["stageId"]]["wallMs"] = int(
                        (done - sub).total_seconds() * 1000
                    )
                except (KeyError, ValueError):
                    pass
        out = {
            "query": name,
            "wall_sec": round(wall, 3),
            "n_jobs": len(jobs),
            "n_stages": len(stages),
            "stages": [
                {"id": k, **v} for k, v in sorted(stages.items())
            ],
        }
        print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
