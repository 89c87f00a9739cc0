"""Registry-wide perf smoke (VERDICT r8 #1): one-rep sf0.01 sweep over
EVERY registered query, appended to ``REGISTRY_BENCH.jsonl``.

``bench.py`` times 40 of the 214 registry queries; a plan regression in
the untimed tail (a lost pushdown, a broadcast flip, an accidental
recompute) is invisible until a human reads the plan.  This sweep is
the tripwire: each run executes every query's OWN plan once (noop
write — never ``count()``, which Catalyst prunes; see SCALING.md) at
sf0.01, divides by the same constant-work host-speed calibration probe
``bench.py`` uses, and appends one JSONL record per query plus a run
header.  It then compares against the previous run and flags any query
whose normalized time grew more than ``_FLAG_RATIO``x.

Flagging needs an absolute floor: a single rep of a 40 ms query
jitters far past 2x on scheduler noise alone (the headline bench
needed min-of-3 for exactly this reason), so a query is flagged only
when BOTH the normalized ratio exceeds ``_FLAG_RATIO`` AND the raw
delta exceeds ``_FLAG_ABS_SEC``.  The floor is stated in the run
header so a reader knows what the empty flag list does and does not
claim; anything slower than ~0.3 s normalized is firmly inside the
tripwire.

Usage::

    python scripts/registry_bench.py            # sweep + compare + append
    python scripts/registry_bench.py --compare-only   # re-run comparison
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_OUT = os.path.join(_ROOT, "REGISTRY_BENCH.jsonl")
_FLAG_RATIO = 2.0
_FLAG_ABS_SEC = 0.3  # raw-seconds floor under which 2x is just jitter


def _load_runs() -> dict[str, dict]:
    """JSONL -> {run_id: {"header": {...}, "queries": {name: record}}},
    in file order (dict preserves insertion, so last key = latest)."""
    runs: dict[str, dict] = {}
    if not os.path.exists(_OUT):
        return runs
    with open(_OUT) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            slot = runs.setdefault(
                rec["run"], {"header": None, "queries": {}}
            )
            if rec.get("kind") == "header":
                slot["header"] = rec
            else:
                slot["queries"][rec["query"]] = rec
    return runs


def compare(
    prev: dict[str, dict], cur: dict[str, dict]
) -> list[dict]:
    """Queries whose normalized time grew > _FLAG_RATIO x AND whose raw
    delta exceeds the jitter floor, plus ERR TRANSITIONS and vanished
    queries.  A query that newly errors records a tiny sec (the raise
    is fast), so the timing rule alone would read the worst regression
    class — broken — as an improvement; err status is therefore
    diffed explicitly and err rows are excluded from the timing rule
    (their sec measures the raise, not the plan)."""
    flagged = []
    for name, c in cur.items():
        p = prev.get(name)
        if p is None:
            continue  # new query: no reference point yet
        if "err" in c and "err" not in p:
            flagged.append(
                {"query": name, "newly_erroring": c["err"], "prev_sec": p["sec"]}
            )
            continue
        if "err" in p:
            if "err" not in c:
                flagged.append({"query": name, "recovered_from_err": p["err"]})
            continue  # err->err: still broken, already flagged when it broke
        if (
            p["norm"] > 0
            and c["norm"] > _FLAG_RATIO * p["norm"]
            and c["sec"] - p["sec"] > _FLAG_ABS_SEC
        ):
            flagged.append(
                {
                    "query": name,
                    "prev_norm": p["norm"],
                    "norm": c["norm"],
                    "ratio": round(c["norm"] / p["norm"], 2),
                    "prev_sec": p["sec"],
                    "sec": c["sec"],
                }
            )
    missing = sorted(set(prev) - set(cur))
    for name in missing:
        flagged.append({"query": name, "missing_from_latest_run": True})
    return sorted(
        flagged, key=lambda f: -f.get("ratio", float("inf"))
    )


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def history_flags(runs: dict[str, dict], run_id: str) -> list[dict]:
    """Self-adjudicating flag rule (VERDICT r9 #5 / r10 #4): a query is
    flagged only when its ``run_id`` normalized time exceeds
    ``_FLAG_RATIO`` x the MEDIAN of its full prior run history (err-free
    rows), with the same raw-seconds floor against the history's median
    sec.  This encodes the adjudication a human previously did by
    reading the ledger: a one-rep blip against a flat history
    (``mixture_temperature_weights`` run005: 1.68 vs median 0.895, under
    2x) never flags, and a genuine spike (``ann_lsh_topk`` run004: 6.01
    vs median 2.85) flags once and then SELF-CLEARS on the next idle run
    (run005: 2.48 vs median 3.10) instead of demanding a hand-written
    verdict.  Err transitions stay pairwise vs the latest prior record
    (a raise records a tiny sec — the timing rule must never see it)."""
    ids = list(runs)
    pos = ids.index(run_id)
    prior_ids = ids[:pos]
    cur = runs[run_id]["queries"]
    flagged = []
    seen_before: set[str] = set()
    for name, c in cur.items():
        hist = [
            runs[rid]["queries"][name]
            for rid in prior_ids
            if name in runs[rid]["queries"]
        ]
        if hist:
            seen_before.add(name)
        prev = hist[-1] if hist else None
        if prev is not None and "err" in c and "err" not in prev:
            flagged.append(
                {"query": name, "newly_erroring": c["err"], "prev_sec": prev["sec"]}
            )
            continue
        if prev is not None and "err" in prev:
            if "err" not in c:
                flagged.append({"query": name, "recovered_from_err": prev["err"]})
            continue  # err->err: still broken, flagged when it broke
        clean = [h for h in hist if "err" not in h]
        if not clean or "err" in c:
            continue  # new query (no reference) — err-new handled above
        med_norm = _median([h["norm"] for h in clean])
        med_sec = _median([h["sec"] for h in clean])
        if (
            med_norm > 0
            and c["norm"] > _FLAG_RATIO * med_norm
            and c["sec"] - med_sec > _FLAG_ABS_SEC
        ):
            flagged.append(
                {
                    "query": name,
                    "history_median_norm": round(med_norm, 2),
                    "norm": c["norm"],
                    "ratio": round(c["norm"] / med_norm, 2),
                    "history_median_sec": round(med_sec, 3),
                    "sec": c["sec"],
                    "n_history": len(clean),
                }
            )
    all_prior = set()
    for rid in prior_ids:
        all_prior.update(runs[rid]["queries"])
    for name in sorted(all_prior - set(cur)):
        flagged.append({"query": name, "missing_from_latest_run": True})
    return sorted(flagged, key=lambda f: -f.get("ratio", float("inf")))


def _compare_latest(runs: dict[str, dict]) -> None:
    ids = list(runs)
    if len(ids) < 2:
        print(json.dumps({"compare": "first run, no reference", "flagged": []}))
        return
    cur_id = ids[-1]
    flagged = history_flags(runs, cur_id)
    print(
        json.dumps(
            {
                "compare": f"{cur_id} vs history median over {len(ids) - 1} runs",
                "flag_rule": f">{_FLAG_RATIO}x history-median normalized AND"
                f" >{_FLAG_ABS_SEC}s raw delta vs history-median sec",
                "n_flagged": len(flagged),
                "flagged": flagged,
            }
        )
    )


def main() -> None:
    runs = _load_runs()
    if "--compare-only" in sys.argv:
        _compare_latest(runs)
        return

    from awsbatch_mapreduce_spark.plans import QUERIES
    from awsbatch_mapreduce_spark.session import get_spark
    from bench import _calibration_sec

    run_id = os.environ.get("SPARK_GRAFT_RUN_ID")
    if run_id is None:
        # first runNNN id not already present — len()+1 could collide
        # with survivors of a hand-pruned file and silently merge two
        # sweeps under one key
        n = len(runs) + 1
        while f"run{n:03d}" in runs:
            n += 1
        run_id = f"run{n:03d}"
    sf_dir = os.environ.get(
        "SPARK_GRAFT_REGISTRY_SF_DIR", "/root/testdata/sf0.01"
    )
    spark = get_spark(app_name="awsbatch-mapreduce-spark-registry-bench")
    spark.sparkContext.setLogLevel("ERROR")
    calibration = _calibration_sec(spark)

    records = []
    total = 0.0
    for name, spec in QUERIES.items():
        t0 = time.perf_counter()
        err = None
        try:
            spec.builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # record, keep sweeping
            err = f"{type(exc).__name__}: {exc}"[:200]
        sec = round(time.perf_counter() - t0, 3)
        total += sec
        rec = {
            "run": run_id,
            "query": name,
            "sec": sec,
            "norm": round(sec / calibration, 2),
        }
        if err:
            rec["err"] = err
        records.append(rec)
        print(f"{name}: {sec}s", file=sys.stderr)
    spark.stop()

    header = {
        "run": run_id,
        "kind": "header",
        "sf_dir": sf_dir,
        "n_queries": len(records),
        "n_err": sum(1 for r in records if "err" in r),
        "total_sec": round(total, 3),
        "calibration_sec": calibration,
        "reps": 1,
        "flag_rule": f">{_FLAG_RATIO}x normalized AND"
        f" >{_FLAG_ABS_SEC}s raw delta",
    }
    with open(_OUT, "a") as fh:
        fh.write(json.dumps(header) + "\n")
        for rec in records:
            fh.write(json.dumps(rec) + "\n")
    print(json.dumps(header))
    _compare_latest(_load_runs())


if __name__ == "__main__":
    main()
