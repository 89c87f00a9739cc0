"""One-off audit (round 7, VERDICT r6 #2): for every registry query,
count distinct BroadcastExchange nodes in the formatted plan at sf0.01
and resolve which parquet tables feed each broadcast subtree, so the
bounded/unbounded call can be made per site.  The interesting rows are
un-enumerated queries whose broadcasts have fact-table lineage
(documents/embeddings/lineitem/orders/events/customer) — those are the
candidates for `never_broadcast` pins + `_LADDER_BOUNDED_BROADCASTS`
entries.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("AUDIT_SF_DIR", "/root/testdata/sf0.01")
FACTS = ("documents", "embeddings", "lineitem", "orders", "events", "customer")


def _depth(line: str) -> int:
    m = re.match(r"^([ :+\-*]*)", line)
    return len(m.group(1)) // 3


def broadcast_lineage(plan: str) -> list[list[str]]:
    """For each BroadcastExchange in the formatted plan's tree block,
    return the parquet table names scanned inside its subtree."""
    blocks = plan.split("\n\n")
    tree = blocks[0].splitlines()
    details = "\n".join(blocks[1:])
    # map scan node id -> table name (from the Location detail line)
    scan_tables: dict[str, str] = {}
    for m in re.finditer(
        r"\((\d+)\) Scan parquet[^\n]*\n(?:[^\n]*\n)*?Location:[^\n]*/(\w+)\.parquet",
        details,
    ):
        scan_tables[m.group(1)] = m.group(2)
    out = []
    for i, line in enumerate(tree):
        bm = re.search(r"BroadcastExchange \((\d+)\)", line)
        if not bm:
            continue
        d = _depth(line)
        tables = []
        for sub in tree[i + 1:]:
            if sub.strip() and _depth(sub) <= d:
                break
            sm = re.search(r"Scan parquet[^(]*\((\d+)\)", sub)
            if sm and sm.group(1) in scan_tables:
                tables.append(scan_tables[sm.group(1)])
        out.append(sorted(set(tables)))
    return out


def main() -> None:
    from awsbatch_mapreduce_spark.plans import QUERIES
    from awsbatch_mapreduce_spark.session import get_spark

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
        ),
    )
    from test_scale_plans import _LADDER_BOUNDED_BROADCASTS  # type: ignore

    spark = get_spark(app_name="broadcast-audit")
    spark.sparkContext.setLogLevel("ERROR")
    only = os.environ.get("AUDIT_ONLY")
    names = only.split(",") if only else list(QUERIES)
    for name in names:
        try:
            df = QUERIES[name].builder(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001
            print(
                json.dumps(
                    {"query": name, "error": str(exc).splitlines()[0][:160]}
                ),
                flush=True,
            )
            continue
        lineages = broadcast_lineage(plan)
        fact_hits = sorted(
            {t for lin in lineages for t in lin if t in FACTS}
        )
        # count DISTINCT node ids in the tree block — same as the
        # enforcement test (reused subtrees re-display the same id)
        tree = plan.split("\n\n")[0]
        n_distinct = len(set(re.findall(r"BroadcastExchange \((\d+)\)", tree)))
        print(
            json.dumps(
                {
                    "query": name,
                    "n_broadcast": n_distinct,
                    "enumerated": name in _LADDER_BOUNDED_BROADCASTS,
                    "lineages": lineages,
                    "fact_bcast": fact_hits,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()


def subtree_shapes(plan: str) -> list[str]:
    """Compressed node-type signature of each BroadcastExchange subtree."""
    tree = plan.split("\n\n")[0].splitlines()
    out = []
    for i, line in enumerate(tree):
        if "BroadcastExchange" not in line:
            continue
        d = _depth(line)
        nodes = []
        for sub in tree[i + 1:]:
            if sub.strip() and _depth(sub) <= d:
                break
            m = re.search(r"([A-Za-z]+[A-Za-z ]*?) \(\d+\)", sub)
            if m:
                nodes.append(m.group(1).strip().replace("Scan parquet", "Scan"))
        out.append(">".join(nodes))
    return out
