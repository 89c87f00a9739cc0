"""Drift pin for QUERIES.md (VERDICT r4 #8): the committed index must
be byte-identical to what the generator emits from the live registry,
so adding/moving a query without regenerating the page fails fast."""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))


def test_queries_md_matches_registry():
    from gen_queries_md import render

    with open(os.path.join(ROOT, "QUERIES.md")) as f:
        on_disk = f.read()
    assert on_disk == render(), (
        "QUERIES.md is stale — run `python scripts/gen_queries_md.py`"
    )


def test_queries_md_covers_every_query():
    from awsbatch_mapreduce_spark.plans import QUERIES
    from gen_queries_md import render

    text = render()
    missing = [n for n in QUERIES if f"| {n} |" not in text]
    assert not missing, missing
