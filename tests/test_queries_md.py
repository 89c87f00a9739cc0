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

    path = os.path.join(ROOT, "QUERIES.md")
    with open(path) as f:
        on_disk = f.read()
    # Record files the driver writes AFTER the round's final commit
    # cannot be reflected in the committed page (VERDICT r6 #1), so
    # regenerate as of QUERIES.md's own mtime: genuine staleness
    # (registry edits without a regen) still fails, post-commit
    # driver records do not.
    # (checked both ways because a fresh checkout can give every file
    # the same mtime, in which order the cutoff view may exclude a
    # record the page WAS generated with — either view matching means
    # the page is current for some consistent record set).
    as_of = os.path.getmtime(path)
    assert on_disk in (render(), render(max_record_mtime=as_of)), (
        "QUERIES.md is stale — run `python scripts/gen_queries_md.py`"
    )


def test_queries_md_covers_every_query():
    from awsbatch_mapreduce_spark.plans import QUERIES
    from gen_queries_md import render

    text = render()
    missing = [n for n in QUERIES if f"| {n} |" not in text]
    assert not missing, missing
