"""S7 — object-store sink path (SURVEY.md §2.1; reference uploads map
outputs to S3, ``src/awsbatch-map/main.py:87-89``, ``S3.Common.cs``).

No S3 endpoint exists in this container, so the honest local test is
to drive the SAME ``df.write``/``spark.read`` code through a
non-``file:`` Hadoop filesystem scheme.  ``viewfs://`` is the stand-in:
like ``s3a://`` it is resolved purely through the Hadoop FileSystem
abstraction from conf (a mount table here, ``fs.s3a.impl`` + creds in
production), so a green roundtrip proves the sink path is
scheme-agnostic — pointing it at a bucket is a conf change, not a code
change.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from awsbatch_mapreduce_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture()
def viewfs(spark, tmp_path):
    """Mount tmp_path as viewfs://<cell>/data via the Hadoop conf.

    The cell (authority) is unique per test: Hadoop caches FileSystem
    instances by (scheme, authority), so reusing a cell name would pin
    the first test's mount table forever."""
    import uuid

    cell = f"cell{uuid.uuid4().hex[:12]}"
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    key = f"fs.viewfs.mounttable.{cell}.link./data"
    hconf.set(key, f"file://{tmp_path}")
    yield f"viewfs://{cell}/data", tmp_path
    hconf.unset(key)


def test_write_roundtrip_through_nonfile_scheme(spark, viewfs):
    base, local_root = viewfs
    uri = f"{base}/nation_out"
    src = load_table(spark, SF_DIR, "nation")
    src.write.mode("overwrite").parquet(uri)

    # the scheme routed through the Hadoop FS abstraction and the bytes
    # physically landed where the mount table mapped them
    local = Path(local_root) / "nation_out"
    assert any(p.suffix == ".parquet" for p in local.iterdir()), list(
        local.iterdir()
    )

    back = spark.read.parquet(uri)
    assert back.count() == src.count()
    assert sorted(back.columns) == sorted(src.columns)


def test_nonfile_scheme_partitioned_write(spark, viewfs):
    """The production S3 layout is partitioned (one prefix per month,
    ``main.py:87-89``); partitionBy must produce the same directory
    layout under a non-file scheme."""
    base, local_root = viewfs
    uri = f"{base}/orders_parted"
    src = load_table(spark, SF_DIR, "orders").selectExpr(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    src.write.partitionBy("o_orderstatus").mode("overwrite").parquet(uri)
    parts = {
        p.name for p in (Path(local_root) / "orders_parted").iterdir() if p.is_dir()
    }
    assert any(n.startswith("o_orderstatus=") for n in parts), parts
    back = spark.read.parquet(uri).filter("o_orderstatus = 'F'")
    assert back.count() == src.filter("o_orderstatus = 'F'").count()
