"""Regression pins for the four ADVICE-r3 fixes.

Each was a latent defect invisible on the shipped fixture (zero/NULL
weights, empty stream dirs, 4-column z-order keys, cutoffs preceding
the first doc); these tests build the degenerate inputs the fixture
lacks and prove both engines now agree on them.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.plans import QUERIES
from tests.oracle_utils import compare_frames

_DOCS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _docs_fixture(spark, tmp_path, rows):
    """Write a documents.parquet with the given rows; return its dir."""
    d = str(tmp_path / "fixture")
    spark.createDataFrame(rows, _DOCS_SCHEMA).coalesce(1).write.parquet(
        f"{d}/documents.parquet"
    )
    return d


def _oracle_pdf(sf_dir: str, sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    return con.execute(sql).fetchdf()


def test_weighted_doc_sample_zero_and_null_weights(spark, tmp_path):
    """A document with n_chars = 0 or NULL used to produce a NULL
    priority — and NULLs sort first in Spark ASC but last in DuckDB,
    silently diverging the top-50.  Both engines must now agree:
    zero-weight docs get priority hash div 1, NULL-weight docs are
    excluded outright."""
    rows = [
        (i, f"doc {i}", "en", "web", (0 if i == 3 else None if i == 5 else 40 + i))
        for i in range(60)
    ]
    d = _docs_fixture(spark, tmp_path, rows)
    spec = QUERIES["weighted_doc_sample"]
    spark_pdf = spec.builder(spark, d).toPandas()
    problems = compare_frames(spark_pdf, _oracle_pdf(d, spec.oracle))
    assert not problems, problems
    got = set(spark_pdf.doc_id)
    assert 5 not in got  # NULL weight excluded in both engines
    assert len(got) == 50


def test_vocab_growth_curve_cutoff_before_first_doc(spark, tmp_path):
    """With doc_ids starting far above the 20%/40% cutoffs, the inner
    join used to drop those checkpoint rows while the oracle's scalar
    subqueries emitted them with zero counts.  Left joins + coalesce
    must now mirror the oracle exactly (5 rows, zero-count heads)."""
    rows = [
        (1000 + i, f"alpha beta gamma{i}", "en", "web", 20) for i in range(10)
    ]
    d = _docs_fixture(spark, tmp_path, rows)
    spec = QUERIES["vocab_growth_curve"]
    spark_pdf = spec.builder(spark, d).toPandas()
    problems = compare_frames(spark_pdf, _oracle_pdf(d, spec.oracle))
    assert not problems, problems
    assert len(spark_pdf) == 5  # every checkpoint row present
    assert (spark_pdf.sort_values("pct").n_docs.iloc[0] == 0).item()


def test_interleave_bits_rejects_sign_overflow(spark):
    """4 columns x 16 bits = 64 would put the top bit in the int64
    sign position, silently corrupting the sort order — must raise."""
    from awsbatch_mapreduce_spark.operators.compact import interleave_bits

    cols = [F.col(c) for c in ("a", "b", "c", "d")]
    with pytest.raises(ValueError, match="63"):
        interleave_bits(cols, bits=16)
    assert interleave_bits(cols, bits=15) is not None  # 60 bits: fine


def test_compact_zorder_four_columns_scales_bits(spark, tmp_path):
    """compact_parquet with 4 z-order columns must quantize to
    63 // 4 = 15 bits per column instead of raising (or overflowing),
    and still preserve rows and schema."""
    from awsbatch_mapreduce_spark.operators.compact import compact_parquet
    from awsbatch_mapreduce_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    src = str(tmp_path / "z4")
    li = load_table(spark, SF_DIR, "lineitem")
    li.repartition(8).write.parquet(src)
    out = compact_parquet(
        spark,
        src,
        zorder_by=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        n_files=4,
    )
    assert out.count() == li.count()
    assert set(out.columns) == set(li.columns)


def test_read_events_stream_raises_on_empty_dir(spark, tmp_path):
    """An empty source dir used to default the schema to nanos; if
    micros files arrived later the stream would misread ts.  It must
    refuse to guess instead."""
    from awsbatch_mapreduce_spark.streaming.windows import read_events_stream

    empty = tmp_path / "no_files_yet"
    empty.mkdir()
    with pytest.raises(FileNotFoundError, match="encoding"):
        read_events_stream(spark, str(empty))
