"""Cross-query invariants of the wave-13 codebook REFIT lifecycle
(VERDICT r13 #1).

Beyond the per-query DuckDB oracle (tests/test_oracle_parity.py — the
oracle IS equivalence proof (a): a from-scratch adaptive program over
the grown corpus), these pin the claims that make the refit the step
that bounds the append/streaming paths at 100 TB: the refitted fine
book collapses from the appended generations back to ceil(n/cap)-grade
(proof (b)), the <= cap member bound holds for the refitted generation,
the refit-from-members quantized path lands frame-identical to a
from-scratch fit over raw embeddings (Spark-side twin of the oracle
proof), the lifecycle is idempotent on one session, and the shared
probe-CTE text `wave11._probe_ctes(_MID_BOUNDARY)` is byte-identical
to the r11 driver-proven `_PROBE_CTES` it now generates."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.plans import QUERIES
from awsbatch_mapreduce_spark.plans.iterative import _quantize
from awsbatch_mapreduce_spark.plans.wave9 import _NO_PEER_BP, _SEMDEDUP_EPS_BP
from awsbatch_mapreduce_spark.plans.wave11 import (
    _CAP,
    _MID_BOUNDARY,
    _PROBE_CTES,
    _index_tables,
    _mod_centroid_init,
    _persist_two_level,
    _probe_batch,
    _probe_ctes,
)
from tests.conftest import SF_BOTH, SF_DIR
from tests.conftest import query_rows as _rows

_Q = "semdedup_codebook_refit"

# sha256 of wave11._PROBE_CTES as driver-proven through round 13,
# recorded immediately BEFORE the round-14 refactor that made it the
# output of _probe_ctes(_MID_BOUNDARY): the parameterization must
# never drift the proven oracle text by a byte.
_PROBE_CTES_SHA = (
    "64e916b46f8423ecc4843e0127cee5c9b6860fbdff29f2258e9ed6891229d9c4"
)


def _tbl(spark, part: str, kind: str) -> str:
    tbls = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith(f"semdedup_{kind}_{part}_")
    ]
    assert tbls, f"{kind} {part} table missing after builder ran"
    return tbls[0]


def _bounds(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    b = emb.agg(F.min("vec_id").alias("lo"), F.max("vec_id").alias("hi")).first()
    mid = (b.lo + b.hi) // 2
    return mid, (mid + b.hi) // 2


def test_probe_ctes_parameterization_is_byte_identical():
    assert _probe_ctes(_MID_BOUNDARY) == _PROBE_CTES
    assert (
        hashlib.sha256(_PROBE_CTES.encode()).hexdigest() == _PROBE_CTES_SHA
    ), "r11 driver-proven probe-CTE text drifted"


def test_refit_cap_bound_and_index_shape(spark):
    """Refitted generation: <= cap members per fine cell BY
    CONSTRUCTION, fine book 1:1 with member (cell, sub) groups, coarse
    book exactly k0' = ceil(sqrt(ceil(n/cap))) rows for the GROWN n."""
    _rows(spark, _Q, SF_DIR)
    mem = spark.table(_tbl(spark, "members", "rft"))
    n = mem.count()
    per_cell = mem.groupBy("cell", "sub").count().agg(F.max("count")).first()[0]
    assert per_cell <= _CAP, f"fine cell over cap after refit: {per_cell}"
    fine = spark.table(_tbl(spark, "fine", "rft"))
    n_fine = fine.count()
    assert n_fine == fine.select("cell", "sub").distinct().count()
    assert n_fine == mem.select("cell", "sub").distinct().count()
    k0p = math.ceil(math.sqrt(math.ceil(n / _CAP)))
    assert spark.table(_tbl(spark, "coarse", "rft")).count() == k0p
    # and the refit consumed the whole grown corpus
    mid, q3 = _bounds(spark, SF_DIR)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assert n == emb.filter(F.col("vec_id") <= F.lit(q3)).count()


def test_refit_collapses_fine_book_to_ceil_grade(spark):
    """Proof (b): pre-refit, three append generations carry one ceil
    overhead per (batch, touched cell) past the build's chunks; the
    refit lands the fine book back at ceil-grade — <= ceil(n/cap) + k0'
    rows (at most one ceil overhead per coarse cell) and strictly below
    the appended-generation count on the fixture."""
    _rows(spark, _Q, SF_DIR)
    mid, _ = _bounds(spark, SF_DIR)
    mem_a = spark.table(_tbl(spark, "members", "rfa"))
    fine_a = spark.table(_tbl(spark, "fine", "rfa")).count()
    build_chunks = (
        mem_a.filter(F.col("seen_id") <= F.lit(mid))
        .select("cell", "sub")
        .distinct()
        .count()
    )
    assert fine_a > build_chunks, "appends added no fine generations"
    mem_r = spark.table(_tbl(spark, "members", "rft"))
    n = mem_r.count()
    fine_r = spark.table(_tbl(spark, "fine", "rft")).count()
    k0p = math.ceil(math.sqrt(math.ceil(n / _CAP)))
    assert fine_r <= math.ceil(n / _CAP) + k0p, (fine_r, n, k0p)
    assert fine_r < fine_a, f"refit failed to collapse: {fine_r} vs {fine_a}"


def test_refit_from_members_equals_from_scratch_fit(spark):
    """Spark-side twin of the oracle equivalence: rebuild the index
    from RAW embeddings over the same grown corpus (float quantization
    path) and probe the same batch — frame-identical to the lifecycle's
    refit-from-members (quantized path) output, proving the members
    table is a lossless fit source."""
    lifecycle = sorted(map(tuple, _rows(spark, _Q, SF_DIR)))
    mid, q3 = _bounds(spark, SF_DIR)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base_s, coarse_s, fine_s, mem_s = _index_tables(spark, SF_DIR, "rfs")
    _persist_two_level(
        spark,
        emb.filter(F.col("vec_id") <= F.lit(q3)),
        _mod_centroid_init,
        base_s,
        coarse_s,
        fine_s,
        mem_s,
    )
    probe = emb.filter(F.col("vec_id") > F.lit(q3)).select(
        "vec_id", _quantize(F.col("embedding")).alias("vq")
    )
    scratch = sorted(
        map(tuple, _probe_batch(spark, probe, coarse_s, fine_s, mem_s).collect())
    )
    assert scratch == lifecycle and len(lifecycle) > 0


def test_refit_flag_consistency_and_non_vacuous(spark):
    for sf in SF_BOTH:
        rows = _rows(spark, _Q, sf)
        n_novel = sum(r["is_novel"] for r in rows)
        assert 0 < n_novel < len(rows), (sf, n_novel, len(rows))
    for r in _rows(spark, _Q, SF_DIR):
        if r["is_novel"]:
            assert r["n_seen_dups"] == 0
            assert r["max_cos_bp"] == _NO_PEER_BP
        else:
            assert r["n_seen_dups"] >= 1
            assert r["max_cos_bp"] >= _SEMDEDUP_EPS_BP


def test_refit_idempotent_on_one_session(spark):
    """Two lifecycle runs on one session must produce identical rows —
    catches read-own-writes between the appends and the refit (the
    refit's source generation must be immutable while it reads it)."""
    r1 = sorted(map(tuple, QUERIES[_Q].builder(spark, SF_DIR).collect()))
    r2 = sorted(map(tuple, QUERIES[_Q].builder(spark, SF_DIR).collect()))
    assert r1 == r2 and len(r1) > 0
