"""Wave 16 (round 17): the serving probes honor the pointer's nprobe,
and the PQ x cap-escalation composition — pinned Spark-side.

The claims under test (the DuckDB oracle parity of the three new
registry queries lives in test_oracle_parity like every other query):

- the ``nprobe=N`` token rides the pointer's atomic rename next to
  ``pq``/``cap=N`` and survives every pointer mutation (actuator write,
  refit inherit, rollback);
- ``probe_current_generation`` serves the REAL rank-k program after a
  ``set_generation_nprobe`` step — frame-identical to the driver-proven
  ``_multiprobe_batch`` (full-vector) / ``_pq_rerank_probe(nprobe=)``
  (ADC), and genuinely different from the single-probe output on the
  fixture (the step CHANGES what production returns);
- the escalated PQ refit re-keys the codes table to the new cell
  geometry: codes 1:1 with members on (seen_id, cell, sub), the <= cap
  bound at the ESCALATED cap, and the PQ codebook unchanged (a pure
  function of the member set).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.plans.iterative import _quantize
from awsbatch_mapreduce_spark.plans.wave11 import (
    _CAP,
    _index_tables,
    _mod_centroid_init,
    _persist_two_level,
    _probe_batch,
)
from awsbatch_mapreduce_spark.plans.wave12 import _admit_batch
from awsbatch_mapreduce_spark.plans.wave13 import (
    _generation_names,
    _multiprobe_batch,
    _pq_generation_names,
    cutover_generation,
    probe_current_generation,
    read_generation_cap,
    read_generation_flags,
    read_generation_meta,
    read_generation_nprobe,
    refit_and_cutover,
    set_generation_nprobe,
)
from awsbatch_mapreduce_spark.plans.wave14 import (
    _persist_pq_codes,
    _pq_rerank_probe,
    _pq_tables,
)
from awsbatch_mapreduce_spark.plans.wave15 import _ESCALATED_CAP
from awsbatch_mapreduce_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _bounds(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    b = emb.agg(F.min("vec_id").alias("lo"), F.max("vec_id").alias("hi")).first()
    return emb, b.lo, b.hi


@pytest.fixture(scope="module")
def fitted_pq_gen(spark, tmp_path_factory):
    """One PQ-flagged generation over the seen half, cut over under a
    fresh pointer — shared by the serving-probe pins below (the fit is
    the expensive part; the pins only move the pointer's nprobe)."""
    emb, lo, hi = _bounds(spark)
    mid = (lo + hi) // 2
    pointer = str(tmp_path_factory.mktemp("w16ptr") / "CURRENT_GENERATION")
    base, coarse, fine, mem = _index_tables(spark, SF_DIR, "w16")
    _persist_two_level(
        spark,
        emb.filter(F.col("vec_id") <= F.lit(mid)),
        _mod_centroid_init,
        base,
        coarse,
        fine,
        mem,
    )
    codes, pqcb = _pq_tables(spark, SF_DIR, "w16")
    _persist_pq_codes(spark, mem, base, codes, pqcb)
    cutover_generation(spark, SF_DIR, pointer, "w16", with_pq=True)
    new = emb.filter(F.col("vec_id") > F.lit(mid)).select(
        "vec_id", _quantize(F.col("embedding")).alias("vq")
    )
    return pointer, (coarse, fine, mem, codes, pqcb), new


def test_nprobe_token_rides_pointer_mutations(tmp_path):
    """set_generation_nprobe preserves kind/n_fit/every other flag,
    replaces its own token idempotently, and refuses a missing pointer
    or a sub-1 width."""
    p = str(tmp_path / "ptr")
    with open(p, "w") as fh:
        fh.write("gen0001\n1234\npq cap=64")
    assert read_generation_nprobe(p) == 1  # no token -> single-probe
    set_generation_nprobe(p, 3)
    assert read_generation_nprobe(p) == 3
    assert read_generation_meta(p) == ("gen0001", 1234)
    assert {"pq", "cap=64", "nprobe=3"} <= read_generation_flags(p)
    assert read_generation_cap(p) == 64
    set_generation_nprobe(p, 2)
    assert read_generation_nprobe(p) == 2
    toks = [t for t in read_generation_flags(p) if t.startswith("nprobe=")]
    assert toks == ["nprobe=2"]
    # legacy kind-only pointer: the token attaches without inventing
    # n_fit or other flags
    with open(p, "w") as fh:
        fh.write("legacy")
    set_generation_nprobe(p, 2)
    assert read_generation_meta(p) == ("legacy", None)
    assert read_generation_flags(p) == frozenset({"nprobe=2"})
    with pytest.raises(RuntimeError, match="no current generation"):
        set_generation_nprobe(str(tmp_path / "missing"), 2)
    with pytest.raises(ValueError, match="nprobe must be >= 1"):
        set_generation_nprobe(p, 0)


def test_cutover_records_nprobe_and_refit_inherits(spark, fitted_pq_gen):
    """The token can be written at cutover time and SURVIVES a refit:
    a generation swap changes index structure, never the actuator's
    serving knob."""
    pointer, (coarse, fine, mem, codes, pqcb), new = fitted_pq_gen
    set_generation_nprobe(pointer, 2)
    old = refit_and_cutover(spark, SF_DIR, pointer, "w16r")
    assert old == "w16"
    kind, _ = read_generation_meta(pointer)
    assert kind == "w16r"
    assert read_generation_nprobe(pointer) == 2  # inherited
    assert "pq" in read_generation_flags(pointer)  # inherited too
    # point back for the serving pins (generation w16 is intact — the
    # refit never vacuums; vacuum is a separate explicit step)
    cutover_generation(
        spark, SF_DIR, pointer, "w16", with_pq=True, nprobe=2
    )
    assert read_generation_nprobe(pointer) == 2


def test_serving_probe_honors_pointer_nprobe(spark, fitted_pq_gen):
    """THE round-17 claim (VERDICT r16 #1), full-vector path: before
    the step the pointer serves the single-probe program; after
    ``set_generation_nprobe(pointer, 2)`` the SAME call site returns
    the driver-proven rank-2 multiprobe output — and the two outputs
    genuinely differ on the fixture, so the step changed production
    behavior, not a label."""
    pointer, (coarse, fine, mem, codes, pqcb), new = fitted_pq_gen
    set_generation_nprobe(pointer, 1)
    got1 = _rows(probe_current_generation(spark, SF_DIR, pointer, new))
    want1 = _rows(_probe_batch(spark, new, coarse, fine, mem))
    assert got1 == want1 and len(got1) > 0

    set_generation_nprobe(pointer, 2)
    got2 = _rows(probe_current_generation(spark, SF_DIR, pointer, new))
    want2 = _rows(_multiprobe_batch(spark, new, coarse, fine, mem, nprobe=2))
    assert got2 == want2
    assert got2 != got1  # the step reached what the reader serves
    # multiprobe superset property: every rank-1 dup survives
    d1 = {r[0]: r[3] for r in got1}
    d2 = {r[0]: r[3] for r in got2}
    assert all(d2[v] >= d1[v] for v in d1)


def test_adc_serving_probe_honors_pointer_nprobe(spark, fitted_pq_gen):
    """Same claim, ADC path: the pointer-resolved IVFPQ probe runs the
    rank-2 union program after the step — frame-identical to the
    direct ``_pq_rerank_probe(nprobe=2)`` and different from the
    single-probe ADC output."""
    pointer, (coarse, fine, mem, codes, pqcb), new = fitted_pq_gen
    set_generation_nprobe(pointer, 1)
    got1 = _rows(
        probe_current_generation(spark, SF_DIR, pointer, new, adc=True)
    )
    want1 = _rows(
        _pq_rerank_probe(spark, new, coarse, fine, mem, codes, pqcb)
    )
    assert got1 == want1 and len(got1) > 0

    set_generation_nprobe(pointer, 2)
    got2 = _rows(
        probe_current_generation(spark, SF_DIR, pointer, new, adc=True)
    )
    want2 = _rows(
        _pq_rerank_probe(
            spark, new, coarse, fine, mem, codes, pqcb, nprobe=2
        )
    )
    assert got2 == want2
    assert got2 != got1
    # the primary (rank-1) assignment is nprobe-invariant: only the
    # dup columns may move
    assert {r[:3] for r in got1} == {r[:3] for r in got2}


def test_escalated_pq_refit_rekeys_codes(spark, tmp_path):
    """VERDICT r16 #2, Spark-side: a quality-escalated refit of a
    PQ-FLAGGED generation rebuilds the codes at the NEW cell geometry —
    codes 1:1 with members on (seen_id, cell, sub), <= cap bound at
    the ESCALATED cap, PQ codebook invariant (a pure function of the
    member set, which the re-chunk does not change)."""
    emb, lo, hi = _bounds(spark)
    mid = (lo + hi) // 2
    q3 = (mid + hi) // 2
    pointer = str(tmp_path / "ptr")

    base_a, coarse_a, fine_a, mem_a = _index_tables(spark, SF_DIR, "w16e")
    _persist_two_level(
        spark,
        emb.filter(F.col("vec_id") <= F.lit(mid)),
        _mod_centroid_init,
        base_a,
        coarse_a,
        fine_a,
        mem_a,
    )
    codes_a, pqcb_a = _pq_tables(spark, SF_DIR, "w16e")
    _persist_pq_codes(spark, mem_a, base_a, codes_a, pqcb_a)
    cutover_generation(
        spark, SF_DIR, pointer, "w16e", with_pq=True, cap=_CAP
    )
    batch = emb.filter(
        (F.col("vec_id") > F.lit(mid)) & (F.col("vec_id") <= F.lit(q3))
    ).select("vec_id", _quantize(F.col("embedding")).alias("vq"))
    _admit_batch(
        spark, batch, coarse_a, fine_a, mem_a,
        codes_tbl=codes_a, pqcb_tbl=pqcb_a,
        cap=read_generation_cap(pointer),
    )

    old = refit_and_cutover(
        spark, SF_DIR, pointer, "w16f", cap=_ESCALATED_CAP
    )
    assert old == "w16e"
    assert read_generation_cap(pointer) == _ESCALATED_CAP
    assert "pq" in read_generation_flags(pointer)

    _, _, mem_b = _generation_names(SF_DIR, "w16f")
    codes_b, pqcb_b = _pq_generation_names(SF_DIR, "w16f")
    mem = spark.table(mem_b)
    # <= cap bound at the escalated cap, and genuinely larger cells
    # than the base cap could hold (the re-chunk actually happened)
    per_cell = mem.groupBy("cell", "sub").count()
    assert per_cell.agg(F.max("count")).first()[0] <= _ESCALATED_CAP
    assert per_cell.agg(F.max("count")).first()[0] > _CAP
    # codes re-keyed 1:1 with the NEW members on (seen_id, cell, sub)
    mk = mem.select("seen_id", "cell", "sub")
    ck = spark.table(codes_b).select("seen_id", "cell", "sub").distinct()
    assert mk.count() == ck.count()
    assert mk.join(ck, ["seen_id", "cell", "sub"], "anti").count() == 0
    # PQ codebook is GEOMETRY-INVARIANT: a pure function of the member
    # SET (residue-class means over seen_id), so a second refit of the
    # same members at the BASE cap must train the identical codebook
    # even though every (cell, sub) key differs
    pcb_escalated = _rows(spark.table(pqcb_b))
    refit_and_cutover(spark, SF_DIR, pointer, "w16g", cap=_CAP)
    _, pqcb_g = _pq_generation_names(SF_DIR, "w16g")
    assert _rows(spark.table(pqcb_g)) == pcb_escalated
    cutover_generation(  # point back at the escalated generation
        spark, SF_DIR, pointer, "w16f", with_pq=True, cap=_ESCALATED_CAP
    )
    # and the ADC reader serves through the pointer at the new cap
    probe = emb.filter(F.col("vec_id") > F.lit(q3)).select(
        "vec_id", _quantize(F.col("embedding")).alias("vq")
    )
    res = probe_current_generation(spark, SF_DIR, pointer, probe, adc=True)
    assert res.count() == probe.count()


def test_admission_probe_serves_pointer_nprobe(spark, tmp_path):
    """The ADMISSION-TIME novelty probe — the last serving surface the
    round-16 actuator could not reach — honors the pointer's nprobe
    (re-read per batch): each admitted batch's probe partition is
    frame-identical to the rank-2 multiprobe twin computed against the
    pre-admission index, across two consecutive admissions."""
    from awsbatch_mapreduce_spark.streaming.codebook import (
        foreach_batch_codebook_admit_probe,
    )

    emb, lo, hi = _bounds(spark)
    mid = (lo + hi) // 2
    q3 = (mid + hi) // 2
    base, coarse, fine, mem = _index_tables(spark, SF_DIR, "w16s")
    _persist_two_level(
        spark,
        emb.filter(F.col("vec_id") <= F.lit(mid)),
        _mod_centroid_init,
        base,
        coarse,
        fine,
        mem,
    )
    pointer = str(tmp_path / "ptr")
    cutover_generation(spark, SF_DIR, pointer, "w16s", nprobe=2)
    out = str(tmp_path / "out")
    fn = foreach_batch_codebook_admit_probe(
        coarse, fine, mem, out, pointer_path=pointer
    )
    b0 = emb.filter(
        (F.col("vec_id") > F.lit(mid)) & (F.col("vec_id") <= F.lit(q3))
    )
    b1 = emb.filter(F.col("vec_id") > F.lit(q3))
    for batch_id, batch in ((0, b0), (1, b1)):
        q = batch.select("vec_id", _quantize(F.col("embedding")).alias("vq"))
        # the twin runs the rank-2 program against the PRE-admission
        # index — collect BEFORE fn mutates the tables
        want = _rows(_multiprobe_batch(spark, q, coarse, fine, mem, nprobe=2))
        fn(batch.select("vec_id", "embedding"), batch_id)
        got = sorted(
            map(
                tuple,
                spark.read.parquet(out)
                .filter(F.col("batch_id") == batch_id)
                .drop("batch_id")
                .select(
                    "vec_id", "cell", "sub", "n_seen_dups", "max_cos_bp",
                    "is_novel",
                )
                .collect(),
            )
        )
        assert got == want and len(got) > 0, batch_id
