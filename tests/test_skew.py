"""Salted join == plain join on a synthetically skewed dataset."""

from __future__ import annotations

from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.operators.skew import salted_join


def _skewed_frames(spark):
    # 90% of fact rows share key 0 — the pathological hot key
    fact = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("payload")
    )
    return fact, dim


def test_salted_inner_join_matches_plain(spark):
    fact, dim = _skewed_frames(spark)
    plain = fact.join(dim, "k").select("k", "v", "payload")
    salted = salted_join(fact, dim, "k").select("k", "v", "payload")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_left_join_keeps_unmatched(spark):
    fact, dim = _skewed_frames(spark)
    # shrink dim so some fact keys miss
    small_dim = dim.filter(F.col("k") < 50)
    plain = fact.join(small_dim, "k", "left").select("k", "v", "payload")
    salted = salted_join(fact, small_dim, "k", how="left").select(
        "k", "v", "payload"
    )
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0


def test_two_phase_topk_matches_plain_window(spark):
    """Bucketed two-phase ranking == the plain per-key window, on a
    frame with one hot key, several normal keys, and keys with fewer
    than k rows (phase 1 must not drop short keys)."""
    from pyspark.sql.window import Window

    from awsbatch_mapreduce_spark.operators.skew import two_phase_topk

    df = spark.range(0, 5_000).select(
        F.when(F.col("id") % 10 < 8, F.lit(0))
        .otherwise(F.col("id") % 37)
        .alias("k"),
        F.col("id").alias("rid"),
        (F.pmod(F.col("id") * 7919, F.lit(1000))).alias("score"),
    )
    w = Window.partitionBy("k").orderBy(F.desc("score"), F.asc("rid"))
    plain = (
        df.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 5)
        .select("k", "rid", "score", "rn")
    )
    two = two_phase_topk(
        df,
        key="k",
        order_cols=[F.desc("score"), F.asc("rid")],
        k=5,
        salt_from="rid",
        n_salts=4,
    ).select("k", "rid", "score", "rn")
    assert plain.exceptAll(two).count() == 0
    assert two.exceptAll(plain).count() == 0


def test_two_phase_topk_short_key(spark):
    """A key with fewer than k rows keeps ALL its rows, exact ranks."""
    from awsbatch_mapreduce_spark.operators.skew import two_phase_topk

    df = spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, 7.0)], "k int, rid int, score double"
    )
    out = two_phase_topk(
        df, "k", [F.desc("score"), F.asc("rid")], k=3, salt_from="rid"
    )
    rows = {(r.rid, r.rn) for r in out.collect()}
    assert rows == {(11, 1), (10, 2)}


def test_salt_spreads_hot_key(spark):
    """The hot key's rows must land on multiple salt values — that's the
    whole point (spread probability of a silent regression to 1 salt is
    ~8^-9000 for 9000 rows)."""
    fact, dim = _skewed_frames(spark)
    salted = fact.withColumn("__salt", (F.rand() * 8).cast("int"))
    n_salts = (
        salted.filter(F.col("k") == 0).select("__salt").distinct().count()
    )
    assert n_salts >= 4
