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
