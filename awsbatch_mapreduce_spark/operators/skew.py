"""Skew-aware join: explicit key salting for pathological hot keys.

AQE's skew-join handling (on in ``session.get_spark``) splits oversized
partitions at runtime and covers moderate skew; explicit salting is the
escape hatch for the pathological case — one key carrying a double-digit
percentage of a 100 TB fact table, where even a split partition's build
side won't fit.

Mechanism: the probe (skewed) side gets a random salt in [0, n); the
build side is replicated n times, once per salt value; the join key
becomes (key, salt).  The hot key's rows now spread over n tasks at the
cost of replicating the build side n× — worth it only when build is
small relative to the hot partition, which is exactly the pathological
regime.  Result is row-identical to the unsalted join (asserted in
``tests/test_skew.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    build: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``skewed`` to ``build`` on ``on`` with ``n_salts``-way key
    salting.

    ``build`` rows are exploded across all salt values (size × n_salts);
    ``skewed`` rows get one pseudorandom salt each.  The salt is derived
    from ``rand`` — it only affects placement, never the result set, so
    nondeterminism is safe (and the only acceptable use of rand in this
    engine).  ``how`` supports inner/left (the skewed side is preserved).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (skewed side first)")
    salted_probe = skewed.withColumn(
        "__salt", (F.rand() * n_salts).cast("int")
    )
    replicated_build = build.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_probe.join(replicated_build, [on, "__salt"], how)
    return out.drop("__salt")
