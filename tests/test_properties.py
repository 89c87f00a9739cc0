"""Property-based tests (hypothesis): engine operators vs independent
reference implementations on randomized inputs.

Example counts are small (Spark round-trips per example), but each
example is a full adversarial dataset — hypothesis shrinks failures to
minimal cases, which unit fixtures can't do.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from awsbatch_mapreduce_spark.operators.asof import asof_join
from awsbatch_mapreduce_spark.operators.histogram import histogram2d

_slow = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def asof_case(draw):
    keys = ["k1", "k2", "k3"]
    n_left = draw(st.integers(1, 12))
    n_right = draw(st.integers(0, 12))
    left = [
        (i, draw(st.sampled_from(keys)), draw(st.integers(0, 100)))
        for i in range(n_left)
    ]
    # unique (key, ts) on the right — the operator's documented contract
    right_keys = draw(
        st.sets(
            st.tuples(st.sampled_from(keys), st.integers(0, 100)),
            min_size=0,
            max_size=n_right,
        )
    )
    right = [(k, t, i) for i, (k, t) in enumerate(sorted(right_keys))]
    return left, right


@_slow
@given(asof_case())
def test_asof_join_matches_merge_asof(spark, case):
    left_rows, right_rows = case
    left = spark.createDataFrame(
        [(i, k, float(t)) for i, k, t in left_rows], "id BIGINT, k STRING, t DOUBLE"
    )
    right = spark.createDataFrame(
        [(k, float(t), p) for k, t, p in right_rows] or [("zz", -1.0, -1)],
        "k STRING, t DOUBLE, payload BIGINT",
    )
    got = (
        asof_join(left, right, on="k", ts="t")
        .toPandas()
        .sort_values("id", ignore_index=True)
    )
    lp = pd.DataFrame(left_rows, columns=["id", "k", "t"]).astype(
        {"t": "float64"}
    ).sort_values(["t", "id"], ignore_index=True)
    rp = pd.DataFrame(
        [(k, float(t), p) for k, t, p in right_rows] or [("zz", -1.0, -1)],
        columns=["k", "t", "payload"],
    ).sort_values(["t", "k"], ignore_index=True)
    want = pd.merge_asof(
        lp, rp, on="t", by="k", direction="backward"
    ).sort_values("id", ignore_index=True)
    assert list(got["id"]) == list(want["id"])
    g = got["payload"].fillna(-999).astype("int64")
    w = want["payload"].fillna(-999).astype("int64")
    assert list(g) == list(w), (left_rows, right_rows)


@st.composite
def hist_case(draw):
    n = draw(st.integers(1, 60))
    xs = draw(
        st.lists(st.floats(-10, 10, allow_nan=False), min_size=n, max_size=n)
    )
    ys = draw(
        st.lists(st.floats(-10, 10, allow_nan=False), min_size=n, max_size=n)
    )
    return xs, ys


@_slow
@given(hist_case())
def test_histogram2d_matches_numpy(spark, case):
    xs, ys = case
    w = h = 5
    xmin, xmax, ymin, ymax = -10.0, 10.0, -10.0, 10.0
    df = spark.createDataFrame(list(zip(xs, ys)), "x DOUBLE, y DOUBLE")
    got = {
        (r.px, r.py): r.cnt
        for r in histogram2d(
            df, "x", "y", x_range=(xmin, xmax), y_range=(ymin, ymax),
            width=w, height=h,
        ).collect()
    }
    # reference: same floor-binning rule in numpy (points at max edge are
    # clamped into the last bin by the operator's min(bin, n-1))
    xstep, ystep = (xmax - xmin) / w, (ymax - ymin) / h
    want: dict[tuple[int, int], int] = {}
    for x, y in zip(xs, ys):
        px = min(int(np.floor((x - xmin) / xstep)), w - 1)
        py = min(int(np.floor((y - ymin) / ystep)), h - 1)
        want[(px, py)] = want.get((px, py), 0) + 1
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
        min_size=1,
        max_size=40,
    )
)
@_slow
def test_zorder_interleave_is_a_bijection(spark, pairs):
    """De-interleaving the Morton key must recover (x, y) exactly —
    the property that makes z-clustering lossless w.r.t. both keys."""
    from pyspark.sql import functions as F

    from awsbatch_mapreduce_spark.operators.compact import interleave_bits

    df = spark.createDataFrame(pairs, "x long, y long")
    rows = df.withColumn(
        "z", interleave_bits([F.col("x"), F.col("y")])
    ).collect()
    for r in rows:
        x = y = 0
        for b in range(16):
            x |= ((r["z"] >> (2 * b)) & 1) << b
            y |= ((r["z"] >> (2 * b + 1)) & 1) << b
        assert (x, y) == (r["x"], r["y"])
