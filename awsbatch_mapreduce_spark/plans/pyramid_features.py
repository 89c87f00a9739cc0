"""Tile-pyramid rollup, hashing-trick featurization, and the recursive
CTE surface.

``tile_pyramid_counts`` extends the reference's single-zoom rasterize
(``src/awsbatch-map/main.py:73-77`` via ``frame_histogram2d``) to the
multi-zoom pyramid a real map/tile service materializes.
``feature_hashing_sparse`` is the classic hashing-trick featurizer for
ML pipelines.  ``recursive_key_lineage`` exercises Spark 4's
``WITH RECURSIVE`` (matching DuckDB's) for iterative closure inside
pure SQL — the declarative alternative to the driver-loop connected
components in ``dedup_canonical_assignment``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.plans.reference_parity import (
    _BBOX,
    _X_EXPR,
    _Y_EXPR,
)
from awsbatch_mapreduce_spark.plans.registry import query
from awsbatch_mapreduce_spark.plans.sampling import md5_bucket
from awsbatch_mapreduce_spark.sources.tables import load_table

_MAX_Z = 4  # base zoom: 2^4 x 2^4 cells over the bbox

# Base-zoom cell indices.  The same textual expression runs in both
# engines; cells at coarser zooms are exact right-shifts of these, so
# the whole pyramid is derived from one binning.
_CX4 = (
    f"LEAST(CAST(FLOOR(({_X_EXPR} - {_BBOX['xmin']!r}) * 16.0 "
    f"/ {_BBOX['xmax'] - _BBOX['xmin']!r}) AS BIGINT), 15)"
)
_CY4 = (
    f"LEAST(CAST(FLOOR(({_Y_EXPR} - {_BBOX['ymin']!r}) * 16.0 "
    f"/ {_BBOX['ymax'] - _BBOX['ymin']!r}) AS BIGINT), 15)"
)
_IN_BBOX = (
    f"{_X_EXPR} >= {_BBOX['xmin']!r} AND {_X_EXPR} <= {_BBOX['xmax']!r} "
    f"AND {_Y_EXPR} >= {_BBOX['ymin']!r} AND {_Y_EXPR} <= {_BBOX['ymax']!r}"
)

_PYRAMID_ORACLE = f"""
    WITH base AS (
      SELECT {_CX4} AS cx4, {_CY4} AS cy4
      FROM lineitem WHERE {_IN_BBOX}),
    lv AS (SELECT unnest(range(0, {_MAX_Z} + 1)) AS zoom)
    SELECT zoom,
           cx4 >> ({_MAX_Z} - zoom) AS cx,
           cy4 >> ({_MAX_Z} - zoom) AS cy,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM base, lv
    GROUP BY 1, 2, 3
"""


@query("tile_pyramid_counts", oracle=_PYRAMID_ORACLE)
def tile_pyramid_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-zoom tile pyramid over the projected plane: per-cell point
    counts at zooms 0..4, coarser cells being exact right-shifts of the
    base binning.

    ONE scan feeds every zoom (explode by zoom level, then a single
    hash aggregate on (zoom, cx, cy)); shuffle volume is bounded by
    total pyramid cells (sum of 4^z), never input rows — the
    map-service materialization pattern at any scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    base = li.filter(F.expr(_IN_BBOX)).select(
        F.expr(_CX4).alias("cx4"), F.expr(_CY4).alias("cy4")
    )
    lv = base.select(
        "cx4",
        "cy4",
        F.explode(F.sequence(F.lit(0), F.lit(_MAX_Z))).alias("zoom"),
    )
    return (
        lv.select(
            "zoom",
            F.expr(f"shiftright(cx4, {_MAX_Z} - zoom)").alias("cx"),
            F.expr(f"shiftright(cy4, {_MAX_Z} - zoom)").alias("cy"),
        )
        .groupBy("zoom", "cx", "cy")
        .agg(F.count("*").alias("cnt"))
    )


_N_FEATURES = 32

_HASHING_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
    SELECT doc_id,
           CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT % {_N_FEATURES}
                AS BIGINT) AS feature,
           CAST(COUNT(*) AS BIGINT) AS weight
    FROM toks
    GROUP BY 1, 2
"""


@query("feature_hashing_sparse", oracle=_HASHING_ORACLE)
def feature_hashing_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization: tokens hash into a fixed 32-dim
    space, emitted as sparse (doc, feature, weight) triples —
    vocabulary-free vectorization for downstream ML.

    Reuses the engine's cross-engine ``md5_bucket`` hash
    (``plans/sampling.py``).  No vocabulary state, no join: one scan,
    one hash aggregate on (doc, feature) — the property that makes the
    hashing trick THE featurizer at corpus scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    return (
        toks.select(
            "doc_id", md5_bucket("tok", _N_FEATURES).alias("feature")
        )
        .groupBy("doc_id", "feature")
        .agg(F.count("*").alias("weight"))
    )


def _lineage_sql(div: str) -> str:
    """Recursive halving chain: key -> key div 2 -> ... -> 0.
    ``div`` is the engine's integer-division operator."""
    return f"""
    WITH RECURSIVE lineage(c_custkey, anc, depth) AS (
      SELECT c_custkey, c_custkey, 0 FROM {{src}}
      UNION ALL
      SELECT c_custkey, anc {div} 2, depth + 1 FROM lineage WHERE anc > 0
    )
    SELECT c_custkey,
           CAST(MAX(depth) AS BIGINT) AS depth,
           CAST(SUM(anc) AS BIGINT) AS path_sum
    FROM lineage
    GROUP BY c_custkey
    """


@query(
    "recursive_key_lineage",
    oracle=_lineage_sql("//").format(src="customer"),
)
def recursive_key_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure in pure SQL via Spark 4 ``WITH RECURSIVE``:
    each customer key walks its halving chain to the root, reporting
    chain depth and the sum of visited ancestors.

    The recursion depth is O(log key) (~14 levels here), and each
    iteration is a full Catalyst plan — Spark materializes the step
    relation per level, so the work per level stays distributed; this
    is the declarative counterpart to the driver-side iterative loops
    (``plans/iterative.py``), with the loop pushed into the engine.
    """
    cust = load_table(spark, sf_dir, "customer")
    cust.select("c_custkey").createOrReplaceTempView("customer_lineage_src")
    return spark.sql(_lineage_sql("DIV").format(src="customer_lineage_src"))
