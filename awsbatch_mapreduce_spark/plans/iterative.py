"""Iterative algorithms on the engine: Lloyd k-means over embeddings.

Genuinely iterative computation — but, unlike round 1/2, no longer
outside the oracle gate: the iteration count is fixed (5), so the
DuckDB oracle unrolls the same five Lloyd steps as chained CTEs, and
every arithmetic step is made cross-engine bit-exact by quantizing to
integers (embedding components at 1e-6, squared distances at 1e-12)
so float-sum accumulation order can never flip an argmin or a rounded
inertia.  Each remaining float op (one division for a centroid
component, one subtract/multiply pair per dimension) is a single IEEE
primitive over identical operands in both engines.

Each Spark iteration is pure DataFrame algebra — assign =
broadcast-codebook argmin, update = posexplode + grouped exact-int
avg — so the per-iteration cost model is identical to the IVF build
in ``plans.similarity`` and scales the same way: the corpus is
scanned once per iteration, centroids stay tiny and broadcast.

Convergence (monotone non-increasing inertia) is asserted in
``tests/test_iterative.py``; exact equality with the unrolled oracle
in ``tests/test_oracle_parity.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from awsbatch_mapreduce_spark.plans.registry import query
from awsbatch_mapreduce_spark.sources.tables import load_table

_VSCALE = 1000000.0  # embedding components quantize at 1e-6
_DSCALE = 1000000000000.0  # squared distances quantize at 1e-12


def _quantize(col: Column) -> Column:
    """array<float> -> array<bigint> fixed-point at 1e-6 (exact int
    sums downstream; |v| <= ~2 here so no overflow anywhere)."""
    return F.transform(
        col,
        lambda v: F.floor(v.cast("double") * F.lit(_VSCALE) + F.lit(0.5)).cast(
            "bigint"
        ),
    )


def _sq_dist_fp(vq: Column, c: Column) -> Column:
    """Squared distance between a quantized vector and a double
    centroid, itself quantized to a 1e-12 int per dimension BEFORE the
    sum — integer addition is associative, so the fold order (Spark:
    array order; DuckDB: SUM over unnested rows) cannot matter."""
    return F.aggregate(
        F.zip_with(
            vq,
            c,
            lambda x, y: F.floor(
                (x / F.lit(_VSCALE) - y)
                * (x / F.lit(_VSCALE) - y)
                * F.lit(_DSCALE)
                + F.lit(0.5)
            ).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def _centroids_of(assigned: DataFrame) -> DataFrame:
    """cell assignment -> per-cell mean vector: posexplode the
    quantized components, exact int64 sum, ONE double division per
    component (identical operands in both engines -> identical IEEE
    result), ordered re-assembly."""
    flat = (
        assigned.select("cell", F.posexplode("vq").alias("pos", "v"))
        .groupBy("cell", "pos")
        .agg(
            (
                F.sum("v").cast("double")
                / (F.lit(_VSCALE) * F.count(F.lit(1)))
            ).alias("cv")
        )
    )
    return flat.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cv"))), lambda s: s["cv"]
        ).alias("centroid")
    )


def label_centroid_init(emb: DataFrame) -> DataFrame:
    """Deterministic k-means init: one centroid per ``label`` (the mean
    of the label's quantized vectors — same exact-int-sum + single-
    division arithmetic as ``_centroids_of``).  Shared by
    ``kmeans_embeddings`` and the wave-9 SemDeDup pipeline so both run
    the IDENTICAL cluster step (and the identical unrolled oracle,
    ``_kmeans_cte``)."""
    return (
        emb.select(
            F.col("label").cast("int").alias("cell"),
            F.posexplode(_quantize(F.col("embedding"))).alias("pos", "v"),
        )
        .groupBy("cell", "pos")
        .agg(
            (
                F.sum("v").cast("double") / (F.lit(_VSCALE) * F.count(F.lit(1)))
            ).alias("cv")
        )
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                lambda s: s["cv"],
            ).alias("centroid")
        )
    )


def assign_to_cells(q: DataFrame, centroids: DataFrame) -> DataFrame:
    """One Lloyd ASSIGN step: quantized corpus (vec_id, vq) against a
    broadcast codebook (cell, centroid) -> (vec_id, vq, cell, d_fp) by
    integer-quantized argmin with the (d_fp, cell) tie-break.  Shared
    by ``kmeans_fit``'s iteration loop and the wave-10/11 persisted-
    codebook probes so the assignment arithmetic has exactly one home
    (the oracle twins: the ``d{i}``/``a{i}`` CTEs and wave 10's ``an``).

    The argmin is a struct-min AGGREGATE, not a row_number window
    (round-11 ladder finding): min(struct(d_fp, cell)) is the same
    (d_fp, cell)-lexicographic first row, but the groupBy's partial
    aggregation collapses the n x k candidate blow-up MAP-SIDE — only
    one row per vec_id (carrying its constant vq) ever crosses the
    exchange, where the window plan shuffled every candidate row with
    its 64-int vq array attached (measured: the wave-11 fine-assign at
    the 100x rehearsal stalled on a ~30 GB candidate exchange; the
    aggregate form shuffles ~1/k of that)."""
    best = F.min(F.struct(F.col("d_fp"), F.col("cell"))).alias("b")
    return (
        q.crossJoin(F.broadcast(centroids))
        .select(
            "vec_id",
            "vq",
            "cell",
            _sq_dist_fp(F.col("vq"), F.col("centroid")).alias("d_fp"),
        )
        .groupBy("vec_id")
        .agg(F.first("vq").alias("vq"), best)
        .select(
            "vec_id",
            "vq",
            F.col("b.cell").alias("cell"),
            F.col("b.d_fp").alias("d_fp"),
        )
    )


def kmeans_fit(
    corpus: DataFrame,
    k_init: DataFrame,
    n_iter: int = 5,
    quantized: bool = False,
) -> tuple[DataFrame, list[float]]:
    """Run ``n_iter`` Lloyd iterations; return (final assignment,
    per-iteration inertia trace).  ``corpus`` needs (vec_id,
    embedding); ``k_init`` needs (cell, centroid: array<double>).
    With ``quantized=True`` the corpus is already (vec_id, vq) in the
    1e-6 fixed-point domain and the quantization step is skipped —
    the wave-13 refit path, which re-fits FROM the persisted members
    table (whose ``vq`` rows are ``_quantize(embedding)`` by
    construction, so both paths iterate on identical integers).

    Driver holds only the loop counter and inertia scalars; data never
    leaves the cluster.  Each iteration persists its assignment and
    unpersists the previous one so the lineage (and recomputation) does
    not grow with the iteration count — the standard Spark iterative-
    algorithm pattern.  The returned assignment carries ``d_fp``
    (1e-12 fixed-point squared distance) so downstream inertia sums
    are exact integers.
    """
    q = (
        corpus.select("vec_id", "vq")
        if quantized
        else corpus.select("vec_id", _quantize(F.col("embedding")).alias("vq"))
    )
    spark = corpus.sparkSession
    from pyspark.sql import types as T

    # literal-codebook schema mirrors the init frame's cell dtype so
    # the final assignment's schema is unchanged by the rewrite
    _lit_schema = T.StructType(
        [
            T.StructField("cell", k_init.schema["cell"].dataType),
            T.StructField("centroid", T.ArrayType(T.DoubleType())),
        ]
    )
    centroids = k_init
    assigned_prev = None
    inertia_trace: list[float] = []
    for i in range(n_iter):
        assigned = assign_to_cells(q, centroids).persist()
        # ONE action per iteration (round-18 optimization, guide §1.2 /
        # §2.4): the per-(cell, pos) stats rollup carries the exact
        # int64 component sums, member counts AND the per-cell d_fp
        # sums, so inertia and the next codebook come out of a single
        # collect — the old loop ran an inertia job plus a separate
        # centroid-aggregation subtree under the next broadcast build.
        # The collected frame is bounded (k x dim rows — the codebook,
        # which was ALWAYS driver-broadcast), never corpus-scaled.
        # Arithmetic is operand-identical: the driver divides the same
        # exact int64 sum by the same (scale x count) in IEEE double,
        # exactly as _centroids_of / the oracle's c{i} CTEs do.
        stats = (
            assigned.select(
                "cell", "d_fp", F.posexplode("vq").alias("pos", "v")
            )
            .groupBy("cell", "pos")
            .agg(
                F.sum("v").alias("sv"),
                F.count(F.lit(1)).alias("c"),
                F.sum("d_fp").alias("sd"),
            )
            .collect()
        )
        if stats:
            inertia_trace.append(
                sum(r["sd"] for r in stats if r["pos"] == 0) / _DSCALE
            )
        else:
            inertia_trace.append(None)
        if i < n_iter - 1:
            by_cell: dict = {}
            for r in stats:
                by_cell.setdefault(r["cell"], {})[r["pos"]] = r["sv"] / (
                    _VSCALE * r["c"]
                )
            centroids = spark.createDataFrame(
                [
                    (cell, [d[p] for p in sorted(d)])
                    for cell, d in sorted(by_cell.items())
                ],
                schema=_lit_schema,
            )
        if assigned_prev is not None:
            assigned_prev.unpersist()
        assigned_prev = assigned
    return assigned_prev, inertia_trace


def _kmeans_cte(
    n_iter: int = 5, source: str = "embeddings", cell_expr: str = "label"
) -> str:
    """The unrolled Lloyd CTE chain WITHOUT a final SELECT: ``WITH q AS
    (...), c0 AS (...), d1/a1/c1, ..., a{n_iter}`` — ``a{n_iter}`` is
    the final (vec_id, cell, dfp) assignment and ``q`` the quantized
    (vec_id, pos, vq) components.  Shared by the kmeans oracle and the
    wave-9/10/11 SemDeDup oracles so the cluster step can never drift
    between them.  ``source`` is the corpus relation — a table name or
    a parenthesized subquery (wave 10+ cluster the seen HALF for the
    persisted-codebook probes).  ``cell_expr`` is the init-cell
    expression over ``q``'s columns — ``label`` (default, one centroid
    per label) or a mod-hash like ``CAST(vec_id % (<k-subquery>) AS
    INT)`` (wave 11's adaptive codebook, where k is computed FROM the
    corpus at fit time — 'the Lloyd CTE already parameterizes k')."""
    steps = [
        f"""WITH q AS MATERIALIZED (
      SELECT vec_id, CAST(label AS INT) AS label,
             generate_subscripts(embedding, 1) AS pos,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0 + 0.5)
                  AS BIGINT) AS vq
      FROM {source}),
    c0 AS MATERIALIZED (
      SELECT {cell_expr} AS cell, pos,
             CAST(SUM(vq) AS DOUBLE) / (1000000.0 * COUNT(*)) AS c
      FROM q GROUP BY 1, 2)"""
    ]
    for i in range(1, n_iter + 1):
        steps.append(
            f"""d{i} AS MATERIALIZED (
      SELECT q.vec_id, c.cell,
             SUM(CAST(FLOOR((q.vq / 1000000.0 - c.c) * (q.vq / 1000000.0 - c.c)
                            * 1000000000000.0 + 0.5) AS BIGINT)) AS dfp
      FROM q JOIN c{i - 1} c ON c.pos = q.pos
      GROUP BY 1, 2),
    a{i} AS MATERIALIZED (
      SELECT vec_id, FIRST(cell ORDER BY dfp, cell) AS cell,
             FIRST(dfp ORDER BY dfp, cell) AS dfp
      FROM d{i} GROUP BY vec_id)"""
        )
        if i < n_iter:
            steps.append(
                f"""c{i} AS MATERIALIZED (
      SELECT a.cell, q.pos,
             CAST(SUM(q.vq) AS DOUBLE) / (1000000.0 * COUNT(*)) AS c
      FROM a{i} a JOIN q ON q.vec_id = a.vec_id
      GROUP BY 1, 2)"""
            )
    return ",\n    ".join(steps)


def _kmeans_oracle(n_iter: int = 5) -> str:
    """Unrolled Lloyd iterations as chained CTEs — the same quantized
    arithmetic as the Spark path, textually parallel per step, so the
    driver's value hash is exact (the 'iterated CTE' form VERDICT r2
    #7 asked for; fixed seed = deterministic per-label init)."""
    return (
        _kmeans_cte(n_iter)
        + f"""
    SELECT cell, COUNT(*) AS n_members,
           FLOOR(CAST(SUM(dfp) AS BIGINT) / 1000000000000.0 * 10000.0 + 0.5)
             / 10000.0 AS inertia
    FROM a{n_iter} GROUP BY cell"""
    )


@query("kmeans_embeddings", oracle=_kmeans_oracle(5))
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5 Lloyd iterations, k=10, init = per-label centroids
    (deterministic).  Output: per-cluster size and 4dp fixed-point
    inertia — exact-match against the unrolled-CTE oracle because
    every iteration's arithmetic is integer-quantized (module
    docstring)."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = kmeans_fit(
        emb.select("vec_id", "embedding"), label_centroid_init(emb), n_iter=5
    )
    return assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_members"),
        (
            F.floor(
                F.sum("d_fp") / F.lit(_DSCALE) * F.lit(10000.0) + F.lit(0.5)
            )
            / F.lit(10000.0)
        ).alias("inertia"),
    )


_CANONICAL_ORACLE = """
    WITH RECURSIVE pairs AS (
      -- near-dup relation: shared 24-char prefix; emit only CONSECUTIVE
      -- ids per group so the closure must chain A-B-C (diameter > 1)
      SELECT prev AS id_a, doc_id AS id_b FROM (
        SELECT doc_id,
               LAG(doc_id) OVER (PARTITION BY substr(text, 1, 24)
                                 ORDER BY doc_id) AS prev
        FROM documents)
      WHERE prev IS NOT NULL),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
    reach(node, root) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node),
    comp AS (SELECT node, MIN(root) AS canonical FROM reach GROUP BY node)
    SELECT CAST(node AS BIGINT) AS doc_id,
           CAST(canonical AS BIGINT) AS canonical_id
    FROM comp
    WHERE node <> canonical
"""


@query("dedup_canonical_assignment", oracle=_CANONICAL_ORACLE)
def dedup_canonical_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one dedup: map every duplicate document to the minimum
    doc_id of its connected component.  The pair generator (shared
    24-char prefix here; exact/MinHash/embedding pairs in production)
    emits only consecutive-id edges per group, so components CHAIN —
    A~B, B~C implies {A,B,C} even though A~C was never emitted, which
    is exactly why dedup needs a closure, not a pairwise join.

    Spark side: iterative min-label propagation over the edge list
    with POINTER DOUBLING — each round a node adopts the min of its
    neighbours' labels and of its label's own label, so the frontier
    distance doubles per round and an L-node chain converges in
    O(log L) rounds, not L (8 rounds covers 256-hop chains).  Each
    round's labels are localCheckpoint-ed: caching alone keeps the
    DATA but Catalyst still re-analyzes the k-deep logical plan every
    round, which dominates (measured 33 s -> ~5 s at sf0.1);
    truncating lineage per round is the same discipline GraphFrames
    applies to its iterative algorithms.  The
    oracle walks the same closure with a recursive CTE.  At 100 TB
    this is the standard "dedup keep-one" reduce after any pair
    generator (exact, MinHash, embedding).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w_grp = Window.partitionBy(F.substring("text", 1, 24)).orderBy("doc_id")
    pairs = (
        docs.withColumn("prev", F.lag("doc_id").over(w_grp))
        .filter(F.col("prev").isNotNull())
        .select(F.col("prev").alias("src"), F.col("doc_id").alias("dst"))
    )
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()

    # label propagation to fixpoint: label(node) = min reachable id
    labels = (
        edges.select("src")
        .distinct()
        .select(F.col("src").alias("node"), F.col("src").alias("label"))
        .localCheckpoint()
    )
    # Both propagation joins pair O(duplicate-set) frames whose
    # localCheckpoint'd stats Catalyst cannot size statically — pin them
    # off the broadcast path so an AQE runtime estimate can never
    # upgrade a corpus-scaled labels frame to a driver-built broadcast
    # (VERDICT r6 #2: the same latent class as the r5 rehearsal OOM).
    from awsbatch_mapreduce_spark.plans.hints import never_broadcast

    for _ in range(8):  # covers chains up to 2^8 hops via doubling
        one_hop = edges.join(
            never_broadcast(labels), edges.src == labels.node
        ).select(F.col("dst").alias("node"), "label")
        # pointer doubling: every label value is itself a node key, so
        # label(label) is always defined
        doubled = (
            never_broadcast(labels.alias("a"))
            .join(
                never_broadcast(labels.alias("b")),
                F.col("a.label") == F.col("b.node"),
            )
            .select(F.col("a.node").alias("node"), F.col("b.label").alias("label"))
        )
        prop = (
            one_hop.unionByName(labels)
            .unionByName(doubled)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            prop.alias("p")
            .join(labels.alias("l"), "node")
            .filter(F.col("p.label") != F.col("l.label"))
            .limit(1)
            .count()
        )
        labels = prop
        if changed == 0:
            break
    edges.unpersist()
    return labels.filter(F.col("node") != F.col("label")).select(
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("label").cast("bigint").alias("canonical_id"),
    )
