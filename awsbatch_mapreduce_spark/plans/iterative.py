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

    EAGER: calling this function runs one Spark job per iteration (a
    bounded k x dim stats collect — the codebook, which was always
    driver-broadcast; the corpus never leaves the cluster) plus one
    up-front materialization of the quantized working set, and the
    next iteration's codebook is rebuilt as a driver-side literal from
    the collected exact int64 sums (round 18; ADVICE r18 asked the
    docstring to say so).  Each iteration persists its assignment and
    unpersists the previous one so lineage does not grow with the
    iteration count.  The returned assignment carries ``d_fp`` (1e-12
    fixed-point squared distance) so downstream inertia sums are exact
    integers.

    Round-19 interior discipline (guide §2.4 / §7.3 — the lifecycle
    queries' wall is driver choreography, not data):

    - the quantized working set is ``localCheckpoint``-ed ONCE, so the
      five assign passes read materialized blocks instead of repeating
      the parquet scan + quantize per iteration (eager, in-region —
      every caller re-pays it per run, no cross-run reuse);
    - the per-iteration argmin is a LITERAL-codebook expression (the
      codebook already lives on the driver as the previous collect's
      exact sums): ``transform`` over an array<array<double>> literal +
      ``array_min``/``array_position``, exactly the (d_fp, cell)
      lexicographic argmin of the old broadcast crossJoin + struct-min
      aggregate — same ``_sq_dist_fp`` integers, ties resolved to the
      lowest cell because the literal is sorted by cell ascending and
      ``array_position`` returns the FIRST minimum.  This removes BOTH
      the per-iteration broadcast-build job and the n-row vec_id
      exchange that the crossJoin+groupBy form needed to collapse its
      n x k candidates (guide §2.4 "remove shuffles outright"): each
      iteration is now scan -> per-row argmin -> bounded (cell, pos)
      rollup -> k x dim collect, ONE exchange of a bounded frame;
    - AQE is disabled around the iteration loop (restored after): the
      iteration query has a FIXED shape with no join to re-plan and a
      bounded exchange, so AQE contributes nothing here while charging
      one extra driver job + re-plan per stage per iteration (measured:
      54 jobs for the 10 collects of a two-fit lifecycle with AQE on,
      10 with it off).  Set ``SPARK_GRAFT_FIT_AQE=1`` to keep AQE on
      inside the fit; the shuffle partitioning still derives from the
      session conf either way.
    """
    import os as _os

    q = (
        corpus.select("vec_id", "vq")
        if quantized
        else corpus.select("vec_id", _quantize(F.col("embedding")).alias("vq"))
    )
    spark = corpus.sparkSession
    q = q.localCheckpoint()

    cell_type = k_init.schema["cell"].dataType
    assigned_prev = None
    inertia_trace: list[float] = []
    _fit_aqe = _os.environ.get("SPARK_GRAFT_FIT_AQE") == "1"
    _old_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    if not _fit_aqe:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # the init codebook is bounded (k x dim — it was always either
        # broadcast or a driver literal), so ONE collect brings it into
        # the same driver-side (cells, cents) form every later
        # iteration's stats rebuild produces
        init_rows = sorted(k_init.collect(), key=lambda r: r["cell"])
        cells = [r["cell"] for r in init_rows]
        cents = [list(r["centroid"]) for r in init_rows]
        for i in range(n_iter):
            assigned = _assign_literal(q, cells, cents, cell_type)
            if i == n_iter - 1:
                # only the FINAL assignment has downstream consumers
                # (coarse write + capacity split); intermediates feed
                # exactly one stats collect each, so caching them was
                # pure block-manager overhead
                assigned = assigned.persist()
            # ONE action per iteration (round-18 optimization, guide §1.2 /
            # §2.4): the per-(cell, pos) stats rollup carries the exact
            # int64 component sums, member counts AND the per-cell d_fp
            # sums, so inertia and the next codebook come out of a single
            # collect.  The collected frame is bounded (k x dim rows — the
            # codebook, which was ALWAYS driver-broadcast), never
            # corpus-scaled.  Arithmetic is operand-identical: the driver
            # divides the same exact int64 sum by the same (scale x count)
            # in IEEE double, exactly as _centroids_of / the oracle's
            # c{i} CTEs do.
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
                cells = sorted(by_cell)
                cents = [
                    [by_cell[cell][p] for p in sorted(by_cell[cell])]
                    for cell in cells
                ]
            assigned_prev = assigned
    finally:
        if not _fit_aqe:
            spark.conf.set("spark.sql.adaptive.enabled", _old_aqe)
    return assigned_prev, inertia_trace


def _assign_literal(
    q: DataFrame, cells: list, cents: list, cell_type
) -> DataFrame:
    """One Lloyd ASSIGN step against a DRIVER-LITERAL codebook:
    (vec_id, vq) -> (vec_id, vq, cell, d_fp) by the same integer-
    quantized (d_fp, cell) argmin as :func:`assign_to_cells`, computed
    per row with higher-order functions over the literal instead of a
    broadcast crossJoin + aggregate.  ``cells``/``cents`` MUST be
    sorted by cell ascending: ``array_position`` returns the first
    minimum, which is then the lowest cell — the struct-min tie-break.
    No exchange, no broadcast build: the n x k distance work happens
    in the row's own task and only the argmin row survives."""
    if not cells:
        # empty codebook (empty corpus): the crossJoin form produced an
        # empty frame; keep that contract
        return q.select(
            "vec_id",
            "vq",
            F.lit(None).cast(cell_type).alias("cell"),
            F.lit(None).cast("bigint").alias("d_fp"),
        ).filter(F.lit(False))
    ds = F.transform(
        _codebook_literal(cents), lambda c: _sq_dist_fp(F.col("vq"), c)
    )
    cells_lit = F.expr(
        "array(" + ",".join(str(int(c)) for c in cells) + ")"
    )
    best_d = F.array_min(ds)
    idx = F.array_position(ds, best_d).cast("int")
    return q.select(
        "vec_id",
        "vq",
        F.element_at(cells_lit, idx).cast(cell_type).alias("cell"),
        best_d.alias("d_fp"),
    )


def _codebook_literal(cents: list) -> Column:
    """k x dim driver-side centroid lists -> ONE array<array<double>>
    literal Column, as a JSON string literal + ``from_json``.  Form
    matters for driver overhead, not semantics (round 19, measured):
    ``F.lit(nested_list)`` costs one py4j round-trip per element
    (~450 ms per iteration at k x dim = 512), and a parsed
    ``array(array(..))`` expression is a k x dim-node tree that every
    analyzer/optimizer pass re-walks per Dataset op (~70-140 ms per
    select at this size; a two-fit lifecycle measured ~7 s slower on
    that form) — while the JSON literal is a 2-node tree the optimizer
    constant-folds once per query, and per-row access through the
    folded array measured no slower than the parsed form once JIT-warm
    (0.21 s vs 0.73 s per million element_at+fold rows).  Exactness:
    ``json.dumps`` emits Python's shortest-round-trip float digits and
    Jackson parses them with ``Double.parseDouble`` semantics, so the
    folded codebook is bit-identical to the collected doubles."""
    import json

    return F.from_json(F.lit(json.dumps(cents)), "array<array<double>>")


def _collect_codebook(codebook: DataFrame) -> tuple[list, list]:
    """Bounded (cell, centroid) frame -> sorted driver-side
    (cells, cents) lists for :func:`_assign_literal` /
    :func:`assign_to_cells_collected`.  One tiny collect job — the
    codebook was always broadcast-sized by contract (k0 rows)."""
    rows = sorted(codebook.collect(), key=lambda r: r["cell"])
    return [r["cell"] for r in rows], [list(r["centroid"]) for r in rows]


def assign_to_cells_collected(q: DataFrame, codebook: DataFrame) -> DataFrame:
    """:func:`assign_to_cells` with the BOUNDED codebook collected to
    the driver and applied as a literal expression (round 19, guide
    §2.4): same (vec_id, vq, cell, d_fp) output, same integer argmin
    and (d_fp, cell) tie-break, but the batch side crosses NO exchange
    — the old broadcast crossJoin + groupBy(vec_id) form shuffled one
    row per batch vector just to collapse its own k candidates, plus
    one broadcast-build job per probe.  The collect happens at plan-
    build time (one k0-row job — the codebook was always driver/
    executor-resident by contract; the never-broadcast pins cover the
    data-scaled sides, not this frame)."""
    cells, cents = _collect_codebook(codebook)
    return _assign_literal(q, cells, cents, codebook.schema["cell"].dataType)


def assign_topk_cells_collected(
    q: DataFrame, codebook: DataFrame, nprobe: int
) -> DataFrame:
    """Rank-``nprobe`` coarse assignment against a collected bounded
    codebook: (vec_id, vq) -> (vec_id, vq, cell, rnk) with rnk =
    1..nprobe by ascending (d_fp, cell) — exactly the iterated
    "struct-min with ranks 1..r-1 excluded" program of
    ``wave13._assign_fine_multi`` (each cell appears once, so the r-th
    lexicographic (d_fp, cell) element IS the r-th exclusion-round
    winner), computed per row via array_sort + slice instead of nprobe
    crossJoin/aggregate rounds — removing nprobe batch-sized exchanges
    and nprobe-1 broadcast builds per probe."""
    cells, cents = _collect_codebook(codebook)
    cell_type = codebook.schema["cell"].dataType
    if not cells:
        return q.select(
            "vec_id",
            "vq",
            F.lit(None).cast(cell_type).alias("cell"),
            F.lit(None).cast("int").alias("rnk"),
        ).filter(F.lit(False))
    cells_lit = F.expr(
        "array(" + ",".join(str(int(c)) for c in cells) + ")"
    )
    ds = F.transform(
        _codebook_literal(cents), lambda c: _sq_dist_fp(F.col("vq"), c)
    )
    top = F.slice(
        F.array_sort(
            F.zip_with(
                ds,
                cells_lit,
                lambda d, c: F.struct(d.alias("d"), c.alias("c")),
            )
        ),
        1,
        nprobe,
    )
    return q.select(
        "vec_id", "vq", F.posexplode(top).alias("p", "s")
    ).select(
        "vec_id",
        "vq",
        F.col("s.c").cast(cell_type).alias("cell"),
        (F.col("p") + 1).cast("int").alias("rnk"),
    )


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
    ).localCheckpoint()  # 9 consumers (8 rounds + seed labels);
    # eager in-region checkpoint, not persist — same measurement
    # semantics as the round-19 ladder migration (no cross-rep
    # CacheManager reuse of the warm-up's cached frame)

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
