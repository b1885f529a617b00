"""Focused equivalence tests for the round-6 optimizations that changed
operator/query internals (round rule: every internals-changing
optimization carries a test proving the rewrite computes the same
thing).  The full oracle sweep (tests/test_query_catalog.py) covers the
end results; these pin the REWRITE-vs-REFERENCE equivalence directly so
a future refactor can't silently diverge.

Covered here:
  * operators/incremental.standing_index — term payload now rides the
    key explode (pages re-join removed, single-split fan-out added)
  * queries._lk_gram_pair_counts — the shared gram-pair-count frame
    qgram_blocking/canopy_blocking both derive from (length window
    moved to a post-agg filter; loose-graph derived from the counts)
  * queries._q_dedup_embedding — interpreted per-pair HOF dot replaced
    by one numpy matmul per Arrow batch
"""

import os

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_standing_index_matches_join_formulation(spark):
    """The keep_cols carry must produce exactly the old explode→join
    rows: same columns, same multiset."""
    from spellchecker_wasm_spark.operators.incremental import (
        _explode_keys, standing_index)

    pages = spark.createDataFrame(
        [(1, "spark"), (2, "spa"), (3, "sprk"), (4, "a")],
        "page_id long, title string")
    asg = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 4)], "page_id long, component long")
    got = standing_index(pages, asg)
    # reference: the pre-r6 formulation (explode, then join pages for
    # the term payload, then join the assignment)
    eb = _explode_keys(pages, "ex_id", "el", "page_id", "title", 2, 7)
    want = (eb.join(pages.select(F.col("page_id").alias("ex_id"),
                                 F.col("title").alias("term_b")), "ex_id")
            .join(asg.select(F.col("page_id").alias("ex_id"), "component"),
                  "ex_id"))
    assert sorted(got.columns) == sorted(want.columns)
    g = _rows(got.select(*sorted(got.columns)))
    w = _rows(want.select(*sorted(want.columns)))
    assert g == w


def test_gram_pair_counts_reproduce_direct_joins(spark):
    """qgram's candidate set and canopy's loose graph derived from the
    shared pair-count frame must equal the direct self-join
    formulations they replaced."""
    import spellchecker_wasm_spark.queries as Q

    pages = Q._lk_pages(spark, SF_DIR)
    g = pages.select(
        "page_id", F.length("title").alias("tl"),
        F.explode(F.array_distinct(F.expr(
            "transform(sequence(1, length(title) - 2), "
            "i -> substring(title, i, 3))"))).alias("gram"))
    a, b = g.alias("a"), g.alias("b")
    qgram_direct = (a.join(b, (F.col("a.gram") == F.col("b.gram"))
                           & (F.col("a.page_id") < F.col("b.page_id"))
                           & (F.abs(F.col("a.tl") - F.col("b.tl")) <= 2))
                    .select(F.col("a.page_id").alias("id_a"),
                            F.col("b.page_id").alias("id_b"))
                    .distinct())
    sim_direct = (a.join(b, (F.col("a.gram") == F.col("b.gram"))
                         & (F.col("a.page_id") < F.col("b.page_id")))
                  .groupBy(F.col("a.page_id").alias("id_a"),
                           F.col("b.page_id").alias("id_b"))
                  .agg(F.count(F.lit(1)).alias("ns"))
                  .where(F.col("ns") >= Q._CANOPY_LOOSE)
                  .select("id_a", "id_b"))
    gpc = Q._lk_gram_pair_counts(spark, SF_DIR)
    qgram_shared = (gpc.where(F.abs(F.col("tla") - F.col("tlb")) <= 2)
                    .select("id_a", "id_b"))
    sim_shared = (gpc.where(F.col("ns") >= Q._CANOPY_LOOSE)
                  .select("id_a", "id_b"))
    assert _rows(qgram_shared) == _rows(qgram_direct)
    assert _rows(sim_shared) == _rows(sim_direct)


def test_dedup_embedding_matches_hof_formulation(spark):
    """The numpy-matmul rewrite must emit exactly the pairs of the old
    broadcast-NLJ interpreted-HOF plan (same IEEE cosine cut)."""
    import spellchecker_wasm_spark.queries as Q
    from spellchecker_wasm_spark.operators.similarity import _prep
    from spellchecker_wasm_spark.queries import _DEDUP_EMB_CAP, load

    got = Q._q_dedup_embedding(spark, SF_DIR)
    emb = (load(spark, SF_DIR, "embeddings")
           .where(F.col("vec_id") < _DEDUP_EMB_CAP))
    n = _prep(emb, "vec_id", "embedding")
    a = n.select(F.col("vid").alias("vec_a"), F.col("v").alias("va"),
                 F.col("nrm").alias("na"))
    b = n.select(F.col("vid").alias("vec_b"), F.col("v").alias("vb"),
                 F.col("nrm").alias("nb"))
    want = (a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
            .withColumn("dot", F.expr(
                "aggregate(zip_with(va, vb, (x, y) -> x * y), 0L, "
                "(acc, x) -> acc + x)"))
            .where(F.col("dot") / (F.sqrt("na") * F.sqrt("nb")) >= 0.35)
            .select("vec_a", "vec_b"))
    assert _rows(got) == _rows(want)
    assert len(_rows(got)) > 0  # non-vacuous at this SF
