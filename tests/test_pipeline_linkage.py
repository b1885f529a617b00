"""North-star pipeline test: synthetic Common-Crawl pages → blocking →
scoring → clustering, pairwise F1 ≥ 0.99 (BASELINE.json metric), with
resume-from-checkpoint and extraction-invariant checks."""

import pytest
from pyspark.sql import functions as F

from spellchecker_wasm_spark.pipeline import (
    LinkageConfig, StageWriter, pairwise_f1, run_linkage, synthesize_pages)
from spellchecker_wasm_spark.pipeline.webpages import extract_text_from_html


@pytest.fixture(scope="module")
def pages_and_labels(spark):
    pages_pdf, labels_pdf = synthesize_pages(n_entities=150, seed=42)
    return (spark.createDataFrame(pages_pdf).cache(),
            spark.createDataFrame(labels_pdf).cache())


def test_generator_determinism():
    a, _ = synthesize_pages(n_entities=20, seed=7)
    b, _ = synthesize_pages(n_entities=20, seed=7)
    assert a.equals(b)
    c, _ = synthesize_pages(n_entities=20, seed=8)
    assert not a["url"].equals(c["url"])


def test_extraction_invariant_byte_identical():
    pages, _ = synthesize_pages(n_entities=25, seed=3)
    for _, row in pages.iterrows():
        assert extract_text_from_html(row["html"]) == row["text"]


def test_input_schema_matches_hint(pages_and_labels):
    pages, _ = pages_and_labels
    assert dict(pages.dtypes) == {"url": "string", "warc_ts": "timestamp",
                                  "html": "binary", "text": "string",
                                  "lang": "string"}


def test_fused_blocks_equal_staged(pages_and_labels):
    """All three blocking paths must emit exactly the same
    (url, title, block_key) set: the pure-Catalyst pages_to_blocks (hot
    path), the round-1 Python mapInPandas pass (parity reference), and the
    staged operator chain."""
    from spellchecker_wasm_spark.operators.blocking import build_blocks
    from spellchecker_wasm_spark.pipeline.linkage import (
        LinkageConfig, extract_and_tokenize, pages_to_blocks,
        pages_to_blocks_python)
    pages, _ = pages_and_labels
    cfg = LinkageConfig()
    catalyst = {(r["url"], r["title"], r["block_key"])
                for r in pages_to_blocks(pages, cfg).collect()}
    fused = {(r["url"], r["title"], r["block_key"])
             for r in pages_to_blocks_python(pages, cfg).collect()}
    tokens = extract_and_tokenize(pages, cfg)
    staged = {(r["url"], r["title"], r["block_key"])
              for r in build_blocks(tokens, term_col="token",
                                    carry_cols=("url", "title")).collect()}
    assert catalyst == fused
    assert fused == staged


def test_linkage_f1(pages_and_labels):
    pages, labels = pages_and_labels
    result = run_linkage(pages.sparkSession, pages)
    scores = pairwise_f1(result["clusters"], labels)
    assert scores["f1"] >= 0.99, scores
    assert scores["recall"] == 1.0, scores  # blocking is lossless at ≤2 edits


def test_fused_prefilter_equals_post_dedup(pages_and_labels):
    """prefilter_before_dedup moves the lossless 2d-banded Levenshtein
    ahead of the pair distinct() — scored pairs and clusters must be
    IDENTICAL to the default plan on the same input."""
    pages, _ = pages_and_labels
    base = run_linkage(pages.sparkSession, pages)
    fused = run_linkage(pages.sparkSession, pages,
                        config=LinkageConfig(prefilter_before_dedup=True))
    key = lambda r: (r["id_a"], r["id_b"], r["distance"])
    assert sorted(map(key, base["scored_pairs"]
                      .select("id_a", "id_b", "distance").collect())) == \
           sorted(map(key, fused["scored_pairs"]
                      .select("id_a", "id_b", "distance").collect()))
    to_sets = lambda df: sorted(
        tuple(sorted(r["nodes"])) for r in df.groupBy("component")
        .agg(F.collect_set("node").alias("nodes")).collect())
    assert to_sets(base["clusters"]) == to_sets(fused["clusters"])


def test_linkage_resume_from_checkpoint(spark, pages_and_labels, tmp_path):
    pages, labels = pages_and_labels
    writer = StageWriter(spark, str(tmp_path), "run1")
    r1 = run_linkage(spark, pages, writer=writer)
    f1_first = pairwise_f1(r1["clusters"], labels)["f1"]
    events = [m["event"] for m in writer.metrics()]
    assert events.count("write") == 3  # blocks, scored_pairs, clusters

    # resume: same run_id must read back, not recompute
    writer2 = StageWriter(spark, str(tmp_path), "run1")
    r2 = run_linkage(spark, pages, writer=writer2)
    events2 = [m["event"] for m in writer2.metrics() if m["event"] == "resume"]
    assert len(events2) == 3
    assert pairwise_f1(r2["clusters"], labels)["f1"] == f1_first

    # lineage carries per-partition row counts; the observation-based
    # total (free, rides the write) must agree with the per-partition
    # scan (opt-in second pass)
    writes = [m for m in writer.metrics() if m["event"] == "write"]
    assert all("partitions" in m and m["row_count"] > 0 for m in writes)
    assert all(sum(m["partitions"].values()) == m["row_count"]
               for m in writes)


def test_extraction_invariant_enforced(spark, pages_and_labels):
    pages, _ = pages_and_labels
    corrupted = pages.withColumn(
        "text", F.concat(F.col("text"), F.lit("!")))
    with pytest.raises(ValueError, match="invariant"):
        run_linkage(spark, corrupted)


def test_multibyte_entities_clustered(pages_and_labels):
    pages, labels = pages_and_labels
    ru = pages.where(F.col("lang") == "ru")
    assert ru.count() > 0  # seed produces a Russian minority
    result = run_linkage(pages.sparkSession, pages,
                         LinkageConfig(verify_extraction=False))
    ru_urls = {r["url"] for r in ru.select("url").collect()}
    comp = {r["node"]: r["component"] for r in result["clusters"].collect()}
    truth = labels.collect()
    for row in truth:
        if row["url_a"] in ru_urls:
            assert comp[row["url_a"]] == comp[row["url_b"]]


@pytest.mark.parametrize("cap", [10**9, 500, 20])
def test_two_level_pairs_equal_flat(pages_and_labels, cap):
    """candidate_pairs_prefix (vocabulary-level keying + expansion) must
    produce EXACTLY the flat key-explosion candidate set — uncapped AND at
    any hot-key cap (its page-weighted key cap mirrors cap_hot_blocks)."""
    from pyspark.sql import functions as F

    from spellchecker_wasm_spark.operators.blocking import cap_hot_blocks
    from spellchecker_wasm_spark.operators.pairs import (
        candidate_pairs, candidate_pairs_prefix)
    from spellchecker_wasm_spark.pipeline.linkage import (
        LinkageConfig, pages_to_blocks, pages_to_prefixes)
    pages, _ = pages_and_labels
    cfg = LinkageConfig()

    blocks = (pages_to_blocks(pages, cfg)
              .select(F.xxhash64("url").alias("page_id"),
                      F.length("title").alias("tl"), "block_key"))
    capped, _ = cap_hot_blocks(blocks, cap)
    dim = pages.select(F.xxhash64("url").alias("id"),
                       F.lit("x").alias("term"))
    flat = {(r["id_a"], r["id_b"]) for r in
            candidate_pairs(capped, id_col="page_id", dim=dim,
                            len_col="tl",
                            max_len_diff=cfg.max_edit_distance)
            .select("id_a", "id_b").collect()}

    toks = (pages_to_prefixes(pages, cfg)
            .select(F.xxhash64("url").alias("page_id"),
                    F.length("title").alias("tl"), "prefix"))
    two, _, _ = candidate_pairs_prefix(
        toks, max_len_diff=cfg.max_edit_distance, max_block_size=cap)
    two_set = {(r["id_a"], r["id_b"]) for r in two.collect()}
    assert two_set == flat
