"""Invariants of the CCNet-style boilerplate removal (beyond the DuckDB
value-hash in test_query_catalog): exactly one instance of every distinct
chunk survives corpus-wide, and untouched docs reassemble verbatim."""

import os

from pyspark.sql import functions as F

from spellchecker_wasm_spark.queries import (
    _BP_CHUNK_TOKENS, _q_boilerplate_chunks, load)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_one_survivor_per_distinct_chunk(spark):
    out = _q_boilerplate_chunks(spark, SF_DIR)
    docs = load(spark, SF_DIR, "documents").where(F.col("text").isNotNull())
    chunks = (docs.select(F.expr(
        "filter(split(text, ' '), x -> x <> '')").alias("w"))
        .select(F.explode(F.expr(
            f"sequence(1, size(w), {_BP_CHUNK_TOKENS})")).alias("start"),
            "w")
        .select(F.expr(
            f"array_join(slice(w, start, {_BP_CHUNK_TOKENS}), ' ')")
            .alias("chunk")))
    n_distinct = chunks.distinct().count()
    agg = out.agg(F.sum("n_kept"), F.sum("n_chunks")).first()
    assert agg[0] == n_distinct          # one survivor per distinct chunk
    assert agg[1] == chunks.count()      # nothing dropped from accounting
    assert agg[0] < agg[1]               # fixture really has boilerplate


def test_unique_docs_reassemble_verbatim(spark):
    out = _q_boilerplate_chunks(spark, SF_DIR).where(
        F.col("n_kept") == F.col("n_chunks"))
    docs = (load(spark, SF_DIR, "documents")
            .where(F.col("text").isNotNull())
            .select("doc_id", F.expr(
                "array_join(filter(split(text, ' '), x -> x <> ''), ' ')")
                .alias("norm_text")))
    joined = out.join(docs, "doc_id")
    assert joined.count() > 0
    assert joined.where(
        F.col("kept_text") != F.col("norm_text")).count() == 0
