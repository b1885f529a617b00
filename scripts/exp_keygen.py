#!/usr/bin/env python
"""Microbenchmark: three physical strategies for the blocking key explode
(the block stage's CPU hog — diag_block shows vocab_hot + capped_persist
burn ~200 core-s at 8 cores on the 600k-page input).

A) current linkage shape: per-page transform/flatten/array_distinct lambda
   (higher-order functions are CodegenFallback => interpreted), explode,
   xxhash64(string key)
B) explode prefixes first (Generate), delete_keys_of_prefix on the plain
   column, explode, xxhash64 — no per-page distinct (recovered later by a
   partition-local dedup)
C) hash-direct: explode prefixes, then emit array<long> FNV-1a hashes of
   each delete variant computed from per-char codepoints — zero string
   allocation, zero higher-order functions

Each counts the exploded (page_id, key_hash) rows.  Run pinned:
  SPARK_GRAFT_CPUS=8 taskset -c 0-7 python scripts/exp_keygen.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spellchecker_wasm_spark.functions.delete_expr import (  # noqa: E402
    delete_keys_of_prefix)
from spellchecker_wasm_spark.functions.delete_hash_expr import (  # noqa: E402
    delete_key_hashes_of_prefix)
from spellchecker_wasm_spark.pipeline.linkage import (  # noqa: E402
    LinkageConfig, title_block_keys, title_prefixes_array)
from spellchecker_wasm_spark.pipeline.webpages import (  # noqa: E402
    synthesize_pages_spark)
from spellchecker_wasm_spark.functions.text_expr import title_expr  # noqa: E402
from spellchecker_wasm_spark.session import get_spark  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    n_entities = int(os.environ.get("BENCH_ENTITIES", "200000"))
    spark = get_spark(app_name="exp-keygen", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = LinkageConfig()

    pages, _ = synthesize_pages_spark(spark, n_entities, seed=42)
    pdim = (pages.where(F.col("html").isNotNull())
            .select(F.xxhash64("url").alias("id"),
                    title_expr(F.col("html")).alias("title"))
            .persist())
    pdim.count()

    out = {}

    def timed(name, df):
        # force the hash column (count() alone lets Catalyst prune it)
        t0 = time.time()
        row = df.agg(F.count(F.lit(1)).alias("n"),
                     F.expr("bit_xor(block_key)").alias("x")).first()
        out[name] = {"sec": round(time.time() - t0, 2), "rows": row["n"]}

    # A: current shape
    a = (pdim.select(
        F.col("id").alias("page_id"),
        F.explode(title_block_keys(F.col("title"), cfg)).alias("k"))
        .select("page_id", F.xxhash64("k").alias("block_key")))
    timed("A_lambda_string", a)

    pref = pdim.select(
        F.col("id").alias("page_id"),
        F.explode(title_prefixes_array(F.col("title"), cfg)).alias("prefix"))

    # B: explode-first, string keys
    b = (pref.select(
        "page_id",
        F.explode(delete_keys_of_prefix(
            F.col("prefix"), cfg.max_edit_distance,
            cfg.prefix_length)).alias("k"))
        .select("page_id", F.xxhash64("k").alias("block_key")))
    timed("B_explode_string", b)

    # C: explode-first, hash-direct
    c = pref.select(
        "page_id",
        F.explode(delete_key_hashes_of_prefix(
            F.col("prefix"), cfg.max_edit_distance,
            cfg.prefix_length)).alias("block_key"))
    timed("C_hash_direct", c)

    # D: hash-direct with codepoints pre-projected as columns (shared
    # across the 29 mask hashes instead of re-derived inside each)
    from spellchecker_wasm_spark.functions.delete_hash_expr import (
        delete_key_hash_explode)
    d = delete_key_hash_explode(pref, "prefix", cfg.max_edit_distance,
                                cfg.prefix_length, keep_cols=["page_id"])
    timed("D_hash_precoded", d)

    print(json.dumps({"cpus": cpus, "entities": n_entities, **out}))
    spark.stop()


if __name__ == "__main__":
    main()
