#!/usr/bin/env python
"""Diagnostic: per-sub-step wall times of the linkage pipeline at a given
core count, to isolate which step anti-scales from 8→32 cores.

Usage: SPARK_GRAFT_CPUS=32 BENCH_ENTITIES=100000 python scripts/diag_scaling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spellchecker_wasm_spark.session import get_spark  # noqa: E402


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_entities = int(os.environ.get("BENCH_ENTITIES", "100000"))
    spark = get_spark(app_name=f"diag-{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from spellchecker_wasm_spark.operators.blocking import cap_hot_blocks
    from spellchecker_wasm_spark.operators.clustering import connected_components
    from spellchecker_wasm_spark.operators.pairs import candidate_pairs
    from spellchecker_wasm_spark.operators.scoring import score_pairs
    from spellchecker_wasm_spark.pipeline.linkage import (
        LinkageConfig, pages_to_blocks)
    from spellchecker_wasm_spark.pipeline.webpages import synthesize_pages_spark

    cfg = LinkageConfig()
    t = {}

    t0 = time.time()
    pages, labels = synthesize_pages_spark(spark, n_entities, seed=42)
    pages = pages.cache()
    n_pages = pages.count()
    t["gen"] = time.time() - t0

    t0 = time.time()
    blocks = pages_to_blocks(pages, cfg)
    blocks = blocks.persist()
    n_blocks = blocks.count()
    t["blocks_materialize"] = time.time() - t0

    t0 = time.time()
    capped, dropped = cap_hot_blocks(blocks, cfg.max_block_size)
    capped = capped.persist()
    n_capped = capped.count()
    t["cap"] = time.time() - t0

    t0 = time.time()
    pairs = candidate_pairs(capped, id_col="url", term_col="title",
                            max_len_diff=2).persist()
    n_pairs = pairs.count()
    t["pairs"] = time.time() - t0

    t0 = time.time()
    scored = score_pairs(pairs, max_distance=2).persist()
    n_scored = scored.count()
    t["score"] = time.time() - t0

    t0 = time.time()
    cc = connected_components(scored.select("id_a", "id_b"))
    cc.count()
    t["cluster"] = time.time() - t0

    out = {"cpus": cpus, "pages": n_pages, "blocks": n_blocks,
           "capped": n_capped, "pairs": n_pairs, "scored": n_scored,
           "times": {k: round(v, 2) for k, v in t.items()}}
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
