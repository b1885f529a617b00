#!/usr/bin/env python
"""Substage breakdown of the BLOCK stage (the non-scaling stage in the
2->8 protocol: ~1.9x from 4x cores while score does ~3x).

Times each materialization boundary separately, with process-tree CPU
core-seconds around each, to find the serial / contended component:

  pdim     — pages scan + title regex extract, persist + count
  vocab    — prefix explode + hot-key vocab aggregation (count)
  capped   — key explode + anti-join + repartition persist + count
  pairs    — shuffle-hash self-join + distinct + payload joins + count

Usage: SPARK_GRAFT_CPUS=8 BENCH_ENTITIES=200000 taskset -c 0-7 \
           python scripts/diag_block.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spellchecker_wasm_spark.session import get_spark  # noqa: E402

_HZ = os.sysconf("SC_CLK_TCK")


def _all_cpu() -> float:
    me = os.getpid()
    total = 0.0
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) == me:
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().split()
            if "java" in parts[1] or "python" in parts[1]:
                total += (int(parts[13]) + int(parts[14])) / _HZ
        except OSError:
            continue
    return total


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    n_entities = int(os.environ.get("BENCH_ENTITIES", "200000"))
    spark = get_spark(app_name="diag-block", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from spellchecker_wasm_spark.operators.pairs import candidate_pairs
    from spellchecker_wasm_spark.pipeline.linkage import (
        LinkageConfig, hot_keys_vocab, pages_to_block_hashes,
        title_prefixes_array)
    from spellchecker_wasm_spark.pipeline.webpages import (
        synthesize_pages_spark)
    from spellchecker_wasm_spark.functions.text_expr import title_expr

    cfg = LinkageConfig(max_block_size=500)
    pages, _labels = synthesize_pages_spark(spark, n_entities, seed=42)
    pages = pages.cache()
    pages.count()

    stages: dict[str, dict] = {}

    def mark(name, fn):
        c0, t0 = _all_cpu(), time.time()
        out = fn()
        wall = time.time() - t0
        stages[name] = {"wall": round(wall, 2),
                        "cpu_core_sec": round(_all_cpu() - c0, 2)}
        return out

    pdim = (pages.where(F.col("html").isNotNull())
            .select(F.xxhash64("url").alias("id"),
                    title_expr(F.col("html")).alias("title"))
            .persist())
    mark("pdim", pdim.count)

    toks = pdim.select(F.explode(
        title_prefixes_array(F.col("title"), cfg)).alias("prefix"))
    hot = hot_keys_vocab(toks, cfg)
    mark("vocab_hot", lambda: hot.cache().count())

    blocks = pages_to_block_hashes(pdim, cfg)
    capped = (blocks.join(F.broadcast(hot.select("block_key")),
                          "block_key", "left_anti")
              .repartition(F.col("block_key"))
              .persist())
    mark("capped_persist", capped.count)

    dim = pdim.select("id", F.col("title").alias("term"))
    pairs = candidate_pairs(capped, id_col="page_id",
                            max_len_diff=cfg.max_edit_distance,
                            dim=dim, len_col="tl")
    mark("pairs", pairs.count)

    print(json.dumps({"cpus": cpus, "entities": n_entities,
                      "stages": stages}))
    spark.stop()


if __name__ == "__main__":
    main()
