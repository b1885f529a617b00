#!/usr/bin/env python
"""Counters-backed scaling diagnosis: JVM CPU core-seconds per pipeline
stage at a given parallelism, sampled from /proc/<pid>/stat around each
stage boundary.

If a stage's total CPU core-seconds are ~equal at 2 and 8 threads, the
work is fixed and wall should shrink ~4× (CPU-bound, scalable).  If CPU
core-seconds INFLATE with thread count, cycles are being spent on shared-
resource stalls (memory bandwidth, cache contention, lock spin) that a
real multi-machine cluster multiplies instead of sharing — the signature
that distinguishes "plan doesn't scale" from "box doesn't scale".

Usage: SPARK_GRAFT_CPUS=2 BENCH_ENTITIES=50000 python scripts/diag_cpu.py
Prints one JSON line: {"cpus": N, "stages": {name: {"wall": s,
"cpu_core_sec": s}}, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spellchecker_wasm_spark.session import get_spark  # noqa: E402

_HZ = os.sysconf("SC_CLK_TCK")


def _proc_cpu(pid: int) -> float:
    """utime+stime core-seconds of pid (not children — the JVM is one
    process; Python workers are separate and sampled via children counts
    of the driver python)."""
    with open(f"/proc/{pid}/stat") as f:
        parts = f.read().split()
    return (int(parts[13]) + int(parts[14])) / _HZ


def _all_cpu() -> float:
    """JVM + all python workers: sum over this session's process tree."""
    me = os.getpid()
    total = 0.0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().split()
            # count java and python processes in this container
            comm = parts[1]
            if b"java" in comm.encode() or b"python" in comm.encode():
                if int(pid) == me:
                    continue
                total += (int(parts[13]) + int(parts[14])) / _HZ
        except (FileNotFoundError, ProcessLookupError, PermissionError):
            continue
    return total


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "2"))
    n_entities = int(os.environ.get("BENCH_ENTITIES", "50000"))
    spark = get_spark(app_name=f"diagcpu-{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from spellchecker_wasm_spark.functions.text_expr import title_expr
    from spellchecker_wasm_spark.operators.clustering import (
        connected_components)
    from spellchecker_wasm_spark.operators.pairs import candidate_pairs
    from spellchecker_wasm_spark.operators.scoring import score_pairs
    from spellchecker_wasm_spark.pipeline.linkage import (
        LinkageConfig, hot_keys_vocab, title_block_keys,
        title_prefixes_array)
    from spellchecker_wasm_spark.pipeline.webpages import (
        synthesize_pages_spark)

    cfg = LinkageConfig(max_block_size=500)
    stages: dict[str, dict] = {}

    def timed(name, fn):
        c0, t0 = _all_cpu(), time.time()
        out = fn()
        wall = time.time() - t0
        stages[name] = {"wall": round(wall, 2),
                        "cpu_core_sec": round(_all_cpu() - c0, 2)}
        return out

    pages, labels = synthesize_pages_spark(spark, n_entities, seed=42)
    pages = pages.cache()
    timed("gen", pages.count)

    pdim = (pages.where(F.col("html").isNotNull())
            .select(F.xxhash64("url").alias("id"),
                    title_expr(F.col("html")).alias("title"))
            .persist())
    blocks = (pdim.select(
        F.col("id").alias("page_id"), F.length("title").alias("tl"),
        F.explode(title_block_keys(F.col("title"), cfg)).alias("k"))
        .select("page_id", "tl", F.xxhash64("k").alias("block_key")))
    toks = pdim.select(F.explode(
        title_prefixes_array(F.col("title"), cfg)).alias("prefix"))
    hot = hot_keys_vocab(toks, cfg)
    capped = (blocks.join(F.broadcast(hot.select("block_key")),
                          "block_key", "left_anti")
              .repartition(F.col("block_key"))
              .persist())
    timed("blocks_cap", capped.count)

    dim = pdim.select("id", F.col("title").alias("term"))
    pairs = candidate_pairs(capped, id_col="page_id",
                            max_len_diff=cfg.max_edit_distance,
                            dim=dim, len_col="tl").cache()
    timed("pairs", pairs.count)

    scored = score_pairs(pairs, max_distance=cfg.max_edit_distance).cache()
    timed("score", scored.count)

    def cluster():
        ids = connected_components(
            scored.select("id_a", "id_b"),
            nodes=pages.select(F.xxhash64("url").alias("page_id")))
        return ids.count()

    timed("cluster", cluster)

    print(json.dumps({"cpus": cpus, "entities": n_entities,
                      "stages": stages}))
    spark.stop()


if __name__ == "__main__":
    main()
