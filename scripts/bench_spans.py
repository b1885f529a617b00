#!/usr/bin/env python
"""ExactSubstr span-dedup scale benchmark: the dup_ngram_spans /
dup_span_removal catalog shapes on a synthesized corpus with PLANTED
boilerplate blocks (the shipped documents table has 500 rows at every
SF — fine for oracles, useless for scale).

Corpus, generated entirely JVM-side and deterministically:
  * N docs of 60 tokens; token (id, i) = `t<xxhash64(id, i) % V>` with
    V = 4e9 — windows are unique w.h.p., so clean docs carry ZERO
    duplicated windows (exact ground truth, no probabilistic slack).
  * Every doc with id % 5 == 0 gets a 10-token boilerplate BLOCK
    spliced at offset 20; the block text is keyed by id // 250, so
    ~50 planted docs share each block (the "same footer on every page
    of a site" case ExactSubstr exists for).

Ground truth per planted doc: exactly 10 - W + 1 = 6 duplicated
windows (W = 5); clean docs: 0.  The run verifies BOTH (recall = every
planted doc flagged with n_dup == 6, precision = zero clean docs
flagged) and, for the removal pass, that exactly the 10 block tokens
disappear from planted docs and clean docs pass through intact.

Measured plan is the catalog plan verbatim (one explode, window-sum on
the window string, no self-join).  Reports wall, docs/s, windows/s.
Prints one JSON line per size; recorded in BENCH/DEDUP.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spellchecker_wasm_spark.session import get_spark  # noqa: E402

W = 5
DOC_LEN = 60
BLOCK_LEN = 10
BLOCK_AT = 20  # splice offset
FAMILY = 250  # docs per boilerplate block family (every 5th doc planted)


def synth_docs(spark, n_docs: int):
    uniq = "concat('t', pmod(xxhash64(id, i), 4000000000))"
    block = (f"concat('b', CAST(id DIV {FAMILY} AS STRING), '_', "
             f"CAST(i - {BLOCK_AT} AS STRING))")
    tok = (f"IF(id % 5 = 0 AND i >= {BLOCK_AT} "
           f"AND i < {BLOCK_AT + BLOCK_LEN}, {block}, {uniq})")
    return (spark.range(n_docs)
            .select(F.col("id").alias("doc_id"), F.expr(
                f"transform(sequence(0, {DOC_LEN - 1}), i -> {tok})")
                .alias("l")))


def spans_plan(t):
    """dup_ngram_spans' exact plan shape over (doc_id, l)."""
    from pyspark.sql import Window

    w = t.select("doc_id", F.explode(F.expr(
        f"transform(sequence(1, size(l) - {W - 1}), "
        f"i -> array_join(slice(l, i, {W}), ' '))")).alias("win"))
    wd = w.groupBy("win", "doc_id").agg(F.count(F.lit(1)).alias("k"))
    return (wd.withColumn(
                "tot", F.sum("k").over(Window.partitionBy("win")))
            .where(F.col("tot") >= 2)
            .groupBy("doc_id").agg(F.sum("k").alias("n_dup")))


def removal_plan(t):
    """dup_span_removal's exact plan shape over (doc_id, l), returning
    (doc_id, n_kept)."""
    from pyspark.sql import Window

    w = (t.select("doc_id", F.posexplode(F.expr(
            f"transform(sequence(1, size(l) - {W - 1}), "
            f"i -> array_join(slice(l, i, {W}), ' '))"))
            .alias("p0", "win"))
         .select("doc_id", (F.col("p0") + 1).alias("s"), "win"))
    dup = (w.withColumn("tot", F.count(F.lit(1))
                        .over(Window.partitionBy("win")))
           .where(F.col("tot") >= 2))
    cov = dup.select(
        "doc_id", F.explode(F.expr(f"sequence(s, s + {W - 1})")).alias("pos"))
    toks = (t.select("doc_id", F.posexplode("l").alias("p0", "term"))
            .select("doc_id", (F.col("p0") + 1).alias("pos")))
    return (toks.join(cov, ["doc_id", "pos"], "left_anti")
            .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_kept")))


def main() -> None:
    sizes = [int(s) for s in (sys.argv[1:] or ["100000", "400000"])]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cpus=cpus)
    for n in sizes:
        t = synth_docs(spark, n).persist()
        n_docs = t.count()  # materialize input outside the timed region
        n_windows = n_docs * (DOC_LEN - W + 1)
        expect_planted = (n_docs + 4) // 5

        t0 = time.time()
        flagged = (spans_plan(t)
                   .groupBy("n_dup").agg(F.count(F.lit(1)).alias("c"))
                   .collect())
        wall = time.time() - t0
        dist = {int(r.n_dup): int(r.c) for r in flagged}
        ok_acct = dist == {BLOCK_LEN - W + 1: expect_planted}

        t1 = time.time()
        kept = (removal_plan(t)
                .groupBy("n_kept").agg(F.count(F.lit(1)).alias("c"))
                .collect())
        wall_rm = time.time() - t1
        kdist = {int(r.n_kept): int(r.c) for r in kept}
        ok_rm = kdist == {DOC_LEN - BLOCK_LEN: expect_planted,
                          DOC_LEN: n_docs - expect_planted}

        t.unpersist()
        print(json.dumps({
            "bench": "dup_spans", "n_docs": n_docs, "cpus": cpus,
            "accounting_sec": round(wall, 2),
            "accounting_docs_per_sec": round(n_docs / wall),
            "windows_per_sec": round(n_windows / wall),
            "removal_sec": round(wall_rm, 2),
            "removal_docs_per_sec": round(n_docs / wall_rm),
            "exact_truth_accounting": ok_acct,
            "exact_truth_removal": ok_rm,
            "n_dup_distribution": dist}), flush=True)


if __name__ == "__main__":
    main()
