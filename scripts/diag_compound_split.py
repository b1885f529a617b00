#!/usr/bin/env python
"""Decompose compound_split's catalog wall time (VERDICT r4 #8).

The row read 2.25s in r3 and 4.4-4.9s across r4/r5 windows.  It shares
the r4 compound-kernel changes (memoized split decision, toArrow dict
collect) and gained a words.persist() — this script times each stage of
the plan separately in one warm session to attribute the growth:

  words    — token-counts agg materialization (the persisted subtree)
  cand     — top-K × top-K concat anti-join against the vocabulary
  fuzzy    — the OSA(<=2) Arrow-UDF join of cand × length-banded vocab
             (the only Python stage; candidate volume printed)
  decomp   — insert/skip decomposition semi-joins + winner filter
  operator — compound_correct over the surviving probes (dict collect
             + map-side correction)
  catalog  — the full catalog row end-to-end for reconciliation

Run: python scripts/diag_compound_split.py [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from spellchecker_wasm_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="diag-compound-split",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    import pyspark.sql.functions as F
    from spellchecker_wasm_spark.queries import (
        _SPLIT_PARTS_K, _compound_words, _q_compound_known,
        _q_compound_split)
    from spellchecker_wasm_spark.functions.udfs import osa_distance_udf
    from spellchecker_wasm_spark.operators.compound import compound_correct

    # warm JVM/Arrow (cold first queries read 3-5x); also reproduces the
    # bench ordering, where compound_known runs before compound_split
    _q_compound_known(spark, sf_dir).count()

    out: dict = {"sf_dir": sf_dir}

    t0 = time.time()
    words = _compound_words(spark, sf_dir).persist()
    out["vocab_terms"] = words.count()
    out["words_sec"] = round(time.time() - t0, 3)

    t0 = time.time()
    w = (words.where(F.col("term").rlike("^[a-z]+$"))
         .orderBy(F.desc("count"), F.asc("term")).limit(_SPLIT_PARTS_K)
         .select("term"))
    cand = (w.select(F.col("term").alias("s1"))
            .crossJoin(w.select(F.col("term").alias("s2")))
            .select(F.concat("s1", "s2").alias("text"))
            .join(words.select(F.col("term").alias("text")), "text",
                  "left_anti")
            .distinct()).persist()
    out["cand_rows"] = cand.count()
    out["cand_sec"] = round(time.time() - t0, 3)

    t0 = time.time()
    osa = osa_distance_udf(2)
    wd = F.broadcast(words.select(F.col("term").alias("w"),
                                  F.length("term").alias("wl")))
    joined = cand.join(wd, (F.abs(F.length("text") - F.col("wl")) <= 2)
                       & (F.col("text") != F.col("w")))
    out["fuzzy_join_rows"] = joined.count()
    out["fuzzy_join_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    fuzzy = (joined.where(osa(F.col("text"), F.col("w")).isNotNull())
             .select("text").distinct()).persist()
    out["fuzzy_rows"] = fuzzy.count()
    out["fuzzy_udf_sec"] = round(time.time() - t0, 3)

    t0 = time.time()
    nofuzzy = cand.join(fuzzy, "text", "left_anti")
    js = nofuzzy.select(
        "text", F.explode(F.sequence(F.lit(1),
                                     F.length("text") - 1)).alias("j"))
    wset = F.broadcast(words.select("term"))
    decomp = (js.select("text", "j",
                        F.expr("substring(text, 1, j)").alias("p1"),
                        F.expr("substring(text, j + 1, length(text))")
                        .alias("p2"))
              .join(wset.withColumnRenamed("term", "p1"), "p1", "left_semi")
              .join(wset.withColumnRenamed("term", "p2"), "p2", "left_semi"))
    uniq = (decomp.groupBy("text")
            .agg(F.count(F.lit(1)).alias("n"), F.min("j").alias("j"))
            .where(F.col("n") == 1))
    skips = (js.where(F.col("j") <= F.length("text") - 2)
             .select("text",
                     F.expr("substring(text, 1, j)").alias("p1"),
                     F.expr("substring(text, j + 2, length(text))")
                     .alias("p2"))
             .join(wset.withColumnRenamed("term", "p1"), "p1", "left_semi")
             .join(wset.withColumnRenamed("term", "p2"), "p2", "left_semi")
             .select("text").distinct())
    good = (nofuzzy.join(uniq.select("text"), "text", "left_semi")
            .join(skips, "text", "left_anti")).persist()
    out["good_rows"] = good.count()
    out["decomp_sec"] = round(time.time() - t0, 3)

    t0 = time.time()
    res = compound_correct(good, "text", words, None, 2, 7,
                           id_cols=("text",))
    out["operator_rows"] = res.count()
    out["operator_sec"] = round(time.time() - t0, 3)

    for df in (words, cand, fuzzy, good):
        df.unpersist()

    t0 = time.time()
    out["catalog_rows"] = _q_compound_split(spark, sf_dir).count()
    out["catalog_sec"] = round(time.time() - t0, 3)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
