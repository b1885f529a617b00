#!/usr/bin/env python
"""Near-dup detection scale benchmark: MinHash-LSH end-to-end on a
synthesized corpus with PLANTED near-duplicates (the shipped documents
table has 500 rows at every SF — fine for oracles, useless for scale).

Corpus, generated entirely JVM-side and deterministically:
  * N base docs of 50 tokens each; token (id, i) = `t<h>` with
    h = pmod(xxhash64(id, i), V) cubed into a Zipf-ish skew (popular
    tokens dominate, like stopwords — the case that breaks naive
    inverted-index joins and motivates LSH).
  * N/10 near-dup docs: doc N+j copies doc j with ~10% of tokens
    rewritten (deterministic positions) — ground truth is (j, N+j).

Pipeline measured (the dedup_ngram_jaccard/minhash_lsh_dups catalog
shapes at scale): 3-gram shingles → 16 MinHash perms → 8 bands of 2 →
bucket self-join (hot buckets capped) → exact shingle-Jaccard verify on
candidates → pairs above threshold.

Reports wall, docs/sec, recall of planted pairs, precision of emitted
pairs, and candidate volume vs N² (the number that decides 100-TB
viability).  Prints one JSON line; recorded in BENCH/DEDUP.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spellchecker_wasm_spark.session import get_spark  # noqa: E402

N_PERMS = 16
N_BANDS = 8  # rows-per-band = 2
MAX_BUCKET = 200  # hot-bucket cap, same role as the blocking stage's cap


def synth_docs(spark, n_base: int, vocab: int = 8000, doc_len: int = 50,
               churn_mod: int = 10):
    """(doc_id, toks array).  Docs [n_base, n_base + n_base/10) are
    near-dups of doc_id - n_base with ~1/churn_mod of tokens rewritten."""
    zipf = (f"cast(pow(pmod(xxhash64(base, i), 10000) / 10000.0, 3) "
            f"* {vocab} as bigint)")
    base_tok = f"concat('t', {zipf})"
    churned = (f"IF(is_dup AND pmod(xxhash64(id, i + 7919), {churn_mod}) = 0, "
               f"concat('r', xxhash64(id, i)), {base_tok})")
    return (spark.range(n_base + n_base // 10)
            .withColumn("is_dup", F.col("id") >= n_base)
            .withColumn("base", F.when(F.col("is_dup"),
                                       F.col("id") - n_base)
                        .otherwise(F.col("id")))
            .select(F.col("id").alias("doc_id"), F.expr(
                f"transform(sequence(0, {doc_len - 1}), i -> {churned})")
                .alias("toks")))


def main() -> None:
    n_base = int(os.environ.get("DEDUP_N", "100000"))
    threshold = float(os.environ.get("DEDUP_J", "0.35"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name=f"bench-dedup-{n_base}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    n_docs = n_base + n_base // 10

    docs = synth_docs(spark, n_base).persist()
    docs.count()

    t0 = time.time()
    sh = (docs.select("doc_id", F.explode(F.expr(
        "transform(sequence(1, size(toks) - 2), i -> "
        "concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', "
        "element_at(toks, i + 2)))")).alias("sh"))
        .dropDuplicates(["doc_id", "sh"]))
    mh = [F.min(F.xxhash64(F.lit(j), F.col("sh"))).alias(f"mh_{j}")
          for j in range(N_PERMS)]
    sig = sh.groupBy("doc_id").agg(*mh)
    bands = sig.select("doc_id", F.explode(F.array(*[
        F.concat_ws("_", F.lit(b), F.col(f"mh_{2 * b}"),
                    F.col(f"mh_{2 * b + 1}"))
        for b in range(N_BANDS)])).alias("band_key"))
    # hot-bucket cap: a band key shared by > MAX_BUCKET docs carries no
    # dedup signal (it is the minhash of a stopword-shingle) and would
    # make the self-join quadratic — same move as the blocking stage
    hot = (bands.groupBy("band_key").count()
           .where(F.col("count") > MAX_BUCKET).select("band_key"))
    capped = bands.join(F.broadcast(hot), "band_key", "left_anti")
    a, b = capped.alias("a"), capped.alias("b")
    cand = (a.join(b.hint("shuffle_hash"),
                   (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    n_cand = cand.count()

    # exact verify on candidates only: |A ∩ B| / |A ∪ B| over shingles
    sz = sh.groupBy("doc_id").count()
    inter = (cand
             .join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
             .join(sh.withColumnRenamed("doc_id", "doc_b")
                   .withColumnRenamed("sh", "sh2"), "doc_b")
             .where(F.col("sh") == F.col("sh2"))
             .groupBy("doc_a", "doc_b").count()
             .withColumnRenamed("count", "n_inter"))
    pairs = (inter
             .join(sz.select(F.col("doc_id").alias("doc_a"),
                             F.col("count").alias("sz_a")), "doc_a")
             .join(sz.select(F.col("doc_id").alias("doc_b"),
                             F.col("count").alias("sz_b")), "doc_b")
             .withColumn("jaccard", F.col("n_inter") / (
                 F.col("sz_a") + F.col("sz_b") - F.col("n_inter")))
             .where(F.col("jaccard") >= threshold)
             .select("doc_a", "doc_b"))
    got = {(r[0], r[1]) for r in pairs.collect()}
    wall = time.time() - t0

    # ground truth, exact: planted pairs whose TRUE shingle-Jaccard
    # clears the threshold (heavy-churn draws can dip below it — those
    # are not recall misses of the LSH, they are below-threshold pairs)
    planted = spark.range(n_base // 10).select(
        F.col("id").alias("doc_a"),
        (F.col("id") + n_base).alias("doc_b"))
    planted_j = (planted
                 .join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
                 .join(sh.withColumnRenamed("doc_id", "doc_b")
                       .withColumnRenamed("sh", "sh2"), "doc_b")
                 .where(F.col("sh") == F.col("sh2"))
                 .groupBy("doc_a", "doc_b").count()
                 .join(sz.select(F.col("doc_id").alias("doc_a"),
                                 F.col("count").alias("sz_a")), "doc_a")
                 .join(sz.select(F.col("doc_id").alias("doc_b"),
                                 F.col("count").alias("sz_b")), "doc_b")
                 .withColumn("j", F.col("count") / (
                     F.col("sz_a") + F.col("sz_b") - F.col("count")))
                 .where(F.col("j") >= threshold)
                 .select("doc_a", "doc_b", "j"))
    rows = planted_j.collect()
    truth = {(r["doc_a"], r["doc_b"]) for r in rows}
    truth_hi = {(r["doc_a"], r["doc_b"]) for r in rows if r["j"] >= 0.45}
    tp = len(got & truth)
    out = {
        "metric": "dedup_scale_bench", "docs": n_docs, "cpus": cpus,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1),
        "candidate_pairs": n_cand,
        "candidate_fraction_of_n2": round(
            n_cand / (n_docs * (n_docs - 1) / 2), 8),
        "emitted_pairs": len(got),
        "recall_planted": round(tp / len(truth), 4),
        "recall_planted_j45": round(
            len(got & truth_hi) / max(1, len(truth_hi)), 4),
        "precision_planted": round(tp / max(1, len(got)), 4),
        "jaccard_threshold": threshold,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
