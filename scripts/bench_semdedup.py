#!/usr/bin/env python
"""SemDeDup scale benchmark: the catalog's `semdedup` row runs k=8 over
the 500-row embeddings fixture — fine for the oracle, useless for the
scale claim.  This measures the REAL shape: k scaled as N/<target
cluster size> (the paper's knob) over a deterministically synthesized
corpus with PLANTED near-duplicates, so both the boundedness argument
(cluster sizes stay flat as N grows) and the semantic claim (planted
near-dups are caught) are measured, not asserted.

Corpus: N vectors x 64 dims, pure JVM — dim d of vector id is
(pmod(xxhash64(id, d), 2001) - 1000) / 1000.  Every id with id % 5 == 4
is a planted near-dup of id-1: identical except a ±0.001 jitter on the
last two dims (cosine ~0.9998 — the recrawled-page-with-trivial-diff
case), against a ~N(0, 1/sqrt(64)) background for independent vectors.

Threshold note: the bench default is 0.75, NOT the catalog fixture's
0.35.  Within-CLUSTER pairs are directionally similar by construction
(that is the point of confining the check to clusters), so against
structureless uniform vectors a global-tail threshold like 0.35 marks
most of every fine cluster as duplicates (measured: 87% drops at
N=50k, k=250).  Real embedding spaces put near-dups far above the
within-cluster background; 0.75 reproduces that separation here
(planted ~0.9998 vs within-cluster p99 well below).

Reported per run (one JSON line; recorded in BENCH/CURATION.md):
  * wall for the full semdedup pass (assignment + dominance + collect),
  * cluster-size mean / p99 / max (the boundedness evidence),
  * blocking recall: fraction of planted pairs that landed in ONE
    cluster (SemDeDup's acknowledged recall loss — a near-dup pair
    split across centroids is invisible, exactly as in the paper),
  * drop recall among co-clustered planted pairs (should be ~1.0: the
    dominance rule must catch every visible planted pair),
  * total drops (planted + random background above threshold).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spellchecker_wasm_spark.operators.similarity import semdedup  # noqa: E402
from spellchecker_wasm_spark.session import get_spark  # noqa: E402

DIMS = 64
JITTERED = 2  # planted near-dups jitter only this many trailing dims


def synth_with_planted(spark, n: int):
    src = "CASE WHEN id % 5 = 4 THEN id - 1 ELSE id END"
    jitter = (f"CASE WHEN id % 5 = 4 AND d >= {DIMS - JITTERED} "
              "THEN CAST(pmod(xxhash64(id, d), 3) - 1 AS BIGINT) "
              "ELSE 0L END")
    base = f"pmod(xxhash64({src}, d), 2001) - 1000"
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {DIMS - 1}), d -> "
            f"CAST(({base} + {jitter}) / 1000.0 AS FLOAT))")
        .alias("embedding"))


def main() -> None:
    n = int(os.environ.get("SEMDEDUP_N", "200000"))
    target = int(os.environ.get("SEMDEDUP_CLUSTER", "200"))
    threshold = float(os.environ.get("SEMDEDUP_COS", "0.75"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    k = max(8, n // target)
    spark = get_spark(app_name=f"bench-semdedup-{n}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    emb = synth_with_planted(spark, n).persist()
    emb.count()

    t0 = time.time()
    out = semdedup(emb, k=k, iters=2, threshold=threshold,
                   assign="arrow").persist()
    n_dropped = out.where(F.col("is_kept") == 0).count()
    wall = time.time() - t0

    sizes = (out.groupBy("cluster").count()
             .agg(F.avg("count").alias("mean"),
                  F.expr("percentile(count, 0.99)").alias("p99"),
                  F.max("count").alias("max")).first())

    # planted pairs are (id-1, id) for id % 5 == 4
    a = out.select(F.col("vec_id").alias("ida"),
                   F.col("cluster").alias("ca"),
                   F.col("is_kept").alias("ka"))
    b = out.select(F.col("vec_id").alias("idb"),
                   F.col("cluster").alias("cb"),
                   F.col("is_kept").alias("kb"))
    planted = (spark.range(n).where("id % 5 = 4")
               .select(F.col("id").alias("idb"),
                       (F.col("id") - 1).alias("ida"))
               .join(a, "ida").join(b, "idb"))
    agg = planted.agg(
        F.count(F.lit(1)).alias("n_planted"),
        F.sum((F.col("ca") == F.col("cb")).cast("int")).alias("co"),
        F.sum(((F.col("ca") == F.col("cb"))
               & ((F.col("ka") == 0) | (F.col("kb") == 0)))
              .cast("int")).alias("caught")).first()

    print(json.dumps({
        "metric": "semdedup_scale", "n": n, "k": k,
        "threshold": threshold, "cpus": cpus,
        "wall_sec": round(wall, 2),
        "vectors_per_sec": round(n / wall),
        "n_dropped": n_dropped,
        "cluster_mean": round(sizes["mean"], 1),
        "cluster_p99": round(float(sizes["p99"]), 1),
        "cluster_max": int(sizes["max"]),
        "n_planted": agg["n_planted"],
        "blocking_recall": round(agg["co"] / agg["n_planted"], 4),
        "drop_recall_coclustered": round(
            agg["caught"] / max(agg["co"], 1), 4),
    }))


if __name__ == "__main__":
    main()
