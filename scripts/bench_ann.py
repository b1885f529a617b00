#!/usr/bin/env python
"""ANN scale benchmark: IVF vs brute-force cosine top-k on a
deterministically synthesized embedding corpus (the shipped embeddings
table has only 500 rows at every SF — fine for oracles, useless for
measuring the scale path).

Corpus: N vectors x 64 dims, generated ENTIRELY JVM-side as
(pmod(xxhash64(id, dim), 2001) - 1000) / 1000 — no driver-side numpy, no
Python in the data path, reproducible everywhere.

Measures, at local[$SPARK_GRAFT_CPUS]:
  * brute-force exact top-5 for Q queries against N (the baseline the
    oracle also uses at fixture scale),
  * ivf_topk at n_cells/n_probe (the scale path: broadcast codebook,
    map-side argmax assignment, probe-join),
  * recall@5 of IVF vs exact, comparison-count ratio, and walls.

Prints one JSON line; recorded in BENCH/ANN.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spellchecker_wasm_spark.operators.similarity import (  # noqa: E402
    brute_force_topk, ivf_topk)
from spellchecker_wasm_spark.session import get_spark  # noqa: E402


def synth_embeddings(spark, n: int, dims: int = 64):
    """Deterministic pseudo-random float vectors in [-1, 1], pure JVM."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dims - 1}), d -> "
            "CAST((pmod(xxhash64(id, d), 2001) - 1000) / 1000.0 AS FLOAT))"
        ).alias("embedding"))


def main() -> None:
    n = int(os.environ.get("ANN_N", "200000"))
    n_q = int(os.environ.get("ANN_Q", "100"))
    n_cells = int(os.environ.get("ANN_CELLS", "256"))
    n_probe = int(os.environ.get("ANN_PROBE", "8"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name=f"bench-ann-{n}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    emb = synth_embeddings(spark, n).persist()
    emb.count()
    q = emb.where(F.col("vec_id") < n_q)

    t0 = time.time()
    exact = {(r[0], r[1]) for r in brute_force_topk(emb, q, k=5).collect()}
    brute_wall = time.time() - t0

    t0 = time.time()
    got = {(r[0], r[1]) for r in
           ivf_topk(emb, q, k=5, n_cells=n_cells, n_probe=n_probe).collect()}
    ivf_wall = time.time() - t0

    t0 = time.time()
    got_arrow = {(r[0], r[1]) for r in
                 ivf_topk(emb, q, k=5, n_cells=n_cells, n_probe=n_probe,
                          assign_impl="arrow").collect()}
    ivf_arrow_wall = time.time() - t0
    assert got_arrow == got, "arrow assignment diverged from jvm"

    recall = len(got & exact) / len(exact)
    out = {
        "metric": "ann_scale_bench", "n": n, "queries": n_q,
        "n_cells": n_cells, "n_probe": n_probe, "cpus": cpus,
        "brute_force_sec": round(brute_wall, 2),
        "ivf_sec": round(ivf_wall, 2),
        "ivf_arrow_sec": round(ivf_arrow_wall, 2),
        "recall_at_5": round(recall, 4),
        # candidate volume ratio: what the probe-join saves at any scale
        "probed_fraction": round(n_probe / n_cells, 4),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
