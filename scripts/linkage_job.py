#!/usr/bin/env python
"""spark-submit entrypoint for the record-linkage pipeline (the north
rule's launch mode: ``spark-submit --py-files pkg.zip`` on a cluster).

    spark-submit --master <cluster> --py-files spellchecker_wasm_spark.zip \
        scripts/linkage_job.py --entities 200000 \
        --checkpoint /path/stages --output /path/clusters

The session comes from spark-submit's conf (master/executors are THE
cluster's); this script only sets analytic defaults that are unset.
Emits one JSON line of run metrics (rows per stage, wall, F1 when labels
are synthesized alongside).
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--entities", type=int, default=1000,
                   help="synthesize this many entities (deterministic, "
                        "seed fixed); real deployments replace this with "
                        "--input <iceberg table> of pages")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max-block-size", type=int, default=500)
    p.add_argument("--checkpoint", help="stage checkpoint dir (resumable)")
    p.add_argument("--run-id", default="run1")
    p.add_argument("--output", required=True, help="clusters parquet dir")
    p.add_argument("--skip-f1", action="store_true")
    args = p.parse_args()

    b = SparkSession.builder.appName("linkage_job")
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.python.unix.domain.socket.enabled": "true",
    }.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from spellchecker_wasm_spark.pipeline.lineage import StageWriter
    from spellchecker_wasm_spark.pipeline.linkage import (
        LinkageConfig, pairwise_f1, run_linkage)
    from spellchecker_wasm_spark.pipeline.webpages import (
        synthesize_pages_spark)

    t0 = time.time()
    pages, labels = synthesize_pages_spark(spark, args.entities,
                                           seed=args.seed)
    pages = pages.cache()
    writer = (StageWriter(spark, args.checkpoint, args.run_id)
              if args.checkpoint else None)
    cfg = LinkageConfig(max_block_size=args.max_block_size)
    result = run_linkage(spark, pages, cfg, writer=writer)
    clusters = result["clusters"]
    clusters.write.mode("overwrite").parquet(args.output)
    clusters = spark.read.parquet(args.output)

    metrics = {
        "pages": pages.count(),
        "clusters": clusters.select("component").distinct().count(),
        "scored_pairs": result["scored_pairs"].count(),
        "wall_sec": round(time.time() - t0, 3),
        "output": args.output,
    }
    if not args.skip_f1:
        metrics["f1"] = round(pairwise_f1(clusters, labels)["f1"], 6)
    print(json.dumps(metrics))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
