#!/usr/bin/env python
"""Decompose stream_incremental_linkage's wall time (VERDICT r4 #3).

The catalog row reads 15.7-17.9s at sf0.1 across clean r4 windows while
the batch twin (incremental_linkage, same standing clusters + same new
pages + same scoring) reads 4.5-5.3s.  This script attributes the gap
with separate timers around each phase, all in one warm session:

  setup    — _lk_cc_asg (batch CC over existing pages) + standing-index
             persist/materialize: shared with the batch twin.
  fixture  — toPandas + two-file mtime-ordered parquet write
             (_stream_two_file_source_df): pure harness.
  operator — the SAME assignment computed in batch form against the
             SAME pre-built index (explode keys -> stream-static-shaped
             join -> Arrow OSA -> per-new-id min): what each micro-batch
             actually pays for data work.
  stream   — the full readStream/writeStream run (2 micro-batches,
             availableNow, complete-mode memory sink) on the already-
             built index and fixture: operator cost x2 + ALL streaming
             machinery (per-batch planning, state store, sink).

Run: python scripts/diag_stream_inc.py [sf_dir]
Prints one JSON line; pin the table in BENCH/STREAMING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from spellchecker_wasm_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="diag-stream-inc",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    from spellchecker_wasm_spark.queries import (
        _lk_cc_asg, _lk_correct, _lk_new_pages, _q_incremental_linkage,
        _q_stream_incremental_linkage, _stream_two_file_source_df)
    from spellchecker_wasm_spark.operators.incremental import (
        assign_new_records, standing_index)

    # warm the session (JVM JIT, Arrow python workers, parquet footers):
    # cold-first-query readings at sf0.1 run 3-5x the warm number
    _q_incremental_linkage(spark, sf_dir).count()

    out: dict = {"sf_dir": sf_dir}

    t0 = time.time()
    pages, asg = _lk_cc_asg(spark, sf_dir)
    eb = standing_index(pages, asg).persist()
    eb.count()
    out["setup_sec"] = round(time.time() - t0, 3)

    t0 = time.time()
    new = _lk_new_pages(spark, sf_dir)
    path = _stream_two_file_source_df(new, "page_id")
    out["fixture_sec"] = round(time.time() - t0, 3)

    # operator cost, batch form: identical join/score/min plan shape the
    # stream executes per micro-batch (dedup_pairs=False = the streaming
    # path's plan), against the SAME persisted index
    t0 = time.time()
    _lk_correct(assign_new_records(new, pages, asg, dedup_pairs=False,
                                   index=eb)).count()
    out["operator_batch_sec"] = round(time.time() - t0, 3)

    # full streaming run on the pre-built index + fixture
    t0 = time.time()
    stream = (spark.readStream.schema(new.schema)
              .option("maxFilesPerTrigger", "1").parquet(path + "/*"))
    o = _lk_correct(assign_new_records(stream, pages, asg, index=eb))
    name = "diag_stream_inc_" + uuid.uuid4().hex[:8]
    q = (o.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(300)
    n = spark.table(name).count()
    out["stream_exec_sec"] = round(time.time() - t0, 3)
    out["rows"] = n
    eb.unpersist()

    # the catalog row end-to-end (cold per-query caches but warm JVM),
    # for reconciliation against the bench window numbers
    t0 = time.time()
    _q_stream_incremental_linkage(spark, sf_dir).count()
    out["catalog_row_sec"] = round(time.time() - t0, 3)

    out["streaming_machinery_sec"] = round(
        out["stream_exec_sec"] - out["operator_batch_sec"], 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
