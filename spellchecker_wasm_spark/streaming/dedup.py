"""Streaming exact deduplication — the incremental form of the batch
``dedup_exact`` catalog query, for pipelines that ingest web pages /
documents continuously instead of as a static table.

``stream_exact_dedup`` keys each record by a content fingerprint
(xxhash64 of the chosen columns, matching the batch operator) and drops
repeats with ``dropDuplicatesWithinWatermark``: state holds one entry
per key only until the event-time watermark passes it, so state size is
bounded by the dedup horizon × arrival rate instead of growing with the
corpus — the property that makes streaming dedup viable at web scale
(the batch operator's full-corpus groupBy is the offline complement).
RocksDB state store (``spark.sql.streaming.stateStore.providerClass``)
is the intended production backend; the in-memory provider is fine for
tests.

Correctness contract (tests/test_streaming.py): for inputs whose
duplicates arrive within the watermark horizon, the streamed output is
exactly the batch ``dropDuplicates`` over the union of the inputs
(first-arrival row kept per key).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def content_fingerprint(cols: Sequence[str]):
    """xxhash64 over the content columns — the same key the batch
    dedup_exact query groups by."""
    return F.xxhash64(*[F.col(c) for c in cols])


def stream_exact_dedup(docs: DataFrame, content_cols: Sequence[str],
                       ts_col: str = "ts",
                       watermark: str = "1 hour") -> DataFrame:
    """Drop records whose content fingerprint was already seen within the
    watermark horizon.  Works on a readStream source (stateful) and on a
    static DataFrame (used by tests as the oracle side).

    Batch-side determinism contract: the streaming path keeps the
    first-ARRIVAL row per key (arrival order is real but not a column),
    so the batch path pins a deterministic stand-in — the minimum row by
    (ts_col, then every other orderable column).  For byte-identical
    duplicates the two agree on content by definition; for same-content
    rows differing in metadata (ids) the batch choice is the stable one
    a resumable pipeline needs (dropDuplicates alone keeps a
    partition-order-dependent row)."""
    from pyspark.sql import Window

    df = docs
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        # watermarks require zoned TIMESTAMP; session tz is pinned to UTC
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    keyed = df.withColumn("content_key", content_fingerprint(content_cols))
    if not keyed.isStreaming:
        complex_prefixes = ("array", "map", "struct", "binary")
        tiebreak = [c for c, t in keyed.dtypes
                    if c not in (ts_col, "content_key")
                    and not t.startswith(complex_prefixes)]
        w = (Window.partitionBy("content_key")
             .orderBy(ts_col, *sorted(tiebreak)))
        return (keyed.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1).drop("_rn"))
    return (keyed.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["content_key"]))
