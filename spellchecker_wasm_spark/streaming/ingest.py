"""Structured Streaming operators.

The reference's only streaming behavior is chunked byte ingest with
partial-line reassembly (spellchecker_wasm.rs:24-49; Node/browser read
streams) — batch loads delivered incrementally, with **final-state
semantics identical to a batch load** (SURVEY.md §2.4/§2.9: streaming
order changes only *when* deletes appear, never the final dictionary).
``stream_dictionary_ingest`` is the Spark-native equivalent: a text file
stream into the same parse + aggregate plan, so appending files to the
directory incrementally merges counts exactly like repeated
``writeToDictionary`` calls (SpellCheckerBase.ts:100-103).

``windowed_event_counts`` adds the event-time machinery the reference
lacks (watermark + tumbling window) for the web-pipeline front end, where
page streams arrive with late data keyed by warc_ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.dictionary import parse_dictionary_lines


def stream_dictionary_ingest(spark: SparkSession, input_dir: str,
                             query_name: str = "words_stream",
                             separator: str = " ",
                             count_threshold: int = 1):
    """Stream `term count` text files from a directory into a continuously
    maintained word-count table (in-memory sink; swap for Iceberg/Delta on
    a cluster).  Returns the StreamingQuery; read results from
    ``spark.table(query_name)``.

    Threshold semantics: filtering inside the complete-mode aggregate gives
    the reference's final-state membership (counts accumulate across files;
    a term crosses the threshold once its cumulative sum does —
    sym_spell.rs:109-133)."""
    lines = (spark.readStream.format("text").load(input_dir))
    entries = parse_dictionary_lines(lines, separator=separator)
    counts = (entries.groupBy("term")
              .agg(F.sum("count").alias("count"))
              .where(F.col("count") >= count_threshold))
    return (counts.writeStream
            .format("memory")
            .queryName(query_name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start())


def windowed_event_counts(events: DataFrame, ts_col: str = "ts",
                          key_col: str = "event_type",
                          window: str = "10 minutes",
                          watermark: str = "30 minutes") -> DataFrame:
    """Event-time tumbling-window counts with late-data handling — works on
    both a static DataFrame and a readStream source (same plan)."""
    df = events
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        # watermarks require zoned TIMESTAMP; session tz is pinned to UTC
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (df.groupBy(F.window(F.col(ts_col), window).alias("win"),
                       F.col(key_col))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.round(F.col("value") * 100).cast("long"))
                 .alias("value_cents"))
            .select(F.col("win.start").alias("window_start"),
                    key_col, "n", "value_cents"))
