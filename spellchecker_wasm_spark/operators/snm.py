"""Sorted-neighborhood blocking (Hernández & Stolfo's SNM) — the second
classic blocking family production ER runs next to key blocking
(beyond-reference: the reference blocks only by delete keys,
SURVEY.md §2.3/2.7; ER toolkits ship sorted-neighborhood alongside it
because the two miss DIFFERENT pairs — key blocking misses pairs whose
edits fall outside the delete neighborhood, SNM misses pairs whose sort
keys diverge early).

The scale trap in SNM is the global rank: ``row_number() OVER (ORDER BY
…)`` with no PARTITION BY collapses the whole dataset into ONE window
task.  ``sorted_ranks`` avoids it with the standard two-pass shape:
range-repartition + in-partition sort (Spark's distributed total order),
per-partition row counts aggregated into cumulative offsets (a
partition-count-sized frame — broadcast-joined back, no driver action,
construction stays lazy), and a per-partition row_number window that
parallelizes because it partitions BY the physical partition id.  Global
rank = partition offset + in-partition rank; the result is independent
of where the range boundaries fall because the order (with a unique
tiebreak) is total.

Neighbor pairing avoids the range-join trap the same way: each row
explodes its ``window`` forward deltas and equi-joins rank+delta —
one narrow shuffle, no broadcast nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sorted_ranks(df: DataFrame, order_cols: list[str],
                 rank_col: str = "rank",
                 num_partitions: int | None = None) -> DataFrame:
    """df → df + rank_col (1-based dense global position under
    ORDER BY order_cols).  order_cols must be a total order (include a
    unique tiebreak column) for the rank to be deterministic."""
    cols = [F.col(c) for c in order_cols]
    part = df.repartitionByRange(*([num_partitions] if num_partitions
                                   else []), *cols)
    staged = part.withColumn("__pid", F.spark_partition_id())
    counts = staged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    offs = counts.select(
        "__pid",
        (F.sum("__n").over(Window.orderBy("__pid")
                           .rowsBetween(Window.unboundedPreceding, -1)))
        .alias("__off"))
    offs = offs.withColumn("__off", F.coalesce("__off", F.lit(0)))
    w = Window.partitionBy("__pid").orderBy(*cols)
    return (staged.join(F.broadcast(offs), "__pid")
            .withColumn(rank_col,
                        (F.row_number().over(w) + F.col("__off"))
                        .cast("bigint"))
            .drop("__pid", "__off"))


def snm_candidate_pairs(df: DataFrame, order_cols: list[str],
                        id_col: str, term_col: str,
                        window: int = 3) -> DataFrame:
    """Sorted-neighborhood candidates: (id_a, id_b, term_a, term_b) for
    every pair within ``window`` positions of each other in the
    order_cols sort — id_a < id_b canonical.  Each unordered pair is
    emitted exactly once (from its lower-ranked member), so no distinct
    is needed."""
    ranked = sorted_ranks(df, order_cols)
    slim = ranked.select(F.col(id_col).alias("id"),
                         F.col(term_col).alias("term"), "rank")
    fan = (slim.select(
        F.col("id").alias("id_l"), F.col("term").alias("term_l"),
        F.explode(F.sequence(F.col("rank") + 1,
                             F.col("rank") + window))
        .alias("target_rank")))
    right = slim.select(F.col("id").alias("id_r"),
                        F.col("term").alias("term_r"),
                        F.col("rank").alias("target_rank"))
    j = fan.join(right, "target_rank")
    return j.select(
        F.least("id_l", "id_r").alias("id_a"),
        F.greatest("id_l", "id_r").alias("id_b"),
        F.when(F.col("id_l") <= F.col("id_r"), F.col("term_l"))
        .otherwise(F.col("term_r")).alias("term_a"),
        F.when(F.col("id_l") <= F.col("id_r"), F.col("term_r"))
        .otherwise(F.col("term_l")).alias("term_b"))
