"""Backward as-of join — attach to each left row the most recent right
row at or before its timestamp, per key.

Spark has no ASOF JOIN operator (DuckDB/Pandas do); the scalable
composition is the classic union + running-window trick:

    union(left tagged 1, right tagged 0)
      → window per key ordered by (ts, tag), rows unbounded-preceding
      → last(right payload, ignorenulls) = the as-of match
      → keep left rows

One shuffle on the join keys, then a single ordered pass per partition —
`last` over a running rows-frame is O(1) incremental state (no
re-aggregation per row), so the cost is the sort-shuffle a per-key
window always pays.  A range/band equi-join alternative explodes
candidate pairs quadratically in bucket density; this shape never
materializes more than left+right rows.

Skew: one hot key lands one task, like every per-key window.  At
10^12-row scale, salt by time-bucketing the key and resolving bucket
boundaries with a second pass of the same shape over bucket-final
matches.

Tie semantics match DuckDB's ASOF (`ON l.ts >= r.ts`): a right row at
exactly the left timestamp is eligible; among right rows sharing (key,
ts) the winner is arbitrary unless the payload carries a tiebreaker —
the same caveat DuckDB documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              payload: list[str] | None = None,
              ts_alias: str = "asof_ts") -> DataFrame:
    """left(..., left_ts) ⟕ right(on..., right_ts, payload...) →
    left columns + ts_alias (matched right_ts, null if no prior row) +
    payload columns (null if no match)."""
    if payload is None:
        payload = [c for c in right.columns
                   if c not in set(on) | {right_ts}]
    pstruct = F.struct(
        F.col(right_ts).alias(ts_alias),
        *[F.col(c) for c in payload])
    r = right.select(*on, F.col(right_ts).alias("__t"),
                     pstruct.alias("__p"), F.lit(0).alias("__side"))
    lcols = list(left.columns)
    l = left.select(*lcols, F.col(left_ts).alias("__t"),
                    F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
                    F.lit(1).alias("__side"))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (Window.partitionBy(*on).orderBy("__t", "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
    out_cols = ([F.col(c) for c in lcols]
                + [F.col(f"__m.{ts_alias}").alias(ts_alias)]
                + [F.col(f"__m.{c}").alias(c) for c in payload])
    return matched.where(F.col("__side") == 1).select(*out_cols)
