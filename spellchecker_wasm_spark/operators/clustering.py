"""Transitive clustering: iterative large-star / small-star connected
components (Kiveris et al., "Connected Components in MapReduce and
Beyond") over scored pairs — the stage the north rule adds on top of the
reference (which stops at pairwise suggestions).

Plain DataFrame ops, no GraphFrames: each round is two groupBy-min joins;
``localCheckpoint`` truncates lineage per iteration so plans stay flat at
any depth.  Converges in O(log n) rounds even on path graphs; termination
is detected by edge-set fixpoint (count + order-insensitive hash).

Output: (node, component) where component is the minimum member id —
deterministic for longs and strings alike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    min(N(u) ∪ {u})."""
    sym = edges.union(edges.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    mins = (sym.groupBy("src")
            .agg(F.min("dst").alias("min_nbr"))
            .select("src", F.least("src", "min_nbr").alias("m")))
    return (sym.join(mins, "src")
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    """Canonicalize edges (src > dst), then for each node u: connect all
    smaller neighbors (and u) to the minimum."""
    canon = (edges.where(F.col("src") != F.col("dst"))
             .select(F.greatest("src", "dst").alias("src"),
                     F.least("src", "dst").alias("dst")))
    mins = canon.groupBy("src").agg(F.min("dst").alias("m"))
    joined = canon.join(mins, "src")
    nbr_edges = (joined.where(F.col("dst") != F.col("m"))
                 .select(F.col("dst").alias("src"), F.col("m").alias("dst")))
    self_edges = joined.select("src", F.col("m").alias("dst"))
    return nbr_edges.union(self_edges).distinct()


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.select(
        F.count(F.lit(1)).alias("n"),
        F.expr("coalesce(bit_xor(xxhash64(src, dst)), 0)").alias("h")).first()
    return row["n"], row["h"]


def connected_components(edges: DataFrame, src_col: str = "id_a",
                         dst_col: str = "id_b", max_iter: int = 25,
                         nodes: DataFrame | None = None) -> DataFrame:
    """edges(src,dst) → (node, component=min id in component).

    ``nodes`` (single-column) adds isolated nodes as their own singleton
    components — pass the full entity table so every row gets a cluster id.
    """
    e = (edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
         .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct()
         .localCheckpoint(eager=True))
    prev_fp = None
    for _ in range(max_iter):
        out = _small_star(_large_star(e))
        # size-aware parallelism: each round runs ~6 shuffle stages over a
        # rapidly-shrinking edge set; without this, small graphs pay
        # per-task scheduling for hundreds of near-empty partitions (3×
        # anti-scaling measured at 32 cores on a 260k-edge graph)
        if prev_fp is not None:
            # coalesce never increases partition count, so this is a no-op
            # for graphs big enough to need full parallelism
            out = out.coalesce(prev_fp[0] // 250_000 + 1)
        e = out.localCheckpoint(eager=True)
        fp = _fingerprint(e)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")

    # converged: every edge points node → component root (star graphs)
    assign = (e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
              .union(e.select(F.col("dst").alias("node"),
                              F.col("dst").alias("component")))
              .groupBy("node").agg(F.min("component").alias("component")))
    if nodes is not None:
        node_col = nodes.columns[0]
        singles = (nodes.select(F.col(node_col).alias("node")).distinct()
                   .join(assign, "node", "left_anti")
                   .select("node", F.col("node").alias("component")))
        assign = assign.union(singles)
    return assign
