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
from pyspark.sql import types as T


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


def _driver_union_find(rows) -> dict:
    """Weighted quick-union with path halving over collected edge rows —
    the finisher for frontiers that fit on the driver."""
    parent: dict = {}

    def find(x):
        r = parent.setdefault(x, x)
        while r != parent[r]:
            parent[r] = parent[parent[r]]
            r = parent[r]
        return r

    for a, b in rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union toward the smaller id so component == min member
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {x: find(x) for x in parent}


def connected_components(edges: DataFrame, src_col: str = "id_a",
                         dst_col: str = "id_b", max_iter: int = 25,
                         nodes: DataFrame | None = None,
                         driver_finish_threshold: int = 4_000_000) -> DataFrame:
    """edges(src,dst) → (node, component=min id in component).

    ``nodes`` (single-column) adds isolated nodes as their own singleton
    components — pass the full entity table so every row gets a cluster id.

    Hybrid strategy (the shape production CC systems use — Kiveris et al.
    §6): large-star/small-star rounds shrink the edge frontier
    geometrically, and once it fits comfortably on the driver
    (``driver_finish_threshold`` rows) a union-find finisher replaces the
    remaining O(log n) rounds — each distributed round costs ~6 fixed
    shuffle stages regardless of size, which dominates wall clock on small
    frontiers (measured: a 130k-edge graph spent ~8s in rounds vs <1s
    collected).  At 10^12-page scale the early rounds run distributed and
    the finisher only ever sees the shrunken star roots.

    Driver memory at the threshold: the frontier arrives as TWO int64
    pandas columns over Arrow (~16 B/edge resident, ~40 B/edge transient
    during the Arrow batch handoff — NOT per-edge Row objects), plus the
    union-find dict at ~90 B/node for the nodes the frontier touches; the
    4M default is ~160 MB of Arrow columns + ~450 MB of transient Python
    ints during the zip + ≤ ~720 MB dict worst-case (every edge touching
    two fresh nodes) — ~1.3 GB peak, sized for the ≥4 GB drivers any
    multi-executor job runs with.  Scale the threshold linearly with
    driver heap if you raise it.  (Measured crossover: one distributed
    round costs ~30 s of core-count-independent wall — 6 shuffle stages +
    distinct + checkpoint — versus ~5 s to union-find a 2.6M-edge
    frontier on the driver, so finishing early is the win well past the
    old 2M default.)
    """
    spark = edges.sparkSession
    node_type = edges.schema[src_col].dataType
    base = (edges.select(F.col(src_col).alias("src"),
                         F.col(dst_col).alias("dst"))
            .where(F.col("src").isNotNull() & F.col("dst").isNotNull()))
    # threshold decision on the RAW edge count (upper bound on distinct):
    # the driver path skips the distinct shuffle entirely — union-find
    # absorbs duplicate edges for free.
    # The slim (src, dst) frame is PERSISTED for the first round: the
    # threshold count and the subsequent consumer (Arrow collect on the
    # driver path, distinct+checkpoint on the distributed path) would
    # otherwise each re-evaluate the caller's edge subtree — for an
    # expensive producer (dedup_clusters' inverted-index Jaccard pairs)
    # that doubled the whole query.  16 B/edge, spills to disk at scale —
    # the same materialization production CC systems start from.
    e = base.persist()
    src_cache = e
    assign = None
    prev_fp = None
    first_round = True
    for _ in range(max_iter):
        n_edges = prev_fp[0] if prev_fp is not None else e.count()
        if first_round and n_edges > driver_finish_threshold:
            # distinct + checkpoint only when distributed rounds will run
            e = e.distinct().localCheckpoint(eager=True)
            n_edges = e.count()
            src_cache.unpersist()
            src_cache = None
        first_round = False
        if n_edges <= driver_finish_threshold:
            # Arrow collect: two flat int64 columns, not 100+B Row objects
            pdf = e.toPandas()
            if src_cache is not None:
                src_cache.unpersist()
                src_cache = None
            comp = _driver_union_find(
                zip(pdf["src"].tolist(), pdf["dst"].tolist()))
            schema = T.StructType([T.StructField("node", node_type),
                                   T.StructField("component", node_type)])
            # Arrow in BOTH directions: building the assignment from two
            # flat columns ships one Arrow batch instead of pickling a
            # row list (measured ~2× on the materialize step; matters
            # linearly as the finisher threshold grows)
            import pandas as _pd
            assign = spark.createDataFrame(
                _pd.DataFrame({"node": list(comp.keys()),
                               "component": list(comp.values())}), schema)
            break
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

    if assign is None:
        # converged distributed: every edge points node → component root
        assign = (e.select(F.col("src").alias("node"),
                           F.col("dst").alias("component"))
                  .union(e.select(F.col("dst").alias("node"),
                                  F.col("dst").alias("component")))
                  .groupBy("node").agg(F.min("component").alias("component")))
    if nodes is not None:
        node_col = nodes.columns[0]
        # one left join instead of anti-join + union (2 stages → 1):
        # isolated nodes become their own singleton components
        assign = (nodes.select(F.col(node_col).alias("node")).distinct()
                  .join(assign, "node", "left")
                  .select("node", F.coalesce("component", "node")
                          .alias("component")))
    return assign
