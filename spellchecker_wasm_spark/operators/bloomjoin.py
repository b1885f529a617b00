"""Runtime Bloom-filter join pruning in public DataFrame API.

Spark's InjectRuntimeFilter applies this exact shape automatically at
cluster scale (catalyst BloomFilterAggregate → BloomFilterMightContain,
not exposed to the public function registry): when a join's build side is
selective, fold its keys into a compact Bloom bitmap and prune the probe
side BEFORE the probe's shuffle toward the join.  The transform is
semantics-preserving — false positives survive the prefilter but die in
the exact join that follows — so callers keep their exact-join oracle
while shuffling only the surviving fraction.

Implementation: a k=2 Bloom over `bits` bits (two independent xxhash64
bit positions per key — the second salted with a literal), OR-folded per
64-bit word by ONE map-side-combined groupBy(word) + bit_or, then a
1-row map_from_entries aggregate.  The bitmap attaches to the probe via
a broadcast 1-row cross join (a BroadcastNestedLoopJoin of one row — a
broadcast variable, not a real NLJ) and the membership test is pure
whole-stage-codegen (`shiftright` + `&` over try_element_at).  Zero
Python, zero extra shuffle; bitmap size is O(bits) regardless of corpus
size.

Sizing: FP ≈ (1 - e^(-k·n/m))^k — for k=2, keep the load n·k/m under
~10% for sub-1% FP.  Production sizes m to the build-side cardinality
(m ≈ n·k/ln2 · log2(1/fp)) and falls back to Spark's automatic runtime
filtering where its thresholds trigger.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_BLOOM_BITS = 1 << 17  # 16 KiB — broadcast-trivial


def _bit_positions(key: Column, bits: int) -> tuple[Column, Column]:
    """Two independent bit positions in [0, bits): xxhash64(key) and
    xxhash64(key, salt).  pmod keeps them non-negative."""
    return (F.pmod(F.xxhash64(key), F.lit(bits)),
            F.pmod(F.xxhash64(key, F.lit(1)), F.lit(bits)))


def bloom_bitmap(build: DataFrame, key_col: str,
                 bits: int = DEFAULT_BLOOM_BITS) -> DataFrame:
    """Fold `build[key_col]`'s k=2 Bloom bits into a 1-row DataFrame
    ``(bm: map<int, bigint>)`` of non-zero 64-bit words.

    An EMPTY build side yields one row with an EMPTY map (collect_list
    over zero rows), which the probe test reads as all-zero words — the
    prefilter then rejects everything, matching the exact join's empty
    result."""
    h1, h2 = _bit_positions(F.col(key_col), bits)
    per_bit = [
        build.select(h.alias("h"))
        .select(F.expr("CAST(shiftright(h, 6) AS INT)").alias("w"),
                F.expr("shiftleft(1L, CAST(pmod(h, 64) AS INT))")
                .alias("bit"))
        for h in (h1, h2)]
    words = (per_bit[0].unionAll(per_bit[1])
             .groupBy("w").agg(F.bit_or("bit").alias("mask")))
    return words.agg(F.map_from_entries(
        F.collect_list(F.struct("w", "mask"))).alias("bm"))


def bloom_prefilter(probe: DataFrame, bitmap: DataFrame, key_col: str,
                    bits: int = DEFAULT_BLOOM_BITS) -> DataFrame:
    """Prune `probe` to rows whose `key_col` MIGHT be in the Bloom
    `bitmap` (1-row frame from bloom_bitmap, broadcast here).  Never
    drops a key that was inserted (both sides compute identical bit
    positions); passes a false-positive fraction the caller's exact join
    must eliminate.  Pure codegen — safe on any probe cardinality."""
    h1, h2 = _bit_positions(F.col(key_col), bits)

    def _hit(h: str) -> Column:
        return F.expr(
            f"(shiftright(coalesce(try_element_at("
            f"bm, CAST(shiftright({h}, 6) AS INT)), 0L),"
            f" CAST(pmod({h}, 64) AS INT)) & 1L) = 1L")

    return (probe.crossJoin(F.broadcast(bitmap))
            .withColumn("_h1", h1).withColumn("_h2", h2)
            .where(_hit("_h1") & _hit("_h2"))
            .drop("bm", "_h1", "_h2"))
