"""Blocking stage: explode SymSpell delete-neighborhood keys.

The reference's ``deletes`` HashMap (sym_spell.rs:59, built at :243-261)
becomes a DataFrame ``blocks(block_key, term, …)``.  Joining on the delete
*string* is collision-free (the reference hashes and tolerates collisions,
:55-58); downstream distance verification exists either way.

Scale design (SURVEY.md §7 stage 5): key fan-out is bounded by prefix
truncation to O(prefix_len^med) ≈ 29 keys/term; the key distribution is
Zipf-like with super-node keys (short prefixes, the empty key from ≤med
terms), handled by the posting-cap with logged drop accounting and AQE
skew-join splitting at pair time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.delete_expr import delete_keys_array


def build_blocks(terms: DataFrame, term_col: str = "term",
                 max_edit_distance: int = 2, prefix_length: int = 7,
                 carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """(…, term) → (block_key, term, …carry) — one row per delete key.

    Key generation is the pure-Catalyst combinatorial expression
    (functions/delete_expr.py) — set-identical to the recursive reference
    kernel but whole-stage-codegen'd JVM string ops, no Python worker.
    The expression returns a deduplicated key array per term, so no
    distinct() is needed when `terms` is term-unique.
    """
    keys = delete_keys_array(F.col(term_col), max_edit_distance, prefix_length)
    cols = [F.col(term_col).alias("term"), *[F.col(c) for c in carry_cols]]
    return terms.select(*cols, F.explode(keys).alias("block_key"))


def cap_hot_blocks(blocks: DataFrame, max_block_size: int,
                   key_col: str = "block_key",
                   persist: bool = False) -> tuple[DataFrame, DataFrame]:
    """Drop super-node blocking keys whose posting list exceeds
    ``max_block_size``; returns (capped_blocks, dropped_stats).

    Pair generation is quadratic in posting size, so a handful of hot keys
    (e.g. ``""`` and 1-2 char prefixes) dominate cost while contributing
    almost no discriminating power — every pair they would produce at
    distance ≤ med is also produced by a longer shared key unless both
    strings are that short.  The anti-join is a broadcast of only the hot
    keys (heavy hitters are few by definition), so the big side never
    reshuffles.  Dropped keys/rows are returned for lineage accounting —
    never silently.

    ``persist``: since the key generator became a pure Catalyst projection
    (functions/delete_expr.py), recomputing the explode per consumer is
    cheaper than materializing the ~80×-fan-out table — persisting 12M
    wide rows cost more wall than four codegen re-scans of the 150k-page
    input (measured).  Set True only when `blocks` ends in an expensive
    non-Catalyst stage (the round-1 Python pass), or checkpoint to a table
    instead (the Iceberg `blocks` stage does exactly that).
    """
    if persist:
        blocks = blocks.persist(StorageLevel.MEMORY_AND_DISK)
    counts = blocks.groupBy(key_col).agg(F.count(F.lit(1)).alias("block_size"))
    hot = counts.where(F.col("block_size") > max_block_size)
    capped = blocks.join(F.broadcast(hot.select(key_col)), key_col, "left_anti")
    return capped, hot
