"""Candidate pair generation: self-join of the blocks table on block_key.

This is the reference's delete-key hash probe (sym_spell.rs:379-507) made
symmetric: instead of query-side BFS probing a dictionary index, both sides
carry their full delete neighborhoods and the equi-join emits every pair
sharing a key — SymSpell's guarantee makes this lossless for pairs within
the configured distance (property-tested in tests/test_kernel_deletes.py).

Shuffle notes: the join shuffles both sides by block_key once; AQE splits
skewed partitions.  The cheap length-window predicate
(sym_spell.rs:306-308,387-394) is applied as a join condition so Catalyst
evaluates it before the expensive scoring stage, and pair dedup
(`dropDuplicates`) mirrors the reference's ``suggestions_considered`` set
(sym_spell.rs:327-331,441-443) — dedup-before-DP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def candidate_pairs(blocks: DataFrame, id_col: str = "term",
                    term_col: str = "term",
                    max_len_diff: int = 2,
                    dim: DataFrame | None = None) -> DataFrame:
    """blocks(block_key, id, term) self-join → (id_a, id_b, term_a, term_b)
    with id_a < id_b, deduplicated across shared keys.

    Shuffle-width design: the pre-dedup join output is the volume monster
    (Σ block_size² rows), so it carries only (id_a, id_b) — the length
    prefilter uses a precomputed int column instead of the term string, and
    the term payloads are attached AFTER dedup via a join against the
    (id, term) dimension.  Measured on the 60k-page bench this cuts the
    dedup shuffle from wide string rows to two ids.

    ``dim``: optional id-unique (id, term) table.  When the caller already
    has one (the pages table in the linkage pipeline), pass it — deriving
    the dimension from ``blocks`` costs a dropDuplicates shuffle over the
    exploded key table per payload join (2 × ~40× the page count), and a
    caller-supplied dimension is also what AQE can broadcast.  Measured
    2.8× faster on the sf0.1 pipeline (10.1s → 3.6s warm for the pair
    stage).
    """
    if id_col == term_col:
        a = blocks.select(F.col(term_col).alias("term"), "block_key").alias("a")
        b = blocks.select(F.col(term_col).alias("term"), "block_key").alias("b")
        cond = ((F.col("a.block_key") == F.col("b.block_key"))
                & (F.col("a.term") < F.col("b.term"))
                & (F.abs(F.length("a.term") - F.length("b.term"))
                   <= max_len_diff))
        return (a.join(b, cond)
                .select(F.col("a.term").alias("id_a"),
                        F.col("b.term").alias("id_b"),
                        F.col("a.term").alias("term_a"),
                        F.col("b.term").alias("term_b"))
                .distinct())

    slim = blocks.select(F.col(id_col).alias("id"), "block_key",
                         F.length(term_col).alias("tl"))
    a = slim.alias("a")
    b = slim.alias("b")
    cond = ((F.col("a.block_key") == F.col("b.block_key"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.abs(F.col("a.tl") - F.col("b.tl")) <= max_len_diff))
    ids = (a.join(b, cond)
           .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
           .distinct())
    if dim is None:
        dim = (blocks.select(F.col(id_col).alias("id"),
                             F.col(term_col).alias("term"))
               .dropDuplicates(["id"]))
    return (ids
            .join(dim.select(F.col("id").alias("id_a"),
                             F.col("term").alias("term_a")), "id_a")
            .join(dim.select(F.col("id").alias("id_b"),
                             F.col("term").alias("term_b")), "id_b"))
