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
                    max_len_diff: int = 2) -> DataFrame:
    """blocks(block_key, id, term) self-join → (id_a, id_b, term_a, term_b)
    with id_a < id_b, deduplicated across shared keys."""
    select_cols = list({id_col, term_col, "block_key"})
    a = blocks.select(select_cols).alias("a")
    b = blocks.select(select_cols).alias("b")
    cond = (
        (F.col(f"a.block_key") == F.col(f"b.block_key"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        & (F.abs(F.length(F.col(f"a.{term_col}"))
                 - F.length(F.col(f"b.{term_col}"))) <= max_len_diff)
    )
    out = (a.join(b, cond)
           .select(F.col(f"a.{id_col}").alias("id_a"),
                   F.col(f"b.{id_col}").alias("id_b"),
                   F.col(f"a.{term_col}").alias("term_a"),
                   F.col(f"b.{term_col}").alias("term_b")))
    return out.dropDuplicates(["id_a", "id_b"])
