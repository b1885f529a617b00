"""Pairwise scoring: vectorized banded Damerau-OSA over candidate pairs.

The reference's verification join-filter (sym_spell.rs:445-450 →
damerau_osa.rs:308-339) as an Arrow-batched pandas UDF; the numpy kernel is
property-tested equal to the scalar parity kernel.  Rows above the
threshold score NULL and are filtered — exactly the reference's
``distance_comparison.is_none() → continue``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.udfs import osa_distance_udf


def score_pairs(pairs: DataFrame, left_col: str = "term_a",
                right_col: str = "term_b", max_distance: int = 2,
                keep_above_threshold: bool = False) -> DataFrame:
    osa = osa_distance_udf(max_distance)
    scored = pairs.withColumn(
        "distance", osa(F.col(left_col), F.col(right_col)))
    if keep_above_threshold:
        return scored
    return scored.where(F.col("distance").isNotNull())
