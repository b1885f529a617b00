"""Pairwise scoring: vectorized banded Damerau-OSA over candidate pairs —
the reference's verification join-filter (sym_spell.rs:445-450 →
damerau_osa.rs:308-339).  Two implementations (pandas-UDF default,
mapInArrow variant), both delegating to kernels property-tested equal to
the scalar parity kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..functions.udfs import osa_distance_udf


def osa_similarity(left, right, distance):
    """DamaerauOSA::similarity (damerau_osa.rs:182-214, converter
    helpers.rs:67-69): ``1 - distance / codepoint-length of the longer
    string`` — 1.0 for identical strings, 0.0 for no noteworthy
    similarity.  Reference quirk preserved: when either side is empty the
    early returns yield the *empty side's* length, i.e. 0.0, even for two
    empty (equal) strings.

    IEEE-deterministic: one int/int division + one subtraction, bit-equal
    across engines (the oracle computes the identical expression).
    """
    ln = F.greatest(F.length(left), F.length(right))
    sim = F.lit(1.0) - distance.cast("double") / ln.cast("double")
    return F.when((F.length(left) == 0) | (F.length(right) == 0),
                  F.lit(0.0)).otherwise(sim)


def score_pairs_arrow(pairs: DataFrame, left_col: str = "term_a",
                      right_col: str = "term_b", max_distance: int = 2,
                      keep_above_threshold: bool = False) -> DataFrame:
    """mapInArrow variant: ships whole rows through Python but zero Python
    string objects.  Measured SLOWER than the pandas-UDF scorer on narrow
    pair schemas (0.85M vs 2.5M pairs/s at 32 cores) because mapInArrow
    returns full rows while ArrowEvalPython returns only the int32 distance
    column — prefer this only when the pair schema is wide and mostly
    consumed by the filter."""
    import numpy as np
    import pyarrow as pa

    from ..kernels.distance_np import osa_batch_arrow

    in_schema = pairs.schema
    out_schema = T.StructType(list(in_schema.fields)
                              + [T.StructField("distance", T.IntegerType())])
    li = pairs.columns.index(left_col)
    ri = pairs.columns.index(right_col)

    def fn(batches):
        for batch in batches:
            d = osa_batch_arrow(batch.column(li), batch.column(ri),
                                max_distance)
            if keep_above_threshold:
                dist = pa.array(np.where(d >= 0, d, 0), type=pa.int32(),
                                mask=d < 0)
                yield pa.RecordBatch.from_arrays(
                    [batch.column(i) for i in range(batch.num_columns)]
                    + [dist], schema=pa.schema(out_schema_pa))
            else:
                mask = pa.array(d >= 0)
                dist = pa.array(d[d >= 0].astype("int32"), type=pa.int32())
                yield pa.RecordBatch.from_arrays(
                    [batch.column(i).filter(mask)
                     for i in range(batch.num_columns)] + [dist],
                    schema=pa.schema(out_schema_pa))

    from pyspark.sql.pandas.types import to_arrow_schema
    out_schema_pa = to_arrow_schema(out_schema)
    return pairs.mapInArrow(fn, out_schema)


def score_pairs(pairs: DataFrame, left_col: str = "term_a",
                right_col: str = "term_b", max_distance: int = 2,
                keep_above_threshold: bool = False,
                jvm_prefilter: bool = True) -> DataFrame:
    """pairs → pairs + distance:int (filtered to ≤ max_distance unless
    keep_above_threshold, which yields NULL distances instead).  Pandas-UDF
    ArrowEvalPython plan: only (left, right) cross into Python and only the
    distance column returns — the narrow-exchange shape that measured
    fastest (see score_pairs_arrow docstring).

    ``jvm_prefilter``: lossless candidate reduction BEFORE the Python
    exchange using Spark's codegen'd banded Levenshtein.  Since
    OSA ≤ lev ≤ 2·OSA (a transposition costs one OSA op but at most two
    Levenshtein ops), every pair with OSA ≤ d satisfies lev ≤ 2d — so
    ``levenshtein(a, b, 2d) ≤ 2d`` discards only true non-matches while
    running entirely inside whole-stage codegen.  On the linkage bench this
    cuts the Arrow exchange ~17× (2.29M candidate pairs → ~150k crossing
    into Python) with identical output distances.
    """
    osa = osa_distance_udf(max_distance)
    if jvm_prefilter and not keep_above_threshold:
        band = 2 * max_distance
        # threshold form returns -1 when the distance EXCEEDS the bound
        pairs = pairs.where(
            F.levenshtein(F.col(left_col), F.col(right_col), band)
            .between(0, band))
    scored = pairs.withColumn(
        "distance", osa(F.col(left_col), F.col(right_col)))
    if keep_above_threshold:
        return scored
    return scored.where(F.col("distance").isNotNull())
