"""Explicit skew mitigation: salted joins.

AQE's runtime skew-join split (enabled in session.py) handles most skew in
sort-merge joins, but salting remains the portable answer when (a) the
skewed relation feeds an operator AQE cannot split (streaming joins,
stateful ops), or (b) a single key exceeds what one task can hold even
after splitting.  The pipeline's own skew strategy is hot-key CAPPING
(with logged drops) because super-node blocking keys carry no signal; this
operator is for joins where the hot keys must be KEPT.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_join(big: DataFrame, dim: DataFrame, key: str,
                n_salts: int = 16, salt_source: Column | None = None,
                how: str = "inner") -> DataFrame:
    """Equi-join ``big ⋈ dim`` on ``key`` with the big side salted into
    ``n_salts`` sub-keys and the dim side replicated n_salts× — a hot key's
    rows spread over n_salts tasks instead of one straggler.

    ``salt_source``: expression whose hash spreads the big side (defaults
    to the whole-row-distinct xxhash64 of the key plus a per-partition
    counter via monotonically_increasing_id — deterministic for a given
    partitioning).  Join type 'inner' or 'left' (dim must be key-unique
    for 'left' to preserve multiplicity).
    """
    if salt_source is None:
        salt_source = F.monotonically_increasing_id()
    salted = big.withColumn("_salt",
                            F.pmod(F.xxhash64(salt_source), F.lit(n_salts)))
    replicated = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0).cast("long"),
                                      F.lit(n_salts - 1).cast("long"))))
    out = salted.join(replicated, [key, "_salt"], how)
    return out.drop("_salt")
