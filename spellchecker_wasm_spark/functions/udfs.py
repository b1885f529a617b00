"""Arrow-batched pandas UDFs bridging the parity kernels into Spark.

These are the ONLY places Python executes in the distributed plans
(input_hint mandate: vectorized pandas/Arrow UDFs, no per-row Python).
Everything else in the operators is built-in Catalyst expressions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernels.deletes import generate_deletes, query_deletes
from ..kernels.distance_np import osa_batch
from ..kernels.text import parse_words


def osa_distance_udf(max_distance: int):
    """Column function: bounded Damerau-OSA distance, NULL when above the
    bound — the reference's verification join-filter (sym_spell.rs:445-450)
    as one vectorized numpy batch per Arrow chunk."""

    @pandas_udf(T.IntegerType())
    def _osa(s1: pd.Series, s2: pd.Series) -> pd.Series:
        d = osa_batch(s1.tolist(), s2.tolist(), max_distance)
        out = pd.Series(d, index=s1.index, dtype="int64")
        return out.where(out >= 0, other=None).astype("Int32")

    # semantically deterministic; marked nondeterministic ONLY to stop
    # Catalyst duplicating the (expensive) UDF into both the projection and
    # the null-filter — halves Python compute in the scoring stage
    return _osa.asNondeterministic()


def jaro_winkler_udf():
    """Column function: Jaro-Winkler similarity (float64), bit-identical
    to DuckDB's ``jaro_winkler_similarity`` on ASCII inputs (the kernel is
    codepoint-based; DuckDB's builtin walks UTF-8 bytes, so non-ASCII
    diverges — kernels/jaro.py docstring, pinned in
    tests/test_kernel_jaro.py).  One vectorized numpy batch per Arrow
    chunk; no per-row Python."""
    from ..kernels.jaro import jaro_winkler_batch

    @pandas_udf(T.DoubleType())
    def _jw(s1: pd.Series, s2: pd.Series) -> pd.Series:
        return pd.Series(jaro_winkler_batch(s1.tolist(), s2.tolist()),
                         index=s1.index)

    # same Catalyst-duplication guard as osa_distance_udf: the projection
    # and the threshold filter must share ONE Python exchange
    return _jw.asNondeterministic()


def generate_deletes_udf(max_edit_distance: int = 2, prefix_length: int = 7):
    """Column function: dictionary-side blocking keys (create_deletes,
    sym_spell.rs:243-261) as array<string> — explode downstream."""

    @pandas_udf(T.ArrayType(T.StringType()))
    def _deletes(terms: pd.Series) -> pd.Series:
        return terms.map(lambda t: sorted(
            generate_deletes(t, max_edit_distance, prefix_length))
            if t is not None else [])

    return _deletes


def query_deletes_udf(max_edit_distance: int = 2, prefix_length: int = 7):
    """Column function: query-side candidate keys (lookup BFS,
    sym_spell.rs:334-345,485-506) as array<string>."""

    @pandas_udf(T.ArrayType(T.StringType()))
    def _deletes(terms: pd.Series) -> pd.Series:
        return terms.map(lambda t: sorted(
            query_deletes(t, max_edit_distance, prefix_length))
            if t is not None else [])

    return _deletes


@pandas_udf(T.ArrayType(T.StringType()))
def parse_words_udf(texts: pd.Series) -> pd.Series:
    """Reference-quirk tokenizer (sym_spell.rs:191-214) as array<string>.
    Regex cannot express the leading-separator quirk; the kernel scan runs
    per batch."""
    return texts.map(lambda t: parse_words(t) if t is not None else [])


def clean_tokens(col):
    """Expression: strip the tokenizer's leading-separator quirk for the
    stages that want plain terms (blocking on web-page tokens)."""
    return F.regexp_replace(col, r"^[^\p{L}_]+", "")
