"""Arrow-native scoring path must agree with the scalar parity kernel and
the pandas-UDF variant."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from spellchecker_wasm_spark.kernels import osa_distance_max
from spellchecker_wasm_spark.kernels.distance_np import osa_batch_arrow
from spellchecker_wasm_spark.operators.scoring import (
    score_pairs, score_pairs_arrow)


def ref(a, b, m):
    r = osa_distance_max(a or "", b or "", m)
    return -1 if r is None else r


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(
    st.one_of(st.none(), st.text(alphabet="abcdфй", max_size=12)),
    st.one_of(st.none(), st.text(alphabet="abcdфй", max_size=12))),
    min_size=1, max_size=50),
    st.integers(min_value=0, max_value=4))
def test_arrow_kernel_matches_scalar(pairs, maxd):
    a = pa.array([p[0] for p in pairs], type=pa.string())
    b = pa.array([p[1] for p in pairs], type=pa.string())
    got = osa_batch_arrow(a, b, maxd)
    want = [ref(p[0], p[1], maxd) for p in pairs]
    assert got.tolist() == want


def test_arrow_kernel_sliced_and_large_string():
    a = pa.array(["kitten", "ab", "", "свой", "same"])
    b = pa.array(["sitting", "ba", "xy", "свойй", "same"])
    # sliced arrays exercise the offset handling
    got = osa_batch_arrow(a.slice(1, 3), b.slice(1, 3), 2)
    assert got.tolist() == [ref("ab", "ba", 2), ref("", "xy", 2),
                            ref("свой", "свойй", 2)]
    la = a.cast(pa.large_string())
    lb = b.cast(pa.large_string())
    assert osa_batch_arrow(la, lb, 2).tolist() == [
        ref(x, y, 2) for x, y in zip(a.to_pylist(), b.to_pylist())]


def test_score_pairs_arrow_matches_pandas(spark):
    rng = np.random.RandomState(3)
    letters = list("abcdef")
    words = ["".join(rng.choice(letters, rng.randint(3, 12)))
             for _ in range(500)]
    rows = [Row(term_a=w, term_b=(w[:-1] if i % 2 else
                                  "".join(rng.choice(letters, 8))))
            for i, w in enumerate(words)]
    df = spark.createDataFrame(rows)
    arrow = {(r["term_a"], r["term_b"], r["distance"])
             for r in score_pairs_arrow(df).collect()}
    pandas_ = {(r["term_a"], r["term_b"], r["distance"])
               for r in score_pairs(df).collect()}
    assert arrow == pandas_ and arrow


def test_score_pairs_keep_above_threshold(spark):
    df = spark.createDataFrame([Row(term_a="abc", term_b="abd"),
                                Row(term_a="abc", term_b="zzzzzz")])
    rows = {(r["term_a"], r["term_b"]): r["distance"]
            for r in score_pairs_arrow(df, keep_above_threshold=True).collect()}
    assert rows[("abc", "abd")] == 1
    assert rows[("abc", "zzzzzz")] is None
