"""JVM-native delete generation (functions/delete_expr.py) must be
set-identical to the parity kernels (kernels/deletes.py) — which are
themselves golden-tested against the reference's recursive
create_deletes/edits (sym_spell.rs:216-261)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spellchecker_wasm_spark.functions.delete_expr import (
    delete_keys_array, query_deletes_array)
from spellchecker_wasm_spark.kernels.deletes import (
    generate_deletes, query_deletes)

# alphabet mixing 1-byte, 2-byte, 3-byte, 4-byte (astral) chars plus
# repeats — exercises the codepoint-vs-byte quirk paths
_ALPHA = "abзжя€𝄞"

CONFIGS = [(2, 7), (1, 7), (2, 3), (3, 4), (2, 2), (1, 1), (2, 1)]

_CASES = [
    "", "a", "я", "ab", "ая", "яя", "abc", "hello", "приветик",
    "aaaaaaa", "aaaaaaaa", "𝄞𝄞", "a𝄞b", "misspelled", "xx",
]


def _spark_sets(spark, terms, expr_fn, med, plen):
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    rows = df.select("term",
                     expr_fn(F.col("term"), med, plen).alias("keys")).collect()
    return {r["term"]: set(r["keys"]) for r in rows}


@pytest.mark.parametrize("med,plen", CONFIGS)
def test_dictionary_side_matches_kernel(spark, med, plen):
    got = _spark_sets(spark, _CASES, delete_keys_array, med, plen)
    for t in _CASES:
        assert got[t] == generate_deletes(t, med, plen), (t, med, plen)


@pytest.mark.parametrize("med,plen", CONFIGS)
def test_query_side_matches_kernel(spark, med, plen):
    got = _spark_sets(spark, _CASES, query_deletes_array, med, plen)
    for t in _CASES:
        assert got[t] == query_deletes(t, med, plen), (t, med, plen)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet=_ALPHA, max_size=10),
                min_size=1, max_size=8, unique=True))
def test_property_random_terms(spark, terms):
    got_d = _spark_sets(spark, terms, delete_keys_array, 2, 7)
    got_q = _spark_sets(spark, terms, query_deletes_array, 2, 7)
    for t in terms:
        assert got_d[t] == generate_deletes(t, 2, 7)
        assert got_q[t] == query_deletes(t, 2, 7)
