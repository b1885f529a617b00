"""Batch numpy OSA must agree element-wise with the scalar parity kernel."""

import numpy as np
from hypothesis import given, settings, strategies as st

from spellchecker_wasm_spark.kernels import osa_distance_max
from spellchecker_wasm_spark.kernels.distance_np import osa_batch


def ref(a, b, m):
    r = osa_distance_max(a, b, m)
    return -1 if r is None else r


def test_basic_batch():
    s1 = ["kitten", "ab", "", "abc", "свой", "bank", "same"]
    s2 = ["sitting", "ba", "xy", "", "свойй", "bnak", "same"]
    got = osa_batch(s1, s2, 2)
    want = [ref(a, b, 2) for a, b in zip(s1, s2)]
    assert got.tolist() == want


def test_max_zero():
    assert osa_batch(["a", "b"], ["a", "c"], 0).tolist() == [0, -1]


def test_none_inputs():
    assert osa_batch([None, "ab"], ["ab", None], 2).tolist() == [2, 2]


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(st.text(alphabet="abcdф", max_size=10),
                          st.text(alphabet="abcdф", max_size=10)),
                min_size=1, max_size=40),
       st.integers(min_value=0, max_value=4))
def test_matches_scalar_kernel(pairs, maxd):
    s1 = [p[0] for p in pairs]
    s2 = [p[1] for p in pairs]
    got = osa_batch(s1, s2, maxd)
    want = np.array([ref(a, b, maxd) for a, b in zip(s1, s2)])
    assert (got == want).all(), (s1, s2, maxd, got.tolist(), want.tolist())


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.text(min_size=0, max_size=24),
                          st.text(min_size=0, max_size=24)),
                min_size=1, max_size=16))
def test_matches_scalar_kernel_unicode(pairs):
    s1 = [p[0] for p in pairs]
    s2 = [p[1] for p in pairs]
    got = osa_batch(s1, s2, 3)
    want = np.array([ref(a, b, 3) for a, b in zip(s1, s2)])
    assert (got == want).all()


def test_large_batch_throughput_sanity():
    rng = np.random.RandomState(42)
    letters = np.array(list("abcdefghij"))
    words = ["".join(rng.choice(letters, rng.randint(3, 15))) for _ in range(20000)]
    other = [w[:max(1, len(w) - 1)] + "x" for w in words]
    got = osa_batch(words, other, 2)
    spot = rng.choice(len(words), 200, replace=False)
    for i in spot:
        assert got[i] == ref(words[i], other[i], 2)
