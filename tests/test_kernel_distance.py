"""Damerau-OSA kernel parity (reference soft_wx/damerau_osa.rs, helpers.rs)."""

import pytest
from hypothesis import given, settings, strategies as st

from spellchecker_wasm_spark.kernels import (
    levenshtein_distance, osa_distance, osa_distance_max, prefix_suffix_prep)


def brute_osa(a: str, b: str) -> int:
    """Textbook O(nm) OSA matrix — independent check implementation."""
    n, m = len(a), len(b)
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost)
            if (i > 1 and j > 1 and a[i - 1] == b[j - 2]
                    and a[i - 2] == b[j - 1]):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[n][m]


def test_osa_is_restricted_not_true_damerau():
    # damerau_osa.rs:33-43: OSA forbids editing a substring twice
    assert osa_distance("CA", "ABC") == 3  # true Damerau would give 2
    assert osa_distance("sated", "dates") == 2


def test_prefix_suffix_prep_golden():
    # helpers.rs:83-89
    assert prefix_suffix_prep("hello", "heelo!") == (3, 4, 2)


@pytest.mark.parametrize("a,b,expected", [
    ("", "", 0),
    ("", "abc", 3),
    ("abc", "", 3),
    ("abc", "abc", 0),
    ("ab", "ba", 1),          # adjacent transposition = 1 edit
    ("kitten", "sitting", 3),
    ("свой", "свойй", 1),     # multi-byte codepoint indexing
    ("bank", "bnak", 1),
    ("bank", "kanb", 2),  # two substitutions (sym_spell.rs:421 comment)
])
def test_osa_known_values(a, b, expected):
    assert osa_distance(a, b) == expected
    assert brute_osa(a, b) == expected


@pytest.mark.parametrize("a,b,maxd,expected", [
    ("kitten", "sitting", 2, None),   # banded early exit
    ("kitten", "sitting", 3, 3),
    ("abcdef", "abcdef", 0, 0),       # max<=0 equality test
    ("abcdef", "abcdeg", 0, None),
    ("", "ab", 2, 2),                 # null-distance path (helpers.rs:9-23)
    ("", "abc", 2, None),
    ("ab", "", 5, 2),
    ("abcdefgh", "ab", 2, None),      # length-diff reject
])
def test_osa_bounded(a, b, maxd, expected):
    assert osa_distance_max(a, b, maxd) == expected


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcфй", max_size=9), st.text(alphabet="abcфй", max_size=9))
def test_osa_matches_brute_force(a, b):
    assert osa_distance(a, b) == brute_osa(a, b)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcd", max_size=9), st.text(alphabet="abcd", max_size=9),
       st.integers(min_value=0, max_value=5))
def test_bounded_consistent_with_unbounded(a, b, maxd):
    full = brute_osa(a, b)
    got = osa_distance_max(a, b, maxd)
    if full <= maxd:
        assert got == full
    else:
        assert got is None


def test_levenshtein():
    assert levenshtein_distance("kitten", "sitting") == 3
    assert levenshtein_distance("ab", "ba") == 2  # no transposition
