"""Smith-Waterman-Gotoh kernel: scalar spec vs hand goldens, batch vs
scalar (property), and the local-alignment invariants."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spellchecker_wasm_spark.kernels.affine import (
    AG_MATCH, affine_gap, affine_gap_batch)

GOLDENS = [
    # identical: every char matches
    ("abc", "abc", 6),
    ("abcdef", "abcdef", 12),
    # one substitution inside a full alignment: 5 matches - 1
    ("abcdef", "abcxef", 9),
    # contiguous 2-gap: 6 matches + open(-2) + extend(-1) = 12 - 3
    ("abcdefgh", "abcfgh", 9),
    # LOCAL alignment: bridging the 4-gap scores 12 - 2 - 3 = 7, but
    # stopping at the perfect 'abcd' prefix scores 8 — the max-M rule
    # takes the window, not the bridge
    ("abcdefghij", "abcdij", 8),
    # ...and one extra match tips the balance to bridging the gap:
    # 14 - 5 = 9 > the 8-point 'abcd' window
    ("abcdefghijk", "abcdijk", 9),
    # prefix truncation: perfect local alignment of the shorter
    ("internation", "international", 22),
    # disjoint alphabets: nothing aligns
    ("xyz", "abc", 0),
    ("", "abc", 0),
    ("abc", "", 0),
    ("", "", 0),
    # local restart: the best window wins, garbage around it is free
    ("zzabczz", "qqabcqq", 6),
]


@pytest.mark.parametrize("a,b,score", GOLDENS)
def test_scalar_goldens(a, b, score):
    assert affine_gap(a, b) == score
    assert affine_gap(b, a) == score  # the score is symmetric


@settings(max_examples=400, deadline=None)
@given(st.text(alphabet="abcd", max_size=10),
       st.text(alphabet="abcd", max_size=10))
def test_batch_matches_scalar(a, b):
    got = affine_gap_batch([a, b], [b, a])
    assert got[0] == affine_gap(a, b)
    assert got[1] == affine_gap(b, a)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcdef", min_size=1, max_size=12))
def test_self_alignment_is_perfect(s):
    assert affine_gap(s, s) == AG_MATCH * len(s)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ab", max_size=10),
       st.text(alphabet="ab", max_size=10))
def test_score_bounds(a, b):
    sw = affine_gap(a, b)
    assert 0 <= sw <= AG_MATCH * min(len(a), len(b))


def test_batch_mixed_lengths_and_unicode():
    pairs = [("проверка", "проверка"), ("straße", "strasse"),
             ("", "x"), ("abcdefgh", "abcfgh")]
    got = affine_gap_batch([p[0] for p in pairs], [p[1] for p in pairs])
    exp = np.array([affine_gap(a, b) for a, b in pairs])
    assert (got == exp).all()
