"""Jaro-Winkler kernel: batch == scalar element-wise, and both are
bit-identical to DuckDB's builtin on ASCII — the exactness contract that
lets scored_pairs_jaro sit under the driver's value-hash oracle."""

import struct

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from spellchecker_wasm_spark.kernels.jaro import (
    jaro_similarity, jaro_winkler_batch, jaro_winkler_similarity)


def bits(x: float) -> bytes:
    return struct.pack("d", x)


def test_known_values():
    # classic Winkler paper pairs + DuckDB-verified values
    assert bits(jaro_winkler_similarity("martha", "marhta")) == bits(
        0.9611111111111111)
    assert bits(jaro_winkler_similarity("dwayne", "duane")) == bits(
        0.8400000000000001)
    assert jaro_winkler_similarity("abc", "abc") == 1.0
    assert jaro_winkler_similarity("abc", "xyz") == 0.0


def test_empty_conventions_match_duckdb():
    # DuckDB scores ANY empty side 0.0, including both-empty
    assert jaro_winkler_similarity("", "") == 0.0
    assert jaro_winkler_similarity("", "abc") == 0.0
    assert jaro_winkler_similarity("abc", "") == 0.0
    assert jaro_similarity("", "") == 0.0


def test_batch_empty():
    assert jaro_winkler_batch([], []).shape == (0,)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.text(alphabet="abcdeф", max_size=12),
                          st.text(alphabet="abcdeф", max_size=12)),
                min_size=1, max_size=40))
def test_batch_matches_scalar(pairs):
    s1 = [p[0] for p in pairs]
    s2 = [p[1] for p in pairs]
    got = jaro_winkler_batch(s1, s2)
    want = np.array([jaro_winkler_similarity(a, b) for a, b in zip(s1, s2)])
    assert got.tobytes() == want.tobytes()  # bitwise


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.text(alphabet="abcde", max_size=12),
                          st.text(alphabet="abcde", max_size=12)),
                min_size=1, max_size=30))
def test_ascii_bitwise_matches_duckdb(pairs):
    con = duckdb.connect()
    con.execute("CREATE TABLE p(a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    want = con.execute(
        "SELECT jaro_winkler_similarity(a, b) FROM p").fetchall()
    con.close()
    got = jaro_winkler_batch([p[0] for p in pairs], [p[1] for p in pairs])
    for g, (w,) in zip(got, want):
        assert bits(float(g)) == bits(w), pairs


def test_non_ascii_divergence_pinned():
    """DuckDB's builtin walks UTF-8 BYTES; the kernel is codepoint-based
    (the semantically-correct unit).  Pin the known divergence so a future
    DuckDB change is noticed — the catalog query guards its fixture to
    ASCII (octet_length = length) on both engines because of this."""
    con = duckdb.connect()
    (dd,) = con.execute(
        "SELECT jaro_winkler_similarity('héllo', 'hallo')").fetchone()
    con.close()
    assert bits(dd) == bits(0.8400000000000001)  # byte-walk value
    assert bits(jaro_winkler_similarity("héllo", "hallo")) == bits(0.88)


def test_transposition_and_window():
    # transpositions: CRATE/TRACE -> m=5? classic: jaro 0.733...
    a, b = "crate", "trace"
    con = duckdb.connect()
    (dd,) = con.execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]).fetchone()
    con.close()
    assert bits(jaro_winkler_similarity(a, b)) == bits(dd)
