"""Delete-neighborhood generator parity (reference sym_spell.rs:216-261)."""

from hypothesis import given, settings, strategies as st

from spellchecker_wasm_spark.kernels import generate_deletes, osa_distance
from spellchecker_wasm_spark.kernels.deletes import query_deletes


def test_short_word_gets_empty_key():
    # key_len <= max_edit_distance inserts "" (sym_spell.rs:248-250)
    keys = generate_deletes("ab", 2, 7)
    assert "" in keys and "ab" in keys and {"a", "b"} <= keys


def test_prefix_truncation():
    # deletes generated from the first prefix_length codepoints only
    keys = generate_deletes("abcdefghij", 2, 7)
    assert "abcdefg" in keys
    assert all(len(k) >= 5 for k in keys)
    assert "abcdefghij" not in keys


def test_delete_set_exact_small():
    assert generate_deletes("abc", 2, 7) == {"abc", "ab", "ac", "bc", "a", "b", "c"}


def test_one_byte_early_return_quirk():
    # edits() returns early for 1-BYTE subjects (sym_spell.rs:217-219):
    # ASCII "ab" → depth-1 deletes are 1 byte, never expanded to "";
    # the "" key still appears via the ≤max_edit_distance rule.
    keys = generate_deletes("ab", 2, 7)
    assert keys == {"", "ab", "a", "b"}
    # 1-codepoint multi-byte subjects DO recurse: "йц" depth-1 deletes are
    # 2-byte single codepoints whose deletion yields "" again — same final
    # set because the ≤med rule also adds it.
    assert generate_deletes("йц", 2, 7) == {"", "йц", "й", "ц"}


def test_fanout_bound():
    # ~25-30 keys/term at med=2, prefix=7 (BASELINE.md index fan-out)
    keys = generate_deletes("abcdefg", 2, 7)
    assert len(keys) == 1 + 7 + 21  # C(7,0)+C(7,1)+C(7,2) distinct deletes


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcdef", min_size=1, max_size=10),
       st.text(alphabet="abcdef", min_size=1, max_size=10))
def test_blocking_guarantee(a, b):
    """Two terms within OSA distance ≤2 share at least one delete key —
    the property that makes SymSpell blocking lossless."""
    if osa_distance(a, b) <= 2:
        assert generate_deletes(a, 2, 7) & generate_deletes(b, 2, 7)


def test_query_deletes_matches_bfs_depth():
    # query-side BFS reaches length >= prefix_len - med (sym_spell.rs:485)
    q = query_deletes("abcd", 2, 7)
    assert q == {"abcd", "abc", "abd", "acd", "bcd",
                 "ab", "ac", "ad", "bc", "bd", "cd"}
    assert "" in query_deletes("ab", 2, 7)
