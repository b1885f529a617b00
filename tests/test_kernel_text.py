"""Tokenizer / codepoint parity (reference sym_spell.rs:191-214, utils.rs)."""

from spellchecker_wasm_spark.kernels import (
    is_alpha_numeric, parse_words, to_char_code)


def test_parse_words_reference_unit_test():
    # sym_spell.rs:805-810 asserts 7 tokens
    words = parse_words("this is a - test, (does it work)?")
    assert len(words) == 7
    # leading-separator quirk (cursor parks on the separator)
    assert words == ["this", " is", " a", " test", "(does", " it", " work"]


def test_digits_are_separators():
    # utils.rs:15-35 excludes 0-9 from the alphanumeric ranges
    assert parse_words("abc123def") == ["abc", "3def"]
    assert not is_alpha_numeric("5")


def test_alpha_numeric_ranges():
    for ch in "azAZ_ф踰é":
        assert is_alpha_numeric(ch), ch
    for ch in " .,!?-09\t\n":
        assert not is_alpha_numeric(ch), ch
    # ZWNJ/ZWJ included (utils.rs:26)
    assert is_alpha_numeric("‌") and is_alpha_numeric("‍")
    # boundary checks
    assert is_alpha_numeric(chr(0xF8)) and is_alpha_numeric(chr(0x2FF))
    assert not is_alpha_numeric(chr(0x300))  # combining marks excluded


def test_to_char_code():
    # utils.rs:40-44 golden
    assert to_char_code("踰") == 0x8E30
    assert to_char_code("a") == 0x61
    assert to_char_code("🚀") == 0x1F680


def test_multibyte_tokenization():
    assert parse_words("привет мир") == ["привет", " мир"]


def test_empty_and_separator_only():
    assert parse_words("") == []
    assert parse_words("  .. !! ") == []
    assert parse_words("a") == ["a"]
    assert parse_words("?a") == ["?a"]  # leading separator kept on final token
