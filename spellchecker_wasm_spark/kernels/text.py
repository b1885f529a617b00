"""Codepoint/tokenizer kernels with reference-parity semantics.

The reference segments strings by Unicode scalar values (codepoints), not
true grapheme clusters (/root/reference/src/grapheme_iterator.rs:59-71 —
a 4-byte emoji is one unit, a combining sequence is N units).  Python `str`
indexing has identical semantics for valid UTF-8, so all kernels here index
by plain Python string positions.
"""

from __future__ import annotations

# Codepoint ranges accepted by the reference's alphanumeric predicate
# (/root/reference/src/utils.rs:15-35).  NOTE: ASCII digits 0-9 are NOT
# included — digits act as token separators (a deliberate reference quirk).
_ALPHA_NUMERIC_RANGES: tuple[tuple[int, int], ...] = (
    (0x41, 0x5A),      # A-Z
    (0x5F, 0x5F),      # _
    (0x61, 0x7A),      # a-z
    (0xC0, 0xD6),      # À-Ö
    (0xD8, 0xF6),      # Ø-ö
    (0xF8, 0x02FF),    # ø-˿
    (0x0370, 0x037D),
    (0x037F, 0x1FFF),
    (0x200C, 0x200D),  # ZWNJ/ZWJ
    (0x2070, 0x218F),
    (0x2C00, 0x2FEF),
    (0x3001, 0xD7FF),
    (0xF900, 0xFDCF),
    (0xFDF0, 0xFFFD),
    (0x10000, 0xEFFFF),
)


def to_char_code(grapheme: str) -> int:
    """Codepoint of a 1-char string (parity with utils.rs:2-13)."""
    if not grapheme:
        return 0
    return ord(grapheme[0])


def is_alpha_numeric(ch: str) -> bool:
    """Reference alphanumeric predicate (utils.rs:15-35)."""
    cp = ord(ch)
    for lo, hi in _ALPHA_NUMERIC_RANGES:
        if lo <= cp <= hi:
            return True
        if cp < lo:
            return False
    return False


def parse_words(text: str) -> list[str]:
    """Tokenize exactly like the reference's ``parse_words``
    (sym_spell.rs:191-214), reproducing its quirks:

    * every token after the first includes one **leading separator char**
      (the cursor is parked on the separator index);
    * ASCII digits are separators (utils.rs excludes 0-9);
    * the final token is emitted only when the text ends on an
      alphanumeric char.

    ``"this is a - test, (does it work)?"`` →
    ``["this", " is", " a", " test", "(does", " it", " work"]``
    (unit test sym_spell.rs:805-810 counts 7 tokens).
    """
    words: list[str] = []
    last_alpha = False
    cursor = 0
    n = len(text)
    for i in range(n):
        alpha = is_alpha_numeric(text[i])
        if not alpha:
            if last_alpha:
                words.append(text[cursor:i])
            cursor = i
        last_alpha = alpha
    # Reference compares the codepoint cursor against the BYTE length
    # (sym_spell.rs:209); as proven in tests this is always true whenever
    # last_alpha holds (cursor <= len-2 < byte_len), so plain emission of
    # the trailing token is byte-identical.
    if last_alpha and cursor != len(text.encode("utf-8")):
        words.append(text[cursor:n])
    return words
