"""Damerau-Levenshtein OSA distance kernels — parity with the reference's
SoftWx port (/root/reference/src/soft_wx/damerau_osa.rs, helpers.rs).

Optimal String Alignment (restricted Damerau): adjacent transposition is a
single edit but no substring is edited twice, so e.g. ``CA``→``ABC`` is 3
(unrestricted Damerau gives 2) and ``sated``→``dates`` is 2
(damerau_osa.rs:33-43).  All indices are codepoints.
"""

from __future__ import annotations


def prefix_suffix_prep(s1: str, s2: str) -> tuple[int, int, int]:
    """Strip common suffix then prefix; expects len(s1) <= len(s2).
    Returns (len1, len2, start) — parity with helpers.rs:37-61;
    golden: ("hello", "heelo!") → (3, 4, 2) (helpers.rs:83-89).
    """
    len1 = len(s1)
    len2 = len(s2)
    while len1 != 0 and s1[len1 - 1] == s2[len2 - 1]:
        len1 -= 1
        len2 -= 1
    start = 0
    while start != len1 and s1[start] == s2[start]:
        start += 1
    if start != 0:
        len1 -= start
        len2 -= start
    return len1, len2, start


def _core_osa(s1: str, s2: str, len1: int, len2: int, start: int) -> int:
    """Single-row DP with transposition cost vector (damerau_osa.rs:57-104)."""
    char1_costs = [j + 1 for j in range(len2)]
    prev_char1_costs = [0] * len2
    char1 = " "
    current = 0
    for i in range(len1):
        prev_char1 = char1
        char1 = s1[start + i]
        char2 = " "
        left = i
        above = i
        next_trans = 0
        for j in range(len2):
            this_trans = next_trans
            next_trans = prev_char1_costs[j]
            current = left  # cost of diagonal (substitution)
            prev_char1_costs[j] = current
            left = char1_costs[j]
            prev_char2 = char2
            char2 = s2[start + j]
            if char1 != char2:
                if above < current:
                    current = above  # deletion
                if left < current:
                    current = left  # insertion
                current += 1
                if (i != 0 and j != 0 and char1 == prev_char2
                        and prev_char1 == char2 and this_trans + 1 < current):
                    current = this_trans + 1  # transposition
            above = current
            char1_costs[j] = current
    return current


def _core_osa_banded(s1: str, s2: str, len1: int, len2: int, start: int,
                     max_distance: int) -> int | None:
    """Banded DP of width ≤ 2·max+1 with per-row early abort
    (damerau_osa.rs:106-172).  Returns None when distance > max_distance.
    """
    # only called with max_distance < len2 (damerau_osa.rs:107-115)
    char1_costs = [j + 1 if j < max_distance else max_distance + 1
                   for j in range(len2)]
    prev_char1_costs = [0] * len2

    len_diff = len2 - len1
    j_offset = max_distance - len_diff
    j_start = 0
    j_end = max_distance
    char1 = " "
    current = 0
    for i in range(len1):
        prev_char1 = char1
        char1 = s1[start + i]
        char2 = " "
        left = i
        above = i
        next_trans = 0
        if i > j_offset:
            j_start += 1
        if j_end < len2:
            j_end += 1
        for j in range(j_start, j_end):
            this_trans = next_trans
            next_trans = prev_char1_costs[j]
            current = left
            prev_char1_costs[j] = current
            left = char1_costs[j]
            prev_char2 = char2
            char2 = s2[start + j]
            if char1 != char2:
                if above < current:
                    current = above
                if left < current:
                    current = left
                current += 1
                if (i != 0 and j != 0 and char1 == prev_char2
                        and prev_char1 == char2 and this_trans + 1 < current):
                    current = this_trans + 1
            above = current
            char1_costs[j] = current
        if char1_costs[i + len_diff] > max_distance:
            return None
    return current if current <= max_distance else None


def osa_distance(s1: str, s2: str) -> int:
    """Unbounded OSA distance (damerau_osa.rs:271-296)."""
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    if len(s1) > len(s2):
        s1, s2 = s2, s1
    len1, len2, start = prefix_suffix_prep(s1, s2)
    if len1 == 0:
        return len2
    return _core_osa(s1, s2, len1, len2, start)


def _null_distance(s1: str, s2: str, max_distance: int) -> int | None:
    """helpers.rs:9-23 — empty-string handling for the bounded entry."""
    if s1 == "":
        if s2 == "":
            return 0
        return len(s2) if len(s2) <= max_distance else None
    return len(s1) if len(s1) <= max_distance else None


def osa_distance_max(s1: str, s2: str, max_distance: int) -> int | None:
    """Bounded OSA distance; None when > max_distance
    (damerau_osa.rs:308-339 ``distance2``).
    """
    if not s1 or not s2:
        return _null_distance(s1, s2, max_distance)
    if max_distance <= 0:
        return 0 if s1 == s2 else None
    if len(s1) > len(s2):
        s1, s2 = s2, s1
    if len(s2) - len(s1) > max_distance:
        return None
    len1, len2, start = prefix_suffix_prep(s1, s2)
    if len1 == 0:
        return len2 if len2 <= max_distance else None
    if max_distance < len2:
        return _core_osa_banded(s1, s2, len1, len2, start, max_distance)
    return _core_osa(s1, s2, len1, len2, start)


def levenshtein_distance(s1: str, s2: str) -> int:
    """Plain Levenshtein (reference levensthtein.rs; unreachable from
    SymSpell, which dispatches DamaerauOSA only — sym_spell.rs:347 — so
    the reference's latent bugs in its bounded variants are deliberately
    NOT reproduced).  Spark-side this maps to the built-in F.levenshtein.
    """
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    if len(s1) > len(s2):
        s1, s2 = s2, s1
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1):
        cur = [i + 1]
        for j, c2 in enumerate(s2):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (c1 != c2)))
        prev = cur
    return prev[-1]
