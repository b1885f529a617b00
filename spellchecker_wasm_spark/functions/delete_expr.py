"""JVM-native (pure Catalyst) delete-neighborhood generation.

The Python kernels in ``kernels/deletes.py`` reproduce the reference's
recursive ``edits``/``create_deletes`` (sym_spell.rs:216-261) literally; at
the blocking stage those per-row Python loops were the measured wall-clock
bottleneck (round-1 bench: key-gen + blocking = 22.5s of a 26.3s pipeline).

Key observation: for prefix length P and max edit distance d, the recursive
delete expansion is exactly the set of strings obtained by removing any
non-empty subset of ≤ d character *positions* from the prefix — a fixed
combinatorial family of C(P,1)+…+C(P,d) position masks (≤ 28 for the
default P=7, d=2).  Each mask is a static ``concat(substring…)`` expression,
so the whole generator compiles to whole-stage-codegen'd JVM string ops:
no Python worker, no Arrow exchange, no per-row interpretation.

Reference quirks that survive into the set (proven by the property tests in
tests/test_delete_expr.py, which compare exhaustively against the parity
kernels):

* ``create_deletes`` additionally keys ``""`` for terms of ≤ d codepoints
  (sym_spell.rs:252-254);
* the recursion's 1-BYTE early return (sym_spell.rs:217-219) only changes
  the result set when the prefix is no longer than d (impossible with the
  default P=7 > d=2): the full-deletion mask may produce ``""`` only if the
  prefix contains a multi-byte character;
* the query-side BFS (sym_spell.rs:334-345,485-506) has neither quirk — it
  is the pure combinatorial family.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import Column, functions as F

DEFAULT_MAX_EDIT_DISTANCE = 2
DEFAULT_PREFIX_LENGTH = 7


def _delete_mask_expr(prefix: Column, positions: tuple[int, ...],
                      prefix_length: int) -> Column:
    """concat of the prefix segments that survive deleting the given
    1-based character positions (positions sorted ascending)."""
    segs = []
    prev = 1
    for p in positions:
        if p > prev:
            segs.append(F.substring(prefix, prev, p - prev))
        prev = p + 1
    # tail: length arg only needs to be >= the remaining chars
    segs.append(F.substring(prefix, prev, prefix_length))
    return F.concat(*segs) if len(segs) > 1 else segs[0]


def _masks(max_edit_distance: int, prefix_length: int):
    for k in range(1, max_edit_distance + 1):
        yield from combinations(range(1, prefix_length + 1), k)


def delete_keys_of_prefix(prefix: Column,
                          max_edit_distance: int = DEFAULT_MAX_EDIT_DISTANCE,
                          prefix_length: int = DEFAULT_PREFIX_LENGTH) -> Column:
    """delete_keys_array for an ALREADY prefix-truncated input.

    Callers that explode many terms per row (the blocking scan) should
    truncate first and call this — the inner ``substring(term, 1, P)``
    otherwise replicates ~3× per mask across the ~30-mask family, tripling
    both the codegen source (janino compile latency is a measured fixed
    cost per plan) and per-row evaluation work.

    Correctness requires prefix_length > max_edit_distance (true for every
    real SymSpell configuration): then ``len(term) ≤ d ⟺ len(prefix) ≤ d``
    so the empty-key rule can read the prefix length (at prefix_length ==
    d, a longer term truncates to exactly d codepoints and would wrongly
    gain the empty key).
    """
    if prefix_length <= max_edit_distance:
        raise ValueError("delete_keys_of_prefix requires "
                         "prefix_length > max_edit_distance")
    pl = F.length(prefix)
    term_len = pl
    keys: list[Column] = [prefix]
    for positions in _masks(max_edit_distance, prefix_length):
        maxpos = positions[-1]
        k = len(positions)
        d = _delete_mask_expr(prefix, positions, prefix_length)
        if positions == tuple(range(1, k + 1)):
            # the only mask that can delete the WHOLE prefix (when pl == k):
            # the recursive kernel emits "" there only if some prefix char
            # is multi-byte (1-byte early return, sym_spell.rs:217-219)
            cond = (pl > maxpos) | ((pl == maxpos)
                                    & (F.octet_length(prefix) > pl))
        else:
            cond = pl >= maxpos
        keys.append(F.when(cond, d))
    # terms of <= max_edit_distance codepoints key the empty string
    # (sym_spell.rs:252-254)
    keys.append(F.when(term_len <= max_edit_distance, F.lit("")))
    return F.array_distinct(F.array_compact(F.array(*keys)))


def delete_keys_array(term: Column,
                      max_edit_distance: int = DEFAULT_MAX_EDIT_DISTANCE,
                      prefix_length: int = DEFAULT_PREFIX_LENGTH) -> Column:
    """array<string> of dictionary-side blocking keys for ``term`` —
    set-identical to kernels.deletes.generate_deletes (create_deletes,
    sym_spell.rs:243-261), as a single Catalyst expression."""
    if prefix_length > max_edit_distance:
        return delete_keys_of_prefix(F.substring(term, 1, prefix_length),
                                     max_edit_distance, prefix_length)
    return _delete_keys_general(term, max_edit_distance, prefix_length)


def _delete_keys_general(term: Column, max_edit_distance: int,
                         prefix_length: int) -> Column:
    """Full form for the exotic prefix_length < max_edit_distance case,
    where the empty-key rule must read the UNTRUNCATED term length."""
    prefix = F.substring(term, 1, prefix_length)
    pl = F.length(prefix)
    term_len = F.length(term)
    keys: list[Column] = [prefix]
    for positions in _masks(max_edit_distance, prefix_length):
        maxpos = positions[-1]
        k = len(positions)
        d = _delete_mask_expr(prefix, positions, prefix_length)
        if positions == tuple(range(1, k + 1)):
            cond = (pl > maxpos) | ((pl == maxpos)
                                    & (F.octet_length(prefix) > pl))
        else:
            cond = pl >= maxpos
        keys.append(F.when(cond, d))
    keys.append(F.when(term_len <= max_edit_distance, F.lit("")))
    return F.array_distinct(F.array_compact(F.array(*keys)))


def query_deletes_array(term: Column,
                        max_edit_distance: int = DEFAULT_MAX_EDIT_DISTANCE,
                        prefix_length: int = DEFAULT_PREFIX_LENGTH) -> Column:
    """array<string> of query-side candidate keys — set-identical to
    kernels.deletes.query_deletes (the lookup BFS, sym_spell.rs:334-345):
    the prefix plus every ≤-max_edit_distance positional deletion, no
    empty-key rule and no byte quirk."""
    prefix = F.substring(term, 1, prefix_length)
    pl = F.length(prefix)
    keys: list[Column] = [prefix]
    for positions in _masks(max_edit_distance, prefix_length):
        maxpos = positions[-1]
        d = _delete_mask_expr(prefix, positions, prefix_length)
        keys.append(F.when(pl >= maxpos, d))
    return F.array_distinct(F.array_compact(F.array(*keys)))
