"""Delete-neighborhood (blocking key) generator — parity with the
reference's ``edits``/``create_deletes`` (sym_spell.rs:216-261).

This is SymSpell's core trick and our blocking stage: every string
reachable from a term's first ``prefix_length`` codepoints by at most
``max_edit_distance`` single-character deletions becomes a blocking key.
Two strings within Damerau-OSA distance ``d ≤ max_edit_distance`` are
guaranteed to share at least one key, so the candidate join has perfect
recall at the configured distance.
"""

from __future__ import annotations

from . import text as _text  # noqa: F401  (kept for parity references)

DEFAULT_MAX_EDIT_DISTANCE = 2
DEFAULT_PREFIX_LENGTH = 7


def edits(subject: str, edit_distance: int, delete_words: set[str],
          max_edit_distance: int) -> None:
    """Recursive single-deletion expansion (sym_spell.rs:216-241).

    Reference quirk preserved: recursion is skipped when the subject is one
    **byte** long (not one codepoint) — a 1-codepoint multi-byte subject
    still generates the empty-string delete (sym_spell.rs:217-219).
    """
    if len(subject.encode("utf-8")) == 1:
        return
    edit_distance += 1
    for i in range(len(subject)):
        delete = subject[:i] + subject[i + 1:]
        if delete not in delete_words:
            if edit_distance < max_edit_distance:
                edits(delete, edit_distance, delete_words, max_edit_distance)
            delete_words.add(delete)


def generate_deletes(term: str,
                     max_edit_distance: int = DEFAULT_MAX_EDIT_DISTANCE,
                     prefix_length: int = DEFAULT_PREFIX_LENGTH) -> set[str]:
    """All blocking keys for ``term`` (parity with create_deletes,
    sym_spell.rs:243-261):

    * ``""`` when the full term has ≤ max_edit_distance codepoints;
    * the (≤ prefix_length)-codepoint prefix itself;
    * every delete of that prefix up to depth ``max_edit_distance``.

    The reference double-inserts the prefix posting (sym_spell.rs:256 and
    again via the returned set at :142-145); postings are set-deduplicated
    downstream in both engines, so we return a set.
    """
    keys: set[str] = set()
    if len(term) <= max_edit_distance:
        keys.add("")
    prefix = term[:prefix_length] if len(term) > prefix_length else term
    keys.add(prefix)
    edits(prefix, 0, keys, max_edit_distance)
    return keys


def query_deletes(term: str,
                  max_edit_distance: int = DEFAULT_MAX_EDIT_DISTANCE,
                  prefix_length: int = DEFAULT_PREFIX_LENGTH) -> set[str]:
    """Candidate keys generated on the *query* side of a lookup — the BFS at
    sym_spell.rs:334-345,485-506 enumerates the input prefix plus all its
    deletes down to length ``prefix_len - max_edit_distance`` (no 1-byte
    early return, no ≤-med empty-key rule; ``""`` appears only when the
    prefix itself has ≤ max_edit_distance codepoints).
    """
    prefix = term[:prefix_length] if len(term) > prefix_length else term
    keys: set[str] = {prefix}
    frontier = [prefix]
    plen = len(prefix)
    for _ in range(max_edit_distance):
        nxt: list[str] = []
        for cand in frontier:
            if plen - len(cand) >= max_edit_distance:
                continue
            for i in range(len(cand)):
                delete = cand[:i] + cand[i + 1:]
                if delete not in keys:
                    keys.add(delete)
                    nxt.append(delete)
        frontier = nxt
    return keys
