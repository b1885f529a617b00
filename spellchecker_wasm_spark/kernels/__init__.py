from .text import is_alpha_numeric, parse_words, to_char_code
from .deletes import edits, generate_deletes
from .distance import (
    osa_distance,
    osa_distance_max,
    levenshtein_distance,
    prefix_suffix_prep,
)
from .jaro import jaro_similarity, jaro_winkler_batch, jaro_winkler_similarity
from .symspell import SuggestItem, SymSpellKernel, Verbosity

__all__ = [
    "jaro_similarity",
    "jaro_winkler_batch",
    "jaro_winkler_similarity",
    "is_alpha_numeric",
    "parse_words",
    "to_char_code",
    "edits",
    "generate_deletes",
    "osa_distance",
    "osa_distance_max",
    "levenshtein_distance",
    "prefix_suffix_prep",
    "SuggestItem",
    "SymSpellKernel",
    "Verbosity",
]
