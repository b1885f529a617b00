from .text import is_alpha_numeric, parse_words, to_char_code
from .deletes import edits, generate_deletes
from .distance import (
    osa_distance,
    osa_distance_max,
    levenshtein_distance,
    prefix_suffix_prep,
)
from .symspell import SuggestItem, SymSpellKernel, Verbosity

__all__ = [
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
