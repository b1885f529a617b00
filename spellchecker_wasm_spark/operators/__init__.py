from .blocking import build_blocks, cap_hot_blocks
from .pairs import candidate_pairs
from .scoring import score_pairs
from .clustering import connected_components
from .dictionary import aggregate_word_counts, parse_dictionary_lines
from .lookup import distributed_lookup

__all__ = [
    "build_blocks",
    "cap_hot_blocks",
    "candidate_pairs",
    "score_pairs",
    "connected_components",
    "aggregate_word_counts",
    "parse_dictionary_lines",
    "distributed_lookup",
]
