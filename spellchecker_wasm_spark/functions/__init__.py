from .udfs import (
    generate_deletes_udf,
    osa_distance_udf,
    parse_words_udf,
    query_deletes_udf,
)

__all__ = [
    "generate_deletes_udf",
    "osa_distance_udf",
    "parse_words_udf",
    "query_deletes_udf",
]
