"""spellchecker_wasm_spark — a from-scratch PySpark-native record-linkage
engine with the query/data-processing capabilities of
justinwilaby/spellchecker-wasm (SymSpell v6.5, Rust→WASM).

Layers
------
kernels/    pure-Python/numpy parity kernels (tokenizer, delete generator,
            banded Damerau-OSA, full SymSpell lookup/lookup_compound) —
            byte-identical to the reference's unit/golden tests.
operators/  Spark DataFrame operators: blocking, candidate pairs, vectorized
            scoring, verbosity top-k lookup, compound correction, connected
            components clustering, dedup family, ANN similarity.
pipeline/   the north-star end-to-end pipeline over Common-Crawl-style pages
            (synthesize → extract → tokenize → block → score → cluster) with
            checkpoint/lineage stages.
functions/  column-expression helpers (hashing, text stats, vectors).

Everything is DataFrame-first; Python appears only inside Arrow-batched
pandas UDFs (the scoring DP, the delete/tokenizer generators, compound).
"""

__version__ = "0.1.0"

DEFAULT_MAX_EDIT_DISTANCE = 2  # reference sym_spell.rs:43
DEFAULT_PREFIX_LENGTH = 7      # reference sym_spell.rs:44
DEFAULT_COUNT_THRESHOLD = 1    # reference sym_spell.rs:45
CORPUS_N = 1024908267229.0     # reference sym_spell.rs:46 (Google 1T tokens)
