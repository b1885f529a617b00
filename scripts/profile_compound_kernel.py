#!/usr/bin/env python
"""Single-core cProfile of the compound kernel hot path (no Spark).

Reuses bench_compound's deterministic corpus generator and dictionary
slice so the profile is the per-core cost the distributed operator
amortizes.  Prints the top cumulative/tottime entries plus the docs/s
the profiled run achieved (cProfile overhead included — compare only
shapes, not absolute rates, against bench_compound numbers).

Env: COMPOUND_N (docs, default 2000), COMPOUND_DICT (top-k terms,
default 30000), PROFILE_SORT (tottime|cumulative).
"""

from __future__ import annotations

import cProfile
import gzip
import io
import os
import pstats
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "scripts"))

from bench_compound import BIGRAMS, DICT, synth_sentences  # noqa: E402
from spellchecker_wasm_spark.operators.compound import (  # noqa: E402
    kernel_from_counts)


def load_dicts(dict_top: int):
    """Same slice as bench_compound: words dict + the 4-12-char term
    pool its sentence generator draws from."""
    words, terms = {}, []
    with gzip.open(DICT, "rt", encoding="utf-8") as f:
        for i, line in enumerate(f):
            if i >= dict_top:
                break
            t, c = line.split(" ")
            words[t] = int(c)
            if 4 <= len(t) <= 12:
                terms.append(t)
    bigrams = {}
    with gzip.open(BIGRAMS, "rt", encoding="utf-8") as f:
        for i, line in enumerate(f):
            if i >= dict_top:
                break
            a, b, c = line.split(" ")
            bigrams[f"{a} {b}"] = int(c)
    return words, bigrams, terms


def main() -> None:
    n = int(os.environ.get("COMPOUND_N", "2000"))
    dict_top = int(os.environ.get("COMPOUND_DICT", "30000"))
    sort = os.environ.get("PROFILE_SORT", "tottime")
    words, bigrams, terms = load_dicts(dict_top)
    t0 = time.time()
    kernel = kernel_from_counts(words, bigrams, 2, 7)
    build = time.time() - t0
    docs = synth_sentences(n, terms)

    t0 = time.time()
    pr = cProfile.Profile()
    pr.enable()
    for d in docs:
        kernel.lookup_compound_joined(d, 2)
    pr.disable()
    wall = time.time() - t0

    buf = io.StringIO()
    pstats.Stats(pr, stream=buf).sort_stats(sort).print_stats(25)
    print(buf.getvalue())
    print(f"index_build_sec={build:.2f} docs={n} wall={wall:.2f} "
          f"docs_per_sec={n / wall:.1f} (cProfile overhead included)")


if __name__ == "__main__":
    main()
