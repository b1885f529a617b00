#!/usr/bin/env python
"""Compound spell-correction throughput: the reference's #2 public API
(lookup_compound, spellchecker_wasm.rs:62-69) run distributed over a
synthesized misspelled-sentence corpus with the real en_82_765 frequency
dictionary (+ bigrams).

Sentences are built deterministically from dictionary words and then
corrupted the way lookup_compound expects to repair them: per-word
character deletions/swaps and dropped spaces (merge errors), seeded by
xxhash-style Python hashing of (doc_id, position) — no RNG state.

Measures docs/sec and chars/sec end-to-end at local[$SPARK_GRAFT_CPUS],
including the one-off per-executor index build from the broadcast
dictionaries (the amortizing cost the operator's design note documents).
Prints one JSON line; recorded in BENCH/COMPOUND.md.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os
import sys
import time

from pyspark.sql import Row, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spellchecker_wasm_spark.operators.compound import (  # noqa: E402
    compound_correct)
from spellchecker_wasm_spark.session import get_spark  # noqa: E402

DICT = "/root/reference/lib/frequency_dictionary_en_82_765.txt.gz"
BIGRAMS = "/root/reference/lib/frequency_bigramdictionary_en_243_342.txt.gz"


def _h(*parts) -> int:
    return int.from_bytes(
        hashlib.md5(":".join(map(str, parts)).encode()).digest()[:8], "big")


def synth_sentences(n: int, words: list[str], words_per_doc: int = 8,
                    zipf: bool = False):
    """Deterministic misspelled sentences from real dictionary words.

    Default draw is UNIFORM over the term pool (the r2/r3 protocol —
    kept for round-over-round comparability).  ``zipf=True`` draws
    rank-weighted (p(rank) ∝ 1/rank over the frequency-sorted pool),
    the token distribution real webtext actually has — the number that
    predicts production throughput for the per-executor memo."""
    if zipf:
        # cumulative 1/rank table; binary-search a hashed uniform into it
        import bisect
        import itertools
        cum = list(itertools.accumulate(1.0 / r
                                        for r in range(1, len(words) + 1)))
        total = cum[-1]
    out = []
    for i in range(n):
        toks = []
        for j in range(words_per_doc):
            if zipf:
                u = (_h(i, j) % 10**9) / 10**9 * total
                w = words[bisect.bisect_left(cum, u)]
            else:
                w = words[_h(i, j) % len(words)]
            r = _h(i, j, "op") % 4
            if r == 0 and len(w) > 4:          # delete one char
                p = _h(i, j, "p") % len(w)
                w = w[:p] + w[p + 1:]
            elif r == 1 and len(w) > 4:        # swap two adjacent chars
                p = _h(i, j, "p") % (len(w) - 1)
                w = w[:p] + w[p + 1] + w[p] + w[p + 2:]
            toks.append(w)
        s = " ".join(toks)
        if _h(i, "merge") % 3 == 0:            # drop one space (merge error)
            sp = [k for k, c in enumerate(s) if c == " "]
            p = sp[_h(i, "mp") % len(sp)]
            s = s[:p] + s[p + 1:]
        out.append(s)
    return out


def main() -> None:
    n = int(os.environ.get("COMPOUND_N", "20000"))
    dict_top = int(os.environ.get("COMPOUND_DICT", "30000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name=f"bench-compound-{n}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

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
            w1, w2, c = line.rstrip("\n").split(" ")
            bigrams[f"{w1} {w2}"] = int(c)

    zipf = os.environ.get("COMPOUND_ZIPF", "0") == "1"
    sentences = synth_sentences(n, terms, zipf=zipf)
    n_chars = sum(len(s) for s in sentences)
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=s) for i, s in enumerate(sentences)]
    ).repartition(cpus * 2).persist()
    docs.count()
    words_df = spark.createDataFrame(
        [Row(term=t, count=c) for t, c in words.items()])
    bigrams_df = spark.createDataFrame(
        [Row(bigram=b, count=c) for b, c in bigrams.items()])

    t0 = time.time()
    out = compound_correct(docs, "text", words_df, bigrams_df,
                           id_cols=("doc_id",)).persist()
    n_out = out.count()
    wall = time.time() - t0
    assert n_out == n

    changed = out.join(docs, "doc_id").where(
        F.col("corrected") != F.col("text")).count()
    res = {
        "metric": "compound_correct_bench", "docs": n, "cpus": cpus,
        "zipf": zipf,
        "dict_terms": len(words), "bigrams": len(bigrams),
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n / wall, 1),
        "chars_per_sec": round(n_chars / wall, 1),
        "corrected_fraction": round(changed / n, 4),
    }
    spark.stop()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
