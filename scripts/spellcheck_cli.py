#!/usr/bin/env python
"""CLI REPL — the reference's bin/spellchecker (yargs stdin→stdout loop)
re-expressed over the parity kernel.

Usage:
  python scripts/spellcheck_cli.py --dictionary /path/to/freq.txt[.gz] \
      [--bigrams /path/bigrams.txt.gz] [--compound] [--verbosity closest]
  then type one word (or sentence with --compound) per line.
"""

from __future__ import annotations

import argparse
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spellchecker_wasm_spark.kernels.symspell import (  # noqa: E402
    SymSpellKernel, Verbosity, ingest_wasm_stream)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dictionary", required=True)
    p.add_argument("--bigrams")
    p.add_argument("--compound", action="store_true")
    p.add_argument("--verbosity", default="closest",
                   choices=["top", "closest", "all"])
    p.add_argument("--max-edit-distance", type=int, default=2)
    p.add_argument("--wasm-ingest", action="store_true",
                   help="reproduce the WASM splitter's drop-last-char quirk")
    args = p.parse_args()

    k = SymSpellKernel(max(2, args.max_edit_distance), 7, 1)

    def load(path: str, is_bigram: bool) -> None:
        op = gzip.open if path.endswith(".gz") else open
        with op(path, "rb") as f:
            data = f.read()
        if args.wasm_ingest:
            ingest_wasm_stream(k, data, is_bigram)
        else:
            for line in data.decode("utf-8").splitlines():
                if is_bigram:
                    k.write_line_to_bigram_dictionary(line, " ")
                else:
                    k.write_line_to_dictionary(line, " ")

    load(args.dictionary, False)
    if args.bigrams:
        load(args.bigrams, True)
    verbosity = {"top": Verbosity.TOP, "closest": Verbosity.CLOSEST,
                 "all": Verbosity.ALL}[args.verbosity]

    for line in sys.stdin:
        text = line.rstrip("\n")
        if not text:
            continue
        if args.compound:
            items = k.lookup_compound(text, args.max_edit_distance)
        else:
            items = k.lookup(text, verbosity, args.max_edit_distance,
                             False, False)
        print("\t".join(f"{s.term},{s.distance},{s.count}" for s in items))
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
