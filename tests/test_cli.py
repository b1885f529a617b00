"""CLI REPL (scripts/spellcheck_cli.py vs /root/reference/bin/spellchecker:
1-79): drive stdin→stdout in a subprocess over the en_GB dictionary and
assert the reference mocha goldens (SpellcheckerWasm.spec.ts:36,59)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLI = os.path.join(REPO, "scripts", "spellcheck_cli.py")
DICT = "/root/reference/lib/frequency_dictionary_en_82_765.txt.gz"
BIGRAMS = "/root/reference/lib/frequency_bigramdictionary_en_243_342.txt.gz"


def _run(args: list[str], stdin: str) -> list[str]:
    out = subprocess.run(
        [sys.executable, CLI, "--dictionary", DICT, "--wasm-ingest", *args],
        input=stdin, capture_output=True, text=True, timeout=300, check=True)
    return out.stdout.strip().splitlines()


def test_cli_lookup_goldens():
    lines = _run(["--verbosity", "closest"], "acheive!\nmispelled\n")
    # newline-truncation ingest quirk: counts are last-digit-truncated
    assert lines[0].split("\t")[0] == "achieve,2,2733276"
    assert lines[1].split("\t")[0] == "misspelled,1,52742"


def test_cli_compound_golden():
    lines = _run(
        ["--bigrams", BIGRAMS, "--compound"],
        "begining sentances with misspeled words is outragous and "
        "mischievious\n")
    term, distance, count = lines[0].rsplit(",", 2)
    assert term == ("beginning sentences with misspelled words is "
                    "outrageous and mischievous")
    assert (int(distance), int(count)) == (5, 0)


def test_cli_empty_lines_skipped():
    lines = _run(["--verbosity", "top"], "\n\nteh\n")
    assert len(lines) == 1
    assert lines[0].startswith("the,1,")
