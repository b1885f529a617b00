"""en_US locale goldens (language_tests_map.json:26-49) — the reference's
second test locale, exercising a different dictionary distribution
(60size_1M 1-gram, 2009-07-15)."""

import json
import os

import pytest

from spellchecker_wasm_spark.kernels import SymSpellKernel, Verbosity, osa_distance_max
from spellchecker_wasm_spark.kernels.symspell import ingest_wasm_stream
from tests.conftest import REFERENCE_TESTS, read_reference_dictionary

DICT = "frequency_dictionary_en_US_60size_1M_1gram_20090715.txt.gz"


@pytest.fixture(scope="module")
def en_us_kernel():
    k = SymSpellKernel(2, 7, 1)
    ingest_wasm_stream(k, read_reference_dictionary(DICT))
    return k


def test_golden_acheive_en_us(en_us_kernel):
    r = en_us_kernel.lookup("acheive!", Verbosity.CLOSEST, 2, False, False)
    assert (r[0].term, r[0].distance, r[0].count) == ("achieved", 2, 337517)


def test_golden_creche_en_us(en_us_kernel):
    r = en_us_kernel.lookup("crèche", Verbosity.CLOSEST, 2, False, False)
    assert (r[0].term, r[0].distance, r[0].count) == ("creche", 1, 1709)


def test_golden_asdf_en_us(en_us_kernel):
    r = en_us_kernel.lookup("asdf", Verbosity.CLOSEST, 2, False, False)
    assert len(r) == 38


@pytest.fixture(scope="module")
def en_us_med7():
    """Custom-options kernel, dictionary pre-filtered to words within OSA 4
    of the probes (lossless — see test_kernel_symspell_goldens.en_gb_med7)."""
    data = read_reference_dictionary(DICT)
    k = SymSpellKernel(7, 7, 2)
    lines = []
    for line in data.decode("utf-8").splitlines():
        term = line.split(" ", 1)[0]
        if any(osa_distance_max(term, probe, 4) is not None
               for probe in ("cofvfee", "eradicate")):
            lines.append(line)
    ingest_wasm_stream(k, ("\n".join(lines) + "\n").encode())
    return k


def test_golden_cofvfee_en_us(en_us_med7):
    r = en_us_med7.lookup("cofvfee", Verbosity.CLOSEST, 4, False, False)
    assert (r[0].term, r[0].distance, r[0].count) == ("coffee", 1, 279183)


def test_golden_eradicate_en_us(en_us_med7):
    r = en_us_med7.lookup("eradicate", Verbosity.CLOSEST, 4, False, True)
    assert (r[0].term, r[0].distance, r[0].count) == ("eradicate", 0, 17305)


def test_misspellings_corpus_en_us(en_us_kernel):
    path = os.path.join(
        REFERENCE_TESTS,
        "commonMisspellings_en_US_60size_1M_1gram_20090715.json")
    corpus = json.load(open(path))
    misses = []
    for entry in corpus:
        correct = entry["correctSpelling"].lower()
        for word in entry["misspellings"]:
            r = en_us_kernel.lookup(word.lower(), Verbosity.CLOSEST, 2,
                                    False, False)
            if correct not in [s.term for s in r]:
                misses.append((word, correct))
    assert not misses, misses


def test_golden_compound_en_us(en_us_kernel):
    ingest_wasm_stream(
        en_us_kernel,
        read_reference_dictionary("frequency_bigramdictionary_en_243_342.txt.gz"),
        is_bigram=True)
    r = en_us_kernel.lookup_compound(
        "begining sentances with misspeled words is outragous and mischievious", 2)
    assert r[0].term == ("beginning sentences with misspelled words is "
                         "outrageous and mischievous")
    assert (r[0].distance, r[0].count) == (5, 0)
