import gzip
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_LIB = "/root/reference/lib"
REFERENCE_TESTS = "/root/reference/src/js/__tests__"
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def read_reference_dictionary(name: str) -> bytes:
    path = os.path.join(REFERENCE_LIB, name)
    if path.endswith(".gz"):
        with gzip.open(path, "rb") as f:
            return f.read()
    with open(path, "rb") as f:
        return f.read()


@pytest.fixture(scope="session")
def en_gb_kernel():
    """Full en_GB dictionary loaded through the WASM-ingest emulation
    (counts last-digit-truncated, matching the mocha goldens)."""
    from spellchecker_wasm_spark.kernels.symspell import (
        SymSpellKernel, ingest_wasm_stream)
    k = SymSpellKernel(2, 7, 1)
    ingest_wasm_stream(
        k, read_reference_dictionary("frequency_dictionary_en_82_765.txt.gz"))
    return k


@pytest.fixture(scope="session")
def en_gb_kernel_with_bigrams(en_gb_kernel):
    from spellchecker_wasm_spark.kernels.symspell import ingest_wasm_stream
    ingest_wasm_stream(
        en_gb_kernel,
        read_reference_dictionary("frequency_bigramdictionary_en_243_342.txt.gz"),
        is_bigram=True)
    return en_gb_kernel


@pytest.fixture(scope="session")
def spark():
    from spellchecker_wasm_spark.session import get_spark
    s = get_spark(app_name="tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()
