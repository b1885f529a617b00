"""spark.read.text reads the reference's gzipped dictionaries natively
(the reference ships a decompress postinstall script, bin/decompress —
Spark needs none) and the DataFrame parse matches the kernel's ingest."""

import gzip

from spellchecker_wasm_spark.operators.dictionary import (
    aggregate_word_counts, parse_dictionary_lines)

DICT = "/root/reference/lib/frequency_dictionary_en_82_765.txt.gz"


def test_spark_reads_gz_dictionary_natively(spark):
    lines = spark.read.text(DICT)
    words = aggregate_word_counts(parse_dictionary_lines(lines))
    n, total = words.count(), words.selectExpr("sum(count)").first()[0]
    with gzip.open(DICT, "rt", encoding="utf-8") as f:
        expect = [l.split(" ") for l in f.read().splitlines()]
    assert n == len({t for t, _ in expect}) == 82765
    assert total == sum(int(c) for _, c in expect)
