"""Hash-direct blocking-key generation (functions/delete_hash_expr) vs the
string generator (functions/delete_expr): the hash family must be the
EXACT hash-image of the string family — same per-prefix cardinality, same
within/cross-prefix equality structure — because pair recall rests on
"two pages sharing a delete variant share a block key".
"""

import gzip

import pytest
from pyspark.sql import functions as F

from spellchecker_wasm_spark.functions.delete_expr import (
    delete_keys_of_prefix)
from spellchecker_wasm_spark.functions.delete_hash_expr import (
    delete_key_hash_explode, delete_key_hashes_of_prefix)

EDGE_TERMS = [
    "", "a", "ab", "abc", "abcdefg", "abcdefgh", "aaaaaaa", "aab",
    "прибор", "привет", "мир", "ия", "я", "яя", "яяя", "é", "naïve",
    "coöp", "xx", "x_y", "_", "a" * 7, "ab" * 4,
]


@pytest.fixture(scope="module")
def vocab(spark):
    words = [l.split()[0] for l in gzip.open(
        "/root/reference/lib/frequency_dictionary_en_82_765.txt.gz",
        "rt")][:4000]
    words += EDGE_TERMS
    return (spark.createDataFrame([(w,) for w in set(words) if w],
                                  ["term"])
            .select(F.substring("term", 1, 7).alias("p")))


def test_hash_family_is_bijective_image_of_string_family(vocab):
    """Zip the two arrays positionally (same mask order, same
    array_distinct first-occurrence semantics): every string key maps to
    exactly one hash everywhere it appears, and no two distinct strings
    share a hash (over the sample)."""
    both = vocab.select(
        "p",
        delete_keys_of_prefix(F.col("p")).alias("ks"),
        delete_key_hashes_of_prefix(F.col("p")).alias("hs")).collect()
    mapping: dict[str, int] = {}
    rev: dict[int, str] = {}
    for row in both:
        assert len(row.ks) == len(row.hs), row.p
        for k, h in zip(row.ks, row.hs):
            assert mapping.setdefault(k, h) == h, (row.p, k)
            assert rev.setdefault(h, k) == k, (row.p, k)
    assert len(mapping) > 10_000


def test_empty_key_rule_short_terms(spark):
    """Terms of <= max_edit_distance codepoints carry the empty-variant
    hash (the xxhash64 seed), like the string path's '' key."""
    df = spark.createDataFrame([("ab",), ("a",), ("яя",)], ["p"])
    rows = df.select(
        delete_keys_of_prefix(F.col("p")).alias("ks"),
        delete_key_hashes_of_prefix(F.col("p")).alias("hs")).collect()
    seed_hash = 42  # xxhash64 of the empty argument sequence
    for row in rows:
        assert ("" in row.ks) == (seed_hash in row.hs)
        assert len(row.ks) == len(row.hs)


def test_explode_form_matches_array_form(vocab):
    """delete_key_hash_explode (two-projection Generate shape) emits the
    same per-prefix multiset as exploding delete_key_hashes_of_prefix."""
    a = (vocab.select("p", F.explode(
        delete_key_hashes_of_prefix(F.col("p"))).alias("block_key"))
        .groupBy("p", "block_key").count())
    b = (delete_key_hash_explode(vocab, "p", keep_cols=["p"])
         .groupBy("p", "block_key").count())
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_candidate_pairs_identical_to_string_path(spark):
    """End-to-end blocking parity: candidate id-pairs from the hash-direct
    explode equal the round-2 string+xxhash64 path on synthetic pages
    (per-page cross-prefix key dedup differs, but the pair set — what F1
    rests on — must not)."""
    from spellchecker_wasm_spark.operators.pairs import candidate_pairs
    from spellchecker_wasm_spark.pipeline.linkage import (
        LinkageConfig, pages_to_block_hashes, title_block_keys)
    from spellchecker_wasm_spark.pipeline.webpages import (
        synthesize_pages_spark)
    from spellchecker_wasm_spark.functions.text_expr import title_expr

    cfg = LinkageConfig()
    pages, _ = synthesize_pages_spark(spark, 120, seed=7)
    pdim = (pages.where(F.col("html").isNotNull())
            .select(F.xxhash64("url").alias("id"),
                    title_expr(F.col("html")).alias("title")))
    old = (pdim.select(
        F.col("id").alias("page_id"), F.length("title").alias("tl"),
        F.explode(title_block_keys(F.col("title"), cfg)).alias("k"))
        .select("page_id", "tl", F.xxhash64("k").alias("block_key")))
    new = pages_to_block_hashes(pdim, cfg)
    dim = pdim.select("id", F.col("title").alias("term"))
    p_old = {(r.id_a, r.id_b) for r in candidate_pairs(
        old, id_col="page_id", dim=dim, len_col="tl").collect()}
    p_new = {(r.id_a, r.id_b) for r in candidate_pairs(
        new, id_col="page_id", dim=dim, len_col="tl").collect()}
    assert p_old == p_new and p_old


@pytest.mark.parametrize("med,plen", [(1, 5), (2, 4), (1, 7), (2, 3)])
def test_hash_family_bijection_nondefault_configs(spark, med, plen):
    """The string↔hash family correspondence holds at every
    (max_edit_distance, prefix_length) with plen > med, not just the
    SymSpell defaults."""
    words = ["abcde", "abcd", "abc", "ab", "a", "aaaaa", "aabba",
             "приве", "яя", "x", "", "abab", "baba", "abcdx"]
    df = (spark.createDataFrame([(w,) for w in words if w], ["term"])
          .select(F.substring("term", 1, plen).alias("p")))
    rows = df.select(
        "p",
        delete_keys_of_prefix(F.col("p"), med, plen).alias("ks"),
        delete_key_hashes_of_prefix(F.col("p"), med, plen).alias("hs")
    ).collect()
    mapping, rev = {}, {}
    for row in rows:
        assert len(row.ks) == len(row.hs), row.p
        for k, h in zip(row.ks, row.hs):
            assert mapping.setdefault(k, h) == h, (med, plen, row.p, k)
            assert rev.setdefault(h, k) == k, (med, plen, row.p, k)
