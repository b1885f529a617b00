"""JVM text extraction/tokenization (functions/text_expr.py) must match the
Python parity kernels byte-for-byte / set-for-set."""

import pytest
from pyspark.sql import functions as F

from spellchecker_wasm_spark.functions.text_expr import (
    extract_text_expr, title_expr, title_tokens_array)
from spellchecker_wasm_spark.kernels.text import parse_words
from spellchecker_wasm_spark.pipeline.webpages import (
    extract_text_from_html, synthesize_pages)

_HTML_CASES = [
    b"<html><head><title>Hello World</title></head>"
    b"<body><p>some body text</p></body></html>",
    b"<html><body><p>no title here</p></body></html>",
    b"<html><head><title>only title</title></head></html>",
    b"<html></html>",
    "<html><head><title>привет мир</title></head>"
    "<body><b>тело</b> ещё</body></html>".encode(),
    b"<html><head><title>multi\nline title</title></head>"
    b"<body>line1<br/>line2</body></html>",
    b"<title>a<b>nested</b> tag title</title><body>x<i>y</i>z</body>",
]


@pytest.fixture(scope="module")
def html_df(spark):
    return spark.createDataFrame([(h,) for h in _HTML_CASES], "html binary")


def test_extract_text_matches_python(html_df):
    rows = html_df.select("html",
                          extract_text_expr(F.col("html")).alias("t")).collect()
    for r in rows:
        assert r["t"] == extract_text_from_html(bytes(r["html"]))


def test_extract_text_matches_on_synthesized_pages(spark):
    pages_pdf, _ = synthesize_pages(n_entities=60, seed=11)
    df = spark.createDataFrame(pages_pdf)
    n_bad = (df.where(extract_text_expr(F.col("html")) != F.col("text"))
             .count())
    assert n_bad == 0


_TITLE_CASES = [
    "this is a - test, (does it work)?",
    "hello world",
    "кроме того، данные",  # arabic comma separator + cyrillic
    "a1b2c3 token99 plain",  # digits are separators (reference quirk)
    "__underscores__ keep",
    "",
    "   ",
    "x",  # below min length
    "ends with separator!",
    "ends with token",
]


def _python_tokens(title: str, min_len: int = 2) -> set[str]:
    toks = set()
    for tok in parse_words(title):
        while tok and not (tok[0].isalpha() or tok[0] == "_"):
            tok = tok[1:]
        if len(tok) >= min_len:
            toks.add(tok)
    return toks


def test_title_tokens_match_python_fused_pass(spark):
    df = spark.createDataFrame([(t,) for t in _TITLE_CASES], "title string")
    rows = df.select("title",
                     title_tokens_array(F.col("title")).alias("toks")).collect()
    for r in rows:
        assert set(r["toks"]) == _python_tokens(r["title"]), r["title"]


def test_title_tokens_match_on_synthesized_titles(spark):
    pages_pdf, _ = synthesize_pages(n_entities=80, seed=5)
    df = spark.createDataFrame(pages_pdf)
    rows = (df.select(title_expr(F.col("html")).alias("title"))
            .select("title", title_tokens_array(F.col("title")).alias("toks"))
            .collect())
    assert len(rows) > 0
    for r in rows:
        assert set(r["toks"]) == _python_tokens(r["title"])


def test_parse_words_regex_oracle_on_quirk_strings():
    """The RE2 pattern used by the parse_words_tokens oracle must equal the
    kernel tokenizer on the quirk cases (leading-separator carry, digit
    separators, multi-byte, trailing separator)."""
    import duckdb

    from spellchecker_wasm_spark.functions.text_expr import alnum_class

    cls = alnum_class()
    pat = "[^" + cls[1:-1] + "]?" + cls + "+"
    con = duckdb.connect()
    cases = [
        "this is a - test, (does it work)?",
        "a1b2  double  seps",
        "привет, мир!",
        "ends.",
        ".starts",
        "mixъed 𝄞notes𝄞 here",
        "",
        "   ",
    ]
    for text in cases:
        got = con.execute(
            "SELECT regexp_extract_all(?, ?)", [text, pat]).fetchone()[0]
        assert got == parse_words(text), (text, got, parse_words(text))


def test_bpe_pattern_java_vs_re2_on_adversarial_strings(spark):
    """token_counts relies on Spark (Java regex) and the DuckDB oracle
    (RE2) tokenizing identically.  Fuzz the agreement on the string
    classes where the engines could plausibly diverge: apostrophes and
    contraction suffixes, unicode letters/whitespace outside the ASCII
    classes, astral-plane symbols (UTF-16 surrogate pairs in Java vs
    codepoints in RE2), mixed control whitespace, and empty-ish runs."""
    import duckdb
    from pyspark.sql import Row, functions as F

    from spellchecker_wasm_spark.queries import _BPE_PAT

    cases = [
        "it's Tom's 'quoted' don't y'all've",
        "tab\tnewline\nmix \r\n \x0b end",
        "digits 123 mixed a1b2c3 42",
        "punct!!! ...ellipsis--dash???",
        "unicode: привет мир, 漢字とカナ",
        "emoji 🎉🎊 and notes 𝄞𝄢 astral",
        "nbsp separated em-space",
        "'", " '", "''", "'s", " 's",
        "", " ", "   leading and trailing   ",
        "CamelCase mixedUPPER lower",
    ]
    sdf = spark.createDataFrame([Row(i=i, t=c) for i, c in enumerate(cases)])
    got = {r["i"]: r["toks"] for r in sdf.select(
        "i", F.regexp_extract_all(F.col("t"), F.lit(_BPE_PAT), F.lit(0))
        .alias("toks")).collect()}
    con = duckdb.connect()
    for i, text in enumerate(cases):
        want = con.execute("SELECT regexp_extract_all(?, ?)",
                           [text, _BPE_PAT]).fetchone()[0]
        assert got[i] == want, (text, got[i], want)


def test_week_truncation_engine_agreement(spark):
    """user_retention's one cross-engine risk is date_trunc('week')
    semantics; pin that Spark and DuckDB agree on boundary timestamps
    (week starts Monday on both): Monday/Sunday midnights, year
    boundary, leap day, epoch, and a microsecond before week end."""
    import duckdb

    cases = ["2024-01-01 00:00:00", "2023-12-31 23:59:59",
             "2024-02-29 12:00:00", "2024-06-02 00:00:00",
             "2024-06-03 00:00:00", "1970-01-01 00:00:00",
             "2024-06-09 23:59:59.999999"]
    sdf = (spark.createDataFrame([(c,) for c in cases], ["s"])
           .select("s", F.date_trunc("week", F.col("s").cast("timestamp"))
                   .cast("date").alias("w")))
    srows = {r["s"]: str(r["w"]) for r in sdf.collect()}
    con = duckdb.connect()
    for c in cases:
        dw, = con.sql("SELECT CAST(date_trunc('week', CAST(? AS TIMESTAMP))"
                      " AS DATE)", params=[c]).fetchone()
        assert srows[c] == str(dw), (c, srows[c], dw)
