"""Edge cases for functions/url_expr.canonical_url beyond what the
catalog fixture synthesizes (the fixture's messiness is seeded mod-k;
these pin the rule set on hand-written adversarial urls)."""

from pyspark.sql import functions as F

from spellchecker_wasm_spark.functions.url_expr import (
    canonical_url, registered_domain, url_host)

CASES = [
    # (raw, canonical)
    ("HTTPS://WWW.Ex.COM:443/A/b/?utm_source=x&z=1&a=2#frag",
     "https://ex.com/A/b?a=2&z=1"),
    # non-default port survives; default-for-OTHER-scheme port survives
    ("http://ex.com:8080/p", "http://ex.com:8080/p"),
    ("http://ex.com:443/p", "http://ex.com:443/p"),
    ("https://ex.com:80/p", "https://ex.com:80/p"),
    # tracking-only query drops the '?' entirely
    ("https://ex.com/p?utm_campaign=a&fbclid=z&gclid=1&ref=nav",
     "https://ex.com/p"),
    # empty path, multiple trailing slashes, empty query
    ("http://EX.com", "http://ex.com"),
    ("http://ex.com///", "http://ex.com"),
    ("http://ex.com/p?", "http://ex.com/p"),
    # param VALUES are untouched; only whole-param names are stripped
    ("http://ex.com/p?id=utm_x&b=ref", "http://ex.com/p?b=ref&id=utm_x"),
    # 'www' as the REGISTRABLE label (www.com) must not be stripped bare
    ("http://www.ex.org/p", "http://ex.org/p"),
    # path case is preserved (path is case-sensitive per RFC 3986)
    ("http://ex.com/CaseSensitive", "http://ex.com/CaseSensitive"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], ["url"])
    got = [r[0] for r in
           df.select(canonical_url(F.col("url"))).collect()]
    want = [c for _, c in CASES]
    assert got == want, list(zip([r for r, _ in CASES], got, want))


def test_registered_domain_fallback(spark):
    df = spark.createDataFrame(
        [("a.b.ex.co.uk",), ("ex.com",), ("localhost",)], ["h"])
    got = [r[0] for r in df.select(registered_domain(F.col("h"))).collect()]
    # naive eTLD+1 (last two labels; PSL substitution documented in
    # url_expr.py) — single-label hosts fall back to themselves
    assert got == ["co.uk", "ex.com", "localhost"]


def test_url_host_strips_port_and_www(spark):
    df = spark.createDataFrame(
        [("HTTP://WWW.A.ORG:8080/x",), ("https://b.net/y",)], ["u"])
    got = [r[0] for r in df.select(url_host(F.col("u"))).collect()]
    assert got == ["a.org", "b.net"]
