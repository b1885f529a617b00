"""Pins the soundex_blocking oracle's core claim: the DuckDB
list_reduce fold reproduces Spark's builtin F.soundex exactly on the
input domain the catalog row restricts itself to (^[a-z]+$) — random
words plus every adversarial shape the state machine has (H/W
transparency, vowel resets, leading vowels/H/W, runs, collapse across
separators)."""

import random

import duckdb
from pyspark.sql import functions as F

from spellchecker_wasm_spark.queries import _SOUNDEX_MAP

ADVERSARIAL = [
    "pf", "paf", "phf", "ahb", "aab", "bab", "bb", "bhb", "bhab", "bcb",
    "bbcb", "bhcb", "cks", "chk", "chak", "ssssssss", "whw", "hw", "a",
    "h", "w", "bw", "wb", "ahahah", "bwbwb", "hb", "hh", "ha", "baab",
    "bhabb", "tymczasowo",
]


def _duckdb_soundex(words):
    con = duckdb.connect()
    con.execute("CREATE TABLE w(t VARCHAR)")
    con.executemany("INSERT INTO w VALUES (?)", [(w,) for w in words])
    sql = f"""
WITH c AS (
  SELECT t, list_transform(range(1, length(t) + 1),
           i -> substr(translate(t, 'abcdefghijklmnopqrstuvwxyz',
                                 '{_SOUNDEX_MAP}'),
                       CAST(i AS INTEGER), 1)) AS codes
  FROM w),
r AS (
  SELECT t, list_reduce(codes,
           (acc, x) -> CASE WHEN x = '9' THEN acc
                            WHEN x = acc[-1] THEN acc
                            ELSE acc || x END) AS red
  FROM c),
d AS (
  SELECT t, CASE WHEN red[1] BETWEEN '1' AND '8'
            THEN substr(translate(red, '09', ''), 2)
            ELSE translate(red, '09', '') END AS dig
  FROM r)
SELECT t, upper(t[1]) || rpad(substr(dig, 1, 3), 3, '0') AS sx FROM d"""
    return dict(con.sql(sql).fetchall())


def test_duckdb_soundex_matches_spark(spark):
    rnd = random.Random(7)
    words = sorted({"".join(rnd.choice("abcdefghijklmnopqrstuvwxyz")
                            for _ in range(rnd.randint(1, 12)))
                    for _ in range(1000)} | set(ADVERSARIAL))
    got = {r.t: r.sx for r in
           spark.createDataFrame([(w,) for w in words], "t string")
           .select("t", F.soundex("t").alias("sx")).collect()}
    want = _duckdb_soundex(words)
    assert got == want
