"""Synthetic Common-Crawl-style web pages (BASELINE.json input_hint:
url string, warc_ts timestamp, html binary, text string, lang string) with
labeled duplicate clusters, plus the fixed byte-identical text extractor.

Deterministic (numpy RandomState over an explicit seed); no external data.
Each entity yields 1-5 page rows: one canonical and variants whose titles
differ by ≤2 Damerau-OSA edits (insert/delete/substitute/adjacent
transpose — the reference's four edit kinds, damerau_osa.rs:83-97).
Entity identity is anchored by a random 10-letter slug token, so distinct
entities sit at large distances with overwhelming probability; common vocab
words are shared across entities on purpose — they create the hot blocking
keys the skew handling must absorb.
"""

from __future__ import annotations

import datetime as _dt
import re

import numpy as np
import pandas as pd

from ..kernels.distance import osa_distance

_EN_VOCAB = ("data web page index search engine crawl archive news shop "
             "blog wiki forum cloud store media photo video music game "
             "travel health finance sports science tech review guide home "
             "world daily open free best top new live online global local "
             "market report journal press record study group project lab "
             "agency studio network system service portal digital").split()
_RU_VOCAB = ("данные сеть страница индекс поиск система архив новости "
             "магазин блог форум облако медиа фото видео музыка игра "
             "путешествие здоровье финансы спорт наука обзор мир").split()
_TLDS = [".com", ".org", ".net", ".io", ".co"]
_EPOCH = _dt.datetime(2024, 1, 1)

_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.S)
_BODY_RE = re.compile(r"<body>(.*?)</body>", re.S)
_TAG_RE = re.compile(r"<[^>]+>")


def extract_text_from_html(html: bytes) -> str:
    """THE fixed extraction rule (per-row invariant: byte-identical per
    url): title contents + '\\n' + tag-stripped body contents."""
    s = html.decode("utf-8")
    title = _TITLE_RE.search(s)
    body = _BODY_RE.search(s)
    t = title.group(1) if title else ""
    b = _TAG_RE.sub("", body.group(1)) if body else ""
    return t + "\n" + b


def _edit_once(rng: np.random.RandomState, s: str, alphabet: str) -> str:
    """One random character edit that never touches spaces (keeps the
    title's token structure) and never empties a token."""
    letter_pos = [i for i, c in enumerate(s) if c != " "]
    for _ in range(20):
        op = rng.randint(4)
        i = int(letter_pos[rng.randint(len(letter_pos))])
        c = alphabet[rng.randint(len(alphabet))]
        if op == 0:      # substitute
            if s[i] == c:
                continue
            return s[:i] + c + s[i + 1:]
        if op == 1:      # insert
            return s[:i] + c + s[i:]
        if op == 2:      # delete (keep tokens non-empty)
            before = s[i - 1] if i > 0 else " "
            after = s[i + 1] if i + 1 < len(s) else " "
            if before == " " and after == " ":
                continue
            return s[:i] + s[i + 1:]
        # adjacent transpose within a token
        if i + 1 < len(s) and s[i + 1] != " " and s[i] != s[i + 1]:
            return s[:i] + s[i + 1] + s[i] + s[i + 2:]
    return s


def _gen_entity(entity_id: int, seed: int, ru_fraction: float) -> list[dict]:
    """Generate one entity's pages from a per-entity-seeded RNG — the same
    rows regardless of which partition (or the driver) generates them."""
    rng = np.random.RandomState((seed * 1_000_003 + entity_id) % (2**31 - 1))
    is_ru = rng.rand() < ru_fraction
    vocab = _RU_VOCAB if is_ru else _EN_VOCAB
    alphabet = ("абвгдежзиклмнопрстуфхцчшэюя" if is_ru
                else "abcdefghijklmnopqrstuvwxyz")
    slug = "".join(alphabet[i] for i in rng.randint(0, len(alphabet), 10))
    words = [vocab[i] for i in rng.randint(0, len(vocab), rng.randint(2, 5))]
    pos = rng.randint(len(words) + 1)
    title = " ".join(words[:pos] + [slug] + words[pos:])
    host = slug + _TLDS[rng.randint(len(_TLDS))]
    n_pages = 1 + rng.randint(5)
    pages = []
    for p in range(n_pages):
        t = title
        if p > 0:
            # sequential random edits can compose to OSA distance 3
            # (e.g. transpose overlapping a delete — OSA forbids editing
            # a substring twice, damerau_osa.rs:30-43), so enforce the
            # ≤2 label invariant explicitly
            for _ in range(25):
                cand = title
                for _ in range(1 + rng.randint(2)):   # 1-2 edits
                    cand = _edit_once(rng, cand, alphabet)
                if osa_distance(title, cand) <= 2:
                    t = cand
                    break
            else:
                t = _edit_once(rng, title, alphabet)  # 1 edit is always ≤1
        body_words = [vocab[i] for i in rng.randint(0, len(vocab),
                                                    5 + rng.randint(30))]
        body = " ".join(body_words)
        html = (f"<html><head><title>{t}</title></head>"
                f"<body><p>{body}</p></body></html>").encode("utf-8")
        url = f"https://{host}/{'-'.join(words[:2]) or 'index'}/{p}"
        pages.append({
            "url": url,
            "warc_ts": _EPOCH + _dt.timedelta(
                seconds=(entity_id * 7 + p) * 37),
            "html": html,
            "text": extract_text_from_html(html),
            "lang": "ru" if is_ru else "en",
        })
    return pages


def synthesize_pages(n_entities: int = 300, seed: int = 42,
                     ru_fraction: float = 0.1):
    """Returns (pages_pdf, labels_pdf) as pandas frames.

    pages: url, warc_ts, html(bytes), text, lang
    labels: url_a < url_b, is_match (all same-entity pairs; non-listed
    pairs are non-matches — the truth set is complete, not sampled).
    """
    pages = []
    labels = []
    for e in range(n_entities):
        urls = []
        for page in _gen_entity(e, seed, ru_fraction):
            pages.append(page)
            urls.append(page["url"])
        for i in range(len(urls)):
            for j in range(i + 1, len(urls)):
                a, b = sorted([urls[i], urls[j]])
                labels.append({"url_a": a, "url_b": b, "is_match": True})
    pages_pdf = pd.DataFrame(pages)
    labels_pdf = pd.DataFrame(labels,
                              columns=["url_a", "url_b", "is_match"])
    return pages_pdf, labels_pdf


def synthesize_pages_spark(spark, n_entities: int, seed: int = 42,
                           ru_fraction: float = 0.1, partitions: int | None = None):
    """Distributed generator: identical rows to ``synthesize_pages`` (same
    per-entity seeding) but produced in parallel on executors — the scale
    path for large benchmark inputs.  Returns (pages_df, labels_df)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism * 2
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ])

    def gen(batches):
        for pdf in batches:
            rows = []
            for eid in pdf["id"]:
                rows.extend(_gen_entity(int(eid), seed, ru_fraction))
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    ids = spark.range(n_entities, numPartitions=partitions)
    pages = ids.mapInPandas(gen, schema)
    # complete truth pairs from same-host (slug ⇒ entity) co-membership
    hosts = pages.select("url", F.expr("split(url, '/')[2]").alias("host"))
    a = hosts.select(F.col("url").alias("url_a"), "host")
    b = hosts.select(F.col("url").alias("url_b"), "host")
    labels = (a.join(b, "host")
              .where(F.col("url_a") < F.col("url_b"))
              .select("url_a", "url_b", F.lit(True).alias("is_match")))
    return pages, labels
