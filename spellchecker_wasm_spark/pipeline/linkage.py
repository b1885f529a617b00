"""End-to-end record-linkage pipeline (the north star):

pages(url, warc_ts, html, text, lang)
  → extract text (byte-identical invariant vs the stored column)
  → title tokens (reference-quirk tokenizer, lowered, cleaned)
  → SymSpell delete-key blocking with hot-key capping        [stage blocks]
  → candidate pairs (url_a < url_b, length window, dedup)    [stage pairs]
  → vectorized banded Damerau-OSA scoring ≤ max_edit_distance [stage scored]
  → large-star/small-star connected components               [stage clusters]

Scale design notes (10^12 documents):
* every stage is a pure DataFrame plan: one shuffle for blocking counts,
  one for the pair join (AQE skew-split), one per clustering round;
* hot blocking keys (shared vocab words) are capped with logged accounting —
  recall is preserved because duplicate pages always share their
  discriminating rare-token blocks, while hot keys only produce pairs that
  either co-occur in rare blocks or score above threshold anyway;
* title strings ride along the blocking rows (~tens of bytes) to avoid two
  extra shuffle joins against a 10^12-row dimension at pair time.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions.udfs import parse_words_udf
from ..operators.blocking import build_blocks, cap_hot_blocks
from ..operators.clustering import connected_components
from ..operators.pairs import candidate_pairs
from ..operators.scoring import score_pairs
from .lineage import StageWriter
from .webpages import extract_text_from_html


@pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched application of the fixed extraction rule."""
    return html.map(lambda h: extract_text_from_html(h) if h is not None else None)


@dataclass
class LinkageConfig:
    max_edit_distance: int = 2
    prefix_length: int = 7
    max_block_size: int = 500
    max_cc_iter: int = 25
    min_token_len: int = 2
    verify_extraction: bool = True


def extract_and_tokenize(pages: DataFrame, config: LinkageConfig) -> DataFrame:
    """pages → (url, title, token) — one row per distinct title token."""
    docs = pages.select(
        "url",
        F.lower(F.substring_index(extract_text_udf(F.col("html")),
                                  "\n", 1)).alias("title"))
    toks = docs.select(
        "url", "title",
        F.explode(parse_words_udf(F.col("title"))).alias("raw_token"))
    # strip the tokenizer's leading-separator quirk for blocking purposes
    # (\p{L}: Java \w is ASCII-only and would erase non-Latin tokens)
    toks = toks.select(
        "url", "title",
        F.regexp_replace("raw_token", r"^[^\p{L}_]+", "").alias("token"))
    return (toks.where(F.length("token") >= config.min_token_len)
            .dropDuplicates(["url", "token"]))


def verify_extraction_invariant(pages: DataFrame) -> int:
    """Per-row invariant vs the reference extractor: re-derive text from
    html and count byte-level mismatches (must be 0)."""
    return (pages
            .where(extract_text_udf(F.col("html")) != F.col("text"))
            .count())


def run_linkage(spark: SparkSession, pages: DataFrame,
                config: LinkageConfig | None = None,
                writer: StageWriter | None = None) -> dict:
    config = config or LinkageConfig()
    if config.verify_extraction:
        mismatches = verify_extraction_invariant(pages)
        if mismatches:
            raise ValueError(
                f"text-extraction invariant violated on {mismatches} rows")

    tokens = extract_and_tokenize(pages, config)

    blocks = build_blocks(tokens, term_col="token",
                          max_edit_distance=config.max_edit_distance,
                          prefix_length=config.prefix_length,
                          carry_cols=("url", "title"))
    blocks = blocks.dropDuplicates(["block_key", "url"])
    capped, dropped = cap_hot_blocks(blocks, config.max_block_size)
    if writer:
        capped = writer.materialize("blocks", capped)
        dropped_rows = dropped.count()
        writer._log({"stage": "blocks", "event": "hot_keys_dropped",
                     "dropped_keys": dropped_rows})

    pairs = candidate_pairs(capped, id_col="url", term_col="title",
                            max_len_diff=config.max_edit_distance)
    scored = score_pairs(pairs, max_distance=config.max_edit_distance)
    if writer:
        scored = writer.materialize("scored_pairs", scored)

    clusters = connected_components(scored, src_col="id_a", dst_col="id_b",
                                    max_iter=config.max_cc_iter,
                                    nodes=pages.select("url"))
    if writer:
        clusters = writer.materialize("clusters", clusters)
    return {"tokens": tokens, "blocks": capped, "dropped_keys": dropped,
            "scored_pairs": scored, "clusters": clusters}


def pairwise_f1(clusters: DataFrame, labels: DataFrame) -> dict:
    """Pairwise precision/recall/F1 of cluster co-membership against the
    complete same-entity truth pairs."""
    a = clusters.select(F.col("node").alias("url_a"), "component")
    b = clusters.select(F.col("node").alias("url_b"), "component")
    pred = (a.join(b, "component")
            .where(F.col("url_a") < F.col("url_b"))
            .select("url_a", "url_b"))
    truth = labels.where(F.col("is_match")).select("url_a", "url_b")
    n_pred = pred.count()
    n_truth = truth.count()
    n_hit = pred.join(truth, ["url_a", "url_b"]).count()
    precision = n_hit / n_pred if n_pred else 1.0
    recall = n_hit / n_truth if n_truth else 1.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {"precision": precision, "recall": recall, "f1": f1,
            "predicted_pairs": n_pred, "truth_pairs": n_truth,
            "matched_pairs": n_hit}
