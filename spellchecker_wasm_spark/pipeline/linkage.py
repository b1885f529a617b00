"""End-to-end record-linkage pipeline (the north star):

pages(url, warc_ts, html, text, lang)
  → extract text (byte-identical invariant vs the stored column)
  → title tokens (reference-quirk tokenizer, lowered, cleaned)
  → SymSpell delete-key blocking with hot-key capping        [stage blocks]
  → candidate pairs (url_a < url_b, length window, dedup)    [stage pairs]
  → vectorized banded Damerau-OSA scoring ≤ max_edit_distance [stage scored]
  → large-star/small-star connected components               [stage clusters]

Scale design notes (10^12 documents):
* every stage is a pure DataFrame plan: one vocabulary-level shuffle for
  hot-key weights, one for the pair join (AQE skew-split), one per
  distributed clustering round;
* hot blocking keys (shared vocab words) are capped with logged accounting —
  recall is preserved because duplicate pages always share their
  discriminating rare-token blocks, while hot keys only produce pairs that
  either co-occur in rare blocks or score above threshold anyway;
* the only persisted state is (id, title) — ~60 bytes/page — and the
  capped key explode; blocking keys are 64-bit hashes, pair rows are bare
  long ids with an int length, and title payloads re-attach post-dedup
  from the slim dimension.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions.delete_expr import delete_keys_array, delete_keys_of_prefix
from ..functions.delete_hash_expr import delete_key_hash_explode
from ..functions.text_expr import title_expr, title_tokens_array
from ..functions.udfs import parse_words_udf
from ..operators.clustering import connected_components
from ..operators.pairs import candidate_pairs
from ..operators.scoring import score_pairs
from .lineage import StageWriter
from .webpages import extract_text_from_html


@pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched application of the fixed extraction rule."""
    return html.map(lambda h: extract_text_from_html(h) if h is not None else None)


def title_prefixes_array(title, config: "LinkageConfig"):
    """Column: array<string> of distinct blocking-token prefixes."""
    toks = title_tokens_array(title, config.min_token_len)
    return F.array_distinct(F.transform(
        toks, lambda t: F.substring(t, 1, config.prefix_length)))


def title_block_keys(title, config: "LinkageConfig"):
    """Column: array<string> of deduplicated blocking keys of a title
    (tokenize → prefix-truncate → combinatorial delete masks)."""
    toks = title_tokens_array(title, config.min_token_len)
    if config.prefix_length > config.max_edit_distance:
        prefixes = F.array_distinct(F.transform(
            toks, lambda t: F.substring(t, 1, config.prefix_length)))
        return F.array_distinct(F.flatten(F.transform(
            prefixes,
            lambda p: delete_keys_of_prefix(p, config.max_edit_distance,
                                            config.prefix_length))))
    return F.array_distinct(F.flatten(F.transform(
        toks, lambda t: delete_keys_array(t, config.max_edit_distance,
                                          config.prefix_length))))


def pages_to_blocks(pages: DataFrame, config: "LinkageConfig") -> DataFrame:
    """Fused extract→tokenize→delete-keys pass as ONE Catalyst projection:
    pages(url, html) → (url, title, block_key), no Python anywhere.

    The round-1 version was a mapInPandas pass (kept below as
    ``pages_to_blocks_python``, the parity reference); profiling attributed
    22.5s of the 26.3s sf0.1 pipeline to its per-row token/delete loops.
    Here the whole stage is JVM expressions — regex extraction
    (text_expr.title_expr), separator-class tokenization
    (title_tokens_array), and the ≤28-position-mask combinatorial delete
    family (delete_expr.delete_keys_array) folded over the token array —
    so the scan stays inside whole-stage codegen with zero exchanges: the
    first shuffle of the pipeline is the blocking-count aggregation.
    Per-page keys are deduplicated with array_distinct *before* explode,
    matching the Python pass's per-page key set.
    """
    title = title_expr(F.col("html"))
    keys = title_block_keys(F.col("title"), config)
    return (pages
            .where(F.col("html").isNotNull())
            .select("url", title.alias("title"))
            .select("url", "title", F.explode(keys).alias("block_key")))


def pages_to_block_hashes(pdim: DataFrame,
                          config: "LinkageConfig") -> DataFrame:
    """pdim(id, title) → (page_id, tl, block_key:long) — the blocking
    explode emitting 64-bit key HASHES directly (functions/
    delete_hash_expr), never materializing key strings.

    Physical shape: Generate(explode(prefixes)) → Project(per-position
    codepoints) → Generate(explode(mask-hash array)) — every expression
    whole-stage-codegen'd, no higher-order function in the fan-out path
    (the per-page prefix array is vocabulary-small; the ~29× key fan-out
    is where interpretation hurt).  Measured 1.56× over the round-2
    string+xxhash64 shape on the 600k-page explode (scripts/exp_keygen.py:
    7.69s → 4.94s at 8 pinned cores), with zero string allocation.

    Deviation from the string path: per-page cross-PREFIX duplicate keys
    (two distinct title prefixes sharing a delete variant) are no longer
    deduplicated before the join — ~0.2% extra rows on the protocol input
    — because recovering the per-page distinct would cost a 47M-row
    aggregate for join input the pair-stage ``distinct()`` already
    absorbs.  Hot-key weights count such pages twice, matching the
    vocabulary path's documented upper-bound semantics (hot_keys_vocab).
    """
    if config.prefix_length > config.max_edit_distance:
        pref = pdim.select(
            F.col("id").alias("page_id"), F.length("title").alias("tl"),
            F.explode(title_prefixes_array(F.col("title"), config))
            .alias("prefix"))
        return delete_key_hash_explode(
            pref, "prefix", config.max_edit_distance, config.prefix_length,
            keep_cols=["page_id", "tl"])
    # exotic P <= d configs: the empty-key rule reads the UNTRUNCATED token
    # length, so explode whole tokens through the general string generator
    # + xxhash64 (delete_key_hash_explode requires P > d)
    toks = pdim.select(
        F.col("id").alias("page_id"), F.length("title").alias("tl"),
        F.explode(title_tokens_array(F.col("title"), config.min_token_len))
        .alias("tok"))
    return (toks.select(
        "page_id", "tl",
        F.explode(delete_keys_array(F.col("tok"),
                                    config.max_edit_distance,
                                    config.prefix_length)).alias("k"))
        .select("page_id", "tl", F.xxhash64("k").alias("block_key")))


def hot_keys_vocab(toks: DataFrame, config: "LinkageConfig") -> DataFrame:
    """Hot blocking keys computed at the VOCABULARY level: page-weighted
    key weight = Σ over posting prefixes of that prefix's page count, at
    ~1/3 the rows of the page-level explode (distinct prefixes × fan-out
    instead of pages × fan-out) and without materializing or re-scanning
    that explode at all.  Returns (block_key:long) hot-key rows.

    The weight is an UPPER BOUND on the page-level posting size
    cap_hot_blocks counts, not always equal to it: a page whose title
    holds two distinct prefixes that share a delete key contributes twice
    here but once there.  For a hot-key CAP the bound errs exactly the
    right way — a key can only be dropped slightly *before* its true
    posting size crosses the threshold, never kept past it, so candidate
    recall loss is bounded by the flat path's own cap.  (Exact distinct
    page counts would need the (page, key) explode back — the cost this
    path exists to avoid; the flat/vocab equivalence test in
    tests/test_pipeline_linkage.py holds on fixtures where no shared-key
    collision straddles the cap boundary, the common case by far.)

    ``toks``: (…, prefix) one row per distinct (page, prefix).
    """
    pc = toks.groupBy("prefix").agg(F.count(F.lit(1)).alias("n_pages"))
    vkeys = delete_key_hash_explode(
        pc, "prefix", config.max_edit_distance, config.prefix_length,
        keep_cols=["n_pages"])
    return (vkeys.groupBy("block_key")
            .agg(F.sum("n_pages").alias("weight"))
            .where(F.col("weight") > config.max_block_size)
            .select("block_key", "weight"))


def pages_to_prefixes(pages: DataFrame, config: "LinkageConfig") -> DataFrame:
    """pages(url, html) → (url, title, prefix) — one row per distinct
    blocking-token PREFIX of a page, pure Catalyst.

    Feeds the two-level blocking (operators.pairs.candidate_pairs_prefix):
    delete keys are generated from the VOCABULARY of these prefixes, not
    per page.  keys(token) == keys(prefix(token)) always — the generator
    prefix-truncates internally and its empty-key rule only fires at
    lengths ≤ max_edit_distance where prefix == token — so pairing
    prefixes is exactly pairing tokens (asserted in
    tests/test_pipeline_linkage.py against the flat path).
    """
    title = title_expr(F.col("html"))
    prefixes = title_prefixes_array(F.col("title"), config)
    return (pages
            .where(F.col("html").isNotNull())
            .select("url", title.alias("title"))
            .select("url", "title", F.explode(prefixes).alias("prefix")))


_DELETE_MEMO: dict[str, list[str]] = {}


def pages_to_blocks_python(pages: DataFrame, config: "LinkageConfig") -> DataFrame:
    """Round-1 fused mapInPandas pass — retained as the Python parity
    reference for pages_to_blocks (tests assert set-equality); superseded
    in the hot path by the pure-Catalyst version above."""
    import pandas as _pd

    from ..kernels.deletes import generate_deletes
    from ..kernels.text import parse_words

    med = config.max_edit_distance
    plen = config.prefix_length
    min_len = config.min_token_len
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("block_key", T.StringType()),
    ])

    # keys fan out ~100-150× per page, so an input batch must be processed
    # in small chunks and yielded incrementally — otherwise every worker
    # builds a multi-million-row pandas frame at once and N workers × that
    # spike thrashes memory (measured 5× slowdown at 32 workers)
    chunk_rows = 512

    def fn(batches):
        memo = _DELETE_MEMO
        for pdf in batches:
            for lo in range(0, len(pdf), chunk_rows):
                chunk = pdf.iloc[lo:lo + chunk_rows]
                urls, titles, keys = [], [], []
                for url, html in zip(chunk["url"], chunk["html"]):
                    if html is None:
                        continue
                    title = extract_text_from_html(bytes(html)).split("\n", 1)[0].lower()
                    toks = set()
                    for tok in parse_words(title):
                        # leading-separator strip == regexp ^[^\p{L}_]+ in
                        # the staged path (equivalence is tested)
                        while tok and not (tok[0].isalpha() or tok[0] == "_"):
                            tok = tok[1:]
                        if len(tok) >= min_len:
                            toks.add(tok)
                    page_keys = set()
                    for tok in toks:
                        k = memo.get(tok)
                        if k is None:
                            k = sorted(generate_deletes(tok, med, plen))
                            if len(memo) < 2_000_000:
                                memo[tok] = k
                        page_keys.update(k)
                    urls.extend([url] * len(page_keys))
                    titles.extend([title] * len(page_keys))
                    keys.extend(page_keys)
                yield _pd.DataFrame({"url": urls, "title": titles,
                                     "block_key": keys})

    return pages.select("url", "html").mapInPandas(fn, schema)


@dataclass
class LinkageConfig:
    max_edit_distance: int = 2
    prefix_length: int = 7
    max_block_size: int = 500
    max_cc_iter: int = 25
    min_token_len: int = 2
    verify_extraction: bool = True
    # apply the lossless 2d-banded Levenshtein verification BEFORE pair
    # dedup (operators.pairs.candidate_pairs prefilter_band docstring):
    # shrinks the dedup exchange ~20× but pays the verification DP per
    # EMITTED pair (per shared key) — measured a net 1.3× end-to-end LOSS
    # on this workload, so off by default; see the docstring for when it
    # wins.  Requires the (id, title) dim to be broadcastable.
    prefilter_before_dedup: bool = False


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

    # dictionary-encode pages to 64-bit ids: the quadratic pair stream and
    # every clustering round then shuffle (long, long) rows instead of url-
    # string pairs (~5× less shuffle volume).  xxhash64 collisions are
    # ~zero here and ~10^-2 expected count even at 10^12 urls (a collision
    # merges two pages — bounded F1 impact); swap for an id-table join if
    # exactness is required.
    # blocks carry (id:long, key_hash:long, len:int) only — keys are
    # 64-bit-hashed (a hash collision merely adds one spurious candidate
    # that scoring rejects; recall is unaffected) and the title payload
    # never rides the ~80×-fan-out explode or the pair-join shuffles; it
    # is re-attached post-dedup from the pages-derived dimension below.
    # (candidate_pairs_prefix, the vocabulary-level two-level variant, is
    # equivalence-tested and preferable when the token vocabulary is far
    # smaller than the corpus; this synthetic workload's unique per-entity
    # slugs make vocab ≈ corpus, where the flat explode measures faster.)
    # ONE persisted slim dimension (id, title) — ~60 bytes/page — feeds
    # every downstream pass: the html-regex extraction runs exactly once;
    # the ~80×-fan-out key explode is NEVER materialized — each pair-join
    # side re-derives it from the cached titles in whole-stage codegen
    # (CPU work that scales with cores, unlike a memory/disk-bound persist
    # of the exploded table), filtered inline by a broadcast anti-join
    # against vocabulary-derived hot keys.
    pdim = (pages.where(F.col("html").isNotNull())
            .select(F.xxhash64("url").alias("id"),
                    title_expr(F.col("html")).alias("title"))
            .persist())
    blocks = pages_to_block_hashes(pdim, config)
    toks = pdim.select(F.explode(
        title_prefixes_array(F.col("title"), config)).alias("prefix"))
    dropped = hot_keys_vocab(toks, config)
    # persist only the CAPPED explode (hot keys carry most of the raw
    # volume), materialized once for both pair-join sides — and persist it
    # ALREADY PARTITIONED by block_key: the one repartition exchange here
    # replaces the two exchanges the self-join would otherwise perform
    # (both sides read the same cached partitioning), and with the
    # shuffle_hash build hint the pair join runs with zero sorts and zero
    # further shuffles (measured 59.6s → 36.9s block+pair at 8 pinned
    # cores on the 600k-page protocol input)
    capped = (blocks.join(F.broadcast(dropped.select("block_key")),
                          "block_key", "left_anti")
              .repartition(F.col("block_key"))
              .persist())
    if writer:
        capped = writer.materialize("blocks", capped)
        writer._log({"stage": "blocks", "event": "hot_keys_dropped",
                     "dropped_keys": dropped.count()})

    dim = pdim.select("id", F.col("title").alias("term"))
    band = (2 * config.max_edit_distance
            if config.prefilter_before_dedup else None)
    pairs = candidate_pairs(capped, id_col="page_id",
                            max_len_diff=config.max_edit_distance, dim=dim,
                            len_col="tl", prefilter_band=band)
    scored = score_pairs(pairs, max_distance=config.max_edit_distance,
                         jvm_prefilter=band is None)
    if writer:
        scored = writer.materialize("scored_pairs", scored)

    ids = connected_components(scored, src_col="id_a", dst_col="id_b",
                               max_iter=config.max_cc_iter,
                               nodes=pages.select(F.xxhash64("url")
                                                  .alias("page_id")))
    clusters = (ids.join(pages.select(F.xxhash64("url").alias("node"),
                                      "url"), "node")
                .select(F.col("url").alias("node"), "component"))
    if writer:
        clusters = writer.materialize("clusters", clusters)
    return {"blocks": capped, "dropped_keys": dropped,
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
