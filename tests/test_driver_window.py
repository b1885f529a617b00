"""Pins the two round-3 driver-signal contracts (VERDICT r3 #1/#2).

1. CATALOG insertion order: the round driver records a CORRECTNESS row
   for only the first ~50 entries (r3 walked exactly indices 0-49), so
   every SURVEY §2 operator, the dedup/ANN/curation headliners, and
   everything touched this round must sit inside the first 50
   positions.
2. bench.py's stdout line: the driver captures only the last ~2,000
   chars of stdout; the printed summary must stay under 1.5 KB no
   matter how large the catalog grows (r3's full-catalog line did not,
   and BENCH_r03.json recorded `parsed: null`).
"""

from __future__ import annotations

import json

from spellchecker_wasm_spark.queries import CATALOG

import bench

# operators the driver MUST certify each round: the reference's two
# public APIs (lookup + lookup_compound/word_segmentation families,
# /root/reference/src/spellchecker_wasm.rs:34-69), the offline builder,
# the distance kernels, and the LLM-pipeline headliners.
_REQUIRED_IN_WINDOW = {
    # §2.1/§2.2 dictionary + tokenizer + blocking
    "word_counts", "bigram_counts", "parse_words_tokens",
    "blocking_keys", "candidate_pairs", "candidate_pairs_prefilter",
    # §2.5 verbosities + flags
    "lookup_closest", "lookup_top", "lookup_all",
    "lookup_closest_self", "lookup_top_unknown",
    # §2.8 compound / segmentation + offline builder
    "compound_known", "compound_split", "compound_merge",
    "compound_correct", "word_segmentation", "dictionary_export",
    # §2.6 distance kernels
    "scored_pairs_osa", "scored_pairs_lev", "scored_pairs_similarity",
    "scored_pairs_similarity2", "scored_pairs_monge_elkan",
    "scored_pairs_soft_tfidf", "scored_pairs_affine_gap",
    # linkage flagship + §2.9 incremental/streaming (r3 verdict #8:
    # 2+ batch-equivalence stream rows must carry driver rows)
    "term_clusters", "linkage_f1", "linkage_cluster_f1",
    "incremental_linkage", "stream_incremental_linkage",
    "stream_dedup_exact", "stream_event_sessions",
    # blocking families (new-in-round rows must carry a driver row)
    "canopy_blocking", "suffix_blocking",
    # dedup suite (minhash_signatures demoted to the tail in r4,
    # simhash demoted in r5 — both intermediate-artifact rows whose
    # consumer rows keep their seats — to make room for the exact
    # prefix-filter join and the r5 LSH-vs-exact recall head-to-head)
    "dedup_exact", "dedup_ngram_jaccard", "dedup_prefix_jaccard",
    "graph_triangles", "minhash_lsh_dups", "dedup_lsh_clusters",
    "lsh_recall_vs_exact", "simhash_dups",
    # embeddings / ANN / clustering / curation (embedding_knn demoted
    # to the tail in r4 — stable exact-kNN baseline with an r2 driver
    # row — to make room for scored_pairs_affine_gap)
    "dedup_embedding", "dedup_embedding_lsh",
    # ann_rrf_fusion demoted to the tail in r4 (fusion convenience over
    # two ANN paths that both keep their own window rows) to make room
    # for suffix_blocking
    "ann_lsh_buckets", "ann_topk_lsh", "ann_ivf_topk",
    # purity_quality demoted to the tail in r4 to make room for
    # scored_pairs_soft_tfidf: its metric siblings (bcubed_quality,
    # ari_quality) are sweep-certified tail rows already
    "kmeans_lloyd", "semdedup",
}

_WINDOW = 50


def test_required_operators_inside_driver_window():
    window = set(list(CATALOG)[:_WINDOW])
    missing = sorted(_REQUIRED_IN_WINDOW - window)
    assert not missing, (
        f"driver CORRECTNESS window (first {_WINDOW} CATALOG entries) "
        f"is missing required operators: {missing}")


def test_headline_subset_exists_in_catalog():
    for name in bench._HEADLINE_QUERIES:
        if name == "linkage_pipeline":  # synthesized by bench, not CATALOG
            continue
        assert name in CATALOG, name


def test_bench_stdout_line_fits_driver_tail_capture():
    # worst-case record: every catalog entry timed, long float reprs
    out = {
        "metric": "headline_queries_total_wall",
        "value": 12345.678,
        "unit": "sec",
        "queries": {name: 123.456 for name in CATALOG} | {
            "linkage_pipeline": 99.999},
        "sf": "sf0.1",
        "cpus": 32,
        "pipeline": {
            "entities": 6000, "pages": 18101, "candidate_pairs": 207683,
            "scored_pairs": 15854, "f1": 1.0, "gen_sec": 8.736,
            "block_sec": 10.805, "score_sec": 1.695, "cluster_sec": 2.592,
            "total_sec": 15.092, "pairs_scored_per_sec": 122499.0,
            "cpu_core_sec": {"block": 153.1, "score": 29.2,
                             "cluster": 36.3, "total": 218.5}},
        "candidate_pairs_scored_per_sec": 122499.0,
        "host": {"loadavg_start": 3.95, "loadavg_end": 7.35,
                 "wall_sec": 329.1, "tree_cpu_core_sec": 1991.5,
                 "tree_cpu_per_wall": 6.05},
    }
    line = bench.compact_summary_line(
        out, "BENCH/bench_full_sf0.1_r4_window1.json")
    assert len(line) <= 1500, len(line)
    parsed = json.loads(line)  # one valid JSON object
    assert parsed["metric"] == "headline_queries_total_wall"
    assert parsed["value"] == 12345.678
    assert parsed["n_queries"] == len(out["queries"])
    assert parsed["queries"]  # headline subset survived the size guard
    assert parsed["pipeline"]["f1"] == 1.0
