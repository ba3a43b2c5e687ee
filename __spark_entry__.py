"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in hadoop_distributed_dynamic_file_system_spark/;
this module is the thin driver-facing shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_distributed_dynamic_file_system_spark import queries as _q  # noqa: E402
from hadoop_distributed_dynamic_file_system_spark import queries_llm as _qllm  # noqa: E402,F401

# The round driver's oracle checks the FIRST 50 entries of queries().
# ROTATION INVARIANT: there are more registered queries (161) than
# window slots (50), so the window is rebuilt each round by STALENESS —
# never-driver-checked queries first, then any query that was ever
# driver-red until it re-earns green, then oldest-last-green (ties
# alphabetical). 50 slots x 4 rounds >= 161, so every registered query
# gets a fresh driver row at least every FOUR rounds (K=4 as the
# registry grows); tools/check.py still runs ALL entries locally every
# round at sf0.01 AND sf0.1. Regenerate the list below from the
# CORRECTNESS_r*.json union when rotating.
#
# Round-5 window: slot 1 = bpe_pair_counts (r4's only red cell — a
# DuckDB-HUGEINT oracle bug, CAST fix in queries_llm.py; must re-earn
# green), slots 2-37 = the thirty-six queries NEW this round (web-quality
# family, span dedup, classifier, bigram LM, leakage-safe splits, the
# end-to-end curation pipeline, image aHash, audio fingerprint, video
# metadata, WARC crawl ingestion incl. per-record gzip members,
# relational BPE encode, token-window chunking, BM25 retrieval,
# PageRank, Unicode NFC normalization, Kneser–Ney LM, char entropy,
# OOV rate, JL projection, n-gram containment, int8 quantization +
# asymmetric quantized ANN, deterministic training-order shuffle,
# script/charset profile, LSH recall/precision report,
# normalize-then-dedup composition, the crawl-to-chunks
# flagship pipeline, IVF over int8 lists, weighted PageRank —
# never driver-checked), the rest = the stalest (r1/r2-checked,
# alphabetical within a round). The nineteen names pushed past slot
# 50 (kv_parse/md5_filter/multi_input_union/percent_filter/pipe_translate/point_lookup/q10/q13/q14/q15/q16/q17/q19/q22/q4/q5/q7/q8/sort_key_spec) and
# the remaining r3-checked queries are due in the round-6 window.
_PRIORITY: list[str] = [
    "bpe_pair_counts",
    "gopher_quality_flags", "dup_line_stats", "top_bigram_char_frac",
    "dup_5gram_char_frac", "c4_line_filter", "line_dedup_corpus",
    "dsir_importance_scores", "span_dedup_cleaned",
    "classifier_source_recovery", "bigram_lm_scores",
    "leakage_safe_splits", "web_curation_pipeline",
    "image_ahash_roundtrip", "audio_fingerprint_roundtrip",
    "video_metadata_roundtrip", "warc_url_extract",
    "bpe_encode_tokens",
    "warc_gzip_members", "doc_chunks", "bm25_retrieval", "link_graph_rank",
    "normalized_corpus", "kn_bigram_lm_scores",
    "char_entropy_scores", "oov_rate_top_vocab", "jl_projection",
    "ngram_containment", "int8_quantized_embeddings", "ann_int8_topk",
    "training_order_shuffle", "script_profile", "lsh_recall_report",
    "normalized_dedup", "crawl_to_chunks_pipeline", "ann_ivf_int8",
    "link_graph_rank_weighted",
    "ann_brute_force", "fingerprints",
    "minhash_signatures", "multimodal_decode", "simhash_fingerprints",
    "token_counts", "bad_records_skip", "crash_skip",
    "cube_revenue", "histogram_detail", "interval_window_count",
    "join_expr_inner", "join_expr_override", "kv_parse",
    "md5_filter", "multi_input_union", "percent_filter",
    "pipe_translate", "point_lookup", "q10_returned_items",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_variety", "q17_small_qty_revenue", "q19_discounted_revenue",
    "q22_dormant_customers", "q4_order_priority", "q5_local_supplier",
    "q7_volume_shipping", "q8_market_share", "sort_key_spec",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return _q.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def _ordered(src: dict) -> dict:
    # Priority names not (yet) registered are skipped rather than
    # fatal: the oracle dict legitimately lacks non-SQL-expressible
    # entries, and a name may land in _PRIORITY a commit before its
    # implementation. tests/test_entry.py pins that queries() itself
    # has no such gaps at release time.
    out = {n: src[n] for n in _PRIORITY if n in src}
    out.update((n, v) for n, v in src.items() if n not in out)
    return out


def _releasing(fn: Callable) -> Callable:
    """Release the PREVIOUS query's engine-internal persists on entry.

    The driver runs all 50 checked queries in one SparkSession and never
    calls our hygiene hooks; by the time query N+1 is constructed, query
    N's result has been collected, so its tracked persists are dead
    weight (round 2 measured ~2× uniform inflation from exactly this
    accumulation). Releasing at construction time of the next query is
    safe — nothing tracked is still referenced by an un-acted plan."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from hadoop_distributed_dynamic_file_system_spark import cache

        cache.release_all()
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: _releasing(f) for n, f in _ordered(dict(_q.QUERIES)).items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column aliases)."""
    return _ordered(dict(_q.ORACLE))
