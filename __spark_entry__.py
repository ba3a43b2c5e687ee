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
# Round 2 verified the 50 longest-registered names (CORRECTNESS_r02:
# 50/50 green); this priority list rotates the window so round 3
# covers the queries that have never had a driver correctness row —
# the LLM-pipeline family, sketches, mergeable rollups,
# pivot/unpivot/grouping-sets, temporal LOCF, TPC-H Q2/Q3/Q6/Q9/Q11/
# Q12/Q20, profiling, layout, and curation. Five mid-stage entries
# (minhash_signatures, simhash_fingerprints, fingerprints,
# token_counts, ann_brute_force) ceded their slots to the round-3
# end-to-end queries that subsume them (curation_funnel,
# repetition_ratio, sharded_term_lookup, time_weighted_avg,
# wav_roundtrip, media_roundtrip); the ceded ones stay registered and
# locally oracle-checked (tools/check.py runs ALL entries).
_PRIORITY: list[str] = [
    # LLM-data-pipeline family (queries_llm.py) — 29 entries
    "dedup_exact", "curation_funnel", "minhash_lsh_pairs",
    "minhash_estimate", "near_dedup_kept", "repetition_ratio",
    "simhash_near_pairs", "ngram_jaccard", "wav_roundtrip",
    "ann_ivf", "embedding_near_dup", "lang_id", "quality_scores",
    "time_weighted_avg", "sharded_term_lookup", "media_roundtrip",
    "stratified_mix", "incremental_dedup", "pii_redaction",
    "contamination", "sequence_packing", "dedup_components",
    "edit_distance_verify", "tfidf_top_terms", "inverted_index",
    "temperature_mix", "ann_ivf_recall", "kfold_assignment",
    "multi_signal_components",
    # Sketches + incremental rollup maintenance
    "sketch_distinct_users", "sketch_median_value",
    "incremental_rollup", "sketch_rollup_distinct",
    # Grouping-set family beyond rollup/cube (those are r02-green)
    "pivot_event_matrix", "unpivot_measures", "grouping_sets_revenue",
    # Temporal LOCF + curation + layout + scale-safe ntile
    "reservoir_per_lang", "daily_locf_snapshot", "zorder_codes",
    "decile_histogram", "winsorized_values",
    # TPC-H shapes with no driver row yet
    "q3_shipping_priority", "q6_forecast_revenue", "q12_priority_lines",
    "q2_min_cost_supplier", "q9_product_profit", "q11_important_stock",
    "q20_excess_stock_suppliers",
    # Profiling
    "json_props_stats", "profile_customer",
    # --- slot 50+: next-in-line if the driver window ever widens ---
    # (near-duplicates of r02-green window/stats shapes, so cut when
    # the unverified set had 53 candidates for 50 slots)
    "trailing_hour_sum", "regression_price_qty", "price_quantity_stats",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return _q.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def _ordered(src: dict) -> dict:
    missing = [n for n in _PRIORITY if n not in src]
    assert not missing, f"priority names absent from registry: {missing}"
    out = {n: src[n] for n in _PRIORITY}
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
