"""Query registry: every implemented operator exposed as a named query.

Each submodule defines ``q_*`` functions with signature
``(spark: SparkSession, sf_dir: str) -> DataFrame`` plus an ``ORACLES``
dict mapping the same names to DuckDB-runnable ANSI SQL. Names without an
oracle entry would record ``err: no_oracle`` (the driver has no
rows-only mode), so every registered query carries one — non-replayable
results use in-plan contract-check oracles that pin booleans TRUE.

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

# Round 13 rotation: the full 38-query r7-stale cohort (text-analysis +
# sketch/temporal + sampling/packing families) is pinned to slots 1-38
# ahead of the round's new registrations; oldest-r8 re-checks fill the
# remaining slots to 50. After this round no query should be
# last-driver-checked before r8.
_ROUND_PRIORITY = [
    "q_mix_weights",  # recheck (last green r7)
    "q_pii_redaction",  # recheck (last green r7)
    "q_repetition_stats",  # recheck (last green r7)
    "q_robots_filter",  # recheck (last green r7)
    "q_text_quality",  # recheck (last green r7)
    "q_tfidf_search",  # recheck (last green r7)
    "q_token_count",  # recheck (last green r7)
    "q_token_fertility",  # recheck (last green r7)
    "q_top_terms_per_source",  # recheck (last green r7)
    "q_unigram_doc_prob",  # recheck (last green r7)
    "q_winnow_overlap_pairs",  # recheck (last green r7)
    "q_winnowing_fingerprints",  # recheck (last green r7)
    "q_array_funcs",  # recheck (last green r7)
    "q_datetime_parts",  # recheck (last green r7)
    "q_string_funcs",  # recheck (last green r7)
    "q_approx_distinct_users",  # recheck (last green r7)
    "q_approx_percentile_value",  # recheck (last green r7)
    "q_asof_purchase_attribution",  # recheck (last green r7)
    "q_cms_heavy_hitters",  # recheck (last green r7)
    "q_hll_mergeable_distinct",  # recheck (last green r7)
    "q_interval_error_click_window",  # recheck (last green r7)
    "q_moving_avg_time_range",  # recheck (last green r7)
    "q_rollup_gapfill_hourly",  # recheck (last green r7)
    "q_session_window_agg",  # recheck (last green r7)
    "q_sessionize_gap_batch",  # recheck (last green r7)
    "q_value_percentiles",  # recheck (last green r7)
    "q_curriculum_schedule",  # recheck (last green r7)
    "q_length_bucket_batches",  # recheck (last green r7)
    "q_pack_sequences",  # recheck (last green r7)
    "q_preference_pairs",  # recheck (last green r7)
    "q_sample_deterministic",  # recheck (last green r7)
    "q_source_cap",  # recheck (last green r7)
    "q_stratified_sample",  # recheck (last green r7)
    "q_token_budget_mix",  # recheck (last green r7)
    "q_train_test_split",  # recheck (last green r7)
    "q_corpus_clean_pipeline",  # recheck (last green r7)
    "q_dataset_card",  # recheck (last green r7)
    "q_quality_scorecard",  # recheck (last green r7)
    "q_adaptive_cycle",
    "q_trap_frontier",
    "q_market_share",  # recheck (last green r8)
    "q_order_priority_check",  # recheck (last green r8)
    "q_promo_revenue",  # recheck (last green r8)
    "q_returned_item_customers",  # recheck (last green r8)
    "q_rich_inactive_customers",  # recheck (last green r8)
    "q_ship_delay_priority",  # recheck (last green r8)
    "q_small_quantity_revenue",  # recheck (last green r8)
    "q_table_profile",  # recheck (last green r8)
    "q_top_revenue_supplier",  # recheck (last green r8)
    "q_volume_shipping",  # recheck (last green r8)
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
        "crawl",
    ):
        try:
            mods.append(__import__(f"{__name__}.{modname}", fromlist=[modname]))
        except ImportError:
            pass
    return mods
