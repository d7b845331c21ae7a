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


# The round driver checks at most ~50 queries per round, in registry
# (dict insertion) order. Names not in _ROUND_PRIORITY keep module order
# after it. (The generated ledger at the end of COVERAGE.md is the
# authoritative per-query verification status; regenerate with
# tools/gen_coverage_ledger.py. Regenerate this list each round with
# tools/gen_round_priority.py.)
# ROUND-7 ROTATION (installed from tools/gen_round_priority.py output):
# 244 registered; 12 unverified; window 50 → 50 slots. Slot 1 is
# q_bm25_topk_logidf (now carrying its contract-check oracle — closes
# the registry's only never-green row); slots 2-12 are the round-7
# additions (bigram backoff, fertility, winnowing + overlap, WARC,
# robots, crawl frontier, Kneser-Ney, curriculum, preference pairs,
# dataset card);
# the rest are oldest-first
# regression re-checks of the stale r2/r3 greens. Re-run + reinstall
# after every query addition.
_ROUND_PRIORITY = [
    "q_bm25_topk_logidf",
    "q_bigram_backoff_quality",
    "q_token_fertility",
    "q_winnowing_fingerprints",
    "q_warc_extract",
    "q_winnow_overlap_pairs",
    "q_robots_filter",
    "q_crawl_frontier",
    "q_kneser_ney_quality",
    "q_curriculum_schedule",
    "q_preference_pairs",
    "q_dataset_card",
    "q_gopher_quality",  # recheck (last green r2)
    "q_lang_id",  # recheck (last green r2)
    "q_mix_weights",  # recheck (last green r2)
    "q_pii_redaction",  # recheck (last green r2)
    "q_repetition_stats",  # recheck (last green r2)
    "q_text_quality",  # recheck (last green r2)
    "q_tfidf_search",  # recheck (last green r2)
    "q_token_count",  # recheck (last green r2)
    "q_top_terms_per_source",  # recheck (last green r2)
    "q_unigram_doc_prob",  # recheck (last green r2)
    "q_array_funcs",  # recheck (last green r2)
    "q_datetime_parts",  # recheck (last green r2)
    "q_string_funcs",  # recheck (last green r2)
    "q_approx_distinct_users",  # recheck (last green r2)
    "q_approx_percentile_value",  # recheck (last green r2)
    "q_asof_purchase_attribution",  # recheck (last green r2)
    "q_cms_heavy_hitters",  # recheck (last green r2)
    "q_hll_mergeable_distinct",  # recheck (last green r2)
    "q_interval_error_click_window",  # recheck (last green r2)
    "q_moving_avg_time_range",  # recheck (last green r2)
    "q_rollup_gapfill_hourly",  # recheck (last green r2)
    "q_session_window_agg",  # recheck (last green r2)
    "q_sessionize_gap_batch",  # recheck (last green r2)
    "q_value_percentiles",  # recheck (last green r2)
    "q_length_bucket_batches",  # recheck (last green r2)
    "q_pack_sequences",  # recheck (last green r2)
    "q_sample_deterministic",  # recheck (last green r2)
    "q_source_cap",  # recheck (last green r2)
    "q_stratified_sample",  # recheck (last green r2)
    "q_token_budget_mix",  # recheck (last green r2)
    "q_train_test_split",  # recheck (last green r2)
    "q_corpus_clean_pipeline",  # recheck (last green r2)
    "q_quality_scorecard",  # recheck (last green r2)
    "q_constraint_checks",  # recheck (last green r3)
    "q_disjunctive_filter_revenue",  # recheck (last green r3)
    "q_grouping_sets",  # recheck (last green r3)
    "q_large_orders",  # recheck (last green r3)
    "q_last_ship_supplier",  # recheck (last green r3)
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
