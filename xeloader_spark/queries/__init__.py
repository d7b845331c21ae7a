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
# ROUND-10 ROTATION (tools/gen_round_priority.py 50 4 — the new
# drain-first mode, VERDICT r9 #1): the 20 r4-stale re-checks are
# PINNED to slots 1-20 ahead of the round's 4 new registrations, so a
# third displacement is structurally impossible; oldest-r5 re-checks
# fill the rest. 273 registered at install.
_ROUND_PRIORITY = [
    "q_exact_median_twopass",  # recheck (last green r4)
    "q_hist_quantile_sketch",  # recheck (last green r4)
    "q_hll_distinct_users",  # recheck (last green r4)
    "q_hll_intersection",  # recheck (last green r4)
    "q_hopping_window_agg",  # recheck (last green r4)
    "q_hourly_autocorrelation",  # recheck (last green r4)
    "q_incremental_rollup",  # recheck (last green r4)
    "q_interarrival_stats",  # recheck (last green r4)
    "q_iqr_outliers",  # recheck (last green r4)
    "q_join_key_skew",  # recheck (last green r4)
    "q_join_size_sketch",  # recheck (last green r4)
    "q_json_payload_stats",  # recheck (last green r4)
    "q_markov_transitions",  # recheck (last green r4)
    "q_rollup_hierarchy",  # recheck (last green r4)
    "q_scd2_history",  # recheck (last green r4)
    "q_scd2_pointintime",  # recheck (last green r4)
    "q_series_correlation",  # recheck (last green r4)
    "q_user_lifetime",  # recheck (last green r4)
    "q_weekly_profile",  # recheck (last green r4)
    "q_classifier_calibration",  # recheck (last green r4)
    "q_fetch_schedule",
    "q_sitemap_index",
    "q_phrase_index_contract",
    "q_discovery_pipeline",
    "q_event_sequence_order",  # recheck (last green r5)
    "q_event_type_filter_project",  # recheck (last green r5)
    "q_hash_match_join",  # recheck (last green r5)
    "q_lineage_join",  # recheck (last green r5)
    "q_local_time_report",  # recheck (last green r5)
    "q_time_bucket_agg",  # recheck (last green r5)
    "q_topk_heavy_hitters",  # recheck (last green r5)
    "q_truncation_audit",  # recheck (last green r5)
    "q_bloom_join_prune",  # recheck (last green r5)
    "q_correlated_subquery",  # recheck (last green r5)
    "q_cross_join_small",  # recheck (last green r5)
    "q_cube_agg",  # recheck (last green r5)
    "q_distinct_agg",  # recheck (last green r5)
    "q_exists_semi_join",  # recheck (last green r5)
    "q_frequent_pairs",  # recheck (last green r5)
    "q_having_filter",  # recheck (last green r5)
    "q_not_exists_anti_join",  # recheck (last green r5)
    "q_order_count_histogram",  # recheck (last green r5)
    "q_outer_join_coverage",  # recheck (last green r5)
    "q_pivot_segments",  # recheck (last green r5)
    "q_pricing_summary",  # recheck (last green r5)
    "q_region_revenue",  # recheck (last green r5)
    "q_rollup_agg",  # recheck (last green r5)
    "q_cross_source_contamination",  # recheck (last green r5)
    "q_incremental_neardup",  # recheck (last green r5)
    "q_jaccard_threshold_curve",  # recheck (last green r5)
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
