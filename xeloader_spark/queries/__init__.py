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
# (dict insertion) order. Names not in _ROUND_PRIORITY keep module order
# after it. (The generated ledger at the end of COVERAGE.md is the
# authoritative per-query verification status; regenerate with
# tools/gen_coverage_ledger.py. Regenerate this list each round with
# tools/gen_round_priority.py.)
# ROUND-5 ROTATION (installed from tools/gen_round_priority.py output):
# 228 registered; 29 unverified; window 50 → 50 slots (0 unverified beyond the window)
# slots 1-19 drain the round-4 backlog (every query's first driver row);
# slots 20-50 re-check the oldest r1 greens per the tool's oldest-first
# ordering. Registry freeze: keep any round-5 additions within the
# headroom the tool reports (currently 0 unverified beyond the window).
_ROUND_PRIORITY = [
    "q_cross_source_contamination",
    "q_incremental_neardup",
    "q_jaccard_threshold_curve",
    "q_snm_multipass",
    "q_snm_recall_eval",
    "q_sorted_neighborhood_pairs",
    "q_degree_distribution",
    "q_kcenter_diverse_sample",
    "q_kcore_membership",
    "q_label_separation",
    "q_matryoshka_recall",
    "q_dsir_resample",
    "q_k_anonymity",
    "q_vocab_coverage",
    "q_ab_test_zscore",
    "q_ewma_smooth",
    "q_seasonal_anomaly",
    "q_type_duration_percentiles",
    "q_packing_boundary_stats",
    "q_blocklist_filter",
    "q_ann_topk_ivfpq",
    "q_bm25_topk",
    "q_bloom_join_prune",
    "q_frequent_pairs",
    "q_url_canonicalize",
    "q_modularity_score",
    "q_mmr_rerank",
    "q_leakage_safe_split",
    "q_bm25_passages",
    "q_event_sequence_order",  # recheck (last green r1)
    "q_event_type_filter_project",  # recheck (last green r1)
    "q_hash_match_join",  # recheck (last green r1)
    "q_lineage_join",  # recheck (last green r1)
    "q_local_time_report",  # recheck (last green r1)
    "q_time_bucket_agg",  # recheck (last green r1)
    "q_topk_heavy_hitters",  # recheck (last green r1)
    "q_truncation_audit",  # recheck (last green r1)
    "q_correlated_subquery",  # recheck (last green r1)
    "q_cross_join_small",  # recheck (last green r1)
    "q_cube_agg",  # recheck (last green r1)
    "q_distinct_agg",  # recheck (last green r1)
    "q_exists_semi_join",  # recheck (last green r1)
    "q_having_filter",  # recheck (last green r1)
    "q_not_exists_anti_join",  # recheck (last green r1)
    "q_order_count_histogram",  # recheck (last green r1)
    "q_outer_join_coverage",  # recheck (last green r1)
    "q_pivot_segments",  # recheck (last green r1)
    "q_pricing_summary",  # recheck (last green r1)
    "q_region_revenue",  # recheck (last green r1)
    "q_rollup_agg",  # recheck (last green r1)
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
