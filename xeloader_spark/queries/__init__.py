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
# ROUND-11 ROTATION (tools/gen_round_priority.py 50 5 — drain-first,
# VERDICT r10 #1): the FULL 24-query r5-stale cohort is pinned to slots
# 1-24 ahead of the round's new registrations (slots 25+), so the
# final drain step cannot be displaced; oldest-r6 re-checks fill 28-50.
# 281 registered at install; after this round no query should be
# last-driver-checked before r6.
_ROUND_PRIORITY = [
    "q_leakage_safe_split",  # recheck (last green r5)
    "q_snm_multipass",  # recheck (last green r5)
    "q_snm_recall_eval",  # recheck (last green r5)
    "q_sorted_neighborhood_pairs",  # recheck (last green r5)
    "q_ann_topk_ivfpq",  # recheck (last green r5)
    "q_degree_distribution",  # recheck (last green r5)
    "q_kcenter_diverse_sample",  # recheck (last green r5)
    "q_kcore_membership",  # recheck (last green r5)
    "q_label_separation",  # recheck (last green r5)
    "q_matryoshka_recall",  # recheck (last green r5)
    "q_mmr_rerank",  # recheck (last green r5)
    "q_modularity_score",  # recheck (last green r5)
    "q_blocklist_filter",  # recheck (last green r5)
    "q_bm25_passages",  # recheck (last green r5)
    "q_bm25_topk",  # recheck (last green r5)
    "q_dsir_resample",  # recheck (last green r5)
    "q_k_anonymity",  # recheck (last green r5)
    "q_url_canonicalize",  # recheck (last green r5)
    "q_vocab_coverage",  # recheck (last green r5)
    "q_ab_test_zscore",  # recheck (last green r5)
    "q_ewma_smooth",  # recheck (last green r5)
    "q_seasonal_anomaly",  # recheck (last green r5)
    "q_type_duration_percentiles",  # recheck (last green r5)
    "q_packing_boundary_stats",  # recheck (last green r5)
    "q_binary_truncation",
    "q_coercion_nulling",
    "q_priority_schedule",
    "q_recrawl_delta",
    "q_revisit_policy",
    "q_crawl_budget",
    "q_changefreq_policy",
    "q_feasible_budget",
    "q_record_linkage",  # recheck (last green r6)
    "q_running_total",  # recheck (last green r6)
    "q_scalar_subquery",  # recheck (last green r6)
    "q_set_operations",  # recheck (last green r6)
    "q_shipping_priority",  # recheck (last green r6)
    "q_supplier_breadth_per_part",  # recheck (last green r6)
    "q_top_customer_per_nation",  # recheck (last green r6)
    "q_windowed_pair_supports",  # recheck (last green r6)
    "q_callstack_decode",  # recheck (last green r6)
    "q_demux_counts",  # recheck (last green r6)
    "q_error_budget",  # recheck (last green r6)
    "q_event_lead_lag",  # recheck (last green r6)
    "q_flatten_projection",  # recheck (last green r6)
    "q_hash_bin_derivation",  # recheck (last green r6)
    "q_lineage_stamp",  # recheck (last green r6)
    "q_props_extract",  # recheck (last green r6)
    "q_run_stats",  # recheck (last green r6)
    "q_session_pattern_extract",  # recheck (last green r6)
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
