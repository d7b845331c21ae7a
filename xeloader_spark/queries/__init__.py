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
# ROUND-9 ROTATION (installed from tools/gen_round_priority.py output,
# re-run + reinstalled after every query addition): 253 registered at
# round open, 0 unverified — the 4 r3-stale queries lead the window
# (VERDICT r8 #1), then the r4 cohort oldest-first fills the remaining
# slots. New registrations this round take priority slots on reinstall.
_ROUND_PRIORITY = [
    "q_important_stock",
    "q_mincost_supplier",
    "q_potential_promotion",
    "q_profit_by_nation",
    "q_warc_reader_contract",
    "q_host_hits",
    "q_anchor_text",
    "q_redirect_resolution",
    "q_rendezvous_shards",
    "q_sitemap_seed",
    "q_phrase_search",
    "q_bucketed_join_contract",
    "q_line_dedup",
    "q_robots_parse",
    "q_robots_sitemaps",
    "q_robots_crawl_delay",
    "q_weighted_sample",  # recheck (last green r3)
    "q_training_data_build",  # recheck (last green r3)
    "q_classifier_inference",  # recheck (last green r3)
    "q_domain_classifier",  # recheck (last green r3)
    "q_forecast_revenue_change",  # recheck (last green r4)
    "q_order_reconciliation",  # recheck (last green r4)
    "q_pivot_user_matrix",  # recheck (last green r4)
    "q_referential_integrity",  # recheck (last green r4)
    "q_revenue_pareto",  # recheck (last green r4)
    "q_fixedwidth_roundtrip",  # recheck (last green r4)
    "q_dedup_eval",  # recheck (last green r4)
    "q_golden_records",  # recheck (last green r4)
    "q_prefix_jaccard_pairs",  # recheck (last green r4)
    "q_source_dup_rates",  # recheck (last green r4)
    "q_image_phash",  # recheck (last green r4)
    "q_image_phash_neardup",  # recheck (last green r4)
    "q_label_propagation",  # recheck (last green r4)
    "q_media_integrity",  # recheck (last green r4)
    "q_pagerank_knn",  # recheck (last green r4)
    "q_pagerank_personalized",  # recheck (last green r4)
    "q_rank_fusion",  # recheck (last green r4)
    "q_triangle_stats",  # recheck (last green r4)
    "q_pmi_collocations",  # recheck (last green r4)
    "q_source_diversity",  # recheck (last green r4)
    "q_conditional_aggs",  # recheck (last green r4)
    "q_id_islands",  # recheck (last green r4)
    "q_null_semantics",  # recheck (last green r4)
    "q_string_agg_ordered",  # recheck (last green r4)
    "q_vector_norms",  # recheck (last green r4)
    "q_attribution_first_touch",  # recheck (last green r4)
    "q_bounce_rate",  # recheck (last green r4)
    "q_cdc_snapshot",  # recheck (last green r4)
    "q_cooccurrence_lift",  # recheck (last green r4)
    "q_distribution_drift",  # recheck (last green r4)
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
