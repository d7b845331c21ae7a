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
# ROUND-4 ROTATION (installed from tools/gen_round_priority.py output):
# the 50 slots are exactly the 50 still-unverified registry entries, so
# after round 4 every registered query has a green driver row across
# r1..r4. gen_round_priority.py now warns when new additions would push
# the unverified set past one round's window — keep round-4-session
# additions within the headroom it reports.
_ROUND_PRIORITY = [
    "q_forecast_revenue_change",
    "q_order_reconciliation",
    "q_pivot_user_matrix",
    "q_referential_integrity",
    "q_revenue_pareto",
    "q_fixedwidth_roundtrip",
    "q_dedup_eval",
    "q_golden_records",
    "q_prefix_jaccard_pairs",
    "q_source_dup_rates",
    "q_image_phash",
    "q_image_phash_neardup",
    "q_label_propagation",
    "q_media_integrity",
    "q_pagerank_knn",
    "q_pagerank_personalized",
    "q_rank_fusion",
    "q_triangle_stats",
    "q_pmi_collocations",
    "q_source_diversity",
    "q_conditional_aggs",
    "q_id_islands",
    "q_null_semantics",
    "q_string_agg_ordered",
    "q_vector_norms",
    "q_attribution_first_touch",
    "q_bounce_rate",
    "q_cdc_snapshot",
    "q_cooccurrence_lift",
    "q_distribution_drift",
    "q_exact_median_twopass",
    "q_hist_quantile_sketch",
    "q_hll_distinct_users",
    "q_hll_intersection",
    "q_hopping_window_agg",
    "q_hourly_autocorrelation",
    "q_incremental_rollup",
    "q_interarrival_stats",
    "q_iqr_outliers",
    "q_join_key_skew",
    "q_join_size_sketch",
    "q_json_payload_stats",
    "q_markov_transitions",
    "q_rollup_hierarchy",
    "q_scd2_history",
    "q_scd2_pointintime",
    "q_series_correlation",
    "q_user_lifetime",
    "q_weekly_profile",
    "q_classifier_calibration",
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
