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
# (dict insertion) order. Rounds 1+2 verified 99 distinct queries green
# (union of CORRECTNESS_r01/r02 rows with rows_match and no err). This
# list front-loads the 44 queries that have no driver row yet — the 19
# late round-2 additions first, then the round-3 additions in the order
# they landed — and spends the remaining budget on regression re-checks
# of the highest-complexity previously-green queries. Names not in this
# list keep module order after it. (The generated ledger at the end of
# COVERAGE.md is the authoritative per-query verification status;
# regenerate with tools/gen_coverage_ledger.py.)
#
# ROUND-4 ROTATION (do this first next round): run
#     python tools/gen_round_priority.py
# and replace this list with its output. It diffs queries() against the
# union of green CORRECTNESS_r*.json rows, front-loads everything still
# unverified (~24 round-3-session additions sit past this round's
# 50-slot cap, e.g. q_scd2_history, q_pagerank_knn, the HLL/histogram
# sketch family, q_triangle_stats, q_label_propagation, the phash and
# prefix-jaccard near-dup queries), then fills with regression
# re-checks ordered by oldest last-green round.
_ROUND_PRIORITY = [
    # the 19 still-unverified queries (no CORRECTNESS_r01/r02 row)
    "q_ann_topk_pq",
    "q_bigram_lm_score",
    "q_bpe_encode",
    "q_bpe_train",
    "q_classifier_inference",
    "q_constraint_checks",
    "q_contrastive_negatives",
    "q_csv_roundtrip",
    "q_domain_classifier",
    "q_funnel_conversion",
    "q_grouping_sets",
    "q_jsonl_roundtrip",
    "q_kmeans_clusters",
    "q_large_orders",
    "q_table_profile",
    "q_upsert_latest",
    "q_value_outliers",
    "q_volume_shipping",
    "q_window_funcs",
    # new round-3 queries go here (before regression re-checks) so they
    # get a driver row in the same round they are added
    "q_ann_topk_lsh_banded",
    "q_semantic_dedup",
    "q_shard_balance",
    "q_canonical_dedup",
    "q_boilerplate_flags",
    "q_vocab_stats",
    "q_token_freq_histogram",
    "q_minhash_search",
    "q_cluster_balanced_sample",
    "q_random_projection",
    "q_retention_cohorts",
    "q_small_quantity_revenue",
    "q_last_ship_supplier",
    "q_market_share",
    "q_rich_inactive_customers",
    "q_shot_boundaries",
    "q_ann_topk_ivf_exact",
    "q_ann_topk_pq_sampled",
    "q_zorder_values",
    "q_novelty_scores",
    "q_editdistance_neardup",
    "q_training_data_build",
    "q_knn_graph",
    "q_weighted_sample",
    "q_top_revenue_supplier",
    "q_audio_decimate",
    # TPC-H completion set (Q4/Q10/Q12/Q14/Q19 shapes), landed round 3:
    # with these, every TPC-H query expressible without a partsupp table
    # has a registered shape. They take the window's last 5 slots (the
    # previous regression re-checks rotate back in round 4) so the full
    # 50-query driver window is exactly the still-unverified set.
    "q_order_priority_check",
    "q_returned_item_customers",
    "q_ship_delay_priority",
    "q_promo_revenue",
    "q_disjunctive_filter_revenue",
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
