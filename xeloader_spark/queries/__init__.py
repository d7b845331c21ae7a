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
# ROUND-8 ROTATION (installed from tools/gen_round_priority.py output,
# re-run + reinstalled after every query addition): 253 registered;
# 9 unverified — the round-8 additions (robots table, link-graph
# family incl. harmonic + HyperBall contract, domain prior, crawl
# pipeline, HTML→text) lead the window, then oldest-first regression
# re-checks of the stale r3 greens fill the remaining slots.
_ROUND_PRIORITY = [
    "q_robots_filter_table",
    "q_host_link_graph",
    "q_host_pagerank",
    "q_link_extract",
    "q_host_harmonic",
    "q_domain_prior",
    "q_crawl_pipeline",
    "q_hyperball_contract",
    "q_html_text_extract",
    "q_market_share",  # recheck (last green r3)
    "q_order_priority_check",  # recheck (last green r3)
    "q_promo_revenue",  # recheck (last green r3)
    "q_returned_item_customers",  # recheck (last green r3)
    "q_rich_inactive_customers",  # recheck (last green r3)
    "q_ship_delay_priority",  # recheck (last green r3)
    "q_small_quantity_revenue",  # recheck (last green r3)
    "q_table_profile",  # recheck (last green r3)
    "q_top_revenue_supplier",  # recheck (last green r3)
    "q_volume_shipping",  # recheck (last green r3)
    "q_csv_roundtrip",  # recheck (last green r3)
    "q_jsonl_roundtrip",  # recheck (last green r3)
    "q_zorder_values",  # recheck (last green r3)
    "q_canonical_dedup",  # recheck (last green r3)
    "q_editdistance_neardup",  # recheck (last green r3)
    "q_minhash_search",  # recheck (last green r3)
    "q_novelty_scores",  # recheck (last green r3)
    "q_ann_topk_ivf_exact",  # recheck (last green r3)
    "q_ann_topk_lsh_banded",  # recheck (last green r3)
    "q_ann_topk_pq",  # recheck (last green r3)
    "q_ann_topk_pq_sampled",  # recheck (last green r3)
    "q_audio_decimate",  # recheck (last green r3)
    "q_cluster_balanced_sample",  # recheck (last green r3)
    "q_kmeans_clusters",  # recheck (last green r3)
    "q_knn_graph",  # recheck (last green r3)
    "q_random_projection",  # recheck (last green r3)
    "q_semantic_dedup",  # recheck (last green r3)
    "q_shot_boundaries",  # recheck (last green r3)
    "q_bigram_lm_score",  # recheck (last green r3)
    "q_boilerplate_flags",  # recheck (last green r3)
    "q_bpe_encode",  # recheck (last green r3)
    "q_bpe_train",  # recheck (last green r3)
    "q_token_freq_histogram",  # recheck (last green r3)
    "q_vocab_stats",  # recheck (last green r3)
    "q_window_funcs",  # recheck (last green r3)
    "q_funnel_conversion",  # recheck (last green r3)
    "q_retention_cohorts",  # recheck (last green r3)
    "q_upsert_latest",  # recheck (last green r3)
    "q_value_outliers",  # recheck (last green r3)
    "q_contrastive_negatives",  # recheck (last green r3)
    "q_shard_balance",  # recheck (last green r3)
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
