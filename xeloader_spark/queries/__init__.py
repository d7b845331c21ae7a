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
# ROUND-12 ROTATION (tools/gen_round_priority.py 50 6 — drain-first,
# VERDICT r11 #1): the FULL 31-query r6-stale cohort (core dedup +
# multimodal + embedding/ANN families) is pinned to slots 1-31 ahead of
# the round's new registrations; oldest-r7 re-checks fill the remaining
# slots to 50 (precisely: drain slots 1-31, the round's 7 new
# registrations at 32-38, r7 re-checks 39-50). 281 registered at round
# open, 288 after the r12 registrations; after this round no query
# should be last-driver-checked before r7.
_ROUND_PRIORITY = [
    "q_smalldatetime_round",  # recheck (last green r6)
    "q_string_truncation",  # recheck (last green r6)
    "q_xml_roundtrip",  # recheck (last green r6)
    "q_bloom_decontaminate",  # recheck (last green r6)
    "q_chunk_dedup",  # recheck (last green r6)
    "q_containment_pairs",  # recheck (last green r6)
    "q_decontaminate",  # recheck (last green r6)
    "q_dedup_clusters",  # recheck (last green r6)
    "q_dedup_exact",  # recheck (last green r6)
    "q_dedup_minhash_lsh",  # recheck (last green r6)
    "q_dedup_shingle_jaccard",  # recheck (last green r6)
    "q_embedding_clusters",  # recheck (last green r6)
    "q_embedding_neardup",  # recheck (last green r6)
    "q_incremental_dedup",  # recheck (last green r6)
    "q_simhash_neardup",  # recheck (last green r6)
    "q_simhash_signature",  # recheck (last green r6)
    "q_substring_dup_spans",  # recheck (last green r6)
    "q_ann_topk_dot",  # recheck (last green r6)
    "q_ann_topk_ivf",  # recheck (last green r6)
    "q_ann_topk_lsh_quantized",  # recheck (last green r6)
    "q_frame_sample",  # recheck (last green r6)
    "q_label_centroids",  # recheck (last green r6)
    "q_multimodal_audio_codec",  # recheck (last green r6)
    "q_multimodal_feature_values",  # recheck (last green r6)
    "q_multimodal_features",  # recheck (last green r6)
    "q_multimodal_real_codec",  # recheck (last green r6)
    "q_multimodal_resize",  # recheck (last green r6)
    "q_bpe_pair_counts",  # recheck (last green r6)
    "q_doc_fingerprint",  # recheck (last green r6)
    "q_token_diversity",  # recheck (last green r6)
    "q_quantile_normalize_scores",  # recheck (last green r6)
    "q_crawl_cycle",
    "q_crawl_state_merge",
    "q_host_backoff",
    "q_robots_cache",
    "q_sitemap_limits",
    "q_url_trap_score",
    "q_adaptive_schedule",
    "q_constraint_checks",  # recheck (last green r7)
    "q_disjunctive_filter_revenue",  # recheck (last green r7)
    "q_grouping_sets",  # recheck (last green r7)
    "q_large_orders",  # recheck (last green r7)
    "q_last_ship_supplier",  # recheck (last green r7)
    "q_warc_extract",  # recheck (last green r7)
    "q_bigram_backoff_quality",  # recheck (last green r7)
    "q_bm25_topk_logidf",  # recheck (last green r7)
    "q_crawl_frontier",  # recheck (last green r7)
    "q_gopher_quality",  # recheck (last green r7)
    "q_kneser_ney_quality",  # recheck (last green r7)
    "q_lang_id",  # recheck (last green r7)
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
