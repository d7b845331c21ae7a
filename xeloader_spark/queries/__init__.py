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
# ROUND-6 ROTATION (installed from tools/gen_round_priority.py output):
# 233 registered; 5 unverified; window 50 → 50 slots (0 unverified beyond
# the window). Slots 1-5 are the round-6 additions (q_bm25_topk_logidf,
# rows-only by design — float log; q_windowed_pair_supports,
# q_token_diversity, q_record_linkage, q_quantile_normalize_scores —
# oracle-exact); the rest are oldest-first regression re-checks of the
# stale r1/r2 greens. Registry freeze: keep any further
# round-6 additions within the headroom the tool reports (re-run +
# reinstall after every addition).
_ROUND_PRIORITY = [
    "q_bm25_topk_logidf",
    "q_windowed_pair_supports",
    "q_token_diversity",
    "q_record_linkage",
    "q_quantile_normalize_scores",
    "q_running_total",  # recheck (last green r1)
    "q_scalar_subquery",  # recheck (last green r1)
    "q_set_operations",  # recheck (last green r1)
    "q_shipping_priority",  # recheck (last green r1)
    "q_supplier_breadth_per_part",  # recheck (last green r1)
    "q_top_customer_per_nation",  # recheck (last green r1)
    "q_callstack_decode",  # recheck (last green r1)
    "q_demux_counts",  # recheck (last green r1)
    "q_error_budget",  # recheck (last green r1)
    "q_event_lead_lag",  # recheck (last green r1)
    "q_flatten_projection",  # recheck (last green r1)
    "q_hash_bin_derivation",  # recheck (last green r1)
    "q_lineage_stamp",  # recheck (last green r1)
    "q_props_extract",  # recheck (last green r1)
    "q_run_stats",  # recheck (last green r1)
    "q_session_pattern_extract",  # recheck (last green r1)
    "q_smalldatetime_round",  # recheck (last green r1)
    "q_string_truncation",  # recheck (last green r1)
    "q_decontaminate",  # recheck (last green r1)
    "q_dedup_clusters",  # recheck (last green r1)
    "q_dedup_exact",  # recheck (last green r1)
    "q_dedup_minhash_lsh",  # recheck (last green r1)
    "q_dedup_shingle_jaccard",  # recheck (last green r1)
    "q_embedding_clusters",  # recheck (last green r1)
    "q_embedding_neardup",  # recheck (last green r1)
    "q_simhash_neardup",  # recheck (last green r1)
    "q_simhash_signature",  # recheck (last green r1)
    "q_ann_topk_dot",  # recheck (last green r1)
    "q_xml_roundtrip",  # recheck (last green r2)
    "q_bloom_decontaminate",  # recheck (last green r2)
    "q_chunk_dedup",  # recheck (last green r2)
    "q_containment_pairs",  # recheck (last green r2)
    "q_incremental_dedup",  # recheck (last green r2)
    "q_substring_dup_spans",  # recheck (last green r2)
    "q_ann_topk_ivf",  # recheck (last green r2)
    "q_ann_topk_lsh_quantized",  # recheck (last green r2)
    "q_frame_sample",  # recheck (last green r2)
    "q_label_centroids",  # recheck (last green r2)
    "q_multimodal_audio_codec",  # recheck (last green r2)
    "q_multimodal_feature_values",  # recheck (last green r2)
    "q_multimodal_features",  # recheck (last green r2)
    "q_multimodal_real_codec",  # recheck (last green r2)
    "q_multimodal_resize",  # recheck (last green r2)
    "q_bpe_pair_counts",  # recheck (last green r2)
    "q_doc_fingerprint",  # recheck (last green r2)
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
