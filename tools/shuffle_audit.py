"""Measured shuffle-volume audit: run representative headline queries
and record ACTUAL bytes moved (input scan, shuffle write, shuffle read)
from the Spark status REST API — the "measure, don't guess" companion to
SCALE.md's shuffle-budget arguments. Byte volumes are load-independent,
so the numbers are stable even on a busy box (unlike wall-clock).

Each query executes against the noop sink (full plan runs, nothing is
materialized on the driver), so per-doc outputs don't inflate driver
memory. Output: SHUFFLE_AUDIT.json with per-query
{input_bytes, shuffle_write, shuffle_read, shuffle_per_input} —
`shuffle_per_input` is the scale-survival number: how many bytes cross
the wire per byte scanned. Queries whose ratio stays ≪ 1 collapse
before they shuffle (digest/aggregate discipline); a ratio ≫ 1 would
flag a pair-explosion or a missed map-side combine.

Usage: python tools/shuffle_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xeloader_spark.session import get_spark

AUDIT_QUERIES = [
    # ingest/relational
    "q_time_bucket_agg",
    "q_pricing_summary",
    "q_region_revenue",
    "q_top_customer_per_nation",
    # dedup family
    "q_dedup_minhash_lsh",
    "q_dedup_shingle_jaccard",
    "q_prefix_jaccard_pairs",
    "q_dedup_clusters",
    "q_embedding_neardup",
    # ANN / graph
    "q_ann_topk_lsh_banded",
    "q_knn_graph",
    "q_pagerank_knn",
    "q_kcore_membership",
    # text / pipeline
    "q_unigram_doc_prob",
    "q_dsir_resample",
    "q_vocab_coverage",
    "q_bpe_encode",
    "q_training_data_build",
    # temporal
    "q_ewma_smooth",
    "q_retention_cohorts",
    "q_type_duration_percentiles",
    # round-4 late additions
    "q_sorted_neighborhood_pairs",
    "q_matryoshka_recall",
    "q_label_separation",
    # round-5 additions
    "q_blocklist_filter",
    "q_bm25_topk",
    "q_frequent_pairs",
    "q_url_canonicalize",
    "q_bloom_join_prune",
    "q_modularity_score",
    "q_mmr_rerank",
    "q_bm25_passages",
    "q_leakage_safe_split",
    # round-6 additions
    "q_windowed_pair_supports",
    "q_bm25_topk_logidf",
    "q_ann_topk_ivfpq",
    "q_record_linkage",
    "q_quantile_normalize_scores",
    # round-7 additions
    "q_bigram_backoff_quality",
    "q_winnowing_fingerprints",
    "q_token_fertility",
    "q_warc_extract",
    "q_winnow_overlap_pairs",
    "q_robots_filter",
    "q_crawl_frontier",
    "q_kneser_ney_quality",
    "q_curriculum_schedule",
    "q_preference_pairs",
    "q_dataset_card",
]

# Iterative operators localCheckpoint their working frames, which
# truncates the executed plan ABOVE the parquet scans — the scan-bytes
# denominator for those queries comes from this explicit map instead of
# the plan regex. Keep an entry per audited iterative query; an audited
# query whose plan is truncated and is NOT listed here is recorded as
# tables=['unknown'] with a None ratio (loud, not silently wrong).
CHECKPOINT_TRUNCATED_TABLES: dict[str, set[str]] = {
    "q_pagerank_knn": {"embeddings"},
    "q_kcore_membership": {"embeddings"},
    "q_knn_graph": {"embeddings"},
    "q_dedup_clusters": {"documents"},
    # rank.global_row_number localCheckpoints its range-partitioned
    # intermediate, so these plans can lose their scan nodes too
    "q_vocab_coverage": {"documents"},
    "q_dsir_resample": {"documents"},
    "q_sorted_neighborhood_pairs": {"documents"},
    # frequent_pairs checkpoints its basket frame; modularity/MMR
    # checkpoint LP rounds / shortlist frames
    "q_frequent_pairs": {"lineitem"},
    "q_modularity_score": {"embeddings"},
    "q_mmr_rerank": {"embeddings"},
    # connected_components persists/collects; the leak join reuses the
    # cached pair frame, so the executed plan can be cache-truncated
    "q_leakage_safe_split": {"documents"},
    # ivfpq persists the quantized frame for the qrows collect, so the
    # executed candidate plan can be cache-truncated
    "q_ann_topk_ivfpq": {"embeddings"},
    # global_row_number localCheckpoints its range-partitioned frame
    "q_quantile_normalize_scores": {"documents"},
    # the slim (doc_id, fp) set is checkpointed for its three consumers
    "q_winnow_overlap_pairs": {"documents"},
    # the train bigram table is checkpointed for its three stats consumers
    "q_kneser_ney_quality": {"documents"},
    # backoff train count tables are checkpointed (r7 review fix #4)
    "q_bigram_backoff_quality": {"documents"},
    # global_row_number localCheckpoints its range-partitioned frame
    "q_curriculum_schedule": {"documents"},
    # the ranked bucket frame is checkpointed for its two pair sides
    "q_preference_pairs": {"documents"},
}


def _stage_totals(ui_port: int, app_id: str) -> dict[str, int]:
    url = f"http://localhost:{ui_port}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as resp:
        stages = json.load(resp)
    tot = {"input_bytes": 0, "shuffle_write": 0, "shuffle_read": 0}
    for st in stages:
        tot["input_bytes"] += st.get("inputBytes", 0)
        tot["shuffle_write"] += st.get("shuffleWriteBytes", 0)
        tot["shuffle_read"] += st.get("shuffleReadBytes", 0)
    return tot


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ui_port = 4099
    spark = get_spark(
        app_name="xeloader-shuffle-audit",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(ui_port),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    from xeloader_spark.queries import all_queries

    queries = all_queries()
    out: dict[str, dict] = {}
    for name in AUDIT_QUERIES:
        # snapshot BEFORE construction: iterative operators (pagerank,
        # k-core, k-means) run their shuffles eagerly via localCheckpoint
        # while the query object is being built
        before = _stage_totals(ui_port, app_id)
        df = queries[name](spark, sf_dir)
        # scanned bytes = on-disk size of the parquet tables in the plan
        # (REST inputBytes is unreliable for columnar scans — events-table
        # stages report KBs for MB files); disk bytes are the stable,
        # deterministic denominator for a scale argument anyway.
        import re

        plan = df._jdf.queryExecution().executedPlan().toString()
        tables = set(re.findall(r"testdata/[^/]+/(\w+)\.parquet", plan))
        if not tables:
            # checkpoint-truncated plan (iterative operator): the scan
            # happened before the checkpoint, so read the denominator
            # from the explicit map. An unmapped query records
            # tables=['unknown'] and a None ratio rather than silently
            # borrowing another table's byte count.
            tables = CHECKPOINT_TRUNCATED_TABLES.get(name, set())
        scan_bytes = sum(
            os.path.getsize(os.path.join(sf_dir, f"{t}.parquet"))
            for t in tables
        )
        if not tables:
            print(
                f"[audit] WARNING: {name} has a checkpoint-truncated plan "
                f"and no CHECKPOINT_TRUNCATED_TABLES entry — recording "
                f"tables=['unknown'], ratio=None",
                file=sys.stderr,
                flush=True,
            )
            tables, scan_bytes = {"unknown"}, 0
        df.write.mode("overwrite").format("noop").save()
        after = _stage_totals(ui_port, app_id)
        d = {k: after[k] - before[k] for k in before}
        d["tables"] = sorted(tables)
        d["table_bytes"] = scan_bytes
        d["shuffle_per_table_byte"] = (
            round(d["shuffle_write"] / scan_bytes, 4) if scan_bytes else None
        )
        out[name] = d
        print(
            f"[audit] {name}: tables={scan_bytes:,}B "
            f"sw={d['shuffle_write']:,} ratio={d['shuffle_per_table_byte']}",
            file=sys.stderr,
            flush=True,
        )
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SHUFFLE_AUDIT.json"),
        "w",
    ) as fh:
        json.dump({"sf_dir": sf_dir, "queries": out}, fh, indent=1)
    print(json.dumps({"audited": len(out)}))
    spark.stop()


if __name__ == "__main__":
    main()
