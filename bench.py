#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": <scale factor>}.

Queries are fully materialized through the `noop` sink (no collect, no
column-pruning shortcuts), which is how a downstream consumer would pay
for them.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from xeloader_spark import queries as q
from xeloader_spark.operators.dedup import release_persisted
from xeloader_spark.session import get_spark

HEADLINE = [
    # ingest/query surface (events, 100k rows at sf0.1)
    "q_time_bucket_agg",
    "q_flatten_projection",
    "q_event_sequence_order",
    "q_topk_heavy_hitters",
    "q_hash_match_join",
    # temporal (events 100k at sf0.1)
    "q_asof_purchase_attribution",
    "q_interval_error_click_window",
    "q_rollup_gapfill_hourly",
    # relational (lineitem 600k / orders 150k at sf0.1)
    "q_pricing_summary",
    "q_region_revenue",
    "q_top_customer_per_nation",
    "q_running_total",
    "q_rollup_agg",
    # extension operators (documents 5k / embeddings 2k at sf0.1)
    "q_dedup_minhash_lsh",
    "q_dedup_shingle_jaccard",
    "q_simhash_neardup",
    "q_embedding_neardup",
    "q_ann_topk_dot",
    "q_text_quality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="xeloader-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.all_queries()

    # warmup: pay JVM/codegen/session init once, outside the timings
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    registry["q_demux_counts"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # ... and one Python worker per core, so the first Arrow/pandas query
    # isn't charged for worker startup
    par = spark.sparkContext.defaultParallelism
    spark.range(par * 1000).repartition(par).mapInPandas(
        lambda batches: batches, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    # The host is multi-tenant and a single sample can be inflated several-fold
    # by transient external load, so each query is timed twice and the MIN is
    # reported (standard steady-state practice). A global budget caps the
    # second pass so a contended run degrades to single samples instead of
    # blowing the driver's time box.
    bench_start = time.perf_counter()
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "480"))

    def run_once(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        release_persisted()  # storage-memory hygiene between pipelines
        return dt

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry[name]
        best = run_once(fn)
        if time.perf_counter() - bench_start < budget:
            best = min(best, run_once(fn))
        timings[name] = round(best, 3)
        print(f"[bench] {name}: {timings[name]}s", file=sys.stderr, flush=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
