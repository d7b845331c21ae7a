#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line (≤1500 chars: total, slowest queries, recall@10,
pass totals, loadavg); the full per-query map is written to
BENCH_DETAIL.json (override path via $SPARK_GRAFT_BENCH_DETAIL).

BENCH_DETAIL.json is TRACKED in git as of round 10 (VERDICT r9 #6: the
driver's BENCH_r{N}.json captures only the stdout tail, so per-row
cross-round audits died at the top-8 truncation while the sidecar was
untracked). Each round-opening commit also preserves the PREVIOUS
driver run's sidecar as BENCH_DETAIL_r{N}.json, so every round's full
98-row map is diffable from artifacts alone.

Queries are fully materialized through the `noop` sink (no collect, no
column-pruning shortcuts), which is how a downstream consumer would pay
for them.

COMPARABILITY: this host is multi-tenant. If loadavg_start (recorded in
the output) is > 6, sub-3s rows inflate up to ~1.8× from scheduling
noise alone (r5/r6 cross-checks) — re-run on a quieter host before
reading a per-row ratio as a regression. The recorded loadavg is the
ground truth for attributing any cross-round delta.
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
    "q_session_window_agg",
    "q_funnel_conversion",
    # relational (lineitem 600k / orders 150k at sf0.1)
    "q_pricing_summary",
    "q_region_revenue",
    "q_volume_shipping",
    "q_top_customer_per_nation",
    "q_running_total",
    "q_rollup_agg",
    "q_shipping_priority",
    # extension operators (documents 5k / embeddings 2k at sf0.1)
    "q_dedup_minhash_lsh",
    "q_dedup_shingle_jaccard",
    "q_dedup_clusters",
    "q_simhash_neardup",
    "q_substring_dup_spans",
    "q_embedding_neardup",
    "q_ann_topk_dot",
    "q_ann_topk_lsh_banded",
    "q_kmeans_clusters",
    "q_text_quality",
    "q_unigram_doc_prob",
    "q_domain_classifier",
    # round-3 corpus diagnostics / retrieval
    "q_boilerplate_flags",
    "q_vocab_stats",
    "q_minhash_search",
    "q_retention_cohorts",
    "q_shot_boundaries",
    "q_scd2_history",
    "q_pagerank_knn",
    "q_triangle_stats",
    "q_hll_distinct_users",
    "q_hourly_autocorrelation",
    "q_pmi_collocations",
    "q_image_phash_neardup",
    "q_prefix_jaccard_pairs",
    "q_cdc_snapshot",
    "q_hist_quantile_sketch",
    "q_markov_transitions",
    "q_pivot_user_matrix",
    "q_label_propagation",
    "q_exact_median_twopass",
    "q_golden_records",
    # round-4 additions
    "q_incremental_neardup",
    "q_kcenter_diverse_sample",
    "q_jaccard_threshold_curve",
    "q_dsir_resample",
    "q_type_duration_percentiles",
    "q_matryoshka_recall",
    "q_label_separation",
    "q_ewma_smooth",
    "q_ab_test_zscore",
    "q_kcore_membership",
    "q_degree_distribution",
    "q_sorted_neighborhood_pairs",
    # round-5 additions
    "q_bm25_topk",
    "q_frequent_pairs",
    "q_url_canonicalize",
    "q_bloom_join_prune",
    "q_modularity_score",
    "q_mmr_rerank",
    "q_bm25_passages",
    "q_leakage_safe_split",
    # round-7 additions
    "q_bigram_backoff_quality",
    "q_kneser_ney_quality",
    "q_winnowing_fingerprints",
    # training-data assembly
    "q_sample_deterministic",
    "q_pack_sequences",
    "q_decontaminate",
    "q_gopher_quality",
    "q_chunk_dedup",
    "q_corpus_clean_pipeline",
    "q_training_data_build",
    # round-12 additions (VERDICT r11 #6): the crawl/recrawl families
    # entered r9-r11 with stress axes but no bench rows — make their
    # cross-round drift diffable like everything else
    "q_discovery_pipeline",
    "q_feasible_budget",
    "q_crawl_cycle",
    # round-13 additions: the health-rails compositions (backoff ×
    # Retry-After driving the budget caps) and the trap-gated frontier
    "q_adaptive_schedule",
    "q_adaptive_cycle",
    "q_trap_frontier",
    # round-14 additions (VERDICT r13 #2): the off-bench heavies. The
    # worst declared query in the repo (q_classifier_inference, 47 s
    # before its r13 Arrow rewrite) was invisible to the bench and only
    # found by mining the sweep log — put the whole set on the record so
    # a future regression there is a bench diff, not an archaeology dig.
    "q_classifier_inference",
    "q_classifier_calibration",
    "q_pagerank_personalized",
    "q_crawl_frontier",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # VERDICT r13 #1: the artifacts must record the EFFECTIVE core count
    # and master, or the driver's scaling axis (same bench at a lower
    # $SPARK_GRAFT_CPUS) is unverifiable after the fact — r13's 8-core
    # run clobbered the 32-core sidecar and produced a false
    # `suspect_cpus_ignored` flag against a factory that honors the env.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
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

    # The host is multi-tenant and transient external load inflates samples
    # several-fold in BURSTS lasting tens of seconds, so each query is timed
    # in two full passes over the suite (a query's two samples are separated
    # by a whole pass, decorrelating them from any one burst) and the MIN is
    # reported. A global budget caps the second pass so a contended run
    # degrades to single samples instead of blowing the driver's time box.
    #
    # VERDICT r2 asked the uniform 1.2-1.6x inflation between rounds to be
    # pinned: both passes' totals AND the host load average (start/end) are
    # now recorded in the output JSON, so a contended round is identifiable
    # from the artifact itself instead of being a mystery ratio.
    #
    # PINNED (round 3): two back-to-back full runs agree (shared-query
    # median ratio 0.97), and round 3 matches round 2 within 3% median —
    # so the harness is stable run-to-run. The residual ~1.4x vs round 1
    # is uniform across zero-shuffle trivia and heavy queries alike,
    # which rules out a plan/code regression; it coincides with the
    # driver regenerating all fixtures between rounds 1 and 2 (commit
    # a312162: different parquet encodings) on a multi-tenant host whose
    # baseline throughput shifted. Rounds are comparable to each other
    # going forward via the recorded loadavg + per-pass totals.
    bench_start = time.perf_counter()
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "480"))
    loadavg_start = os.getloadavg()

    def run_once(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        release_persisted()  # storage-memory hygiene between pipelines
        return dt

    timings: dict[str, float] = {}
    pass1: dict[str, float] = {}
    pass2: dict[str, float] = {}
    for name in HEADLINE:
        pass1[name] = round(run_once(registry[name]), 3)
        timings[name] = pass1[name]
    for name in HEADLINE:
        if time.perf_counter() - bench_start >= budget:
            break
        pass2[name] = round(run_once(registry[name]), 3)
        timings[name] = min(timings[name], pass2[name])
    for name in HEADLINE:
        print(f"[bench] {name}: {timings[name]}s", file=sys.stderr, flush=True)

    # Skew-path proof over a corpus where 30% of docs share a 24-token
    # boilerplate header (the hot-key scenario). Two families, capped vs
    # uncapped, result sets asserted IDENTICAL (the cap removes hot keys,
    # not signal):
    #   - exact inverted-index Jaccard: each hot shingle contributes
    #     O(df²) join rows, so uncapped pays ~22 shingles x 1800²/2 pairs
    #     — THE path max_df exists for. Expect uncapped >> capped.
    #   - MinHash-LSH: bands on signatures, so hot shingles only leak in
    #     via band collisions among boilerplate docs — much weaker than
    #     O(df²), but the cap still removes that candidate inflation.
    from xeloader_spark.operators.dedup import (
        jaccard_pairs,
        minhash_neardup,
        shingles,
    )
    from xeloader_spark.operators.skew import make_skewed_corpus

    skewed = make_skewed_corpus(
        spark, n_docs=6000, boiler_tokens=24, body_min=30, body_span=60
    ).localCheckpoint()

    def run_skew(fn, max_df):
        t0 = time.perf_counter()
        pairs = {(r.id_a, r.id_b) for r in fn(max_df).collect()}
        dt = time.perf_counter() - t0
        release_persisted()
        return pairs, dt

    skew_runs = {
        "skew_jaccard": lambda max_df: jaccard_pairs(
            shingles(skewed, n=3), threshold=0.5, max_df=max_df
        ),
        "skew_lsh": lambda max_df: minhash_neardup(
            skewed, threshold=0.5, max_df=max_df
        ),
    }
    family_pairs: dict[str, set] = {}
    for fam, fn in skew_runs.items():
        uncapped_pairs, t_uncapped = run_skew(fn, None)
        capped_pairs, t_capped = run_skew(fn, 100)
        assert uncapped_pairs == capped_pairs, f"max_df changed {fam} results"
        family_pairs[fam] = uncapped_pairs
        if time.perf_counter() - bench_start < budget:  # min-of-2
            t_uncapped = min(t_uncapped, run_skew(fn, None)[1])
            t_capped = min(t_capped, run_skew(fn, 100)[1])
        timings[f"{fam}_uncapped"] = round(t_uncapped, 3)
        timings[f"{fam}_capped"] = round(t_capped, 3)
        for n in (f"{fam}_uncapped", f"{fam}_capped"):
            print(f"[bench] {n}: {timings[n]}s", file=sys.stderr, flush=True)

    # Prefix filtering is the LOSSLESS skew answer: the boilerplate
    # shingles are the most frequent tokens, so they never enter the
    # index — no max_df needed, identical result set guaranteed (and
    # asserted against the exhaustive run above).
    from xeloader_spark.operators.dedup import prefix_jaccard_pairs

    def run_prefix():
        t0 = time.perf_counter()
        pairs = {
            (r.id_a, r.id_b)
            for r in prefix_jaccard_pairs(shingles(skewed, n=3), 1, 2).collect()
        }
        dt = time.perf_counter() - t0
        release_persisted()
        return pairs, dt

    pf_pairs, t_pf = run_prefix()
    assert pf_pairs == family_pairs["skew_jaccard"], "prefix filter lost pairs"
    if time.perf_counter() - bench_start < budget:
        t_pf = min(t_pf, run_prefix()[1])
    timings["skew_prefix_jaccard"] = round(t_pf, 3)

    # Sorted-neighborhood on the same skewed corpus: candidates are
    # O(n·window) by CONSTRUCTION, so the boilerplate hot keys cannot
    # inflate the pair space at all — the wall-clock should track the
    # rank machinery, not the skew. SNM is lossy-by-design (window
    # misses), so assert containment in the exhaustive set, not equality.
    from xeloader_spark.operators.dedup import sorted_neighborhood_pairs

    def run_snm():
        t0 = time.perf_counter()
        pairs = {
            (r.id_a, r.id_b)
            for r in sorted_neighborhood_pairs(skewed, window=5).collect()
        }
        return pairs, time.perf_counter() - t0

    snm_pairs, t_snm = run_snm()
    assert snm_pairs <= family_pairs["skew_jaccard"], "SNM invented pairs"
    if time.perf_counter() - bench_start < budget:
        t_snm = min(t_snm, run_snm()[1])
    timings["skew_snm"] = round(t_snm, 3)
    print(f"[bench] skew_snm: {timings['skew_snm']}s", file=sys.stderr, flush=True)
    print(
        f"[bench] skew_prefix_jaccard: {timings['skew_prefix_jaccard']}s",
        file=sys.stderr,
        flush=True,
    )

    # ANN quality: recall@10 of each approximate path against the exact
    # quantized-dot brute force (the fixture embeddings are unit-norm, so
    # dot, cosine, and L2 rankings coincide and ONE exact baseline serves
    # all three). Regressions in ANN tuning now show up as recall, not
    # just wall-time.
    from xeloader_spark.catalog import load_table as _load
    from xeloader_spark.operators import cluster as _cl
    from xeloader_spark.operators import similarity as _sim

    emb = _load(spark, sf_dir, "embeddings").localCheckpoint()
    rq, rk = list(range(16)), 10

    def topranks(df) -> dict[int, dict[int, int]]:
        out: dict[int, dict[int, int]] = {}
        for r in df.collect():
            out.setdefault(r.query_id, {})[r.candidate_id] = r.rk
        return out

    def topsets(df) -> dict[int, set[int]]:
        return {q: set(d) for q, d in topranks(df).items()}

    exact_top = topsets(_sim.dot_topk_quantized(emb, rq, k=rk))
    recall_at_10: dict[str, float] = {}
    ranks_by_path: dict[str, dict[int, dict[int, int]]] = {}

    def score_recall(nm: str, approx_top: dict[int, set[int]]) -> None:
        recall_at_10[nm] = round(
            sum(
                len(approx_top.get(qid, set()) & hits)
                for qid, hits in exact_top.items()
            )
            / (len(exact_top) * rk),
            4,
        )
        print(
            f"[bench] recall@10 {nm}: {recall_at_10[nm]} "
            f"({timings.get(f'ann_recall_{nm}', 0)}s)",
            file=sys.stderr,
            flush=True,
        )

    # Index-free / one-shot paths: build and query are the same scan, so
    # one row each.
    ann_paths = {
        "lsh_quantized": lambda: _sim.lsh_ann_topk_quantized(
            emb, rq, k=rk, n_planes=6
        ),
        "lsh_banded": lambda: _sim.lsh_ann_topk_banded(
            emb, rq, k=rk, bands=16, planes_per_band=4
        ),
        "ivf": lambda: _sim.ivf_topk(
            emb, rq, k=rk, n_centroids=16, n_probe=8, train_fraction=0.5
        ),
    }
    for nm, mk in ann_paths.items():
        t0 = time.perf_counter()
        ranks_by_path[nm] = topranks(mk())
        timings[f"ann_recall_{nm}"] = round(time.perf_counter() - t0, 3)
        score_recall(nm, {q: set(d) for q, d in ranks_by_path[nm].items()})

    # Trained-index paths, reported as build vs query rows (r5 verdict
    # #3): at 100 TB the index is built once and queried forever, so the
    # per-query number is the one that matters — and the ivfpq row no
    # longer re-fits the PQ codebooks the pq row already trained (the
    # fit settings are identical: m=16, sub_k=16, 1 Lloyd round on the
    # md5-gated quarter sample, salt "pqtrain" — so the shared model is
    # bit-identical to what each path would train itself; equality is
    # pinned in tests/test_extensions.py). ann_recall_* keeps the
    # build+query total for cross-round row comparability, with the
    # ivfpq build counting only its own coarse fit (the PQ fit is the
    # pq row's build, shared).
    def _timed(key: str, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[key] = round(time.perf_counter() - t0, 3)
        print(f"[bench] {key}: {timings[key]}s", file=sys.stderr, flush=True)
        return out

    # ivf_exact: full-corpus coarse fit (the correctness-path settings)
    coarse_full = _timed(
        "ann_ivf_exact_build", lambda: _cl.ivf_fit(emb, km_k=16)
    )
    ranks_by_path["ivf_exact"] = _timed(
        "ann_ivf_exact_query",
        lambda: topranks(
            _cl.ivf_topk_exact(
                emb, rq, k=rk, n_probe=8, km_k=16, centroids=coarse_full
            )
        ),
    )
    # pq: md5-gated sampled training is the production shape (codebook
    # Lloyd rounds scan a fraction, not the corpus); m=16 (4-dim
    # subspaces) per the r4 sweep: recall 0.93 vs 0.775 at m=8; frac
    # 0.25 + one Lloyd round keeps recall@10 ≥ 0.9 (r5 sweep) — the
    # full-training correctness path stays in q_ann_topk_pq and the
    # pytest recall floor.
    pq_model = _timed(
        "ann_pq_build",
        lambda: _cl.pq_fit(emb, m=16, sub_k=16, iters=1, train_fraction=0.25),
    )
    ranks_by_path["pq"] = _timed(
        "ann_pq_query",
        lambda: topranks(
            _cl.pq_topk(emb, rq, k=rk, rerank=200, model=pq_model)
        ),
    )
    # ivfpq: its own sampled coarse fit (2 Lloyd rounds) + the SHARED pq
    # codebooks; probe 12/16 + 200-deep exact re-rank per the r5 sweep
    coarse_s = _timed(
        "ann_ivfpq_build",
        lambda: _cl.ivf_fit(emb, km_k=16, iters=2, train_fraction=0.25),
    )
    ranks_by_path["ivfpq"] = _timed(
        "ann_ivfpq_query",
        lambda: topranks(
            _cl.ivfpq_topk(
                emb, rq, k=rk, n_probe=12, rerank=200,
                coarse_centroids=coarse_s, pq_model=pq_model,
            )
        ),
    )
    for nm in ("ivf_exact", "pq", "ivfpq"):
        timings[f"ann_recall_{nm}"] = round(
            timings[f"ann_{nm}_build"] + timings[f"ann_{nm}_query"], 3
        )
        score_recall(nm, {q: set(d) for q, d in ranks_by_path[nm].items()})
    emb.unpersist()

    # RRF fusion of the two already-collected rankings (q_rank_fusion's
    # operator recipe, scored driver-side from the SAME collected ranks —
    # no extra Spark work): the ensemble should beat both constituents.
    fused: dict[int, set[int]] = {}
    for qid in exact_top:
        cands: dict[int, float] = {}
        for nm in ("ivf_exact", "pq"):
            for cid, r in ranks_by_path.get(nm, {}).get(qid, {}).items():
                cands[cid] = cands.get(cid, 0.0) + 1.0 / (60 + r)
        fused[qid] = {
            cid
            for cid, _ in sorted(
                cands.items(), key=lambda kv: (-kv[1], kv[0])
            )[:rk]
        }
    score_recall("fusion_ivf_pq", fused)

    # Bulk-load throughput — the reference's core function (read →
    # flatten → demux-partitioned write), timed end-to-end into a scratch
    # dir including the actual parquet write, not a noop sink.
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from xeloader_spark.catalog import load_table
    from xeloader_spark.operators.ingest import (
        IngestConfig,
        demux_write,
        flatten_events,
    )

    cfg = IngestConfig(write_mode="overwrite", session_filter=False)

    def run_ingest() -> float:
        tmp = tempfile.mkdtemp(prefix="bench_ingest_")
        try:
            t0 = time.perf_counter()
            ev = load_table(spark, sf_dir, "events").withColumn(
                "e_source_file", F.input_file_name()
            )
            demux_write(flatten_events(ev, cfg), tmp, cfg)
            return time.perf_counter() - t0
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    best = run_ingest()
    if time.perf_counter() - bench_start < budget:
        best = min(best, run_ingest())
    timings["ingest_demux_write"] = round(best, 3)
    print(
        f"[bench] ingest_demux_write: {timings['ingest_demux_write']}s",
        file=sys.stderr,
        flush=True,
    )

    # ann_recall_{ivf_exact,pq,ivfpq} are DERIVED rows (build + query
    # sums kept for cross-round row comparability after the r6 split);
    # their components are already in timings, so exclude the sums from
    # the wall-clock total or the ANN families count double.
    derived = {f"ann_recall_{nm}" for nm in ("ivf_exact", "pq", "ivfpq")}
    total = round(
        sum(v for k, v in timings.items() if k not in derived), 3
    )
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "cpus": cpus,
        "master": spark.sparkContext.master,
        # bench.py's own comparability rule (module docstring): a run
        # started above loadavg 6 is NOT comparable per-row. Recorded as
        # a flag so downstream diffs can discount it mechanically
        # instead of manufacturing phantom regressions (VERDICT r13 #1).
        "contended": loadavg_start[0] > 6,
        "recall_at_10": recall_at_10,
        "pass_totals": {
            "pass1": round(sum(pass1.values()), 3),
            "pass2": round(sum(pass2.values()), 3) if pass2 else None,
            "pass2_queries": len(pass2),
        },
        "loadavg": {
            "start": [round(x, 2) for x in loadavg_start],
            "end": [round(x, 2) for x in os.getloadavg()],
        },
    }
    # The driver captures only the tail of stdout (~2000 chars), and the
    # full per-query map outgrew it in round 3 (BENCH_r03 "parsed": null).
    # Full detail goes to a sidecar file; the FINAL stdout line is a
    # compact summary (≤1500 chars: totals, recall, loadavg, the slowest
    # queries, and a pointer to the sidecar).
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)
    # Per-core-count sidecar twin (VERDICT r13 #1): runs at different
    # $SPARK_GRAFT_CPUS no longer clobber one artifact — the driver's
    # scaling axis (32-core vs 8-core) stays diffable from files alone.
    root, ext = os.path.splitext(detail_path)
    with open(f"{root}_c{cpus}{ext or '.json'}", "w") as fh:
        json.dump(detail, fh, indent=1)
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:8]
    )
    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": float(sf),
        "cpus": cpus,
        "contended": detail["contended"],
        "n_queries": len(timings),
        "queries": slowest,
        "queries_truncated_to_slowest": len(slowest),
        "detail_file": os.path.basename(detail_path),
        "recall_at_10": recall_at_10,
        "pass_totals": detail["pass_totals"],
        "loadavg": detail["loadavg"],
    }
    line = json.dumps(compact)
    if len(line) > 1500:  # hard guarantee for the driver's tail capture
        compact.pop("queries", None)
        compact.pop("loadavg", None)
        line = json.dumps(compact)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
