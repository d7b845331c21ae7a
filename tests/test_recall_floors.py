"""ANN recall floors at sf0.1, pinned in pytest (VERDICT r3 item 6).

bench.py measures recall@10 per round at its SAMPLED-training settings
(the production shape); these tests re-measure at the FULL/correctness
training settings (frac 0.5, 2 Lloyd rounds — what q_ann_topk_pq /
q_ann_topk_ivfpq hash-check) so sampling-induced recall drift stays
attributable (VERDICT r5 item 8): if the bench number dips but these
floors hold, the dip is the documented sampling trade, not a tuning
regression. All pipelines are deterministic (md5 hyperplanes, fixed
k-means seeds, fixed fixture), so measured recalls are stable
run-to-run; floors sit well under the measured values (r5: banded LSH
0.9125, IVF 0.84, IVF-exact 0.80+, PQ 0.93, IVF-PQ 0.875, fusion
0.956) but far above chance. Each test prints its measured value (run
with -s or see BASELINE.md's "recall at correctness settings" column).

Settings mirror the correctness-path queries exactly — if their tuning
changes, change it here too.
"""

from __future__ import annotations

import pytest

from xeloader_spark.catalog import load_table
from xeloader_spark.operators import cluster as cl
from xeloader_spark.operators import similarity as sim

SF01 = "/root/testdata/sf0.1"
QIDS = list(range(16))
K = 10


@pytest.fixture(scope="module")
def emb01(spark):
    df = load_table(spark, SF01, "embeddings").localCheckpoint()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def exact_top(emb01):
    out: dict[int, set[int]] = {}
    for r in sim.dot_topk_quantized(emb01, QIDS, k=K).collect():
        out.setdefault(r.query_id, set()).add(r.candidate_id)
    return out


def _ranks(df) -> dict[int, dict[int, int]]:
    out: dict[int, dict[int, int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, {})[r.candidate_id] = r.rk
    return out


def _recall_of_ranks(ranks, exact_top) -> float:
    return sum(
        len(set(ranks.get(q, {})) & h) for q, h in exact_top.items()
    ) / (len(exact_top) * K)


def _recall(df, exact_top) -> float:
    return _recall_of_ranks(_ranks(df), exact_top)


@pytest.fixture(scope="module")
def ivf_exact_ranks(emb01):
    return _ranks(cl.ivf_topk_exact(emb01, QIDS, k=K, n_probe=8, km_k=16))


@pytest.fixture(scope="module")
def pq_full_ranks(emb01):
    # full/correctness training settings (q_ann_topk_pq's)
    return _ranks(
        cl.pq_topk(
            emb01, QIDS, k=K, m=16, sub_k=16, iters=2, rerank=200,
            train_fraction=0.5,
        )
    )


def test_banded_lsh_recall_floor(emb01, exact_top):
    r = _recall(
        sim.lsh_ann_topk_banded(emb01, QIDS, k=K, bands=16, planes_per_band=4),
        exact_top,
    )
    print(f"\n[recall-floor] banded_lsh@correctness: {r:.4f}")
    assert r >= 0.8, f"banded LSH recall@10 regressed: {r}"


def test_ivf_recall_floor(emb01, exact_top):
    r = _recall(
        sim.ivf_topk(
            emb01, QIDS, k=K, n_centroids=16, n_probe=8, train_fraction=0.5
        ),
        exact_top,
    )
    print(f"\n[recall-floor] ivf@correctness: {r:.4f}")
    assert r >= 0.7, f"IVF recall@10 regressed: {r}"


def test_ivf_exact_recall_floor(ivf_exact_ranks, exact_top):
    r = _recall_of_ranks(ivf_exact_ranks, exact_top)
    print(f"\n[recall-floor] ivf_exact@correctness: {r:.4f}")
    assert r >= 0.7, f"IVF-exact recall@10 regressed: {r}"


def test_pq_recall_floor(pq_full_ranks, exact_top):
    r = _recall_of_ranks(pq_full_ranks, exact_top)
    print(f"\n[recall-floor] pq@correctness: {r:.4f}")
    assert r >= 0.8, f"PQ recall@10 regressed: {r}"  # measured 0.93 (r4)


def test_ivfpq_recall_floor(emb01, exact_top):
    r = _recall(
        cl.ivfpq_topk(
            emb01,
            QIDS,
            k=K,
            n_probe=12,
            km_k=16,
            m=16,
            sub_k=16,
            pq_iters=2,
            rerank=200,
            train_fraction=0.5,
        ),
        exact_top,
    )
    print(f"\n[recall-floor] ivfpq@correctness: {r:.4f}")
    assert r >= 0.75, f"IVF-PQ recall@10 regressed: {r}"  # measured 0.875 (r5)


def test_fusion_recall_floor(ivf_exact_ranks, pq_full_ranks, exact_top):
    """RRF fusion of IVF-exact + PQ at full-training settings — the
    correctness-settings twin of the bench's fusion_ivf_pq row (which
    since r5 fuses SAMPLED-training constituents). r4 measured 0.9563
    at these settings; floor 0.9."""
    fused: dict[int, set[int]] = {}
    for qid in exact_top:
        cands: dict[int, float] = {}
        for ranks in (ivf_exact_ranks, pq_full_ranks):
            for cid, rk in ranks.get(qid, {}).items():
                cands[cid] = cands.get(cid, 0.0) + 1.0 / (60 + rk)
        fused[qid] = {
            cid
            for cid, _ in sorted(
                cands.items(), key=lambda kv: (-kv[1], kv[0])
            )[:K]
        }
    r = sum(len(fused.get(q, set()) & h) for q, h in exact_top.items()) / (
        len(exact_top) * K
    )
    print(f"\n[recall-floor] fusion_ivf_pq@correctness: {r:.4f}")
    assert r >= 0.9, f"fusion recall@10 regressed: {r}"


def test_prebuilt_model_paths_bit_identical(spark):
    """The bench's build/query split (r5 verdict #3) rests on prebuilt
    fits being bit-identical to in-call training: pq_fit/ivf_fit handed
    back via model=/centroids=/pq_model= must reproduce the exact rows
    the self-training calls produce (same md5 gate, same seed rule, same
    Lloyd rounds). sf0.001 keeps this pin cheap."""
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rq = list(range(8))
    a = cl.pq_topk(
        emb, rq, k=5, m=16, sub_k=16, iters=1, rerank=50, train_fraction=0.25
    ).collect()
    pm = cl.pq_fit(emb, m=16, sub_k=16, iters=1, train_fraction=0.25)
    b = cl.pq_topk(emb, rq, k=5, rerank=50, model=pm).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    c = cl.ivfpq_topk(
        emb, rq, k=5, n_probe=12, km_k=16, km_iters=2, m=16, sub_k=16,
        pq_iters=1, rerank=50, train_fraction=0.25,
    ).collect()
    cc = cl.ivf_fit(emb, km_k=16, iters=2, train_fraction=0.25)
    d = cl.ivfpq_topk(
        emb, rq, k=5, n_probe=12, rerank=50,
        coarse_centroids=cc, pq_model=pm,
    ).collect()
    assert sorted(map(tuple, c)) == sorted(map(tuple, d))

    e = cl.ivf_topk_exact(emb, rq, k=5, n_probe=8, km_k=16).collect()
    f = cl.ivf_topk_exact(
        emb, rq, k=5, n_probe=8, km_k=16, centroids=cl.ivf_fit(emb, km_k=16)
    ).collect()
    assert sorted(map(tuple, e)) == sorted(map(tuple, f))


def test_wrong_model_inputs_fail_loudly(spark):
    """r6 code-review hardening: caller-supplied coarse centroids with
    the wrong dimension must raise (the probe loop would zip-truncate
    silently otherwise), and duplicate query_ids must be rejected up
    front (the ADC map literal is keyed by query_id — Spark would throw
    an opaque DUPLICATED_MAP_KEY mid-task)."""
    import pytest

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    bad_centroids = [[0] * 8 for _ in range(4)]  # corpus dim is 64
    with pytest.raises(ValueError, match="centroid dim"):
        cl.ivf_topk_exact(emb, [0, 1], k=3, centroids=bad_centroids)
    with pytest.raises(ValueError, match="coarse centroid dim"):
        cl.ivfpq_topk(
            emb, [0, 1], k=3,
            coarse_centroids=bad_centroids,
            pq_model=cl.pq_fit(emb, m=16, sub_k=4, iters=0),
        )
    with pytest.raises(ValueError, match="duplicate query_ids"):
        cl.pq_topk(emb, [3, 3], k=3, m=16, sub_k=4, iters=0)
    with pytest.raises(ValueError, match="duplicate query_ids"):
        cl.ivfpq_topk(emb, [3, 3], k=3, m=16, sub_k=4, pq_iters=0)
