"""ANN recall floors at sf0.1, pinned in pytest (VERDICT r3 item 6).

bench.py measures recall@10 per round; these floors make a tuning
regression FAIL TESTS instead of quietly shrinking a bench number. All
pipelines are deterministic (md5 hyperplanes, fixed k-means seeds, fixed
fixture), so the measured recalls are stable run-to-run; floors sit well
under the measured values (r3/r4 bench: banded LSH 0.9125, IVF 0.84,
IVF-exact 0.80, PQ 0.775) but far above chance.

Settings mirror bench.py's ann_paths block exactly — if bench tuning
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


def _recall(df, exact_top) -> float:
    got: dict[int, set[int]] = {}
    for r in df.collect():
        got.setdefault(r.query_id, set()).add(r.candidate_id)
    return sum(len(got.get(q, set()) & h) for q, h in exact_top.items()) / (
        len(exact_top) * K
    )


def test_banded_lsh_recall_floor(emb01, exact_top):
    r = _recall(
        sim.lsh_ann_topk_banded(emb01, QIDS, k=K, bands=16, planes_per_band=4),
        exact_top,
    )
    assert r >= 0.8, f"banded LSH recall@10 regressed: {r}"


def test_ivf_recall_floor(emb01, exact_top):
    r = _recall(
        sim.ivf_topk(
            emb01, QIDS, k=K, n_centroids=16, n_probe=8, train_fraction=0.5
        ),
        exact_top,
    )
    assert r >= 0.7, f"IVF recall@10 regressed: {r}"


def test_ivf_exact_recall_floor(emb01, exact_top):
    r = _recall(
        cl.ivf_topk_exact(emb01, QIDS, k=K, n_probe=8, km_k=16), exact_top
    )
    assert r >= 0.7, f"IVF-exact recall@10 regressed: {r}"


def test_pq_recall_floor(emb01, exact_top):
    r = _recall(
        cl.pq_topk(
            emb01,
            QIDS,
            k=K,
            m=16,
            sub_k=16,
            iters=2,
            rerank=200,
            train_fraction=0.5,
        ),
        exact_top,
    )
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
    assert r >= 0.75, f"IVF-PQ recall@10 regressed: {r}"  # measured 0.875 (r5)
