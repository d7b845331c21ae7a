"""Exact k-means: Lloyd behavior and scale shape.

Cross-engine parity (every assignment + distance vs the unrolled-CTE
DuckDB replay) is covered by test_oracle_parity; these pin the
algorithmic properties and the plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xeloader_spark.catalog import load_table
from xeloader_spark.operators import cluster as cls
from xeloader_spark.plans.inspect import count_exchanges


def test_assignment_is_shuffle_free(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = cls._quantized(emb, "vec_id", "embedding", cls.SCALE)
    assigned = cls._assign(q, [[0] * 64, [2000] * 64])
    assert count_exchanges(assigned) == 0, (
        "k-means assignment must be a pure projection (centroids are "
        "plan literals); found a shuffle:\n" + assigned._jdf.queryExecution().toString()
    )


def test_deterministic_and_complete(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = cls.kmeans_exact(emb).collect()
    b = cls.kmeans_exact(emb).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == emb.count()  # every vector assigned exactly once
    assert {r.cluster for r in a} <= set(range(cls.K))


def test_objective_improves_over_no_iteration(spark, sf_dir):
    """Three Lloyd rounds must not do worse than the raw seeds."""
    emb = load_table(spark, sf_dir, "embeddings")
    trained = cls.kmeans_exact(emb, iters=cls.ITERS)
    seeded = cls.kmeans_exact(emb, iters=0)
    obj_t = trained.agg(F.sum("dist")).collect()[0][0]
    obj_s = seeded.agg(F.sum("dist")).collect()[0][0]
    assert obj_t <= obj_s, (obj_t, obj_s)


class TestProductQuantization:
    def test_rerank_recall_beats_chance(self, spark, sf_dir):
        """Deterministic pipeline → deterministic recall. On these
        near-random fixture embeddings (PQ's worst case: no cluster
        structure) the 50-deep ADC shortlist + exact re-rank must still
        hold well above the chance rate of a random 50-of-500 shortlist
        (~0.1)."""
        import numpy as np

        from xeloader_spark.catalog import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        qids = [0, 1, 2, 3, 4]
        got = cls.pq_topk(emb, qids, k=10, rerank=50).collect()
        pq_sets: dict[int, set] = {}
        for r in got:
            pq_sets.setdefault(r.query_id, set()).add(r.candidate_id)

        pdf = emb.select("vec_id", "embedding").toPandas()
        M = np.array([np.array(v) for v in pdf.embedding])
        ids = pdf.vec_id.values
        recalls = []
        for q in qids:
            qv = M[ids == q][0]
            d = ((M - qv) ** 2).sum(axis=1)
            order = np.argsort(d, kind="stable")
            top = [int(ids[i]) for i in order if int(ids[i]) != q][:10]
            recalls.append(len(pq_sets[q] & set(top)) / 10)
        assert sum(recalls) / len(recalls) >= 0.3, recalls
        cls.release_persisted()

    def test_codes_are_compact_and_complete(self, spark, sf_dir):
        from xeloader_spark.catalog import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        out = cls.pq_topk(emb, [0, 1], k=3, rerank=0)
        rows = out.collect()
        assert len(rows) == 6  # k per query
        assert all(r.rk <= 3 and r.adc_dist >= 0 for r in rows)
        cls.release_persisted()


class TestKCenterEdgeCases:
    def test_k_exceeding_corpus_returns_full_selection(self, spark):
        import pytest

        small = spark.createDataFrame(
            [(i, [i / 4.0, 0.0]) for i in range(3)],
            "vec_id long, embedding array<double>",
        )
        out = cls.kcenter_select(small, k=10).collect()
        # all 3 points selected, rounds 0..2, no AttributeError on -NULL
        assert sorted(r.vec_id for r in out) == [0, 1, 2]
        assert sorted(r.round for r in out) == [0, 1, 2]
        # coverage radius is non-increasing after the seed round
        dists = [r.dist_at_selection for r in sorted(out, key=lambda r: r.round)]
        assert all(a >= b for a, b in zip(dists[1:], dists[2:]))

    def test_empty_corpus_raises_value_error(self, spark):
        import pytest

        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="empty corpus"):
            cls.kcenter_select(empty, k=2)
