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
