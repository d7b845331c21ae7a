"""Scale-knob tests: salted join equivalence, bucketed co-located joins
(no Exchange), and the stateful streaming sessionizer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xeloader_spark.catalog import load_table
from xeloader_spark.operators import skew
from xeloader_spark.plans import physical_plan
from xeloader_spark.streaming import ingest_stream as st
from xeloader_spark.streaming.sessionize import start_sessionize

SF = "/root/testdata/sf0.001"


class TestSaltedJoin:
    def test_equivalence_with_plain_join(self, spark):
        li = load_table(spark, SF, "lineitem")
        orders = load_table(spark, SF, "orders").select("o_orderkey", "o_orderpriority")
        plain = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        salted = (
            skew.salted_join(
                li.withColumnRenamed("l_orderkey", "k"),
                orders.withColumnRenamed("o_orderkey", "k"),
                "k",
                salt_n=4,
            )
            .groupBy("o_orderpriority")
            .count()
        )
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        )

    def test_rejects_right_joins(self, spark):
        li = load_table(spark, SF, "lineitem")
        with pytest.raises(ValueError):
            skew.salted_join(li, li, "l_orderkey", how="full")


class TestBloomPruneJoin:
    def test_equivalence_and_actual_pruning(self, spark):
        li = load_table(spark, SF, "lineitem")
        orders = load_table(spark, SF, "orders").filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1996-04-01")
        )
        plain = li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).count()
        joined = skew.bloom_prune_join(li, orders, "l_orderkey", "o_orderkey")
        assert joined.count() == plain

        # the prune must actually prune: fact survivors of the Bloom
        # filter alone sit between the true match count and far below
        # the full fact count for this selective cohort (no false
        # negatives, few false positives at m=32768)
        n_fact = li.count()
        n_semi = li.join(
            orders, li.l_orderkey == orders.o_orderkey, "left_semi"
        ).count()
        n_pruned = skew.bloom_prune(
            li, orders, "l_orderkey", "o_orderkey"
        ).count()
        assert n_semi <= n_pruned < n_fact // 2

    def test_rejects_outer_joins(self, spark):
        li = load_table(spark, SF, "lineitem")
        with pytest.raises(ValueError):
            skew.bloom_prune_join(li, li, "l_orderkey", "l_orderkey", how="left")


class TestBucketedJoin:
    def test_colocated_join_has_no_exchange(self, spark, tmp_path):
        # (warehouse dir is a static conf; managed tables land in
        # ./spark-warehouse and are dropped in finally)
        spark.sql("CREATE DATABASE IF NOT EXISTS buckets_db")
        spark.sql("USE buckets_db")
        prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        # tiny test tables would broadcast; force the sort-merge path the
        # bucketing exists for
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            li = load_table(spark, SF, "lineitem")
            orders = load_table(spark, SF, "orders")
            skew.write_bucketed(li, "b_lineitem", "l_orderkey", 8)
            skew.write_bucketed(orders, "b_orders", "o_orderkey", 8)
            a = spark.table("b_lineitem")
            b = spark.table("b_orders")
            joined = a.join(b, a.l_orderkey == b.o_orderkey).select(
                "l_orderkey", "o_orderpriority"
            )
            plan = physical_plan(joined)
            # co-located: neither side shuffles (no hash-partitioning
            # exchange); both scans read bucketed
            assert "Exchange hashpartitioning" not in plan, plan
            assert "SortMergeJoin" in plan, plan
            assert joined.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
            spark.sql("DROP TABLE IF EXISTS b_lineitem")
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("USE default")


class TestSessionize:
    def test_gap_sessionization(self, spark, tmp_path):
        # events fixture spans ~a simulated stream; use a 30-min gap
        root = str(tmp_path / "in")
        ev = load_table(spark, SF, "events")
        ev.coalesce(2).write.mode("overwrite").parquet(root)

        stream = st.read_event_stream(spark, root)
        q = start_sessionize(
            stream,
            str(tmp_path / "ckpt"),
            gap_seconds=1800,
            watermark="0 seconds",
            queryName="sessions_t",
        )
        q.awaitTermination(180)
        got = spark.sql("select * from sessions_t")
        rows = got.collect()
        assert len(rows) > 0
        # invariants: sessions are well-formed and disjoint per user
        by_user: dict[int, list] = {}
        for r in rows:
            assert r.session_start <= r.session_end
            assert r.n_events >= 1
            by_user.setdefault(r.user_id, []).append(r)
        for sess in by_user.values():
            sess.sort(key=lambda r: r.session_start)
            for a, b in zip(sess, sess[1:]):
                gap = (b.session_start - a.session_end).total_seconds()
                assert gap > 1800, (a, b)
        # conservation: emitted sessions cover only closed sessions; the
        # final (open) session per user may be withheld by the watermark
        n_emitted = sum(r.n_events for r in rows)
        assert n_emitted <= ev.count()


def test_zorder_layout_prunes(spark, tmp_path):
    """Z-order write produces files whose Morton-key ranges are DISJOINT
    (range partitioning), i.e. parquet min/max footers can prune scans
    on either clustered column; rows are conserved."""
    from xeloader_spark.catalog import load_table
    from xeloader_spark.operators.skew import z_value, zorder_write

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "event_type"
    )
    out = str(tmp_path / "zorder")
    zorder_write(ev, out, "user_id", "event_id", bits=14, n_files=8)

    back = spark.read.parquet(out).withColumn(
        "_f", F.input_file_name()
    ).withColumn("_z", z_value("user_id", "event_id", bits=14))
    assert back.count() == ev.count()
    ranges = {
        r._f: (r.zmin, r.zmax)
        for r in back.groupBy("_f")
        .agg(F.min("_z").alias("zmin"), F.max("_z").alias("zmax"))
        .collect()
    }
    assert len(ranges) >= 2  # actually clustered into multiple files
    spans = sorted(ranges.values())
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, (spans,)  # disjoint → footer stats prune
