"""Temporal operators: as-of join, interval join, gap-filled rollup,
approximate distinct. Semantics pinned against naive formulations; plan
shape pinned so the scale properties (single shuffle, no nested loop)
don't regress."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from xeloader_spark.catalog import load_table
from xeloader_spark.operators.temporal import (
    asof_join,
    funnel,
    interval_join,
    rollup_gapfill,
)
from xeloader_spark.plans.inspect import count_exchanges, physical_plan

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def ts(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            Row(sym="A", ts=ts(1), qty=10),
            Row(sym="A", ts=ts(5), qty=20),
            Row(sym="A", ts=ts(10), qty=30),
            Row(sym="B", ts=ts(3), qty=40),
            Row(sym="C", ts=ts(7), qty=50),  # no quotes at all
        ]
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            Row(sym="A", ts=ts(0), px=1.0, qid=1),
            Row(sym="A", ts=ts(5), px=2.0, qid=2),  # equal-ts: at-or-before
            Row(sym="A", ts=ts(5), px=3.0, qid=3),  # tie on ts → max qid wins
            Row(sym="A", ts=ts(8), px=4.0, qid=4),
            Row(sym="B", ts=ts(9), px=5.0, qid=5),  # only AFTER B's trade
        ]
    )


class TestAsofJoin:
    def test_backward_semantics(self, trades, quotes):
        out = asof_join(
            trades, quotes, on="sym", right_cols=["px", "qid"], tie_col="qid"
        )
        got = {(r.sym, r.ts): (r.px, r.qid) for r in out.collect()}
        assert got[("A", ts(1))] == (1.0, 1)
        # equal timestamp is at-or-before; tie on ts broken by max qid
        assert got[("A", ts(5))] == (3.0, 3)
        assert got[("A", ts(10))] == (4.0, 4)
        # B's only quote is after the trade; C has none
        assert got[("B", ts(3))] == (None, None)
        assert got[("C", ts(7))] == (None, None)
        assert out.count() == 5  # every left row survives

    def test_forward_semantics(self, trades, quotes):
        out = asof_join(
            trades,
            quotes,
            on="sym",
            right_cols=["px", "qid"],
            tie_col="qid",
            direction="forward",
        )
        got = {(r.sym, r.ts): (r.px, r.qid) for r in out.collect()}
        # nearest at-or-after; tie on ts broken by MIN qid for forward
        assert got[("A", ts(1))] == (2.0, 2)
        assert got[("A", ts(5))] == (2.0, 2)
        assert got[("A", ts(10))] == (None, None)
        assert got[("B", ts(3))] == (5.0, 5)

    def test_tolerance(self, trades, quotes):
        out = asof_join(
            trades,
            quotes,
            on="sym",
            right_cols=["px", "qid"],
            tie_col="qid",
            tolerance_seconds=2,
        )
        got = {(r.sym, r.ts): r.qid for r in out.collect()}
        assert got[("A", ts(1))] == 1  # 1s old: within tolerance
        assert got[("A", ts(10))] == 4  # 2s old: inclusive boundary
        assert got[("A", ts(5))] == 3  # exact-ts match, age 0

    def test_matches_naive_on_fixture(self, spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        clicks = ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        purch = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", F.col("event_id").alias("pid")
        )
        fast = asof_join(
            clicks, purch, on="user_id", right_cols=["pid"], tie_col="pid"
        ).select("event_id", "pid")
        # naive: inequality join + max_by over (ts, pid)
        naive = (
            clicks.alias("c")
            .join(
                purch.alias("p"),
                (F.col("c.user_id") == F.col("p.user_id"))
                & (F.col("p.ts") <= F.col("c.ts")),
                "left",
            )
            .groupBy(F.col("c.event_id").alias("event_id"))
            .agg(F.max(F.struct(F.col("p.ts"), F.col("p.pid"))).alias("m"))
            .select("event_id", F.col("m.pid").alias("pid"))
        )
        assert fast.exceptAll(naive).count() == 0
        assert naive.exceptAll(fast).count() == 0

    def test_single_shuffle_plan(self, trades, quotes):
        out = asof_join(trades, quotes, on="sym", right_cols=["px"], tie_col="px")
        plan = physical_plan(out, mode="simple")
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges == 1, f"asof_join should shuffle once:\n{plan}"


class TestIntervalJoin:
    def test_matches_nonequi_join(self, spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        errors = ev.filter(F.col("event_type") == "error").select(
            F.col("event_id").alias("error_id"),
            "user_id",
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 90 SECONDS")).alias("end_ts"),
        )
        clicks = ev.filter(F.col("event_type") == "click").select(
            "user_id",
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        fast = interval_join(
            clicks, errors, on="user_id", point_ts="click_ts", bucket_seconds=60
        ).select("error_id", "click_id")
        naive = (
            clicks.join(
                errors,
                (clicks.user_id == errors.user_id)
                & (clicks.click_ts >= errors.start_ts)
                & (clicks.click_ts <= errors.end_ts),
            )
            .select("error_id", "click_id")
        )
        assert fast.exceptAll(naive).count() == 0
        assert naive.exceptAll(fast).count() == 0

    def test_boundaries_inclusive_and_no_dup(self, spark):
        points = spark.createDataFrame(
            [Row(k=1, ts=ts(0)), Row(k=1, ts=ts(60)), Row(k=1, ts=ts(61))]
        )
        ivs = spark.createDataFrame(
            [Row(k=1, iv_id=1, start_ts=ts(0), end_ts=ts(60))]
        )
        out = interval_join(
            points, ivs, on="k", bucket_seconds=7  # buckets misaligned on purpose
        )
        rows = [(r.ts, r.iv_id) for r in out.collect()]
        assert (ts(0), 1) in rows and (ts(60), 1) in rows
        assert all(t != ts(61) for t, _ in rows)
        assert len(rows) == 2  # each pair exactly once despite multi-bucket span

    def test_no_nested_loop_in_plan(self, spark):
        points = spark.createDataFrame([Row(k=1, ts=ts(0))])
        ivs = spark.createDataFrame([Row(k=1, start_ts=ts(0), end_ts=ts(60))])
        plan = physical_plan(
            interval_join(points, ivs, on="k"), mode="simple"
        )
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan


class TestRollupGapfill:
    def test_dense_spine_and_fills(self, spark):
        df = spark.createDataFrame(
            [
                Row(g="x", ts=ts(0), v=1.0),
                Row(g="x", ts=ts(3 * 3600), v=5.0),  # hours 1,2 are gaps
                Row(g="y", ts=ts(3600), v=2.0),
            ]
        )
        out = rollup_gapfill(
            df,
            ts_col="ts",
            bucket_seconds=3600,
            keys=["g"],
            aggs=[
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("v").cast("decimal(25,6)")).cast("double").alias("s"),
            ],
            zero_cols=["n"],
            locf_cols=["s"],
        ).collect()
        by = {(r.g, r.bucket_ts): r for r in out}
        # spine: global [hour0, hour3] × {x, y} = 8 rows
        assert len(out) == 8
        assert by[("x", ts(3600))].n == 0  # zero-filled gap
        assert by[("x", ts(3600))].s == 1.0  # locf carries hour0's sum
        assert by[("x", ts(2 * 3600))].s == 1.0
        assert by[("x", ts(3 * 3600))].s == 5.0
        assert by[("y", ts(0))].s is None  # leading gap stays null
        assert by[("y", ts(0))].n == 0
        assert by[("y", ts(3600))].s == 2.0

    def test_count_type_preserved(self, spark):
        df = spark.createDataFrame([Row(g="x", ts=ts(0), v=1.0)])
        out = rollup_gapfill(
            df, keys=["g"], aggs=[F.count(F.lit(1)).alias("n")], zero_cols=["n"]
        )
        assert dict(out.dtypes)["n"] == "bigint"


class TestSessionizeBatchStreamParity:
    def test_closed_stream_sessions_match_batch(self, spark, sf_dir, tmp_path):
        """The applyInPandasWithState sessionizer must produce exactly the
        sessions the oracle-checked batch plan produces (closed sessions
        are a subset — the watermark may withhold each user's last)."""
        from xeloader_spark.queries.temporal import q_sessionize_gap_batch
        from xeloader_spark.streaming import ingest_stream as st
        from xeloader_spark.streaming.sessionize import start_sessionize

        batch = {
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in q_sessionize_gap_batch(spark, sf_dir).collect()
        }
        root = str(tmp_path / "in")
        load_table(spark, sf_dir, "events").coalesce(2).write.mode(
            "overwrite"
        ).parquet(root)
        q = start_sessionize(
            st.read_event_stream(spark, root),
            str(tmp_path / "ckpt"),
            gap_seconds=1800,
            watermark="0 seconds",
            queryName="sessions_parity",
        )
        q.awaitTermination(180)
        rows = spark.sql("select * from sessions_parity").collect()
        assert rows
        for r in rows:
            key = (r.user_id, r.session_start, r.session_end, r.n_events)
            assert key in batch, f"stream session not in batch result: {key}"


class TestApproxDistinct:
    def test_within_tolerance_of_exact(self, spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        both = (
            ev.groupBy("event_type")
            .agg(
                F.approx_count_distinct("user_id").alias("approx"),
                F.countDistinct("user_id").alias("exact"),
            )
            .collect()
        )
        assert both
        for r in both:
            assert abs(r.approx - r.exact) <= max(2, 0.1 * r.exact), (
                r.event_type,
                r.approx,
                r.exact,
            )

    def test_approx_percentile_near_exact(self, spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        rows = (
            ev.groupBy("event_type")
            .agg(
                F.percentile_approx("value", 0.5).alias("approx_med"),
                F.expr("percentile(value, 0.5)").alias("exact_med"),
            )
            .collect()
        )
        assert rows
        for r in rows:
            assert abs(r.approx_med - r.exact_med) <= 2.0, r

    def test_hll_union_matches_global(self, spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        per = ev.groupBy("event_type").agg(F.hll_sketch_agg("user_id").alias("sk"))
        merged = per.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
        ).collect()[0]["est"]
        exact = ev.select("user_id").distinct().count()
        assert abs(merged - exact) <= max(2, 0.1 * exact)


class TestFunnel:
    def _fixture(self, spark):
        t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
        s = lambda sec: t0 + dt.timedelta(seconds=sec)
        rows = [
            # user 1: clean view -> click -> purchase
            (1, s(0), "view", 100),
            (1, s(10), "click", 101),
            (1, s(20), "purchase", 102),
            # user 2: click BEFORE the first view must not count;
            # no later click, so funnel stops at step 1
            (2, s(0), "click", 200),
            (2, s(10), "view", 201),
            (2, s(20), "purchase", 202),
            # user 3: purchase before the qualifying click must not count
            (3, s(0), "view", 300),
            (3, s(5), "purchase", 301),
            (3, s(10), "click", 302),
            # user 4: same-timestamp click does not count (strict >),
            # the later one does
            (4, s(0), "view", 400),
            (4, s(0), "click", 401),
            (4, s(30), "click", 402),
        ]
        return spark.createDataFrame(
            rows, ["user_id", "ts", "event_type", "event_id"]
        )

    def test_strict_ordering_semantics(self, spark):
        per_user = {
            r.user: r
            for r in funnel(
                self._fixture(spark), steps=("view", "click", "purchase")
            ).collect()
        }
        t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
        u1 = per_user[1]
        assert (u1.t_1, u1.t_2, u1.t_3) == (
            t0,
            t0 + dt.timedelta(seconds=10),
            t0 + dt.timedelta(seconds=20),
        )
        u2 = per_user[2]
        assert u2.t_1 == t0 + dt.timedelta(seconds=10)
        assert u2.t_2 is None and u2.t_3 is None
        u3 = per_user[3]
        assert u3.t_2 == t0 + dt.timedelta(seconds=10)
        assert u3.t_3 is None
        u4 = per_user[4]
        assert u4.t_2 == t0 + dt.timedelta(seconds=30)

    def test_single_shuffle_regardless_of_depth(self, spark):
        deep = funnel(
            self._fixture(spark),
            steps=("view", "click", "purchase", "view", "click"),
        )
        assert count_exchanges(deep) == 1, physical_plan(deep)


class TestScd2History:
    def test_runs_compress_and_bounds_chain(self, spark):
        from xeloader_spark.operators.temporal import scd2_history

        rows = [
            # key 1: a a b a  -> 3 versions
            (1, 1, 100, "a"),
            (1, 2, 200, "a"),
            (1, 3, 300, "b"),
            (1, 4, 400, "a"),
            # key 2: single run
            (2, 5, 100, "x"),
            (2, 6, 150, "x"),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, t long, event_type string"
        ).withColumn("ts", F.timestamp_seconds("t"))
        out = {
            (r.user_id, r.version): r
            for r in scd2_history(df).collect()
        }
        assert len(out) == 4
        v1, v2, v3 = out[(1, 1)], out[(1, 2)], out[(1, 3)]
        assert (v1.event_type, v2.event_type, v3.event_type) == ("a", "b", "a")
        assert (v1.n_events, v2.n_events, v3.n_events) == (2, 1, 1)
        # validity bounds chain: each version closes where the next opens
        assert v1.effective_to == v2.effective_from
        assert v2.effective_to == v3.effective_from
        assert v3.effective_to is None  # current version stays open
        assert out[(2, 1)].n_events == 2
        assert out[(2, 1)].effective_to is None

    def test_single_shuffle_plan(self, spark):
        from xeloader_spark import plans
        from xeloader_spark.queries import temporal as qt

        df = qt.q_scd2_history(spark, "/root/testdata/sf0.001")
        plans.assert_max_shuffles(df, 1)

    def test_conservation_and_dense_versions(self, spark):
        """Run lengths partition the per-key event count and versions are
        dense 1..max — on the real fixture, not a toy."""
        from xeloader_spark.operators.temporal import scd2_history

        events = load_table(
            spark, "/root/testdata/sf0.001", "events"
        ).filter(F.col("user_id") < 200)
        hist = scd2_history(events).collect()
        per_key_hist: dict[int, list] = {}
        for r in hist:
            per_key_hist.setdefault(r.user_id, []).append(r)
        per_key_events = {
            r.user_id: r.cnt
            for r in events.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        assert set(per_key_hist) == set(per_key_events)
        for uid, rows in per_key_hist.items():
            # run lengths sum to the key's event count
            assert sum(r.n_events for r in rows) == per_key_events[uid]
            # versions dense from 1, exactly one open version at the end
            versions = sorted(r.version for r in rows)
            assert versions == list(range(1, len(rows) + 1))
            open_rows = [r for r in rows if r.effective_to is None]
            assert len(open_rows) == 1
            assert open_rows[0].version == len(rows)


class TestLag1Autocorrelation:
    def test_alternating_and_constant_series(self, spark):
        """A strict high/low alternating hourly series has acf1 = -1;
        a constant series is degenerate and must emit exactly 0."""
        import datetime as dt

        from xeloader_spark.operators.temporal import lag1_autocorrelation

        base = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for h in range(24):
            # 'alt': 3 events on even hours, 1 on odd; 'flat': always 2
            for _ in range(3 if h % 2 == 0 else 1):
                rows.append((eid, base + dt.timedelta(hours=h), "alt")); eid += 1
            for _ in range(2):
                rows.append((eid, base + dt.timedelta(hours=h), "flat")); eid += 1
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string"
        )
        got = {
            r.event_type: r
            for r in lag1_autocorrelation(df, keys=("event_type",)).collect()
        }
        assert got["alt"].n_pairs == 23
        assert got["alt"].acf1 == -1.0
        assert got["flat"].acf1 == 0.0

    def test_gapfill_zeros_enter_the_series(self, spark):
        """An hour with no events must appear as x=0, not be skipped:
        two spikes with a silent hour between them must produce pairs
        containing zeros (sx < 2 * spike)."""
        import datetime as dt

        from xeloader_spark.operators.temporal import lag1_autocorrelation

        base = dt.datetime(2024, 1, 1)
        rows = [(i, base, "t") for i in range(4)] + [
            (10 + i, base + dt.timedelta(hours=2), "t") for i in range(4)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string"
        )
        r = lag1_autocorrelation(df, keys=("event_type",)).collect()[0]
        assert r.n_pairs == 2  # 3 buckets -> 2 pairs, middle is the zero
        assert r.sx == 4 and r.sy == 4 and r.sxy == 0


class TestCdcApply:
    def _log(self, spark, rows):
        return spark.createDataFrame(
            rows, "k long, seq long, op string, v string"
        )

    def test_delete_wins_and_audit(self, spark):
        from xeloader_spark.operators.temporal import cdc_apply

        log = self._log(
            spark,
            [
                (1, 1, "I", "a"), (1, 2, "U", "b"),           # live, updated
                (2, 1, "I", "x"), (2, 2, "D", None),          # deleted
                (3, 1, "I", "q"), (3, 2, "D", None), (3, 3, "I", "r"),  # re-inserted
            ],
        )
        got = {
            r.k: r
            for r in cdc_apply(
                log, ["k"], ["seq"], "op", ["v"]
            ).collect()
        }
        assert set(got) == {1, 3}
        assert got[1].v == "b" and got[1].last_op == "U"
        assert (got[1].n_ops, got[1].n_inserts, got[1].n_updates, got[1].n_deletes) == (2, 1, 1, 0)
        assert got[3].v == "r" and got[3].n_deletes == 1 and got[3].n_inserts == 2

    def test_replay_idempotent(self, spark):
        """Replaying the same log rows (at-least-once delivery) must not
        change the snapshot — max is idempotent."""
        from xeloader_spark.operators.temporal import cdc_apply

        rows = [(1, 1, "I", "a"), (1, 2, "U", "b"), (2, 1, "I", "x")]
        once = cdc_apply(self._log(spark, rows), ["k"], ["seq"], "op", ["v"])
        twice = cdc_apply(
            self._log(spark, rows + rows), ["k"], ["seq"], "op", ["v"]
        )
        o = {(r.k, r.seq, r.last_op, r.v) for r in once.collect()}
        t = {(r.k, r.seq, r.last_op, r.v) for r in twice.collect()}
        assert o == t

    def test_single_shuffle_plan(self, spark):
        from xeloader_spark.operators.temporal import cdc_apply
        from xeloader_spark.plans import inspect as plans

        log = self._log(spark, [(1, 1, "I", "a")])
        plans.assert_max_shuffles(
            cdc_apply(log, ["k"], ["seq"], "op", ["v"]), 1
        )


class TestDistributionDrift:
    def test_no_drift_and_full_drift(self, spark):
        """Identical halves → TVD 0; disjoint category sets → TVD 1."""
        import datetime as dt

        from xeloader_spark.operators.temporal import distribution_drift

        base = dt.datetime(2024, 1, 1)
        h = dt.timedelta(hours=1)
        same = [(i, base, "a") for i in range(3)] + [
            (i, base + 2 * h, "a") for i in range(3)
        ]
        df = spark.createDataFrame(same, "id long, ts timestamp, event_type string")
        r = distribution_drift(df).collect()[0]
        assert r.tvd_total == 0.0 and r.cross_diff == 0

        flip = [(i, base, "a") for i in range(3)] + [
            (i, base + 2 * h, "b") for i in range(4)
        ]
        df2 = spark.createDataFrame(flip, "id long, ts timestamp, event_type string")
        rows = {r.event_type: r for r in distribution_drift(df2).collect()}
        assert rows["a"].tvd_total == 1.0
        assert rows["a"].n_first == 3 and rows["a"].n_second == 0
        assert rows["b"].share_delta == 1.0


class TestMarkovTransitions:
    def test_known_chain(self, spark):
        """a→b→a→b for one user and a→a for another: transition rows and
        row-normalized probabilities are fully determined."""
        import datetime as dt

        from xeloader_spark.operators.temporal import markov_transitions

        base = dt.datetime(2024, 1, 1)
        s = dt.timedelta(seconds=1)
        rows = [
            (1, base + 0 * s, 1, "a"), (2, base + 1 * s, 1, "b"),
            (3, base + 2 * s, 1, "a"), (4, base + 3 * s, 1, "b"),
            (5, base + 0 * s, 2, "a"), (6, base + 1 * s, 2, "a"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        )
        got = {
            (r.prev_state, r.next_state): (r.n_transitions, r.n_from_prev, r.p_transition)
            for r in markov_transitions(df).collect()
        }
        assert got == {
            ("a", "b"): (2, 3, 2 / 3),
            ("a", "a"): (1, 3, 1 / 3),
            ("b", "a"): (1, 1, 1.0),
        }
        # no cross-user transition (user 1 ends with b, user 2 starts with a)
        assert ("b", "b") not in got

    def test_probabilities_sum_to_one_per_row(self, spark):
        from xeloader_spark.catalog import load_table
        from xeloader_spark.operators.temporal import markov_transitions

        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        rows = markov_transitions(ev).collect()
        from collections import defaultdict

        sums = defaultdict(float)
        for r in rows:
            sums[r.prev_state] += r.p_transition
        assert all(abs(v - 1.0) < 1e-9 for v in sums.values())


class TestScd2PointInTime:
    def test_every_fact_hits_its_containing_run(self, spark):
        """The composed scd2 → as-of join must attach the run containing
        each event (consistency invariant) including run-start ties."""
        from xeloader_spark.queries.temporal import q_scd2_pointintime

        rows = q_scd2_pointintime(spark, "/root/testdata/sf0.001").collect()
        assert rows and all(r.consistent for r in rows)
        assert all(r.effective_from <= r.ts for r in rows)


def test_native_session_window_matches_gap_sessionizer(spark):
    """Spark's built-in session_window (gap-merge semantics) must carve
    the same sessions as the window-based batch sessionizer (and hence
    the applyInPandasWithState streaming twin): same (user, first-event,
    event-count) triples on the fixture. (The only semantic edge is a
    gap of EXACTLY 30:00.000000 — `>` vs `>=` — which microsecond
    timestamps never hit.)"""
    from xeloader_spark.catalog import load_table
    from xeloader_spark.queries.temporal import q_sessionize_gap_batch

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    native = (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("first_ts"))
        .select("user_id", "first_ts", "n_events")
    )
    batch = q_sessionize_gap_batch(spark, "/root/testdata/sf0.001").select(
        "user_id",
        F.col("session_start").alias("first_ts"),
        "n_events",
    )
    a = {(r.user_id, r.first_ts, r.n_events) for r in native.collect()}
    b = {(r.user_id, r.first_ts, r.n_events) for r in batch.collect()}
    assert a == b and len(a) > 100


class TestSeriesCorrelation:
    def test_perfect_and_anti_correlation(self, spark):
        """Two series with identical hourly counts → r = 1; a series
        high exactly when another is low → r = -1; a constant series
        emits 0 by convention."""
        import datetime as dt

        from xeloader_spark.operators.temporal import series_correlation

        base = dt.datetime(2024, 1, 1)
        rows, eid = [], 0
        for h in range(12):
            hi = h % 2 == 0
            for _ in range(3 if hi else 1):
                rows.append((eid, base + dt.timedelta(hours=h), "a")); eid += 1
                rows.append((eid, base + dt.timedelta(hours=h), "b")); eid += 1
            for _ in range(1 if hi else 3):
                rows.append((eid, base + dt.timedelta(hours=h), "c")); eid += 1
            for _ in range(2):
                rows.append((eid, base + dt.timedelta(hours=h), "d")); eid += 1
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string"
        )
        got = {
            (r.cat_a, r.cat_b): r.pearson_r
            for r in series_correlation(df).collect()
        }
        assert got[("a", "b")] == 1.0
        assert got[("a", "c")] == -1.0
        assert got[("a", "d")] == 0.0  # constant partner → degenerate 0
        assert len(got) == 6


def test_cooccurrence_lift_closed_form(spark):
    """3 users: u1{a,b}, u2{a,b}, u3{a}: support(a,b)=2, lift =
    2·3/(3·2) = 1.0; a pair never co-occurring is absent."""
    from xeloader_spark.queries import temporal as qt
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1, "a"), (2, base, 1, "b"),
        (3, base, 2, "a"), (4, base, 2, "b"),
        (5, base, 3, "a"), (6, base, 3, "a"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    import xeloader_spark.catalog as cat

    # drive the query body directly on the frame via the operator logic:
    ut = df.select("user_id", "event_type").distinct()
    n_users = ut.select("user_id").distinct().count()
    assert n_users == 3
    got = (
        ut.alias("x")
        .join(ut.alias("y"), "user_id")
        .filter(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(F.col("x.event_type"), F.col("y.event_type"))
        .count()
        .collect()
    )
    assert len(got) == 1 and got[0]["count"] == 2
