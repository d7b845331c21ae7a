"""Tests for the XML XEvent source (S4/S5 public format), the JDBC-parity
sink construction (S18/S20), and the plan-shape assertions (§4)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from xeloader_spark import plans
from xeloader_spark.catalog import load_table
from xeloader_spark.queries import core as qcore
from xeloader_spark.sources import jdbc_sink, xe_xml

SF = "/root/testdata/sf0.001"

XML_EVENTS = [
    '<event name="wait_info" package="sqlos" timestamp="2024-01-01T00:00:01.500Z">'
    '<data name="duration"><value>42</value></data>'
    '<data name="wait_type"><value>PAGEIOLATCH_SH</value></data>'
    '<action name="session_id" package="sqlserver"><value>53</value></action>'
    "</event>",
    '<event name="wait_info" package="sqlos" timestamp="2024-01-01T00:00:02.250Z">'
    '<data name="duration"><value>7</value></data>'
    '<data name="wait_type"><value>CXPACKET</value></data>'
    '<action name="session_id" package="sqlserver"><value>54</value></action>'
    "</event>",
    '<event name="sql_batch_completed" package="sqlserver" timestamp="2024-01-01T00:00:03Z">'
    '<data name="batch_text"><value>SELECT 1</value></data>'
    '<action name="session_id" package="sqlserver"><value>53</value></action>'
    "</event>",
]


class TestXmlSource:
    @pytest.fixture(scope="class")
    def xml_dir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("xml_events")
        (d / "Trace_0_1.xml").write_text("\n".join(XML_EVENTS[:2]) + "\n")
        (d / "Trace_1_2.xml").write_text(XML_EVENTS[2] + "\n")
        return str(d)

    def test_parse_and_flatten(self, spark, xml_dir):
        parsed = xe_xml.read_xml_events(spark, xml_dir)
        rows = parsed.orderBy("ts").collect()
        assert len(rows) == 3
        assert rows[0].event_type == "wait_info"
        assert rows[0].fields["duration"] == "42"
        assert rows[0].actions["session_id"] == "53"
        assert rows[0].ts.microsecond == 500000

        flat = xe_xml.flatten_xml_events(
            parsed, field_types={"duration": "UInt64", "session_id": "Int32"}
        )
        cols = set(flat.columns)
        assert {"c_duration", "c_wait_type", "c_batch_text", "a_session_id"} <= cols
        wi = flat.filter(F.col("event_type") == "wait_info").orderBy("ts").collect()
        assert int(wi[0].c_duration) == 42  # decimal(38,0) per UInt64 mapping
        assert wi[0].a_session_id == 53
        # event-local fields are null on foreign event types
        sb = flat.filter(F.col("event_type") == "sql_batch_completed").first()
        assert sb.c_duration is None
        assert sb.c_batch_text == "SELECT 1"

    XEM_SIDECAR = (
        "<metadata>"
        '<event name="wait_info" package="sqlos">'
        '<data name="duration" type="UInt64"/>'
        '<data name="wait_type" type="unicode_string"/>'
        '<data name="signal_duration" type="UInt64"/>'
        "</event>"
        '<event name="sql_batch_completed" package="sqlserver">'
        '<data name="batch_text" type="unicode_string"/>'
        "</event>"
        '<action name="session_id" package="sqlserver" type="Int32"/>'
        "</metadata>"
    )

    def test_xem_dual_file_explicit_schema(self, spark, xml_dir, tmp_path):
        """S5 over the XML reader (`FileProcessor.cs:280-334`'s
        metadata-from-sidecar contract, VERDICT r11 #7): the sidecar —
        not the data — decides the column inventory and types. A
        declared field absent from every event in the batch
        (signal_duration) still comes out as a typed NULL column; the
        inferred path can't know it exists. Types apply per §1.3
        (UInt64 → decimal(38,0)). Undeclared data fields are dropped."""
        xem = tmp_path / "trace.xem.xml"
        xem.write_text(self.XEM_SIDECAR)
        flat = xe_xml.read_xml_events_with_xem(spark, xml_dir, str(xem))
        cols = set(flat.columns)
        assert {
            "c_duration", "c_wait_type", "c_signal_duration",
            "c_batch_text", "a_session_id",
        } <= cols
        # declared-but-absent: present, typed, all NULL
        sd_type = dict(flat.dtypes)["c_signal_duration"]
        assert sd_type == "decimal(38,0)"
        assert flat.filter("c_signal_duration IS NOT NULL").count() == 0
        wi = flat.filter(F.col("event_type") == "wait_info").orderBy("ts").collect()
        assert int(wi[0].c_duration) == 42 and wi[0].a_session_id == 53
        assert wi[0].c_batch_text is None  # foreign event's field: NULL

    def test_xem_sidecar_drops_undeclared(self, spark, tmp_path):
        """A data field the sidecar does NOT declare never becomes a
        column (the declared schema is the contract), and the explicit
        flatten matches the inferred flatten on the shared columns."""
        xml = (
            '<event name="wait_info" package="sqlos" '
            'timestamp="2024-01-01T00:00:01Z">'
            '<data name="duration"><value>9</value></data>'
            '<data name="undeclared_extra"><value>zzz</value></data>'
            "</event>"
        )
        parsed = xe_xml.parse_events_xml(
            spark.createDataFrame([(xml,)], "xml string")
        )
        fields, actions = xe_xml.parse_xem_metadata(
            '<metadata><event name="wait_info">'
            '<data name="duration" type="UInt64"/></event></metadata>'
        )
        assert fields == {"duration": "UInt64"} and actions == {}
        flat = xe_xml.flatten_xml_events_explicit(parsed, fields, actions)
        assert "c_undeclared_extra" not in flat.columns
        inferred = xe_xml.flatten_xml_events(
            parsed, field_types={"duration": "UInt64"}
        )
        assert (
            flat.select("event_type", "c_duration").collect()
            == inferred.select("event_type", "c_duration").collect()
        )

    def test_cli_entry_point_c_dual_file(self, spark, xml_dir, tmp_path, capsys):
        """S28 entry point C (`-f` + `-m`, InputParameters.cs:82-85):
        the CLI loads the XML event file with the sidecar-declared
        schema and demux-writes typed tables — flag-for-flag with
        ProcessXELwithXEM's dual-file contract. A structurally broken
        <event> (no name) is REPORTED as n_errors and EXCLUDED from the
        demux output (r13, ADVICE r12 #4 — error rows are not data)."""
        import json as _json
        import shutil

        from xeloader_spark.__main__ import main

        src = tmp_path / "xml_in"
        shutil.copytree(xml_dir, src)
        (src / "Trace_2_3.xml").write_text(
            '<event timestamp="2024-01-01T00:00:09Z">'
            '<data name="duration"><value>1</value></data></event>\n'
        )
        xem = tmp_path / "trace.xem.xml"
        xem.write_text(self.XEM_SIDECAR)
        out = str(tmp_path / "xem_cli_out")
        rc = main(["-f", str(src), "-m", str(xem), "-o", out, "-w"])
        printed = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0
        assert printed["n_events"] == 4 and printed["event_types"] == 2
        assert printed["n_errors"] == 1 and printed["n_files"] == 3
        loaded = spark.read.parquet(out)
        assert dict(loaded.dtypes)["c_signal_duration"] == "decimal(38,0)"
        assert loaded.filter("event_type = 'wait_info'").count() == 2
        # the error row was counted but never written
        assert loaded.count() == 3
        assert loaded.filter("event_type IS NULL").count() == 0

    def test_nested_value_text_and_entities(self, spark):
        """The SDK's readable-map shape nests values under <value><text>;
        plain values sit in the element text; entities unescape. All three
        must parse structurally (no regex extraction)."""
        xml = (
            '<event name="wait_info" package="sqlos" '
            'timestamp="2024-01-01T00:00:01.500Z">'
            '<data name="wait_type"><value><text>PAGEIOLATCH_SH</text></value></data>'
            '<data name="note"><value>a &amp; b &lt;tag&gt;</value></data>'
            '<action name="query"><value><text>SELECT &amp;x FROM t</text></value></action>'
            "</event>"
        )
        row = xe_xml.parse_events_xml(
            spark.createDataFrame([(xml,)], "xml string")
        ).first()
        assert row.fields["wait_type"] == "PAGEIOLATCH_SH"
        assert row.fields["note"] == "a & b <tag>"
        assert row.actions["query"] == "SELECT &x FROM t"

    def test_build_event_xml_roundtrip(self, spark):
        """build_event_xml → parse_events_xml is lossless, including
        entity-escaped text and the nested readable-map form."""
        df = spark.createDataFrame(
            [(7, "err & <warn>", "2024-01-02 03:04:05.123456")],
            "event_id long, msg string, ts_s string",
        ).select("event_id", "msg", F.to_timestamp("ts_s").alias("ts"))
        xml_df = df.select(
            xe_xml.build_event_xml(
                F.lit("error_reported"),
                F.col("ts"),
                data={"event_id": F.col("event_id"), "message": F.col("msg")},
                nested_text={"message"},
            ).alias("xml")
        )
        row = xe_xml.parse_events_xml(xml_df).first()
        assert row.event_type == "error_reported"
        assert row.ts.microsecond == 123456
        assert row.fields["message"] == "err & <warn>"
        assert row.fields["event_id"] == "7"


class TestJdbcSink:
    def test_writer_options(self, spark):
        df = load_table(spark, SF, "events")
        mode, opts = jdbc_sink.build_jdbc_options(
            url="jdbc:sqlserver://localhost;database=xe",
            table="xel.wait_info",
            mode="truncate",
            xevent_types={"event_id": "Int64", "props": "String"},
        )
        assert mode == "overwrite"
        assert opts["batchsize"] == str(jdbc_sink.DEFAULT_BATCH_SIZE)
        assert opts["truncate"] == "true"
        assert "event_id bigint" in opts["createTableColumnTypes"]
        assert "props nvarchar(512)" in opts["createTableColumnTypes"]
        # writer construction itself must not raise
        jdbc_sink.jdbc_writer(
            df, "jdbc:sqlserver://localhost", "xel.t", mode="truncate"
        )

    def test_schema_evolution_matrix(self, spark):
        """EnsureTableSchemaMatches parity (EventMetadata.cs:400-455):
        new frame columns → ALTER ADD with GetSQLType DDL; server-only
        columns → appended to the frame as null strings; matching columns
        (case-insensitively) → untouched."""
        df = spark.createDataFrame(
            [(1, "x", 2.5, None)],
            "event_id long, C_Props string, c_duration double, c_payload binary",
        )
        existing = ["event_id", "c_props", "legacy_note"]
        alters, server_only = jdbc_sink.schema_evolution_plan(
            df, existing, schema_name="xel", table="wait_info",
            xevent_types={"c_duration": "float"},
        )
        # c_duration: declared XEvent type wins (float → real);
        # c_payload: Spark BinaryType → varbinary(max) via GetSQLType
        assert alters == [
            "ALTER TABLE [xel].[wait_info] ADD [c_duration] real NULL",
            "ALTER TABLE [xel].[wait_info] ADD [c_payload] varbinary(max) NULL",
        ]
        assert server_only == ["legacy_note"]

        ran: list[str] = []
        aligned = jdbc_sink.ensure_table_schema_matches(
            df, lambda: existing, ran.append,
            schema_name="xel", table="wait_info",
            xevent_types={"c_duration": "float"},
        )
        assert ran == alters
        assert aligned.schema["legacy_note"].dataType.simpleString() == "string"
        assert aligned.select("legacy_note").first().legacy_note is None

    def test_schema_evolution_executes_against_live_engine(self, spark):
        """VERDICT r2 #8: the ALTER emission must be EXECUTED, not just
        planned. In-process DuckDB stands in for the JDBC server: create
        the live table, introspect via its real INFORMATION_SCHEMA,
        evolve with the DuckDB dialect, then re-introspect — the executed
        DDL must make every frame column land, typed, and idempotent on a
        second evolution pass. The write itself round-trips rows through
        the evolved table."""
        import duckdb

        con = duckdb.connect()
        con.execute("CREATE SCHEMA xel")
        con.execute(
            "CREATE TABLE xel.wait_info "
            "(event_id BIGINT, c_props VARCHAR, legacy_note VARCHAR)"
        )

        def fetch_cols() -> list[str]:
            return [
                r[0]
                for r in con.execute(
                    jdbc_sink.existing_columns_query("xel", "wait_info")
                ).fetchall()
            ]

        df = spark.createDataFrame(
            [(1, "x", 2.5, bytearray(b"\x01"), None)],
            "event_id long, C_Props string, c_duration double, "
            "c_payload binary, c_note string",
        )
        ran: list[str] = []

        def run_sql(stmt: str) -> None:
            ran.append(stmt)
            con.execute(stmt)  # must parse and apply on the live engine

        aligned = jdbc_sink.ensure_table_schema_matches(
            df,
            fetch_cols,
            run_sql,
            schema_name="xel",
            table="wait_info",
            xevent_types={"c_duration": "float"},
            dialect=jdbc_sink.DUCKDB,
        )
        assert len(ran) == 3  # c_duration, c_payload, c_note
        live = {
            r[0]: r[1]
            for r in con.execute(
                "SELECT column_name, data_type FROM "
                "information_schema.columns WHERE table_schema = 'xel' "
                "AND table_name = 'wait_info'"
            ).fetchall()
        }
        # every frame column landed with the dialect-rendered type
        assert live["c_duration"] == "FLOAT"  # declared XEvent float→real
        assert live["c_payload"] == "BLOB"
        assert live["c_note"] == "VARCHAR"  # nvarchar(512) default
        # server-only column appended to the frame as null string
        assert aligned.select("legacy_note").first().legacy_note is None
        assert set(c.lower() for c in aligned.columns) == set(live)

        # rows written through the evolved table come back intact
        con.execute(
            "INSERT INTO xel.wait_info VALUES (1, 'x', NULL, 2.5, "
            "'\\x01'::BLOB, 'n')"
        )
        assert con.execute("SELECT count(*) FROM xel.wait_info").fetchone()[
            0
        ] == 1

        # second pass: live table now matches → zero statements executed
        ran2: list[str] = []
        jdbc_sink.ensure_table_schema_matches(
            df,
            fetch_cols,
            ran2.append,
            schema_name="xel",
            table="wait_info",
            xevent_types={"c_duration": "float"},
            dialect=jdbc_sink.DUCKDB,
        )
        assert ran2 == []
        con.close()

    def test_schema_evolution_noop_when_matching(self, spark):
        df = spark.createDataFrame([(1, "x")], "event_id long, c_props string")
        alters, server_only = jdbc_sink.schema_evolution_plan(
            df, ["EVENT_ID", "C_PROPS"]
        )
        assert alters == [] and server_only == []
        assert "INFORMATION_SCHEMA.COLUMNS" in jdbc_sink.existing_columns_query(
            "xel", "t"
        )

    def test_demux_builds_one_writer_per_type(self, spark):
        df = load_table(spark, SF, "events")
        writers = jdbc_sink.demux_jdbc_tables(df, url="jdbc:sqlserver://x")
        assert set(writers) == {
            "xel.click",
            "xel.error",
            "xel.purchase",
            "xel.signup",
            "xel.view",
        }


class TestPlanShapes:
    """The §4 optimizations must actually appear in the physical plans."""

    def test_filter_pushdown_event_type(self, spark):
        df = qcore.q_event_type_filter_project(spark, SF)
        plans.assert_pushed_filter(df, "event_type")
        # 4 projected columns + the filter column
        plans.assert_pruned_schema(df, 5)

    def test_column_pruning_topk(self, spark):
        df = qcore.q_topk_heavy_hitters(spark, SF)
        plans.assert_pruned_schema(df, 1)  # only user_id read

    def test_lineage_join_broadcasts(self, spark):
        df = qcore.q_lineage_join(spark, SF)
        plans.assert_broadcast_join(df)
        plans.assert_no_cartesian(df)

    def test_region_revenue_no_cartesian(self, spark):
        from xeloader_spark.queries import relational

        df = relational.q_region_revenue(spark, SF)
        plans.assert_no_cartesian(df)
        plans.assert_broadcast_join(df)

    def test_partsupp_tpch_family_plans(self, spark):
        """Round-9 partsupp TPC-H shapes: the multi-fact star (Q9) and
        the nested semi-join (Q20) must keep dims broadcast, no
        cartesian anywhere, and Q20's ship-date window must reach the
        lineitem scan (partition-pruning shape at 100 TB)."""
        from xeloader_spark.queries import relational

        q9 = relational.q_profit_by_nation(spark, SF)
        plans.assert_no_cartesian(q9)
        plans.assert_broadcast_join(q9)
        q20 = relational.q_potential_promotion(spark, SF)
        plans.assert_no_cartesian(q20)
        plans.assert_pushed_filter(q20, "l_shipdate")
        q2 = relational.q_mincost_supplier(spark, SF)
        plans.assert_no_cartesian(q2)
        # Q11's only cross join is the 1-row broadcast total
        q11 = relational.q_important_stock(spark, SF)
        plans.assert_broadcast_join(q11)

    def test_flagship_partial_aggregation(self, spark):
        """q_time_bucket_agg must map-side combine (two HashAggregate
        phases) and read only the 3 needed columns — the shape that keeps
        the shuffle tiny at any scale."""
        df = qcore.q_time_bucket_agg(spark, SF)
        plan = plans.physical_plan(df)
        assert plan.count("HashAggregate") >= 2, plan
        plans.assert_pruned_schema(df, 3)  # ts, event_type, value

    def test_pricing_summary_partial_aggregation(self, spark):
        from xeloader_spark.queries import relational

        df = relational.q_pricing_summary(spark, SF)
        plan = plans.physical_plan(df)
        assert plan.count("HashAggregate") >= 2, plan
        plans.assert_pruned_schema(df, 6)


class TestNewOperatorPlanShapes:
    """Shuffle/broadcast budgets for the training-pipeline operators:
    these assertions are the 100×-scale-up contract — a regression here
    means an operator stopped being shuffle-frugal, not just got slower."""

    def test_sampling_is_shuffle_free(self, spark):
        from xeloader_spark.queries import sampling as qs

        # hash-gated filters are narrow: zero shuffles, corpus never moves
        plans.assert_max_shuffles(qs.q_sample_deterministic(spark, SF), 0)
        plans.assert_max_shuffles(qs.q_stratified_sample(spark, SF), 0)

    def test_pack_sequences_single_shuffle(self, spark):
        from xeloader_spark.queries import sampling as qs

        # one Exchange for the per-source window; nothing else may move
        plans.assert_max_shuffles(qs.q_pack_sequences(spark, SF), 1)

    def test_bm25_takeordered_and_stats_broadcast(self, spark):
        from xeloader_spark.queries import text as qt

        # mirrors the TF-IDF contract: the 1-row stats frame broadcasts
        # back (tiny agg shuffle only), top-k compiles to
        # TakeOrderedAndProject — no global sort, no wide shuffle
        df = qt.q_bm25_topk(spark, SF)
        plan = plans.physical_plan(df)
        assert "TakeOrderedAndProject" in plan, plan
        plans.assert_broadcast_join(df)
        plans.assert_max_shuffles(df, 1)

    def test_frequent_pairs_no_transaction_self_join(self, spark):
        from xeloader_spark.queries import relational as qr

        # post-checkpoint: item-support agg, frequent-item regroup, pair
        # agg, and the two 1-row/total aggregates — slim keys only; the
        # transaction table itself was scanned and shuffled exactly once
        # into the checkpointed basket frame, which the final plan reads
        # as scans, not Exchanges
        df = qr.q_frequent_pairs(spark, SF)
        plans.assert_max_shuffles(df, 6)
        plans.assert_broadcast_join(df)
        plans.assert_no_cartesian(df)
        plan = plans.physical_plan(df)
        assert "Scan parquet" not in plan  # checkpoint truncates
        assert "Generate" in plan  # array-side pair carve, no self-join

    def test_quantile_normalize_shuffle_budget(self, spark):
        from xeloader_spark.queries import sampling as qs

        # per-source window + distributed global rank + rank equi-join +
        # 1-row N broadcast: no single-partition window (suite gate), no
        # cartesian, bounded exchange count
        df = qs.q_quantile_normalize_scores(spark, SF)
        plans.assert_no_cartesian(df)
        plans.assert_max_shuffles(df, 10)

    def test_record_linkage_blocked_equi_join(self, spark):
        from xeloader_spark.queries import relational as qr

        # candidates must come from the block-key equi-join — a lost
        # block key degenerates to a cartesian and fails here
        df = qr.q_record_linkage(spark, SF)
        plans.assert_no_cartesian(df)
        plan = plans.physical_plan(df)
        assert "BroadcastNestedLoopJoin" not in plan, plan
        plans.assert_max_shuffles(df, 2)

    def test_windowed_pair_supports_no_self_join(self, spark):
        from xeloader_spark.queries import relational as qr

        # basket collapse + array-side pair carve per (basket, month) —
        # the windowed itemsets twin must keep the no-transaction-self-
        # join contract: join + basket agg + slim (month, pair) agg
        df = qr.q_windowed_pair_supports(spark, SF)
        plans.assert_no_cartesian(df)
        plan = plans.physical_plan(df)
        assert "Generate" in plan, plan  # explode carve, not a self-join
        plans.assert_max_shuffles(df, 3)

    def test_bloom_prune_is_codegen_filter_on_fact(self, spark):
        from xeloader_spark.operators import skew
        from xeloader_spark.catalog import load_table

        li = load_table(spark, SF, "lineitem")
        orders = load_table(spark, SF, "orders").filter(
            F.col("o_orderdate") >= "1996-01-01"
        )
        pruned = skew.bloom_prune(li, orders, "l_orderkey", "o_orderkey")
        # the fact side contributes ZERO exchanges: only the dim side's
        # two tiny bitset aggregates shuffle, the probe is a filter
        # inside the fact scan's codegen stage
        plans.assert_max_shuffles(pruned, 2)
        plan = plans.physical_plan(pruned)
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan

    def test_decontaminate_broadcasts_eval_side(self, spark):
        from xeloader_spark.queries import dedup as qd

        df = qd.q_decontaminate(spark, SF)
        plans.assert_broadcast_join(df)
        plans.assert_no_cartesian(df)

    def test_leakage_split_broadcast_is_pair_bounded(self, spark):
        """Round-5 verdict finding #1: the audit's lookup sides must be
        LEFT-SEMI-shrunk to pair members BEFORE any broadcast hint — the
        per-doc split frame is corpus-sized and may never broadcast. The
        semi-joins in the plan are the pin that the shrink engages; the
        broadcast-lint whitelist pins that no other corpus-sized frame
        gains a hint."""
        from xeloader_spark.queries import dedup as qd

        df = qd.q_leakage_safe_split(spark, SF)
        plan = plans.physical_plan(df)
        assert plan.count("LeftSemi") >= 2, plan
        plans.assert_broadcast_join(df)
        plans.assert_no_cartesian(df)

    def test_repetition_stats_shuffle_free(self, spark):
        from xeloader_spark.queries import text as qt

        plans.assert_max_shuffles(qt.q_repetition_stats(spark, SF), 0)

    def test_token_diversity_shuffle_free(self, spark):
        from xeloader_spark.queries import text as qt

        # per-token counts via HOFs over the doc's own array — the
        # corpus never moves
        plans.assert_max_shuffles(qt.q_token_diversity(spark, SF), 0)

    def test_chunk_dedup_two_shuffles(self, spark):
        from xeloader_spark.queries import dedup as qd

        # one on md5(chunk) for the keeper window, one on doc_id for the
        # combined stats+reassembly aggregate — and a single corpus scan
        df = qd.q_chunk_dedup(spark, SF)
        plans.assert_max_shuffles(df, 2)
        assert df._jdf.queryExecution().executedPlan().toString().count(
            "Scan parquet"
        ) == 1

    def test_group_take_single_window_shuffle(self, spark):
        from xeloader_spark.queries import sampling as qs

        plans.assert_max_shuffles(qs.q_source_cap(spark, SF), 1)
        df = qs.q_token_budget_mix(spark, SF)
        plans.assert_broadcast_join(df)  # group budgets must broadcast
        plans.assert_no_cartesian(df)

    def test_unigram_score_shuffle_budget(self, spark):
        from xeloader_spark.queries import text as qt

        # explode+freq agg on tok, per-doc agg, global-total window
        plans.assert_max_shuffles(qt.q_unigram_doc_prob(spark, SF), 3)

    def test_multiway_joins_broadcast_dims(self, spark):
        from xeloader_spark.queries import relational as qr

        # Q7 shape: all five dims broadcast, one exchange (the group-by)
        df = qr.q_volume_shipping(spark, SF)
        plans.assert_broadcast_join(df)
        plans.assert_no_cartesian(df)
        # Q18 shape: HAVING agg shuffles once; joins broadcast
        df = qr.q_large_orders(spark, SF)
        plans.assert_broadcast_join(df)
        plans.assert_no_cartesian(df)

    def test_upsert_single_shuffle(self, spark):
        from xeloader_spark.queries import temporal as qt

        # max-of-struct agg: one exchange, map-side combined partials
        plans.assert_max_shuffles(qt.q_upsert_latest(spark, SF), 1)

    def test_outliers_broadcast_back(self, spark):
        from xeloader_spark.queries import temporal as qt

        # two tiny aggregates broadcast back; corpus itself never shuffles
        df = qt.q_value_outliers(spark, SF)
        plans.assert_broadcast_join(df)
        plans.assert_no_cartesian(df)

    def test_contrastive_negatives_shuffle_budget(self, spark):
        from xeloader_spark.queries import sampling as qs

        # per-shard ranking window + (shard, rank) self-join; a global
        # sort sneaking in would show as a third exchange
        plans.assert_max_shuffles(qs.q_contrastive_negatives(spark, SF), 2)

    def test_pipeline_no_cartesian(self, spark):
        from xeloader_spark.queries import pipeline as qp

        df = qp.q_corpus_clean_pipeline(spark, SF)
        plans.assert_no_cartesian(df)
        from xeloader_spark.operators.dedup import release_persisted

        release_persisted()


class TestRound3PlanShapes:
    """Shuffle budgets for the round-3 operators (see SCALE.md rows)."""

    def test_boilerplate_two_slim_shuffles(self, spark):
        from xeloader_spark.queries import text as qt

        # corpus collapses to (id, digest, digest) before the two df
        # windows; only digest-sized rows may move
        plans.assert_max_shuffles(qt.q_boilerplate_flags(spark, SF), 2)

    def test_vocab_stats_budgets(self, spark):
        from xeloader_spark.queries import text as qt

        plans.assert_max_shuffles(qt.q_vocab_stats(spark, SF), 2)
        plans.assert_max_shuffles(qt.q_token_freq_histogram(spark, SF), 2)

    def test_minhash_search_broadcasts_query_side(self, spark):
        from xeloader_spark.queries import dedup as qd

        df = qd.q_minhash_search(spark, SF)
        plans.assert_broadcast_join(df)
        plans.assert_no_cartesian(df)
        # shingle agg + signature agg + rank window; no corpus self-join
        plans.assert_max_shuffles(df, 3)

    def test_random_projection_zero_shuffle(self, spark):
        from xeloader_spark.queries import similarity as qsim

        plans.assert_max_shuffles(qsim.q_random_projection(spark, SF), 0)

    def test_retention_cohorts_two_shuffles(self, spark):
        from xeloader_spark.queries import temporal as qtem

        plans.assert_max_shuffles(qtem.q_retention_cohorts(spark, SF), 2)

    def test_relational_round3_shapes(self, spark):
        from xeloader_spark.queries import relational as qr

        plans.assert_max_shuffles(qr.q_small_quantity_revenue(spark, SF), 2)
        plans.assert_max_shuffles(qr.q_market_share(spark, SF), 2)
        for df in (
            qr.q_last_ship_supplier(spark, SF),
            qr.q_rich_inactive_customers(spark, SF),
        ):
            plans.assert_max_shuffles(df, 3)
            plans.assert_no_cartesian(df)


class TestRound3LateAdditionShapes:
    def test_novelty_inverted_index_budget(self, spark):
        from xeloader_spark.queries import dedup as qd

        # shingle-min ownership agg + partition-reusing join + doc agg
        plans.assert_max_shuffles(qd.q_novelty_scores(spark, SF), 3)

    def test_zorder_key_zero_shuffle(self, spark):
        from xeloader_spark.queries import ingest as qi

        plans.assert_max_shuffles(qi.q_zorder_values(spark, SF), 0)

    def test_ivf_exact_assignment_is_projection(self, spark):
        from xeloader_spark.queries import similarity as qsim

        # literal centroids + broadcast probe pairs: only the rank window
        # may shuffle
        plans.assert_max_shuffles(qsim.q_ann_topk_ivf_exact(spark, SF), 1)

    def test_knn_graph_banded_budget(self, spark):
        from xeloader_spark.queries import similarity as qsim

        df = qsim.q_knn_graph(spark, SF)
        # 2 = deliberate REPARTITION_BY_NUM before the band self-join
        # (AQE coalesces by input size and is blind to join expansion —
        # without it the tiny signature shuffle folds to one partition
        # and the whole Σ bucket² pair space runs single-task;
        # 39s → 3s at sf0.1) + ONE src repartition that serves both the
        # pair-dedup aggregate and the per-src rank window
        # (hashpartitioning(src) satisfies both clusterings — r13).
        plans.assert_max_shuffles(df, 2)
        plans.assert_no_cartesian(df)

    def test_editdistance_blocked_budget(self, spark):
        from xeloader_spark.queries import dedup as qd

        df = qd.q_editdistance_neardup(spark, SF)
        plans.assert_max_shuffles(df, 1)
        plans.assert_no_cartesian(df)

    def test_weighted_sample_zero_shuffle(self, spark):
        from xeloader_spark.queries import sampling as qsp

        plans.assert_max_shuffles(qsp.q_weighted_sample(spark, SF), 0)

    def test_training_build_window_budget(self, spark):
        from xeloader_spark.queries import pipeline as qp

        # 2 digest windows + keeper window + final aggregate
        plans.assert_max_shuffles(qp.q_training_data_build(spark, SF), 4)


class TestTpchCompletionPlanShapes:
    """Plan pins for the round-3 TPC-H completion set (Q4/Q6/Q10/Q12/Q14/
    Q19 shapes): the semi-join, top-k, pushdown, and broadcast choices
    each query's docstring promises must be visible in the physical plan."""

    def test_order_priority_semi_join(self, spark):
        from xeloader_spark.queries import relational as qr

        df = qr.q_order_priority_check(spark, SF)
        plan = plans.physical_plan(df)
        assert "LeftSemi" in plan, plan
        plans.assert_no_cartesian(df)
        # orders date window must reach the scan
        plans.assert_pushed_filter(df, "o_orderdate")

    def test_returned_items_topk_no_global_sort(self, spark):
        from xeloader_spark.queries import relational as qr

        df = qr.q_returned_item_customers(spark, SF)
        plan = plans.physical_plan(df)
        assert "TakeOrderedAndProject" in plan, plan
        plans.assert_no_cartesian(df)
        plans.assert_pushed_filter(df, "l_returnflag")

    def test_ship_delay_partial_agg(self, spark):
        from xeloader_spark.queries import relational as qr

        df = qr.q_ship_delay_priority(spark, SF)
        plan = plans.physical_plan(df)
        assert plan.count("HashAggregate") >= 2, plan
        plans.assert_pushed_filter(df, "l_shipdate")

    def test_promo_revenue_broadcasts_part(self, spark):
        from xeloader_spark.queries import relational as qr

        df = qr.q_promo_revenue(spark, SF)
        plans.assert_broadcast_join(df)
        plans.assert_no_cartesian(df)
        # join + final agg: only the broadcast moves, plus the 1-row
        # single-partition gather for the global aggregate
        plans.assert_max_shuffles(df, 1)

    def test_disjunctive_hull_pushdown(self, spark):
        from xeloader_spark.queries import relational as qr

        df = qr.q_disjunctive_filter_revenue(spark, SF)
        plans.assert_broadcast_join(df)
        # the part-side disjunction is fully part-local, so Catalyst
        # must push the OR of brand/size conjuncts into the part scan
        plans.assert_pushed_filter(df, "p_brand")
        plans.assert_no_cartesian(df)

    def test_forecast_revenue_scan_shape(self, spark):
        from xeloader_spark.queries import relational as qr

        df = qr.q_forecast_revenue_change(spark, SF)
        plans.assert_pushed_filter(df, "l_shipdate")
        plans.assert_pushed_filter(df, "l_discount")
        plans.assert_pushed_filter(df, "l_quantity")
        # reads exactly the 4 touched columns
        plans.assert_pruned_schema(df, 4)
        plan = plans.physical_plan(df)
        assert plan.count("HashAggregate") >= 2, plan


def test_knn_join_width_pinned(spark):
    """The k-NN self-join must keep its explicit pre-join repartition:
    AQE coalesces shuffles by input size and cannot see the join's
    Σ bucket² expansion, so without the pinned width the whole pair
    space executes in one task."""
    from xeloader_spark.queries import similarity as qs

    df = qs.q_knn_graph(spark, SF)
    plan = plans.physical_plan(df)
    assert "REPARTITION_BY_NUM" in plan, plan


class TestFixedWidthSource:
    def test_file_roundtrip_orders(self, spark, tmp_path):
        """Write orders as a positional flat file, read it back via the
        same colspec: typed equality on every row, and the on-disk lines
        are genuinely fixed-width."""
        from xeloader_spark.catalog import load_table
        from xeloader_spark.sources import fixed_width as fw

        orders = load_table(spark, SF, "orders")
        path = str(tmp_path / "orders_fixed")
        fw.write_fixed_width(orders, path, fw.ORDERS_SPEC)

        raw = spark.read.text(path)
        width = sum(f.width for f in fw.ORDERS_SPEC)
        lens = raw.select(F.length("value").alias("l")).distinct().collect()
        assert [r.l for r in lens] == [width]

        back = fw.read_fixed_width(spark, path, fw.ORDERS_SPEC)
        a = {
            r.o_orderkey: (r.o_custkey, r.o_orderstatus, float(r.o_totalprice), r.o_orderdate, r.o_orderpriority)
            for r in back.collect()
        }
        b = {
            r.o_orderkey: (r.o_custkey, r.o_orderstatus, r.o_totalprice, r.o_orderdate, r.o_orderpriority)
            for r in orders.collect()
        }
        assert a == b

    def test_null_and_alignment_semantics(self, spark):
        from xeloader_spark.sources import fixed_width as fw

        spec = [
            fw.FixedWidthField("k", 5, "bigint"),
            fw.FixedWidthField("s", 6, "string"),
        ]
        df = spark.createDataFrame([(7, "ab"), (None, None)], "k long, s string")
        lines = [r.line for r in fw.render_fixed_width(df, spec).collect()]
        assert "    7ab    " in lines  # numeric right, string left aligned
        assert "           " in lines  # nulls render as spaces
        back = fw.parse_fixed_width(
            spark.createDataFrame([(l,) for l in lines], "line string"), spec
        ).collect()
        got = {(r.k, r.s) for r in back}
        assert got == {(7, "ab"), (None, None)}

    def test_overflow_raises_not_truncates(self, spark):
        from xeloader_spark.sources import fixed_width as fw

        spec = [fw.FixedWidthField("s", 3, "string")]
        df = spark.createDataFrame([("toolong",)], "s string")
        with pytest.raises(Exception, match="fixed-width overflow"):
            fw.render_fixed_width(df, spec).collect()


def test_pivot_explicit_values_shuffle_budget(spark):
    """Pivot with a pinned value list must stay a pure two-aggregate
    plan: the corpus shuffles ONCE into (user, type) partial counts;
    the second exchange moves only the aggregate-sized (≤ users × 5
    rows) matrix for pivotfirst. Crucially there is NO third job — an
    unpinned value list adds a distinct-discovery pass over the corpus."""
    from xeloader_spark.queries import relational as qr

    df = qr.q_pivot_user_matrix(spark, SF)
    plans.assert_max_shuffles(df, 2)


class TestSessionAdditionShapes:
    """Plan pins for the late round-3 additions."""

    def test_prefix_jaccard_no_cartesian(self, spark):
        from xeloader_spark.queries import dedup as qd

        df = qd.q_prefix_jaccard_pairs(spark, SF)
        plans.assert_no_cartesian(df)

    def test_triangle_no_cartesian(self, spark):
        from xeloader_spark.queries import similarity as qs

        plans.assert_no_cartesian(qs.q_triangle_stats(spark, SF))

    def test_markov_single_corpus_shuffle_plus_matrix(self, spark):
        from xeloader_spark.queries import temporal as qt

        # window on user + states² aggregate + states-sized total window
        plans.assert_max_shuffles(qt.q_markov_transitions(spark, SF), 3)

    def test_hll_sketch_shuffle_budget(self, spark):
        from xeloader_spark.queries import temporal as qt

        # 2 partial builds + merge + estimate + exact-distinct join side
        df = qt.q_hll_distinct_users(spark, SF)
        plans.assert_no_cartesian(df)

    def test_drift_broadcasts_split_point(self, spark):
        from xeloader_spark.queries import temporal as qt

        df = qt.q_distribution_drift(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" in plan  # the 1-row split point
        plans.assert_no_cartesian(df)


class TestRound4AdditionShapes:
    """Shuffle budgets for the round-4 additions (SCALE.md rows). The
    suite-wide no-global-window gate already covers them via the parity
    sweep; these pin the Exchange counts so a regression that adds a
    corpus shuffle fails here, not in a 100x deployment."""

    def test_threshold_curve_budget(self, spark):
        from xeloader_spark.queries import dedup as qd

        # shingle self-join (2 sides) + pair agg + sizes agg + 2 size
        # joins + decile agg — the inverted-index pair pass, once, for
        # every threshold
        df = qd.q_jaccard_threshold_curve(spark, SF)
        plans.assert_max_shuffles(df, 8)
        plans.assert_no_cartesian(df)

    def test_contamination_matrix_budget(self, spark):
        from xeloader_spark.queries import dedup as qd

        df = qd.q_cross_source_contamination(spark, SF)
        plans.assert_max_shuffles(df, 5)
        plans.assert_no_cartesian(df)

    def test_incremental_neardup_broadcasts_batch(self, spark):
        from xeloader_spark.queries import dedup as qd

        # history (snapshot) side must NEVER re-shuffle: the new batch's
        # band keys broadcast into it (minhash_search discipline)
        df = qd.q_incremental_neardup(spark, SF)
        plans.assert_max_shuffles(df, 4)
        plans.assert_no_cartesian(df)

    def test_kcenter_zero_shuffle_rounds(self, spark):
        from xeloader_spark.queries import similarity as qs

        # selected vectors are driver literals: every round is a
        # projection + max-of-struct aggregate — corpus never moves
        plans.assert_max_shuffles(qs.q_kcenter_diverse_sample(spark, SF), 0)

    def test_k_anonymity_budget(self, spark):
        from xeloader_spark.queries import text as qt

        plans.assert_max_shuffles(qt.q_k_anonymity(spark, SF), 2)

    def test_blocklist_filter_single_shuffle_pruned_scan(self, spark):
        from xeloader_spark.queries import text as qt

        # phrase flags are codegen projections; the ONLY exchange is the
        # map-side-combined groupBy(source); the scan must read exactly
        # (text, source)
        df = qt.q_blocklist_filter(spark, SF)
        plans.assert_max_shuffles(df, 1)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ReadSchema: struct<text:string,source:string>" in plan


class TestRound4LateAdditionShapes:
    """Shuffle budgets for the DSIR/EWMA/matryoshka/k-core batch
    (SCALE.md rows). kcore counts only the post-checkpoint tail — the
    per-round budget is documented on the operator."""

    def test_dsir_three_shuffles(self, spark):
        from xeloader_spark.queries import text as qt

        # tok agg + partition-reusing freq join + doc agg; totals ride a
        # broadcast cross join
        df = qt.q_dsir_resample(spark, SF)
        plans.assert_max_shuffles(df, 3)
        plans.assert_no_cartesian(df)

    def test_vocab_coverage_budget(self, spark):
        from xeloader_spark.queries import text as qt

        # freq agg + the distributed global-rank machinery (range
        # partition, pid window, offset join) + final 1-row agg
        plans.assert_max_shuffles(qt.q_vocab_coverage(spark, SF), 7)

    def test_temporal_round4_budgets(self, spark):
        from xeloader_spark.queries import temporal as qt

        # bucket agg + ONE per-user lag window (the explode-x8 form
        # measured 4.8 shuffle bytes per input byte; this one ~0.6)
        plans.assert_max_shuffles(qt.q_ewma_smooth(spark, SF), 2)
        plans.assert_max_shuffles(qt.q_seasonal_anomaly(spark, SF), 3)
        plans.assert_max_shuffles(qt.q_ab_test_zscore(spark, SF), 3)

    def test_embedding_round4_budgets(self, spark):
        from xeloader_spark.queries import similarity as qs

        plans.assert_max_shuffles(qs.q_degree_distribution(spark, SF), 6)
        plans.assert_max_shuffles(qs.q_label_separation(spark, SF), 6)
        plans.assert_no_cartesian(qs.q_label_separation(spark, SF))
        plans.assert_max_shuffles(qs.q_kcore_membership(spark, SF), 2)

    def test_snm_ranks_slim_projection(self, spark):
        from xeloader_spark.queries import dedup as qd

        # rank machinery (range + pid window + offset) over (id, key)
        # ONLY + 2 block joins + 2 id-keyed verify joins — the shingle
        # arrays must never ride the rank shuffle (audit: 22.6MB → 0.5MB)
        df = qd.q_sorted_neighborhood_pairs(spark, SF)
        plans.assert_max_shuffles(df, 8)
        plans.assert_no_cartesian(df)


class TestRound7AdditionShapes:
    def test_ivfpq_query_phase_stage_budget(self, spark):
        """Pin the prebuilt-model IVF-PQ query phase to its minimal
        shape: exactly 2 shuffles (the two per-query-window exchanges —
        ADC shortlist rank and exact re-rank, both required by
        semantics), both joins broadcast (probe list and shortlist are
        query-bounded), 2 corpus scans (assignment+encode, re-rank), no
        cartesian. The sf0.1 bench row (~6.8s) is AQE stage-scheduling
        floor, not compute (BASELINE.md note) — this pin makes a future
        regression in actual plan work distinguishable from that noise."""
        from xeloader_spark.operators import cluster as cl

        emb = load_table(spark, SF, "embeddings")
        coarse = cl.ivf_fit(emb, km_k=16, iters=2, train_fraction=0.25)
        pqm = cl.pq_fit(emb, m=16, sub_k=16, iters=1, train_fraction=0.25)
        df = cl.ivfpq_topk(
            emb, [0, 7, 14, 21], k=10, n_probe=12, rerank=200,
            coarse_centroids=coarse, pq_model=pqm,
        )
        plans.assert_max_shuffles(df, 2)
        plans.assert_no_cartesian(df)
        plan = plans.physical_plan(df, "simple")
        assert plan.count("FileScan parquet") == 2, plan
        assert plan.count("BroadcastHashJoin") == 2, plan

    def test_round7_text_query_budgets(self, spark):
        from xeloader_spark.queries import text as qt

        # one language-bounded aggregate
        plans.assert_max_shuffles(qt.q_token_fertility(spark, SF), 1)
        # selection is all array HOFs; the explode emits only the
        # already-selected ~2T/(w+1) fingerprints — zero shuffles
        plans.assert_max_shuffles(qt.q_winnowing_fingerprints(spark, SF), 0)
        # bigram agg + unigram agg + c(w1) fold + two probe joins +
        # doc agg/backfill — all digest-sized (w1,w2)/doc_id rows; the
        # 1-row N total rides a broadcast cross join
        bb = qt.q_bigram_backoff_quality(spark, SF)
        plans.assert_max_shuffles(bb, 5)
        plans.assert_no_cartesian(bb)
        # KN: the checkpointed train-bigram table hides the train agg;
        # the visible plan is stats derivations + probes + doc agg
        kn = qt.q_kneser_ney_quality(spark, SF)
        plans.assert_max_shuffles(kn, 5)
        plans.assert_no_cartesian(kn)

    def test_curriculum_budget(self, spark):
        from xeloader_spark.queries import sampling as qs

        # unigram scorer (explode agg + partition-reusing freq join +
        # doc agg) + the distributed global-rank machinery; slim rank
        # rows; both scalar totals ride broadcast cross joins
        df = qs.q_curriculum_schedule(spark, SF)
        plans.assert_no_cartesian(df)

    def test_curriculum_keeps_zero_token_docs(self, spark, tmp_path):
        """r7 review finding: the explode-built unigram scorer drops
        empty docs, but the schedule (and its oracle) must keep every
        document — easiness 0, ranked last, phases computed against the
        FULL doc count."""
        import os

        from xeloader_spark.queries import sampling as qs

        d = str(tmp_path)
        spark.createDataFrame(
            [(1, "a b a", "en", "src0"), (2, "", "en", "src0"),
             (3, "b c", "en", "src0")],
            ["doc_id", "text", "lang", "source"],
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        rows = {r.doc_id: r for r in qs.q_curriculum_schedule(spark, d).collect()}
        assert set(rows) == {1, 2, 3}
        assert rows[2].n_tokens == 0 and rows[2].easiness_ppm == 0
        assert rows[2].rank == 3 and rows[2].phase == 2

    def test_robots_filter_zero_shuffle(self, spark):
        """REP evaluation is a pure projection: the ruleset is a plan
        literal and longest-match resolves via struct-sort HOFs — the
        URL column never moves."""
        from xeloader_spark.queries import text as qt

        plans.assert_max_shuffles(qt.q_robots_filter(spark, SF), 0)
        # the composed fetch schedule: canonical-URL agg + host window
        plans.assert_max_shuffles(qt.q_crawl_frontier(spark, SF), 2)

    def test_winnow_overlap_post_checkpoint_budget(self, spark):
        """Winnow overlap pairs: the slim (doc_id, fp) set is
        checkpointed once for its three consumers, so the visible plan
        is the pair join + size joins only — 3 shuffles (was 15 with
        the lineage replayed per consumer), no cartesian."""
        from xeloader_spark.queries import text as qt

        df = qt.q_winnow_overlap_pairs(spark, SF)
        plans.assert_max_shuffles(df, 3)
        plans.assert_no_cartesian(df)

    def test_warc_parser_hostile_input_and_shape(self, spark):
        """The WARC record parser must degrade loudly, never crash, on
        hostile crawl bytes: a payload embedding the version line at
        line start splits the record — the real record surfaces
        len_ok=False and the spurious fragment parses to all-NULL
        fields (try_element_at/nullif, not an ANSI task crash). Clean
        records parse exactly. Parser plan: zero shuffles."""
        from xeloader_spark.sources.warc import parse_warc

        CRLF = "\r\n"

        def rec(uri, body, status="200"):
            http = (
                f"HTTP/1.1 {status} OK{CRLF}"
                f"Content-Type: text/plain{CRLF}{CRLF}{body}"
            )
            return (
                f"WARC/1.0{CRLF}WARC-Type: response{CRLF}"
                f"WARC-Target-URI: {uri}{CRLF}"
                f"WARC-Record-ID: <urn:uuid:x>{CRLF}"
                f"Content-Length: {len(http)}{CRLF}{CRLF}{http}{CRLF}{CRLF}"
            )

        evil = f"before{CRLF}WARC/1.0{CRLF}after"
        blob = rec("u1", "hello") + rec("u2", evil) + rec("u3", "bye", "404")
        df = spark.createDataFrame([(1, blob)], "warc_file long, warc_blob string")
        out = parse_warc(df)
        plans.assert_max_shuffles(out, 0)
        rows = {r.rec_seq: r for r in out.collect()}
        assert len(rows) == 4  # the embedded version line splits rec 1
        assert rows[0].len_ok and rows[0].payload == "hello"
        assert rows[0].http_status == 200
        assert rows[1].len_ok is False  # the boundary-miscount audit
        assert rows[2].target_uri is None and rows[2].len_ok is None
        assert rows[3].http_status == 404 and rows[3].len_ok

    def test_simpson_stats_linear_form_in_plan(self, spark):
        """The token-count stats must compile to the sorted run-length
        aggregate (sort_array + single fold), not the quadratic
        distinct×filter HOF — and stay zero-shuffle."""
        from xeloader_spark.queries import text as qt

        df = qt.q_token_diversity(spark, SF)
        plans.assert_max_shuffles(df, 0)
        plan = plans.physical_plan(df, "simple")
        assert "sort_array" in plan, plan
        assert "array_distinct" not in plan, plan

    def test_robots_rule_host_case_insensitive(self, spark):
        """r7 review finding: RFC 9309 hosts are case-insensitive, but
        the URL-side expression lower-cases — a mixed-case rule host
        must be normalized at render time, not silently never match."""
        from xeloader_spark.operators.robots import robots_filter

        df = spark.createDataFrame(
            [(1, "https://example.com/x")], "id long, url string"
        )
        out = robots_filter(df, [("Example.COM", "/", False)]).collect()
        assert len(out) == 1 and out[0].allowed is False
        assert out[0].matched_len == 1

    def test_preference_pairs_budget(self, spark):
        """Scoring is a zero-shuffle projection; the single bucket-rank
        window is paid once behind the checkpoint; the visible plan is
        the mirrored-rank equi-join (broadcast at this SF, shuffle at
        scale — both fine), never an all-pairs space."""
        from xeloader_spark.queries import sampling as qs

        df = qs.q_preference_pairs(spark, SF)
        plans.assert_max_shuffles(df, 3)
        plans.assert_no_cartesian(df)

    def test_dataset_card_budget(self, spark):
        """One digest window + one (lang, source) rank/agg chain — the
        corpus crosses the wire once as digests + slim stats, 2
        exchanges total, no cartesian."""
        from xeloader_spark.queries import pipeline as qp

        df = qp.q_dataset_card(spark, SF)
        plans.assert_max_shuffles(df, 2)
        plans.assert_no_cartesian(df)


class TestRound8WarcReader:
    """Round-8 hardening (VERDICT r7 #1): records born as rows in the
    reader, not whole-file blob strings."""

    @pytest.fixture(scope="class")
    def warc_dirs(self, spark, tmp_path_factory):
        """Write the sf0.001 WARC fixture to disk twice: plain `.warc`
        text files and gzip-member `.warc.gz` (each record its own
        member, concatenated — the Common Crawl layout). Returns
        (text_dir, gz_dir, blob_df)."""
        import gzip

        from xeloader_spark.queries.ingest import pack_warc_blobs

        docs = load_table(spark, SF, "documents")
        blobs = pack_warc_blobs(docs).localCheckpoint()
        tdir = tmp_path_factory.mktemp("warc_text")
        gdir = tmp_path_factory.mktemp("warc_gz")
        for r in blobs.collect():
            (tdir / f"f{r.warc_file}.warc").write_bytes(
                r.warc_blob.encode("utf-8")
            )
            with open(gdir / f"f{r.warc_file}.warc.gz", "wb") as f:
                for body in r.warc_blob.split("WARC/1.0\r\n"):
                    if body:
                        f.write(gzip.compress(("WARC/1.0\r\n" + body).encode()))
        return str(tdir), str(gdir), blobs

    @staticmethod
    def _keyed(df):
        """Record-keyed comparison form: the reader path is an unordered
        bag (no rec_seq by design), so compare on the spec-unique
        WARC-Record-ID."""
        cols = [
            "record_id",
            "warc_type",
            "target_uri",
            "content_length",
            "http_status",
            "payload",
            "len_ok",
        ]
        return sorted(tuple(r) for r in df.select(*cols).collect())

    def test_reader_path_parity_and_plan(self, spark, warc_dirs):
        """read_warc over real files == parse_warc over blob rows,
        record-for-record; and the reader plan has ZERO exchanges —
        scan + filter + one codegen projection stage."""
        from xeloader_spark.sources.warc import parse_warc, read_warc

        tdir, _, blobs = warc_dirs
        rd = read_warc(spark, tdir)
        plans.assert_max_shuffles(rd, 0)
        assert self._keyed(rd) == self._keyed(parse_warc(blobs))

    def test_reader_path_splits_large_files(self, spark, warc_dirs):
        """The point of the reader path: an uncompressed .warc splits —
        forcing tiny maxPartitionBytes yields MORE tasks than files
        with identical results (a blob row can never do this)."""
        from xeloader_spark.sources.warc import read_warc

        tdir, _, _ = warc_dirs
        n_files = len(
            [f for f in os.listdir(tdir) if f.endswith(".warc")]
        )
        before = self._keyed(read_warc(spark, tdir))
        old = spark.conf.get("spark.sql.files.maxPartitionBytes")
        old_cost = spark.conf.get("spark.sql.files.openCostInBytes")
        try:
            spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
            spark.conf.set("spark.sql.files.openCostInBytes", "0")
            split_df = read_warc(spark, tdir)
            n_parts = split_df.rdd.getNumPartitions()
            assert n_parts > n_files, (n_parts, n_files)
            assert self._keyed(split_df) == before
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)
            spark.conf.set("spark.sql.files.openCostInBytes", old_cost)

    def test_reader_strips_bom_and_surfaces_preamble(self, spark, tmp_path):
        """r8 review fix: a UTF-8 BOM on an otherwise well-formed file
        parses identically to the clean file (stripped in the reader);
        a NON-empty preamble (not valid WARC) surfaces as one all-NULL
        audit row — loud degradation, never silent loss."""
        from xeloader_spark.sources.warc import read_warc

        CRLF = "\r\n"
        http = f"HTTP/1.1 200 OK{CRLF}Content-Type: text/plain{CRLF}{CRLF}hi"
        rec = (
            f"WARC/1.0{CRLF}WARC-Type: response{CRLF}"
            f"WARC-Target-URI: u{CRLF}WARC-Record-ID: <urn:uuid:x>{CRLF}"
            f"Content-Length: {len(http)}{CRLF}{CRLF}{http}{CRLF}{CRLF}"
        )
        clean = tmp_path / "clean"
        bomd = tmp_path / "bomd"
        pre = tmp_path / "pre"
        for d in (clean, bomd, pre):
            d.mkdir()
        (clean / "a.warc").write_bytes(rec.encode())
        (bomd / "a.warc").write_bytes("﻿".encode() + rec.encode())
        (pre / "a.warc").write_bytes(b"junk preamble\r\n" + rec.encode())

        keyed = lambda d: sorted(
            (r.record_id, r.payload, r.len_ok)
            for r in read_warc(spark, str(d)).collect()
        )
        assert keyed(bomd) == keyed(clean)
        assert len(keyed(clean)) == 1
        pre_rows = read_warc(spark, str(pre)).collect()
        assert len(pre_rows) == 2
        null_rows = [r for r in pre_rows if r.record_id is None]
        assert len(null_rows) == 1 and null_rows[0].len_ok is None

    def test_blob_path_preamble_parity(self, spark):
        """r9 (ADVICE r8): `parse_warc` now KEEPS a non-empty preamble
        as one all-NULL audit row at rec_seq=-1 — the same
        loud-degradation contract as `read_warc`, so the two
        parity-pinned paths agree on corrupt files too; a well-formed
        blob still yields records only."""
        from xeloader_spark.sources.warc import parse_warc

        CRLF = "\r\n"
        http = f"HTTP/1.1 200 OK{CRLF}Content-Type: text/plain{CRLF}{CRLF}hi"
        rec = (
            f"WARC/1.0{CRLF}WARC-Type: response{CRLF}"
            f"WARC-Target-URI: u{CRLF}WARC-Record-ID: <urn:uuid:x>{CRLF}"
            f"Content-Length: {len(http)}{CRLF}{CRLF}{http}{CRLF}{CRLF}"
        )
        schema = "warc_file string, warc_blob string"
        rows = parse_warc(
            spark.createDataFrame([("f", "junk preamble\r\n" + rec)], schema)
        ).collect()
        assert len(rows) == 2
        nulls = [r for r in rows if r.record_id is None]
        assert len(nulls) == 1
        assert nulls[0].rec_seq == -1 and nulls[0].len_ok is None
        clean = parse_warc(
            spark.createDataFrame([("f", rec)], schema)
        ).collect()
        assert len(clean) == 1 and clean[0].record_id is not None

    def test_gz_member_reader_parity(self, spark, warc_dirs):
        """read_warc_gz inflates concatenated gzip members and parses
        to the same records as the blob path (per-file parallelism,
        documented in SCALE.md §WARC)."""
        from xeloader_spark.sources.warc import parse_warc, read_warc_gz

        _, gdir, blobs = warc_dirs
        assert self._keyed(read_warc_gz(spark, gdir)) == self._keyed(
            parse_warc(blobs)
        )


class TestRound8RobotsTable:
    """Round-8 hardening (VERDICT r7 #2): rules as data, joined on host."""

    def test_table_variant_parity_with_literal(self, spark):
        """robots_filter_table == robots_filter verdict-for-verdict on
        the fixture corpus + ruleset (incl. the '?'-anchored rule), and
        its plan is the honest scale shape: rules agg + host equi-join,
        ≤2 exchanges, no cartesian."""
        from xeloader_spark.operators.robots import (
            robots_filter,
            robots_filter_table,
        )
        from xeloader_spark.queries.text import _ROBOTS_RULES, _URL_SEED_SPARK

        docs = (
            load_table(spark, SF, "documents")
            .withColumn("url", F.expr(_URL_SEED_SPARK))
            .select("doc_id", "url")
        )
        rules_df = spark.createDataFrame(
            _ROBOTS_RULES, "host string, prefix string, allow boolean"
        )
        cols = ["doc_id", "url", "host", "path", "matched_len", "allowed"]
        lit_out = robots_filter(docs, _ROBOTS_RULES).select(*cols)
        tab_out = robots_filter_table(docs, rules_df).select(*cols)
        plans.assert_max_shuffles(tab_out, 2)
        plans.assert_no_cartesian(tab_out)
        assert sorted(map(tuple, tab_out.collect())) == sorted(
            map(tuple, lit_out.collect())
        )

    def test_query_string_rule_semantics(self, spark):
        """RFC 9309 path+query matching (r7 advice finding): a
        '?'-anchored rule fires as a PREFIX of path+query, an empty
        path defaults to '/' before the query is appended, and the
        query never leaks into host extraction."""
        from xeloader_spark.operators.robots import robots_filter

        rules = [
            ("h.com", "/search?q=", False),
            ("h.com", "/?lang=", False),
        ]
        df = spark.createDataFrame(
            [
                (1, "https://h.com/search?q=x"),
                (2, "https://h.com/search?page=2&q=x"),  # prefix, not substr
                (3, "https://h.com?lang=de"),  # empty path → '/?lang=de'
                (4, "https://h.com/search"),  # no query → no match
            ],
            "id long, url string",
        )
        got = {r.id: (r.allowed, r.matched_len, r.path) for r in
               robots_filter(df, rules).collect()}
        assert got[1] == (False, 10, "/search?q=x")
        assert got[2] == (True, -1, "/search?page=2&q=x")
        assert got[3] == (False, 7, "/?lang=de")
        assert got[4] == (True, -1, "/search")

    def test_no_rules_for_host_defaults_allow(self, spark):
        """Table variant: a host absent from rules_df (NULL rule array
        after the left join) must default-allow with matched_len -1 —
        the HOF chain over NULL coalesces, it doesn't drop the row."""
        from xeloader_spark.operators.robots import robots_filter_table

        rules_df = spark.createDataFrame(
            [("other.com", "/", False)],
            "host string, prefix string, allow boolean",
        )
        df = spark.createDataFrame(
            [(1, "https://unlisted.com/x")], "id long, url string"
        )
        out = robots_filter_table(df, rules_df).collect()
        assert len(out) == 1
        assert out[0].allowed is True and out[0].matched_len == -1


class TestRound8LinkGraph:
    """cc-webgraph family: href extraction → host graph → host rank."""

    def test_link_extract_zero_shuffle_and_drops(self, spark):
        """Extraction is regexp_extract_all + explode + string functions
        in one codegen stage (0 exchanges), and the three non-link
        classes (protocol-relative, fragment-only, mailto:) never
        produce edges while both resolution classes (absolute,
        host-relative) do."""
        from xeloader_spark.queries import text as qt

        df = qt.q_link_extract(spark, SF)
        plans.assert_max_shuffles(df, 0)
        rows = df.collect()
        hrefs = {r.href for r in rows}
        assert not any(h.startswith(("//", "#", "mailto:")) for h in hrefs)
        assert any(h.startswith("https://") for h in hrefs)  # absolute
        rel = [r for r in rows if r.href.startswith("/")]
        assert rel and all(
            r.dst_url == f"https://{r.src_host}{r.href}" for r in rel
        )
        assert all(r.dst_host == r.src_host for r in rel)

    def test_host_graph_and_pagerank_budgets(self, spark):
        """Host graph: 2 exchanges (the count-distinct pair over slim
        host-pair rows). PageRank: rounds run behind per-iteration
        localCheckpoints, so the visible plan is node-sized and
        exchange-free — the O(1)-plan discipline the kNN variant pins.
        Rank mass: every rank positive, total ≤ scale (dangling leak
        only shrinks mass, never inflates it)."""
        from xeloader_spark.queries import text as qt

        g = qt.q_host_link_graph(spark, SF)
        plans.assert_max_shuffles(g, 2)
        plans.assert_no_cartesian(g)
        pr = qt.q_host_pagerank(spark, SF)
        plans.assert_max_shuffles(pr, 0)
        rows = pr.collect()
        assert len(rows) >= 10
        assert all(r.rank_micro > 0 for r in rows)
        assert sum(r.rank_micro for r in rows) <= qt._HOST_PR_SCALE

    def test_harmonic_exact_and_hyperball_parity(self, spark):
        """Exact bounded-hop harmonic (the driver-checked rank) vs the
        HyperBall register-round twin — THE 100 TB shape (state is
        O(nodes·2^p) register rows, no pair frame). Deterministic HLL →
        this bound is stable, not flaky: per-host relative error < 10%
        at p=8 (measured 2.2% max on this fixture), zero-centrality
        hosts read ≈ 0, and the top host agrees. Also pins the
        monotone-ball invariant (n_reaching ≤ node count) and the
        harmonic ≤ n_reaching·scale bound (every term ≤ scale)."""
        from xeloader_spark.operators.graph import (
            harmonic_centrality,
            hyperball_harmonic,
        )
        from xeloader_spark.queries import text as qt

        edges = qt._host_edges(qt._link_docs(spark, SF))
        S = qt._HARMONIC_SCALE
        ex = {r.id: r for r in harmonic_centrality(edges, scale=S).collect()}
        assert all(
            r.harmonic_scaled <= r.n_reaching * S for r in ex.values()
        )
        assert all(r.n_reaching <= len(ex) - 1 for r in ex.values())
        hb = {r.id: r.harmonic_est for r in hyperball_harmonic(edges, p=8).collect()}
        assert set(hb) == set(ex)
        for host, r in ex.items():
            exact = r.harmonic_scaled / S
            if exact > 0:
                assert abs(hb[host] - exact) / exact < 0.10, (host, exact, hb[host])
            else:
                assert abs(hb[host]) < 0.1, (host, hb[host])
        top_exact = max(ex.values(), key=lambda r: r.harmonic_scaled).id
        top_hb = max(hb, key=hb.get)
        assert top_exact == top_hb

    def test_crawl_pipeline_budget(self, spark):
        """One crawl hop end-to-end (WARC parse → links → REP gate →
        frontier): everything through the robots gate is codegen string
        functions over single-record rows; the only exchanges are the
        frontier aggregate + the host wave window (plus the explode's
        AQE reuse) — ≤3, no cartesian. Also pins that query-LESS URLs
        survive canonicalization: DuckDB's array_to_string over an
        EMPTY list is NULL where Spark's array_join is '' (r8 latent
        oracle bug, masked while every fixture URL carried a query
        string — the oracle now coalesces)."""
        from xeloader_spark.queries import text as qt

        df = qt.q_crawl_pipeline(spark, SF)
        plans.assert_max_shuffles(df, 3)
        plans.assert_no_cartesian(df)
        rows = df.collect()
        assert len(rows) > 100
        # query-less canonical URLs exist and grouped correctly
        assert all("?" not in r.canonical_url for r in rows)
        assert all(r.n_refs >= 1 and r.fetch_wave >= 0 for r in rows)

    def test_html_to_text_semantics_and_duck_parity(self, spark):
        """HTML→text edge cases: multi-line script bodies dropped with
        contents, MULTIPLE tags all stripped (DuckDB regexp_replace is
        first-match-only without 'g' — the r8 gsub dialect hook),
        single-level entity unescape (&amp;lt; → &lt;, never <),
        whitespace collapse; and the DuckDB rendering of the same
        template agrees string-for-string."""
        import duckdb

        from xeloader_spark.operators.links import html_to_text, html_to_text_sql
        from xeloader_spark.sources.warc import DUCK_DIALECT

        cases = [
            (1, '<html><script a="b">\nvar x = "<p>hi</p>";\n</script>'
                "<p>one</p><p>two</p></html>"),
            (2, "a &amp;lt; b &lt;i&gt; &quot;q&quot; &#39;s&#39; &amp; c"),
            (3, "<style>.a{}</style><b>x</b>   y\t\nz"),
            (4, ""),
            # numeric character references (r9): decimal + hex decode
            # across the full range; out-of-range / surrogate refs and
            # malformed heads kept as literal text; '&amp;#39;'
            # single-unescapes to the TEXT '&#39;'
            (5, "it&#8217;s &#x2019;q&#x2019; &#955; &#128512;"),
            (6, "&#38;lt; &amp;#39; &#1114112; &#xD800; &#x; &# &#12"),
            (7, "&#65;head tail&#98;"),
            # zero-padded spec-valid refs decode; > bound stays literal
            (8, "&#00000065; &#x0000041; &#99999999999;"),
            (9, None),  # NULL html stays NULL in BOTH engines
            # r10: curated NAMED entities beyond the XML core —
            # &nbsp; maps to plain space (whitespace collapse follows),
            # '&amp;nbsp;' single-unescapes to the TEXT '&nbsp;',
            # unknown names stay literal
            (10, "5&nbsp;km&mdash;done&hellip; &rsquo;x&rsquo; &copy;"
                 " &amp;nbsp; &unknown; 2&times;3&deg;"),
        ]
        df = spark.createDataFrame(cases, "doc_id long, html string")
        got = {r.doc_id: r.text_out for r in html_to_text(df).collect()}
        assert got[1] == "one two"
        assert got[2] == 'a &lt; b <i> "q" \'s\' & c'
        assert got[3] == "x y z"
        assert got[4] == ""
        assert got[5] == "it’s ’q’ λ \U0001f600"
        assert got[6] == "&lt; &#39; &#1114112; &#xD800; &#x; &# &#12"
        assert got[7] == "Ahead tailb"
        assert got[8] == "A A &#99999999999;"
        assert got[9] is None
        assert got[10] == (
            "5 km—done… ’x’ © &nbsp; &unknown; 2×3°"
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE h(doc_id BIGINT, html VARCHAR);"
            + "".join(
                "INSERT INTO h VALUES (%d, %s);"
                % (i, "NULL" if t is None else "'%s'" % t.replace("'", "''"))
                for i, t in cases
            )
        )
        exp = dict(
            con.execute(
                f"SELECT doc_id, {html_to_text_sql(DUCK_DIALECT, 'html')} "
                "FROM h"
            ).fetchall()
        )
        assert got == exp, (got, exp)

    def test_canonicalize_queryless_url_oracle_parity(self, spark):
        """The divergence-class regression pin: canonicalizing a URL
        with NO query string must agree between the Spark operator and
        the DuckDB core CTE (empty-list array_to_string coalesced)."""
        import duckdb

        from xeloader_spark.operators import text as tx
        from xeloader_spark.queries.text import _URL_CANON_CORE

        urls = [
            (1, "https://A.com/x/"),
            (2, "http://b.com:80/y"),
            (3, "https://c.com"),
            (4, "https://d.com/z?utm_source=x"),  # query strips to empty
            # r10 axes: RFC 3986 dot segments + percent-hex case —
            # shared-builder parity in BOTH engines
            (5, "https://e.com/a/./b/../c"),
            (6, "https://f.com/x%3a/y?q=%2fv"),
            (7, "https://g.com/../x/.."),
            (8, "https://h.com/p%ZZq"),  # bare '%': re-emitted verbatim
            # r11 axes: §6.2.2.2 unreserved decode in both engines —
            # '%6c'/'%41' decode, '%2e' decodes to '.' and THEN the
            # dot-segment fold removes it, reserved '%2f'/'%3D' stay
            (9, "https://i.com/arti%6cles/%41"),
            (10, "https://j.com/a/%2e/b/%2E%2e/c?t=x%2fy"),
            (11, "https://k.com/%7Euser?q=a%3Db"),
            (12, "https://l.com/%00x/%ff"),  # non-unreserved: stay encoded
        ]
        df = spark.createDataFrame(urls, "doc_id long, url string")
        got = {
            r.doc_id: r.canonical_url
            for r in tx.url_canonicalize(df).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE u(doc_id BIGINT, url VARCHAR);"
            + "".join(
                f"INSERT INTO u VALUES ({i}, '{u}');" for i, u in urls
            )
        )
        exp = dict(
            con.execute(
                "WITH " + _URL_CANON_CORE
                + " SELECT doc_id, canonical_url FROM canon"
            ).fetchall()
        )
        assert got == exp, (got, exp)
