"""Unit tests for SURVEY §2.1 scalar transforms S7, S10-S16 (test strategy
§5.3)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xeloader_spark import schema as xs
from xeloader_spark.functions import (
    callstack_debugcmd_expr,
    callstack_debugcmd_udf,
    decode_callstack_py,
    null_module_statement,
    smalldatetime_round,
    three_timestamp_projection,
    truncate_binary,
    truncate_string,
    truncation_flag,
    uint64_hex,
    uint64_to_bin,
)


class TestTypeMapping:  # S7, §1.3
    @pytest.mark.parametrize(
        "xe,expected",
        [
            ("UInt64", T.DecimalType(38, 0)),
            ("Int64", T.LongType()),
            ("UInt32", T.LongType()),
            ("Int32", T.IntegerType()),
            ("UInt16", T.IntegerType()),
            ("Int16", T.ShortType()),
            ("UInt8", T.ShortType()),
            ("Int8", T.ByteType()),
            ("Boolean", T.BooleanType()),
            ("DateTime", T.TimestampType()),
            ("Binary", T.BinaryType()),
            ("String", T.StringType()),
            ("MapValue", T.StringType()),
            ("ActivityId", T.StringType()),
            ("XMLData", T.StringType()),
            ("SomethingUnknown", T.StringType()),
        ],
    )
    def test_spark_type(self, xe, expected):
        assert xs.spark_type_for(xe) == expected

    def test_sql_type_bounded_vs_lob(self):
        bounded = xs.LayoutConfig(layout="columnstore", lob_supported=False)
        lob = xs.LayoutConfig(layout="columnstore", lob_supported=True)
        assert xs.sql_server_type_for("String", "c_message", bounded) == "nvarchar(1024)"
        assert xs.sql_server_type_for("String", "c_message", lob) == "nvarchar(max)"
        assert xs.sql_server_type_for("XMLData", "c_showplan_xml", lob) == "xml"
        assert (
            xs.sql_server_type_for("XMLData", "c_showplan_xml", bounded)
            == "nvarchar(4000)"
        )
        assert xs.sql_server_type_for("Binary", "c_blob", bounded) == "varbinary(1024)"
        assert xs.sql_server_type_for("UInt64", "a_query_hash") == "decimal(38,0)"
        assert xs.sql_server_type_for("DateTime", "e_time_of_event") == "smalldatetime"
        assert (
            xs.sql_server_type_for("DateTime", "e_time_of_event_utc") == "datetime2(7)"
        )

    def test_build_event_schema_dual_and_drop(self):
        s = xs.build_event_schema(
            {"duration": "UInt64", "data_stream": "Binary", "statement": "XMLData"},
            {
                "query_hash": "UInt64",
                "callstack": "Binary",
                "debug_break": "String",
                "sql_text": "String",
            },
        )
        names = [f.name for f in s.fields]
        assert names[:4] == [
            "e_imported_file_id",
            "e_time_of_event",
            "e_time_of_event_utc",
            "e_time_of_event_local",
        ]
        assert "c_duration" in names
        assert "c_data_stream" not in names  # dropped field
        assert "a_debug_break" not in names  # dropped action
        assert "a_query_hash_bin" in names  # dual column
        assert "a_callstack_debugcmd" in names  # dual column
        assert s["a_query_hash"].dataType == T.DecimalType(38, 0)
        assert s["a_query_hash_bin"].dataType == T.BinaryType()

    def test_registry_merge_evolution(self):
        reg = xs.EventSchemaRegistry()
        reg.register("wait_info", {"duration": "UInt64"}, {})
        evolved = xs.build_event_schema(
            {"duration": "UInt64", "signal_duration": "UInt64"}, {}
        )
        merged = reg.merge("wait_info", evolved)
        assert "c_signal_duration" in [f.name for f in merged.fields]


class TestTimestamps:  # S10
    def test_three_projection(self, spark):
        ts = dt.datetime(2024, 3, 10, 8, 45, 59, 500000)
        df = spark.createDataFrame([Row(ts=ts)])
        out = three_timestamp_projection(df, tz="Asia/Kolkata").collect()[0]
        assert out.e_time_of_event == dt.datetime(2024, 3, 10, 8, 45)
        assert out.e_time_of_event_utc == ts
        assert out.e_time_of_event_local == dt.datetime(2024, 3, 10, 14, 15, 59, 500000)

    def test_smalldatetime_round_boundary(self, spark):
        rows = [
            Row(i=1, ts=dt.datetime(2024, 1, 1, 0, 0, 29, 900000)),  # down
            Row(i=2, ts=dt.datetime(2024, 1, 1, 0, 0, 30, 0)),  # up
            Row(i=3, ts=dt.datetime(2024, 1, 1, 0, 0, 29, 998000)),  # up (boundary)
        ]
        df = spark.createDataFrame(rows).select(
            "i", smalldatetime_round(F.col("ts")).alias("r")
        )
        got = {r.i: r.r for r in df.collect()}
        assert got[1] == dt.datetime(2024, 1, 1, 0, 0)
        assert got[2] == dt.datetime(2024, 1, 1, 0, 1)
        assert got[3] == dt.datetime(2024, 1, 1, 0, 1)


class TestTruncation:  # S11-S13
    def test_string_boundary(self, spark):
        df = spark.createDataFrame([Row(s="x" * 10), Row(s="y" * 3)])
        out = df.select(
            truncate_string("s", 5).alias("t"),
            truncation_flag("s", 5).alias("f"),
        ).collect()
        assert (out[0].t, out[0].f) == ("x" * 5, 1)
        assert (out[1].t, out[1].f) == ("y" * 3, 0)

    def test_binary_uses_binary_width_not_reference_bug(self, spark):
        # EventHolder.cs:327 copies the *string* truncation width when
        # truncating binaries; we pin the correct behavior: exactly
        # max_bytes bytes survive.
        blob = bytes(range(20))
        df = spark.createDataFrame([Row(b=bytearray(blob))])
        out = df.select(truncate_binary("b", 7).alias("t")).collect()[0]
        assert bytes(out.t) == blob[:7]


class TestHashBytes:  # S14
    def test_known_value(self, spark):
        df = spark.createDataFrame([Row(h=0x1122334455667788)])
        out = df.select(
            uint64_hex("h").alias("hx"), uint64_to_bin("h").alias("bn")
        ).collect()[0]
        assert out.hx == "1122334455667788"
        assert bytes(out.bn) == bytes.fromhex("1122334455667788")

    def test_unsigned_interpretation(self, spark):
        # a uint64 > 2^63 arrives as a negative long; two's-complement hex
        # is exactly the unsigned big-endian image
        df = spark.createDataFrame([Row(h=-1)])
        out = df.select(uint64_hex("h").alias("hx")).collect()[0]
        assert out.hx == "FFFFFFFFFFFFFFFF"


class TestCallstack:  # S15
    FRAMES8 = bytes.fromhex("8877665544332211") + bytes.fromhex("F0DEBC9A78563412")

    def test_python_core_8(self):
        got = decode_callstack_py(self.FRAMES8, 8, "ln ")
        assert got == "ln 1122334455667788;ln 123456789ABCDEF0"

    def test_python_core_4_and_partial(self):
        data = bytes.fromhex("44332211") + bytes.fromhex("AABB")  # partial tail
        assert decode_callstack_py(data, 4, "ln ") == "ln 11223344"

    def test_python_core_null(self):
        assert decode_callstack_py(None) is None

    def test_expr_matches_python(self, spark):
        import random

        rng = random.Random(42)
        blobs = [bytes(rng.randrange(256) for _ in range(rng.choice([0, 4, 8, 16, 24, 31]))) for _ in range(50)]
        df = spark.createDataFrame([Row(i=i, b=bytearray(b)) for i, b in enumerate(blobs)])
        got = {
            r.i: r.cmd
            for r in df.select(
                "i", callstack_debugcmd_expr("b", 8, "ln ").alias("cmd")
            ).collect()
        }
        for i, b in enumerate(blobs):
            assert got[i] == decode_callstack_py(b, 8, "ln "), f"blob {i}"

    def test_udf_matches_python(self, spark):
        df = spark.createDataFrame([Row(b=bytearray(self.FRAMES8)), Row(b=None)])
        out = df.select(callstack_debugcmd_udf("b", 8).alias("cmd")).collect()
        assert out[0].cmd == "ln 1122334455667788;ln 123456789ABCDEF0"
        assert out[1].cmd is None


class TestWindowsTz:  # -z parity (InputParameters.cs:276-279)
    def test_common_sql_server_zones_map(self):
        from xeloader_spark.functions import to_iana
        from zoneinfo import ZoneInfo

        cases = {
            "Pacific Standard Time": "America/Los_Angeles",
            "Eastern Standard Time": "America/New_York",
            "Central Europe Standard Time": "Europe/Budapest",
            "GMT Standard Time": "Europe/London",
            "India Standard Time": "Asia/Kolkata",
            "China Standard Time": "Asia/Shanghai",
            "AUS Eastern Standard Time": "Australia/Sydney",
            "UTC": "Etc/UTC",
        }
        for win, iana in cases.items():
            assert to_iana(win) == iana
            ZoneInfo(iana)  # every mapped target must be a real zone

    def test_every_mapping_target_resolves(self):
        from xeloader_spark.functions import WINDOWS_TO_IANA
        from zoneinfo import ZoneInfo

        for iana in WINDOWS_TO_IANA.values():
            ZoneInfo(iana)

    def test_iana_passthrough_and_error_lists_zones(self):
        import pytest as _pt

        from xeloader_spark.functions import to_iana

        assert to_iana("America/Chicago") == "America/Chicago"
        with _pt.raises(ValueError, match="Pacific Standard Time"):
            to_iana("Not A Zone")


class TestCoercion:  # S16
    def test_complex_types_stringify_as_json(self, spark):
        import json

        from xeloader_spark.functions import stringify_columns

        df = spark.createDataFrame(
            [({"k": "v"}, [1, 2, 3], ("a", 7), "plain", 42)],
            "m map<string,string>, arr array<int>, "
            "st struct<x:string,y:int>, s string, i int",
        )
        row = stringify_columns(df).collect()[0]
        # complex types are real JSON (parseable), not Spark's {k -> v}
        assert json.loads(row.m) == {"k": "v"}
        assert json.loads(row.arr) == [1, 2, 3]
        assert json.loads(row.st) == {"x": "a", "y": 7}
        # primitives are plain casts
        assert row.s == "plain" and row.i == "42"

    def test_module_statement_nulled(self, spark):
        df = spark.createDataFrame(
            [
                Row(event_type="module_start", c_statement="<xml/>"),
                Row(event_type="module_end", c_statement="<xml/>"),
                Row(event_type="sql_batch", c_statement="SELECT 1"),
            ]
        )
        out = {r.event_type: r.c_statement for r in null_module_statement(df).collect()}
        assert out["module_start"] is None
        assert out["module_end"] is None
        assert out["sql_batch"] == "SELECT 1"
