"""Schema system: XEvent logical types → Spark types, column naming, and
per-event-type schema construction (SURVEY §1.2-1.3).

Reference behavior being reproduced (cited for parity checking):
- type mapping `GetDataTableColumnType` XELoader/EventMetadata.cs:257-282
  and `GetSQLType` XELoader/EventMetadata.cs:284-353;
- `c_`/`a_`/`e_` column-naming convention XELoader/EventMetadata.cs:71,
  :89-105, :111;
- four mandatory engine columns XELoader/EventMetadata.cs:89-105;
- dual derived columns (`*_bin`, `a_callstack_debugcmd`)
  XELoader/EventMetadata.cs:56-68;
- dropped actions/fields XELoader/EventMetadata.cs:50-55,
  XELoader/EventHolder.cs:145-148;
- known-large-string and known-XML column sets
  XELoader/EventMetadata.cs:325-344.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# §1.3 type mapping. UInt64 has no lossless signed-64 fit → Decimal(38,0)
# (reference: EventMetadata.cs:261-262 maps it to .NET Decimal / SQL
# decimal(38,0)).
XEVENT_TO_SPARK: dict[str, T.DataType] = {
    "uint64": T.DecimalType(38, 0),
    "int64": T.LongType(),
    "uint32": T.LongType(),
    "int32": T.IntegerType(),
    "uint16": T.IntegerType(),
    "int16": T.ShortType(),
    "uint8": T.ShortType(),
    "int8": T.ByteType(),
    "boolean": T.BooleanType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "datetime": T.TimestampType(),
    "binary": T.BinaryType(),
    # MapValue / ActivityId / XMLData / String and anything unknown all
    # flatten to string (EventMetadata.cs:274-281) — the model is strictly
    # flat-relational.
    "string": T.StringType(),
    "mapvalue": T.StringType(),
    "activityid": T.StringType(),
    "xmldata": T.StringType(),
}

# Column-name-driven overrides (EventMetadata.cs:325-344).
KNOWN_LARGE_STRING_COLS = frozenset(
    {"c_message", "c_statement", "c_batch_text", "c_execution_statistics", "a_sql_text"}
)
KNOWN_XML_COLS = frozenset(
    {
        "a_tsql_stack",
        "a_tsql_frame",
        "c_blocked_process",
        "c_calculator",
        "c_data",
        "c_execution_stats_report",
        "c_input_relation",
        "c_output_parameters",
        "c_server_memory_grants",
        "c_showplan_xml",
        "c_stats_collection",
        "c_xml_report",
    }
)

# Actions dropped from every schema (EventMetadata.cs:50-55) and fields
# skipped at extraction time (EventHolder.cs:145-148).
DROPPED_ACTIONS = frozenset(
    {"debug_break", "create_dump_single_thread", "create_dump_all_threads"}
)
DROPPED_FIELDS = frozenset({"data_stream"})

# Actions that get a parallel derived column (EventMetadata.cs:56-68).
HASH_ACTIONS = frozenset({"query_hash", "query_plan_hash"})
CALLSTACK_ACTION = "callstack"

ENGINE_COLUMNS: tuple[tuple[str, T.DataType], ...] = (
    ("e_imported_file_id", T.LongType()),  # EventMetadata.cs:89
    ("e_time_of_event", T.TimestampType()),  # coarse, EventMetadata.cs:94
    ("e_time_of_event_utc", T.TimestampType()),  # EventMetadata.cs:99
    ("e_time_of_event_local", T.TimestampType()),  # EventMetadata.cs:104
)


def field_column(name: str) -> str:
    """Event-local payload column name (`c_` prefix, EventMetadata.cs:111)."""
    return f"c_{name}"


def action_column(name: str) -> str:
    """Session-global action column name (`a_` prefix, EventMetadata.cs:71)."""
    return f"a_{name}"


def spark_type_for(xevent_type: str) -> T.DataType:
    return XEVENT_TO_SPARK.get(xevent_type.lower(), T.StringType())


def build_event_schema(
    event_fields: dict[str, str],
    actions: dict[str, str],
) -> T.StructType:
    """Build the flat per-event-type StructType: engine columns, then `c_`
    fields in declaration order, then every `a_` action (every action is
    appended to every event table, EventMetadata.cs:114-117), with dual
    derived columns and drop rules applied."""
    cols: list[T.StructField] = [
        T.StructField(n, t, True) for n, t in ENGINE_COLUMNS
    ]
    for fname, ftype in event_fields.items():
        if fname in DROPPED_FIELDS:
            continue
        cols.append(T.StructField(field_column(fname), spark_type_for(ftype), True))
    for aname, atype in actions.items():
        if aname in DROPPED_ACTIONS:
            continue
        cols.append(T.StructField(action_column(aname), spark_type_for(atype), True))
        if aname in HASH_ACTIONS:
            # parallel big-endian binary form for DMV-capture joins
            # (EventMetadata.cs:56-62, EventHolder.cs:216-225)
            cols.append(
                T.StructField(action_column(aname) + "_bin", T.BinaryType(), True)
            )
        if aname == CALLSTACK_ACTION:
            # parallel debugger-command string (EventMetadata.cs:63-68)
            cols.append(
                T.StructField(action_column(aname) + "_debugcmd", T.StringType(), True)
            )
    return T.StructType(cols)


# ---------------------------------------------------------------------------
# SQL Server DDL mapping (GetSQLType, EventMetadata.cs:284-353) — kept for
# JDBC-parity mode and documentation; the Spark-native sink is parquet where
# none of the width-bounding matters.


@dataclass
class LayoutConfig:
    """Physical layout knobs mirroring `-I/-l/-L/-X/-B/-x`
    (InputParameters.cs:35-53, EventMetadata.cs:355-397)."""

    layout: str = "columnstore"  # or "rowstore"
    lob_supported: bool = True  # SQL>=2017 analog; False → width-bounded
    string_trunc: int = 1024  # -L
    xml_trunc: int = 4000  # -X
    binary_trunc: int = 1024  # -B
    xml_as_string: bool = False  # -x


def sql_server_type_for(
    xevent_type: str, column_name: str, cfg: LayoutConfig | None = None
) -> str:
    """SQL Server DDL type for a column — the reference's GetSQLType
    (EventMetadata.cs:284-353) including the layout/LOB-dependent max-type
    selection (EventMetadata.cs:355-397)."""
    cfg = cfg or LayoutConfig()
    t = xevent_type.lower()
    bounded = cfg.layout == "columnstore" and not cfg.lob_supported
    max_nvarchar = f"nvarchar({cfg.string_trunc})" if bounded else "nvarchar(max)"
    max_xml = (
        f"nvarchar({cfg.xml_trunc})"
        if bounded
        else ("nvarchar(max)" if cfg.xml_as_string else "xml")
    )
    max_binary = f"varbinary({cfg.binary_trunc})" if bounded else "varbinary(max)"

    if t == "uint64":
        return "decimal(38,0)"
    if t in ("int64", "uint32"):
        return "bigint"
    if t in ("int32", "uint16"):
        return "int"
    if t in ("uint8", "int16"):
        return "smallint"
    if t == "int8":
        return "tinyint"
    if t == "boolean":
        return "bit"
    if t == "float":
        return "real"
    if t == "double":
        return "float"
    if t == "datetime":
        # coarse graphing column is smalldatetime; precise ones datetime2(7)
        # (EventMetadata.cs:304-311)
        return "smalldatetime" if column_name == "e_time_of_event" else "datetime2(7)"
    if t == "binary":
        return max_binary
    if column_name in KNOWN_XML_COLS:
        return max_xml
    if column_name in KNOWN_LARGE_STRING_COLS:
        return max_nvarchar
    return "nvarchar(512)"


@dataclass
class EventSchemaRegistry:
    """One inferred schema per event type — the reference's one-time
    metadata extraction (ExtractMetadataFromFile, EventMetadata.cs:31-132)
    as a driver-side registry. Schema inference happens once (the reference
    guards it with a writer lock, FileProcessor.cs:206-215; in Spark the
    driver is already the single point of schema resolution)."""

    schemas: dict[str, T.StructType] = field(default_factory=dict)

    def register(
        self, event_name: str, fields: dict[str, str], actions: dict[str, str]
    ) -> T.StructType:
        schema = build_event_schema(fields, actions)
        self.schemas[event_name] = schema
        return schema

    def merge(self, event_name: str, other: T.StructType) -> T.StructType:
        """Schema evolution: add columns present in `other` but missing here
        — the reference's EnsureTableSchemaMatches ALTER TABLE … ADD path
        (EventMetadata.cs:400-455). Spark-native equivalent is parquet
        `mergeSchema`; this registry mirrors it for explicit control."""
        current = self.schemas.get(event_name)
        if current is None:
            self.schemas[event_name] = other
            return other
        names = {f.name for f in current.fields}
        merged = list(current.fields) + [
            f for f in other.fields if f.name not in names
        ]
        out = T.StructType(merged)
        self.schemas[event_name] = out
        return out
