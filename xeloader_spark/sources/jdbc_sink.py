"""JDBC sink — SQL-Server-parity write path (S18/S20).

The reference's sink is `SqlBulkCopy` with 1M-row batches and no timeout
(XELoader/EventHolder.cs:360-433, batch default InputParameters.cs:35).
The Spark-native sink is parquet (operators.ingest.demux_write); this
module provides the JDBC equivalent for deployments that still want the
rows in SQL Server. No SQL Server exists in this runtime, so the writer
construction is unit-tested and the `.save()` call is the caller's.

Mapping of reference knobs:
- `-b` batch size 1,048,576  → `batchsize` option
- table-per-event-type       → one `dbo.<schema>.<event>` table per type
  via partitioned loop (JDBC has no partitionBy)
- `-w/-c/-a` write modes     → overwrite/truncate(+option truncate=true)/
  append SaveModes
- DDL type mapping           → schema.sql_server_type_for drives
  `createTableColumnTypes`
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import LayoutConfig, sql_server_type_for

DEFAULT_BATCH_SIZE = 1_048_576  # InputParameters.cs:35; README.md:31


def build_jdbc_options(
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = DEFAULT_BATCH_SIZE,
    layout: LayoutConfig | None = None,
    xevent_types: dict[str, str] | None = None,
    options: dict[str, str] | None = None,
) -> tuple[str, dict[str, str]]:
    """Compute (save_mode, jdbc options) for a parity write.

    `xevent_types` maps column name → XEvent type name; when given, the
    target DDL types are generated with the reference's GetSQLType rules
    (EventMetadata.cs:284-353) via `createTableColumnTypes`.
    """
    opts: dict[str, str] = {
        "url": url,
        "dbtable": table,
        "batchsize": str(batch_size),
        "isolationLevel": "NONE",  # bulk-load semantics
    }
    save_mode = mode
    if mode == "truncate":
        save_mode = "overwrite"
        opts["truncate"] = "true"
    if xevent_types:
        opts["createTableColumnTypes"] = ", ".join(
            f"{col} {sql_server_type_for(xet, col, layout)}"
            for col, xet in xevent_types.items()
        )
    opts.update(options or {})
    return save_mode, opts


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = DEFAULT_BATCH_SIZE,
    layout: LayoutConfig | None = None,
    xevent_types: dict[str, str] | None = None,
    options: dict[str, str] | None = None,
):
    """Build (not execute) a configured JDBC DataFrameWriter."""
    save_mode, opts = build_jdbc_options(
        url, table, mode, batch_size, layout, xevent_types, options
    )
    writer = df.write.format("jdbc").mode(save_mode)
    for k, v in opts.items():
        writer = writer.option(k, v)
    return writer


# ------------------------------------------------- schema evolution (S6)
#
# The reference diffs the inferred event schema against the live table and
# evolves BOTH sides (EnsureTableSchemaMatches, EventMetadata.cs:400-455):
# frame columns missing from the table become `ALTER TABLE … ADD … NULL`,
# and table columns missing from the frame are appended to the in-memory
# DataTable as strings so the bulk copy column lists line up. The plan
# computation is pure (testable without a server); execution takes caller
# callbacks since no SQL Server exists in this runtime.

# Spark type → reference XEvent type name, so the ALTER DDL runs through
# the same GetSQLType rules as initial table creation (single source of
# truth for widths/LOB selection).
_SPARK_TO_XEVENT: dict[type, str] = {
    T.LongType: "int64",
    T.IntegerType: "int32",
    T.ShortType: "int16",
    T.ByteType: "int8",
    T.BooleanType: "boolean",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.TimestampType: "datetime",
    T.BinaryType: "binary",
    T.DecimalType: "uint64",
}


def _xevent_type_for_spark(dt: T.DataType) -> str:
    return _SPARK_TO_XEVENT.get(type(dt), "unicode_string")


class SqlServerDialect:
    """Identifier quoting + DDL type rendering for the ALTER emission.
    The statement TEMPLATE is dialect-independent (`ALTER TABLE s.t ADD
    c <type> NULL` parses on SQL Server and DuckDB alike); only the
    quoting characters and type vocabulary differ, so dialects override
    exactly those two hooks. Default target is SQL Server (the
    reference's engine); the DuckDB dialect exists so the evolution path
    can be EXECUTED against a live in-process engine in tests rather
    than only planned."""

    name = "sqlserver"

    def quote(self, ident: str) -> str:
        return f"[{ident}]"

    def render_type(self, sql_server_type: str) -> str:
        return sql_server_type


class DuckDbDialect(SqlServerDialect):
    name = "duckdb"

    _EXACT = {
        "bit": "BOOLEAN",
        "real": "FLOAT",
        "float": "DOUBLE",  # SQL Server float(53) is double precision
        "smalldatetime": "TIMESTAMP",
        "xml": "VARCHAR",
    }

    def quote(self, ident: str) -> str:
        return '"' + ident.replace('"', '""') + '"'

    def render_type(self, sql_server_type: str) -> str:
        t = sql_server_type.lower()
        if t in self._EXACT:
            return self._EXACT[t]
        if t.startswith("datetime2"):
            return "TIMESTAMP"
        if t.startswith("nvarchar"):
            return "VARCHAR"
        if t.startswith("varbinary"):
            return "BLOB"
        return sql_server_type  # bigint/int/smallint/tinyint/decimal(p,s)


SQL_SERVER = SqlServerDialect()
DUCKDB = DuckDbDialect()


def existing_columns_query(schema_name: str, table: str) -> str:
    """The reference's live-table introspection (EventMetadata.cs:416-418),
    parameterized the JDBC way (run via a `query` option or connection)."""
    return (
        "SELECT COLUMN_NAME FROM INFORMATION_SCHEMA.COLUMNS "
        f"WHERE TABLE_SCHEMA = '{schema_name}' AND TABLE_NAME = '{table}'"
    )


def schema_evolution_plan(
    df: DataFrame,
    existing_columns: Iterable[str],
    schema_name: str = "xel",
    table: str = "events",
    layout: LayoutConfig | None = None,
    xevent_types: dict[str, str] | None = None,
    dialect: SqlServerDialect = SQL_SERVER,
) -> tuple[list[str], list[str]]:
    """Diff the frame's schema against the live table's column set →
    (`ALTER TABLE … ADD` statements, server-only column names).

    Mirrors EnsureTableSchemaMatches exactly: comparison is
    case-insensitive (the reference uses an OrdinalIgnoreCase set), added
    columns are NULLable (history rows can't backfill), and DDL types come
    from the GetSQLType rules — via the declared XEvent type when known
    (`xevent_types`), else from the Spark type. Server-only columns are
    reported for `align_frame` (the reference appends them to the DataTable
    as strings, EventMetadata.cs:445-452)."""
    existing = {c.lower() for c in existing_columns}
    frame_cols = {f.name.lower() for f in df.schema.fields}
    alters: list[str] = []
    for f in df.schema.fields:
        if f.name.lower() in existing:
            continue
        xet = (xevent_types or {}).get(f.name) or _xevent_type_for_spark(f.dataType)
        sql_type = dialect.render_type(sql_server_type_for(xet, f.name, layout))
        q = dialect.quote
        alters.append(
            f"ALTER TABLE {q(schema_name)}.{q(table)} "
            f"ADD {q(f.name)} {sql_type} NULL"
        )
    server_only = [c for c in existing_columns if c.lower() not in frame_cols]
    return alters, server_only


def align_frame(df: DataFrame, server_only_columns: Iterable[str]) -> DataFrame:
    """Append the table's extra columns to the frame as null strings so the
    write's column list matches the table (EventMetadata.cs:445-452 adds
    them to the DataTable as typeof(string))."""
    out = df
    for c in server_only_columns:
        out = out.withColumn(c, F.lit(None).cast("string"))
    return out


def ensure_table_schema_matches(
    df: DataFrame,
    fetch_existing_columns: Callable[[], Iterable[str]],
    run_sql: Callable[[str], None],
    schema_name: str = "xel",
    table: str = "events",
    layout: LayoutConfig | None = None,
    xevent_types: dict[str, str] | None = None,
    dialect: SqlServerDialect = SQL_SERVER,
) -> DataFrame:
    """Full EnsureTableSchemaMatches parity: introspect, ALTER the table
    for new frame columns, and return the frame aligned with the table's
    server-only columns. `fetch_existing_columns` / `run_sql` wrap the
    caller's JDBC connection (no SQL Server in this runtime; the executed
    path is exercised end-to-end against in-process DuckDB via
    `dialect=DUCKDB` in `test_sources_plans.py`)."""
    existing = list(fetch_existing_columns())
    alters, server_only = schema_evolution_plan(
        df, existing, schema_name, table, layout, xevent_types, dialect
    )
    for stmt in alters:
        run_sql(stmt)
    return align_frame(df, server_only)


def demux_jdbc_tables(
    df: DataFrame,
    url: str,
    schema_name: str = "xel",
    mode: str = "append",
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> dict[str, object]:
    """Table-per-event-type demux for JDBC (EventMetadata.cs:84): one
    writer per distinct event type, each filtered declaratively so
    Catalyst pushes the type predicate to the scan. Returns writers keyed
    by table name; caller invokes .save() (requires a live server)."""
    types = [r.event_type for r in df.select("event_type").distinct().collect()]
    writers = {}
    for t in sorted(types):
        sub = df.filter(df.event_type == t).drop("event_type")
        writers[f"{schema_name}.{t}"] = jdbc_writer(
            sub, url, f"{schema_name}.{t}", mode=mode, batch_size=batch_size
        )
    return writers
