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

from pyspark.sql import DataFrame

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
