"""Streaming bulk-load into a live SQL engine — the streaming twin of
the reference's core job (XELoader bulk-copies event batches into SQL
Server tables, XELoader/FileProcessor.cs batch loop; here Structured
Streaming micro-batches land in an in-process DuckDB through the same
dialect / schema-evolution machinery, exactly-once).

`foreachBatch` is the production pattern for JDBC-style sinks Structured
Streaming cannot address natively. Each micro-batch arrives with a
monotonic `batch_id`; the handler

1. ensures the target table exists and its schema matches the frame —
   EXECUTED DDL via `sources.jdbc_sink.ensure_table_schema_matches`
   (the S6 evolution path), so a widened stream evolves the live table
   mid-stream instead of failing;
2. consults the load log: a `batch_id` already recorded is a
   redelivery (restart, retried trigger) and is skipped — at-least-once
   delivery becomes an exactly-once EFFECT;
3. appends the rows and the load-log entry in one transaction, so a
   crash between the two cannot double- or half-load a batch.

Driver-side inserts are batch-sized by construction (micro-batches are
bounded), mirroring the reference's 1M-row bulk-copy batches; a
production JDBC target swaps the insert body for executor-parallel
`df.write.jdbc` plus the same transactional load-log gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from ..sources.jdbc_sink import DuckDbDialect, ensure_table_schema_matches


def make_duckdb_batch_loader(
    db_path: str,
    schema_name: str,
    table: str,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch(handler)`` that loads micro-batches into
    the DuckDB file at `db_path` with schema evolution + an idempotent
    batch_id load log."""
    dialect = DuckDbDialect()
    qschema = dialect.quote(schema_name)
    qtable = f"{qschema}.{dialect.quote(table)}"
    qlog = f"{qschema}.{dialect.quote('_load_log')}"

    def handler(batch_df: DataFrame, batch_id: int) -> None:
        import duckdb

        con = duckdb.connect(db_path)
        try:
            con.execute(f"CREATE SCHEMA IF NOT EXISTS {qschema}")
            con.execute(
                f"CREATE TABLE IF NOT EXISTS {qlog} "
                "(batch_id BIGINT, n_rows BIGINT)"
            )
            seen = con.execute(
                f"SELECT COUNT(*) FROM {qlog} WHERE batch_id = ?",
                [batch_id],
            ).fetchone()[0]
            if seen:
                return  # redelivered batch: already an applied effect

            pdf = batch_df.toPandas()
            con.register("_incoming", pdf)
            exists = con.execute(
                "SELECT COUNT(*) FROM information_schema.tables "
                "WHERE table_schema = ? AND table_name = ?",
                [schema_name, table],
            ).fetchone()[0]
            if not exists:
                con.execute(
                    f"CREATE TABLE {qtable} AS "
                    "SELECT * FROM _incoming WHERE 1 = 0"
                )

            def fetch_cols() -> list[str]:
                return [
                    r[0]
                    for r in con.execute(
                        "SELECT column_name FROM information_schema.columns "
                        "WHERE table_schema = ? AND table_name = ?",
                        [schema_name, table],
                    ).fetchall()
                ]

            aligned = ensure_table_schema_matches(
                batch_df,
                fetch_cols,
                lambda stmt: con.execute(stmt),
                schema_name=schema_name,
                table=table,
                dialect=dialect,
            )
            con.unregister("_incoming")
            con.register("_incoming", aligned.toPandas())
            cols = ", ".join(dialect.quote(c) for c in aligned.columns)
            con.execute("BEGIN")
            con.execute(
                f"INSERT INTO {qtable} ({cols}) "
                f"SELECT {cols} FROM _incoming"
            )
            con.execute(
                f"INSERT INTO {qlog} VALUES (?, ?)", [batch_id, len(pdf)]
            )
            con.execute("COMMIT")
        finally:
            con.close()

    return handler
