"""S16 — non-primitive value coercion to the flat string model.

Reference: MapValue/ActivityId/XMLData values are stringified in the
fields/actions loops (XELoader/EventHolder.cs:135-183, :202-258); special
case: `module_start`/`module_end`.`statement` XMLData is nulled out — a
known data bug in SQL 2012/2014 traces (EventHolder.cs:166-171).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stringify_to_flat(
    col: Column | str, dtype: T.DataType | None = None
) -> Column:
    """Flatten any value to its string form — the strictly flat-relational
    model of §1.2. Complex types (map/struct/array) serialize via
    `to_json` so downstream consumers get real JSON, not Spark's
    `{k -> v}` cast rendering; primitives cast. An unresolved Column
    carries no type, so pass `dtype` (from the frame's schema) to get the
    JSON branch — `stringify_columns` does this per-column automatically.
    """
    c = F.col(col) if isinstance(col, str) else col
    if dtype is not None and isinstance(
        dtype, (T.MapType, T.StructType, T.ArrayType)
    ):
        return F.to_json(c)
    return c.cast(T.StringType())


def stringify_columns(df: DataFrame, *cols: str) -> DataFrame:
    """Type-aware flattening over named columns (all columns when none
    given): complex types → JSON text, primitives → cast string."""
    targets = cols or tuple(df.columns)
    by_name = {f.name: f.dataType for f in df.schema.fields}
    out = df
    for name in targets:
        out = out.withColumn(
            name, stringify_to_flat(F.col(name), by_name[name])
        )
    return out


def null_module_statement(
    df: DataFrame,
    event_type_col: str = "event_type",
    statement_col: str = "c_statement",
) -> DataFrame:
    """Null the statement payload on module_start/module_end events
    (EventHolder.cs:166-171)."""
    if statement_col not in df.columns:
        return df
    return df.withColumn(
        statement_col,
        F.when(
            F.col(event_type_col).isin("module_start", "module_end"),
            F.lit(None).cast("string"),
        ).otherwise(F.col(statement_col)),
    )
