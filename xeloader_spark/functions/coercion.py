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


def stringify_to_flat(col: Column | str) -> Column:
    """Flatten any value to its string form (maps/structs/arrays via
    to_json, primitives via cast) — the strictly flat-relational model of
    §1.2."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(T.StringType())


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
