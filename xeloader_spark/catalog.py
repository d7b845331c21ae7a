"""Fixture catalog: load the driver-generated parquet tables.

Mirrors the reference's catalog role (database/schema/table creation,
XELoader/InputParameters.cs:385-515) in Spark terms: tables are parquet
paths; `register_views` exposes them as SQL views so `spark.sql` works
like the downstream SQL Server the reference loads into.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Column pruning + predicate pushdown reach the
    parquet scan because this stays fully declarative.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark has
    no native type for (timestamps are microsecond precision). We read
    nanos as int64 (``spark.sql.legacy.parquet.nanosAsLong``) and truncate
    to microseconds — exactly what DuckDB does when materializing
    TIMESTAMP_NS, so oracle comparisons agree.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for fld in df.schema.fields:
        if fld.name == "ts" and fld.dataType.typeName() in ("long", "bigint"):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (idempotent)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
