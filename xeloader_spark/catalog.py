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

    Timestamp normalization: the fixtures have been generated with two
    parquet physical shapes over time — TIMESTAMP(NANOS) (no native Spark
    type; read as int64 via ``spark.sql.legacy.parquet.nanosAsLong`` and
    truncated to micros) and TIMESTAMP(MICROS) without UTC adjustment
    (which Spark 4 would infer as TIMESTAMP_NTZ). Both are normalized to
    session TIMESTAMP at the *scan* (inferTimestampNTZ=false — a reader
    conf, not a cast, so timestamp predicates still push down to
    parquet). The session is pinned to UTC (`session.py`), so wall-clock
    values agree with DuckDB's naive timestamps in oracle comparisons.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for fld in df.schema.fields:
        if fld.name == "ts" and fld.dataType.typeName() in ("long", "bigint"):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif fld.dataType.typeName() == "timestamp_ntz":
            df = df.withColumn(fld.name, F.col(fld.name).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (idempotent)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
