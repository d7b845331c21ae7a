"""SURVEY §2.2 — the query surface the reference's output schema is built
for. The reference creates a columnstore expressly so SQL Server can run
these (XELoader README.md:29, InputParameters.cs:622-626); here they are
native DataFrame plans.

All of these run over the ``events`` fixture (the decoded-XE-trace analog,
FIXTURES.md) and the TPC-H-ish tables. Every aggregate column is aliased
identically in the Spark plan and the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table

# Exact accumulation for doubles: decimal is associative/commutative-exact,
# so Spark's partial aggregation order cannot change the result, and DuckDB
# computes the identical value. Final cast to double is deterministic.
_DEC = "decimal(25,6)"


def _dsum(col: str, alias: str):
    return (
        F.sum(F.col(col).cast(_DEC)).cast("double").alias(alias)
    )


def _davg(col: str, alias: str):
    # avg = exact-sum (double) / count — same two deterministic ops as the
    # oracle's CAST(SUM(CAST(..)) AS DOUBLE) / COUNT(*).
    return (
        F.sum(F.col(col).cast(_DEC)).cast("double") / F.count(F.lit(1))
    ).alias(alias)


def q_time_bucket_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregate — the canonical "graphing" query the coarse
    `e_Time_Of_Event` column exists for (InputParameters.cs:622-624).

    Scale notes: partial aggregation (map-side combine) happens before the
    shuffle on (bucket, event_type); cardinality is bounded by
    buckets × types, so the shuffle is tiny regardless of input size.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("minute", F.col("ts")).alias("bucket_ts"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum("value", "sum_value"),
            _davg("value", "avg_value"),
        )
    )


def q_event_sequence_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact event ordering "down to the 100 nanoseconds" — enabled by the
    `datetime2(7)` UTC column / `c_event_sequence` cluster key
    (InputParameters.cs:624-625, EventMetadata.cs:207).

    Scale notes: an unpartitioned `Window.orderBy` would move the WHOLE
    events table through one task (Spark's "No Partition Defined for
    Window operation" execution; the rank filter does not push through
    the window). The 100 lowest event_ids are instead selected with
    `orderBy().limit(100)` — a TakeOrderedAndProject, which keeps top-100
    per partition then merges 100×partitions rows on the driver side —
    and ONLY that bounded 100-row frame is windowed for the sequence
    number. Pinned by assert_no_global_window (bounded inputs exempt).
    """
    ev = load_table(spark, sf_dir, "events")
    first100 = ev.select("event_id", "ts", "event_type").orderBy("event_id").limit(100)
    w = Window.orderBy("event_id")
    return first100.withColumn("seq", F.row_number().over(w).cast("long"))


def q_event_type_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type selection + projection — the table-per-event-type
    model (EventMetadata.cs:84) as a filter. The predicate and the 4-column
    projection both push down to the parquet scan."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "error").select(
        "event_id", "ts", "user_id", "value"
    )


def q_lineage_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join rows back to their source record — the `e_Imported_File_Id` →
    `tbl_ImportedXEventFiles` pattern (EventHolder.cs:105,
    InputParameters.cs:545-546). Fixture stand-in per FIXTURES.md:
    lineitem (events) ⋈ orders (lineage), aggregated per lineage attr.

    Scale notes: no explicit broadcast hint — orders scales with the
    corpus (1.5M rows per TPC-H SF), so the join strategy is left to the
    optimizer: size-estimate broadcast under the 64 MB threshold at test
    scale, sort-merge/shuffle-hash with AQE skew handling at 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(
            orders,
            li.l_orderkey == orders.o_orderkey,
            "inner",
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _dsum("l_extendedprice", "sum_price"),
        )
    )


def q_hash_match_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join on a derived hash key against an external capture set — the
    `a_query_hash_bin` dual-column design "to match with DMV captures"
    (EventHolder.cs:216-225). Here: md5-derived user hash; the capture set
    is the distinct hashes seen on error events; join finds all activity
    of those users.

    Scale notes: the distinct capture set is small → broadcast; the derived
    key is computed JVM-side (built-in md5), no Python.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "user_hash", F.md5(F.col("user_id").cast("string"))
    )
    captures = (
        ev.filter(F.col("event_type") == "error").select("user_hash").distinct()
    )
    return (
        ev.join(F.broadcast(captures), "user_hash", "inner")
        .groupBy("user_hash")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("first_event_id"),
        )
    )


def q_local_time_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three-timestamp projection (S10): coarse minute bucket, precise
    UTC, and local-zone time (EventHolder.cs:105-114). Fixed offset
    +05:30 here for cross-engine oracle parity; `local_time_projection`
    in functions.timeutil accepts any IANA zone."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_trunc("minute", F.col("ts")).alias("e_time_of_event"),
        F.col("ts").alias("e_time_of_event_utc"),
        (F.col("ts") + F.expr("INTERVAL 330 MINUTES")).alias(
            "e_time_of_event_local"
        ),
    )


def q_truncation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count/flag over-length payloads — the truncation counters
    (TrackStatus.cs:28-30) as an aggregate, width 64 chars standing in for
    the `-L` bound (InputParameters.cs:45)."""
    ev = load_table(spark, sf_dir, "events")
    over = (F.length("props") > 64).cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(over).alias("n_truncated"),
        F.max(F.length("props")).cast("long").alias("max_len"),
    )


def q_topk_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N repeated values — the canonical XE analysis the columnstore
    exists for (README.md:29). Top 10 users by event count with total
    tie-break so the selected set is engine-independent.

    Scale notes: partial-agg before shuffle; top-k via sort+limit lets
    Spark use a TakeOrderedAndProject (no full sort materialization).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(10)
    )


ORACLES: dict[str, str] = {
    "q_time_bucket_agg": """
        SELECT date_trunc('minute', ts) AS bucket_ts,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_value
        FROM events
        GROUP BY 1, 2
    """,
    "q_event_sequence_order": """
        SELECT event_id, ts, event_type, seq
        FROM (
            SELECT event_id, ts, event_type,
                   ROW_NUMBER() OVER (ORDER BY event_id) AS seq
            FROM events
        )
        WHERE seq <= 100
    """,
    "q_event_type_filter_project": """
        SELECT event_id, ts, user_id, value
        FROM events
        WHERE event_type = 'error'
    """,
    "q_lineage_join": """
        SELECT o.o_orderpriority,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
    """,
    "q_hash_match_join": """
        WITH ev AS (
            SELECT *, md5(CAST(user_id AS VARCHAR)) AS user_hash FROM events
        ),
        captures AS (
            SELECT DISTINCT user_hash FROM ev WHERE event_type = 'error'
        )
        SELECT ev.user_hash,
               COUNT(*) AS n_events,
               MIN(ev.event_id) AS first_event_id
        FROM ev JOIN captures USING (user_hash)
        GROUP BY 1
    """,
    "q_local_time_report": """
        SELECT event_id,
               date_trunc('minute', ts) AS e_time_of_event,
               ts AS e_time_of_event_utc,
               ts + INTERVAL 330 MINUTE AS e_time_of_event_local
        FROM events
    """,
    "q_truncation_audit": """
        SELECT event_type,
               COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN length(props) > 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated,
               CAST(MAX(length(props)) AS BIGINT) AS max_len
        FROM events
        GROUP BY 1
    """,
    "q_topk_heavy_hitters": """
        SELECT user_id, COUNT(*) AS n_events
        FROM events
        GROUP BY 1
        ORDER BY n_events DESC, user_id ASC
        LIMIT 10
    """,
}
