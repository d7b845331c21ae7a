"""JSON-lines event source with bounded error tolerance.

The reference's source boundary is the closed XEvent SDK; the engine keeps
that boundary narrow (SURVEY §7.3) so decoded text representations slot
in. ``xe_xml`` covers the documented XML form; this module covers the
JSON-lines form (one event object per line) that log shippers emit.

Malformed lines follow the S26 contract (EventHolder.cs:76-96 — per-row
errors counted, file aborted at the budget): Spark's PERMISSIVE mode
captures unparseable lines in a corrupt-record column instead of failing
the job, the row is flagged ``e_is_error``, and
``operators.ingest.split_by_error_budget`` consumes that flag directly.
Parsing stays JVM-side (native JSON datasource — no Python in the row
path), and schema is explicit: at 100 TB you never pay a sampling pass
for inference, and a drifting producer can't silently widen a column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

# The engine event model (FIXTURES.md `events`): explicit, nullable fields.
EVENT_JSON_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


def read_json_events(
    spark: SparkSession,
    path: str,
    schema: T.StructType = EVENT_JSON_SCHEMA,
    path_glob: str | None = None,
) -> DataFrame:
    """Read JSON-lines events with per-row error capture.

    Output = the schema's data columns plus ``e_source_file`` (lineage,
    S23), ``e_is_error`` (1 for rows that failed to parse or lack the
    mandatory ``event_id``), and ``e_corrupt_record`` (the raw text of a
    failed line, for diagnostics) — ready for ``split_by_error_budget``.

    The error flag is derived from the mandatory id field, not the corrupt
    column: Spark disallows plans whose pruned scan reads ONLY the
    corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
    COLUMN) unless the frame is cached — and caching is not an acceptable
    default at scale. A parse failure nulls every data field, so a null
    ``event_id`` captures it; an id-less-but-valid row is an error by the
    same contract (it cannot be sequenced or deduplicated downstream).
    """
    reader = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    df = reader.json(path)
    return (
        df.withColumn("e_source_file", F.input_file_name())
        .withColumn("e_is_error", F.col("event_id").isNull().cast("long"))
        .withColumnRenamed(CORRUPT_COL, "e_corrupt_record")
    )
