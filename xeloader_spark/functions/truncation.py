"""S11-S13 — width-bounding truncation transforms.

Reference: ExtractStringFromStringAfterTruncation / …XML… / …Binary…
(XELoader/EventHolder.cs:273-339), applied when the storage layout cannot
hold LOBs; widths default 1024/4000/1024 (InputParameters.cs:45-48); each
truncation increments a global counter (TrackStatus.cs:28-30).

NB: the reference's binary truncation has a bug — it copies
`m_StringToStringTruncation` bytes instead of the binary width
(EventHolder.cs:327). Per SURVEY §5 we deliberately do NOT replicate it;
`truncate_binary` uses the binary width. Pinned by a unit test.

Truncation counting is done with `observe()` metrics (Spark's accumulator
surface that is safe under task retries), see operators.ingest.RunStats.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def truncate_string(col: Column | str, max_len: int = 1024) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, max_len)


def truncate_xml(col: Column | str, max_len: int = 4000) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, max_len)


def truncate_binary(col: Column | str, max_bytes: int = 1024) -> Column:
    # substring works on BinaryType in Spark (returns binary) — the
    # correct width, not the reference's :327 bug.
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, max_bytes)


def truncation_flag(col: Column | str, max_len: int) -> Column:
    """1 when the value would be truncated — feeds the S27 counters."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(c) > max_len).cast("long")
