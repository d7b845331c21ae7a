"""S14 — query-hash byte-order transform.

Reference: `a_query_hash`/`a_query_plan_hash` are UInt64s; a parallel
`*_bin` column holds the value's bytes reversed to big-endian "to be able
to match with DMV captures which are in binary format"
(XELoader/EventHolder.cs:216-225; schema at EventMetadata.cs:56-62).

`hex()` of a long already renders big-endian two's-complement, so the
big-endian byte image is just `unhex(lpad(hex(x),16,'0'))` — pure JVM
expressions, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def uint64_hex(col: Column | str) -> Column:
    """16-char uppercase big-endian hex of an (unsigned-interpreted) long."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lpad(F.hex(c), 16, "0")


def uint64_to_bin(col: Column | str) -> Column:
    """8-byte big-endian binary image — the `*_bin` dual column."""
    return F.unhex(uint64_hex(col))
