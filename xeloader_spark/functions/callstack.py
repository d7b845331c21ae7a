"""S15 — callstack frame decode.

Reference: GenerateDebuggerCommandFromCallStackAction
(XELoader/EventHolder.cs:341-358): split the binary callstack into
`-h`-byte frames (frame size 4 or 8, InputParameters.cs:53), reverse each
frame's bytes (little-endian → address), hex-format, prefix the `-j`
debugger command (default "ln "), join with ";".

Three implementations, most-preferred first:
- `callstack_debugcmd_expr`: pure JVM column expression (sequence +
  transform + hex-pair reversal) — whole-stage-codegen friendly, the one
  used in the ingest pipeline;
- `callstack_debugcmd_udf`: Arrow-batched pandas UDF over the pure-Python
  core — kept to demonstrate the vectorized-UDF boundary and for tests;
- `decode_callstack_py`: pure-Python core (unit-testable without Spark).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def decode_callstack_py(
    callstack: bytes | None, frame_size: int = 8, prefix: str = "ln "
) -> str | None:
    """Pure-Python reference semantics (EventHolder.cs:341-358): per frame,
    bytes reversed then hex, `prefix` prepended, frames joined by ';'.
    A trailing partial frame is ignored (the reference iterates whole
    frames only)."""
    if callstack is None:
        return None
    n_frames = len(callstack) // frame_size
    parts = []
    for i in range(n_frames):
        frame = callstack[i * frame_size : (i + 1) * frame_size]
        parts.append(prefix + frame[::-1].hex().upper())
    return ";".join(parts)


def callstack_debugcmd_expr(
    colname: str, frame_size: int = 8, prefix: str = "ln "
) -> Column:
    """JVM-side variant: hex the whole blob, slice per frame, reverse each
    frame's hex *pairs* (== byte reversal), join. No Python in the hot
    path. `colname` must be a column name (the expression references it
    textually)."""
    fs2 = frame_size * 2
    h = f"hex({colname})"
    frame_hex = f"substring({h}, i * {fs2} + 1, {fs2})"
    # split '(..)(..)…' into byte pairs, reverse, rejoin
    rev = (
        f"array_join(reverse(filter(split(regexp_replace({frame_hex}, "
        f"'(..)', '$1,'), ','), x -> x != '')), '')"
    )
    expr = f"""
        CASE
          WHEN {colname} IS NULL THEN NULL
          WHEN length({colname}) < {frame_size} THEN ''
          ELSE array_join(
            transform(sequence(0, int(length({colname}) / {frame_size}) - 1),
                      i -> concat('{prefix}', {rev})),
            ';')
        END
    """
    return F.expr(expr)


def callstack_debugcmd_udf(
    col: Column | str, frame_size: int = 8, prefix: str = "ln "
) -> Column:
    """Arrow-batched pandas-UDF variant (EventHolder.cs:341-358 semantics).
    ~10-100× faster than a row-at-a-time Python UDF; still slower than the
    expression variant — use `callstack_debugcmd_expr` in pipelines.
    (UDF is created lazily: pandas_udf needs an active SparkSession.)"""
    if frame_size not in (4, 8):
        raise ValueError("frame_size must be 4 or 8 (InputParameters.cs:53)")
    c = F.col(col) if isinstance(col, str) else col

    @pandas_udf(T.StringType())
    def decode(s: pd.Series) -> pd.Series:
        return s.map(
            lambda b: decode_callstack_py(b, frame_size, prefix)
            if b is not None
            else None
        )

    return decode(c)
