"""Fixed-width flat-file source/sink — the classic bulk-loader exchange
format (mainframe extracts, COBOL copybook layouts, `bcp -c` style
feeds). The reference's loader family reads positional event payloads
(XELoader/FileProcessor.cs drives a fixed event record layout through the
SDK); this module is the standalone-file counterpart: a declared
``colspec`` plays the copybook.

Spark-first: parsing is `spark.read.text` + substring/trim/cast
projections — pure whole-stage codegen, no UDF, no shuffle; rendering is
lpad/rpad + concat. Both directions are driven by the same colspec, so a
render→parse round trip is an in-plan identity check (`q_fixedwidth_roundtrip`).

Conventions (the common mainframe ones):
- strings LEFT-aligned, space padded; numerics RIGHT-aligned, space padded
- doubles travel as fixed-scale decimals (`decimal(p,s)` in the spec) —
  rendering a raw double would hit locale/scientific-notation hazards
- timestamps travel as ``yyyy-MM-dd HH:mm:ss`` (19 chars)
- a value wider than its field raises at render time (CASE + raise_error)
  rather than silently truncating a key
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


@dataclass(frozen=True)
class FixedWidthField:
    name: str
    width: int
    dtype: str  # spark type name: bigint, string, timestamp, decimal(p,s)

    @property
    def numeric(self) -> bool:
        return self.dtype != "string" and not self.dtype.startswith(
            "timestamp"
        )


def _render_col(f: FixedWidthField):
    c = F.col(f.name)
    if f.dtype.startswith("timestamp"):
        s = F.date_format(c, _TS_FMT)
    elif f.dtype == "string":
        s = c
    else:
        s = c.cast(f.dtype).cast("string")
    s = F.coalesce(s, F.lit(""))
    padded = (
        F.lpad(s, f.width, " ") if f.numeric else F.rpad(s, f.width, " ")
    )
    return F.when(
        F.length(s) > f.width,
        F.raise_error(
            F.concat(
                F.lit(f"fixed-width overflow in {f.name}: "), s
            )
        ),
    ).otherwise(padded)


def render_fixed_width(
    df: DataFrame, spec: list[FixedWidthField]
) -> DataFrame:
    """Render rows to one `line` column of Σwidth characters."""
    return df.select(
        F.concat(*[_render_col(f) for f in spec]).alias("line")
    )


def parse_fixed_width(
    lines: DataFrame, spec: list[FixedWidthField], line_col: str = "line"
) -> DataFrame:
    """Parse fixed-width lines back to typed columns (substring → trim →
    cast; empty fields become null). 1-indexed substring offsets are
    computed from the spec — the single source of truth for the layout."""
    cols = []
    start = 1
    for f in spec:
        raw = F.trim(F.substring(F.col(line_col), start, f.width))
        val = F.when(raw == "", F.lit(None))
        if f.dtype.startswith("timestamp"):
            parsed = F.to_timestamp(raw, _TS_FMT)
        else:
            parsed = raw.cast(f.dtype)
        cols.append(val.otherwise(parsed).cast(f.dtype).alias(f.name))
        start += f.width
    return lines.select(*cols)


def write_fixed_width(
    df: DataFrame, path: str, spec: list[FixedWidthField], mode: str = "overwrite"
) -> None:
    render_fixed_width(df, spec).write.mode(mode).text(path)


def read_fixed_width(
    spark: SparkSession, path: str, spec: list[FixedWidthField]
) -> DataFrame:
    return parse_fixed_width(
        spark.read.text(path), spec, line_col="value"
    )


# copybook for the orders table (doubles as the round-trip fixture):
# o_totalprice travels as decimal(12,2) — TPC-H prices are exact cents,
# so double → decimal(12,2) → double is lossless
ORDERS_SPEC = [
    FixedWidthField("o_orderkey", 12, "bigint"),
    FixedWidthField("o_custkey", 12, "bigint"),
    FixedWidthField("o_orderstatus", 1, "string"),
    FixedWidthField("o_totalprice", 15, "decimal(12,2)"),
    FixedWidthField("o_orderdate", 19, "timestamp"),
    FixedWidthField("o_orderpriority", 16, "string"),
]
