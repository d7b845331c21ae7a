"""Scalar transform library — the reference's S10-S16 transforms as
JVM-side column expressions (UDFs only where genuinely required)."""

from .timeutil import three_timestamp_projection, smalldatetime_round
from .truncation import (
    truncate_string,
    truncate_xml,
    truncate_binary,
    truncation_flag,
)
from .hashes import uint64_hex, uint64_to_bin
from .callstack import decode_callstack_py, callstack_debugcmd_expr, callstack_debugcmd_udf
from .coercion import stringify_to_flat, stringify_columns, null_module_statement
from .windows_tz import to_iana, WINDOWS_TO_IANA

__all__ = [
    "three_timestamp_projection",
    "smalldatetime_round",
    "truncate_string",
    "truncate_xml",
    "truncate_binary",
    "truncation_flag",
    "uint64_hex",
    "uint64_to_bin",
    "decode_callstack_py",
    "callstack_debugcmd_expr",
    "callstack_debugcmd_udf",
    "stringify_to_flat",
    "stringify_columns",
    "null_module_statement",
    "to_iana",
    "WINDOWS_TO_IANA",
]
