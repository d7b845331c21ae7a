"""Query registry: every implemented operator exposed as a named query.

Each submodule defines ``q_*`` functions with signature
``(spark: SparkSession, sf_dir: str) -> DataFrame`` plus an ``ORACLES``
dict mapping the same names to DuckDB-runnable ANSI SQL. Names without an
oracle entry are non-SQL-expressible (UDF-backed) and get rows-only checks.

Cross-engine determinism rules used throughout (so the driver's
order-insensitive value-hash matches):
- SUM/AVG over floating columns go through an exact decimal accumulator,
  then cast to double at the end: ``CAST(SUM(CAST(x AS DECIMAL(25,6))) AS
  DOUBLE)``. Decimal addition is exact and order-independent; the final
  decimal→double cast is IEEE round-to-nearest in both engines.
- Top-k queries always carry a total tie-breaking ORDER BY so the selected
  row *set* is engine-independent.
- Timestamps are UTC (session tz pinned); local time is a fixed-offset
  projection in oracle-checked queries (IANA zones supported in the API,
  but zone-db differences across engines make them unsuitable for oracles).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import core


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        for name in dir(mod):
            if name.startswith("q_"):
                registry[name] = getattr(mod, name)
    return registry


def all_oracles() -> dict[str, str]:
    oracles: dict[str, str] = {}
    for mod in _modules():
        oracles.update(getattr(mod, "ORACLES", {}))
    return oracles


def _modules():
    mods = [core]
    for modname in (
        "relational",
        "ingest",
        "dedup",
        "similarity",
        "text",
        "scalars",
        "temporal",
        "sampling",
        "pipeline",
    ):
        try:
            mods.append(__import__(f"{__name__}.{modname}", fromlist=[modname]))
        except ImportError:
            pass
    return mods
