"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``xeloader_spark``; this module only adapts it to
the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from xeloader_spark import queries as _q
from xeloader_spark.session import tune_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    return _q.core.q_time_bucket_agg(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    reg = _q.all_queries()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in reg.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query. Every registered query carries an
    oracle: the driver has no rows-only mode (an omitted key records
    ``err: no_oracle``), so non-SQL-replayable results (float log,
    trained models) are expressed as in-plan contract checks whose
    booleans the oracle pins TRUE."""
    return _q.all_oracles()
