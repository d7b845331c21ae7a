"""Mirror of the driver's t2 gate: every queries() entry with an oracle
must match DuckDB exactly at sf0.001 (fast) — the driver runs sf0.01.

Run the slower sf0.01 sweep with: pytest -q -m sf001 --override... (see
test_oracle_parity_sf01 marker)."""

from __future__ import annotations

import pytest

import __spark_entry__ as spark_entry
from xeloader_spark.testing import check_query

QUERIES = spark_entry.queries()
ORACLES = spark_entry.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    res = check_query(spark, sf_dir, name, QUERIES[name], ORACLES.get(name))
    assert res.ok, f"{name}: {res.detail}"
    assert res.spark_rows >= 0


def test_entry_smoke(spark):
    df = spark_entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) >= 3
