"""Helpers over `df._jdf...executedPlan` / explain text. These are the
`.explain("formatted")` discipline as assertions, so plan regressions
(lost pushdown, broadcast flipping to shuffle, accidental cartesian)
fail tests instead of silently costing 100× at scale."""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    return df.sparkSession._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """The filter must reach the parquet scan (PushedFilters: [...])."""
    plan = physical_plan(df)
    scans = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert scans, f"no PushedFilters line in plan:\n{plan}"
    assert any(fragment in l for l in scans), (
        f"filter {fragment!r} not pushed; scan lines: {scans}"
    )


def assert_pruned_schema(df: DataFrame, max_columns: int) -> None:
    """The scan must read at most `max_columns` columns (ReadSchema)."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            schema_part = line.split("ReadSchema:", 1)[1]
            ncols = schema_part.count(":")
            assert ncols <= max_columns, (
                f"scan reads {ncols} columns (> {max_columns}): {line.strip()}"
            )
            return
    raise AssertionError(f"no ReadSchema in plan:\n{plan}")


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"no broadcast join in plan:\n{plan}"
    )


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan
    (broadcast exchanges excluded — those move the SMALL side). Counts
    the formatted plan's detail headers `(n) Exchange`, which appear
    exactly once per operator (tree lines would double-count)."""
    import re

    plan = physical_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if re.match(r"^\(\d+\) Exchange", line.strip())
    )


def assert_max_shuffles(df: DataFrame, n: int) -> None:
    """The plan must shuffle at most `n` times — the budget that decides
    whether an operator survives a 100× scale-up."""
    got = count_exchanges(df)
    assert got <= n, (
        f"{got} shuffle Exchanges (budget {n}):\n{physical_plan(df)}"
    )
