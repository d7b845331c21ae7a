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


#: Operators that bound the row count of a Window's input, making a
#: single-partition window frame acceptable (the frame is k rows, not the
#: corpus). WindowGroupLimit is Spark's rank-filter pushdown: it prunes
#: each input partition to the top-k BEFORE the single-partition exchange.
_LIMITING_OPS = (
    "TakeOrderedAndProject",
    "GlobalLimit",
    "CollectLimit",
    "LocalLimit",
    "WindowGroupLimit",
)


def _top_level_bracket_groups(s: str) -> list[str]:
    """Split `Arguments: [a, b], [c], [d]` into its top-level [...] groups
    (nested brackets/parens inside windowspecdefinition don't count)."""
    groups: list[str] = []
    depth = 0
    start = None
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start is not None:
                groups.append(s[start : i + 1])
                start = None
    return groups


def find_global_windows(df: DataFrame) -> list[str]:
    """Return descriptions of Window operators whose partition spec is
    EMPTY and whose input is NOT bounded by a limit operator — i.e. the
    "No Partition Defined for Window operation" shape that funnels the
    entire input through one task. Correct on small data, a scale-killer
    at 100×.

    Detection: in `.explain("formatted")`, a Window detail block's
    `Arguments:` line prints [exprs], [partitionSpec], [orderSpec] with
    EMPTY specs omitted — so 3 groups is always partitioned, 1 group is
    always unpartitioned, and a 2-group window is unpartitioned exactly
    when its second group is an ORDER spec (sort directions like
    `x ASC NULLS FIRST`) rather than a plain partition column list.
    The input is considered bounded when the Window node's subtree (from
    the plan tree section) contains a limiting operator
    (TakeOrderedAndProject / GlobalLimit / CollectLimit /
    WindowGroupLimit rank pushdown)."""
    import re

    plan = physical_plan(df)
    # --- tree section: (indent, opname, node_id) until the first blank ---
    lines = plan.splitlines()
    tree: list[tuple[int, str, int]] = []
    in_tree = False
    for line in lines:
        if line.startswith("== Physical Plan"):
            in_tree = True
            continue
        if in_tree:
            if not line.strip():
                break
            m = re.search(r"([A-Za-z][\w.]*)\s*\((\d+)\)\s*$", line)
            if m:
                tree.append((line.index(m.group(1)), m.group(1), int(m.group(2))))
    # --- detail blocks: node_id -> Arguments line ---
    args: dict[int, str] = {}
    current: int | None = None
    for line in lines:
        m = re.match(r"^\((\d+)\)\s", line.strip())
        if m and not line.startswith(" "):
            current = int(m.group(1))
        elif current is not None and line.startswith("Arguments:"):
            args[current] = line[len("Arguments:") :]
    offenders: list[str] = []
    for idx, (indent, name, node_id) in enumerate(tree):
        if name != "Window":
            continue
        groups = _top_level_bracket_groups(args.get(node_id, ""))
        if len(groups) >= 3:
            continue  # [exprs], [partition], [order]
        if len(groups) == 2 and not re.search(
            r"\s(ASC|DESC)\b", groups[-1]
        ):
            continue  # [exprs], [partition] — partitioned, no order spec
        bounded = False
        for indent2, name2, _ in tree[idx + 1 :]:
            if indent2 <= indent:
                break
            if name2 in _LIMITING_OPS:
                bounded = True
                break
        if not bounded:
            offenders.append(f"Window ({node_id}): Arguments:{args.get(node_id, '?')}")
    return offenders


def assert_no_global_window(df: DataFrame) -> None:
    """FAIL if the plan contains any Window with an empty partition spec
    over a non-limited input (single-task at scale). Applied suite-wide
    via testing.check_query."""
    offenders = find_global_windows(df)
    assert not offenders, (
        "single-partition global Window over unbounded input:\n"
        + "\n".join(offenders)
        + "\n\nfull plan:\n"
        + physical_plan(df)
    )


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
