"""Plan inspection utilities (SURVEY §4): assert that Catalyst produced
the physical plan we designed for — filters pushed to the scan, columns
pruned, small sides broadcast, codegen spans wide."""

from .truncate import round_truncate
from .inspect import (
    physical_plan,
    assert_pushed_filter,
    assert_pruned_schema,
    assert_broadcast_join,
    assert_no_cartesian,
    assert_max_shuffles,
    count_exchanges,
)

__all__ = [
    "round_truncate",
    "physical_plan",
    "assert_pushed_filter",
    "assert_pruned_schema",
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_max_shuffles",
    "count_exchanges",
]
