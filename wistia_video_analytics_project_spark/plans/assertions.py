"""Executed-plan assertions (see package docstring)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical (executed) plan as text — what `.explain()` prints."""
    return df._jdf.queryExecution().executedPlan().toString()


def _scans(plan: str) -> list[str]:
    return [l for l in plan.splitlines() if "FileScan" in l or "Scan parquet" in l]


def assert_pushed_filter(df: DataFrame, column: str) -> None:
    """The scan (not a post-scan Filter) must evaluate a predicate on
    ``column`` — DataFilters/PushedFilters mention it."""
    plan = executed_plan(df)
    for line in _scans(plan):
        m = re.search(r"(DataFilters|PushedFilters): \[([^\]]*)\]", line)
        if m and column in m.group(2):
            return
    raise AssertionError(f"no scan pushes a filter on {column!r}:\n{plan}")


def assert_read_columns_at_most(df: DataFrame, table_path_part: str, cols: set[str]) -> None:
    """Column pruning: the scan of the given table reads no columns
    beyond ``cols``."""
    plan = executed_plan(df)
    for line in _scans(plan):
        if table_path_part not in line:
            continue
        m = re.search(r"FileScan parquet \[([^\]]*)\]", line)
        if m:
            read = {c.split("#")[0].strip() for c in m.group(1).split(",") if c.strip()}
            extra = read - cols
            if extra:
                raise AssertionError(
                    f"scan of {table_path_part} reads extra columns {extra}:\n{line}"
                )
            return
    raise AssertionError(f"no parquet scan found for {table_path_part}:\n{plan}")


def assert_broadcast_join(df: DataFrame) -> None:
    plan = executed_plan(df)
    if "BroadcastHashJoin" not in plan:
        raise AssertionError(f"expected a BroadcastHashJoin:\n{plan}")


def assert_no_exchange(df: DataFrame) -> None:
    """No shuffle anywhere in the plan (bucketed/broadcast-only paths)."""
    plan = executed_plan(df)
    if re.search(r"\bExchange (hash|range)partitioning", plan):
        raise AssertionError(f"unexpected shuffle Exchange:\n{plan}")


def assert_take_ordered(df: DataFrame) -> None:
    """Top-k must plan as TakeOrderedAndProject, never a global Sort."""
    plan = executed_plan(df)
    if "TakeOrderedAndProject" not in plan:
        raise AssertionError(f"expected TakeOrderedAndProject:\n{plan}")
