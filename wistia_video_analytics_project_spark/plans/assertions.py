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


def plan_report(df: DataFrame, execute: bool = True) -> dict:
    """Programmatic plan audit — the numbers a perf review reads off
    ``explain()`` by eye, as a dict a CI gate or notebook can assert on:

    - ``n_shuffles``: hash/range Exchange count (each one is a full
      network pass over its input at cluster scale);
    - ``n_broadcast_joins`` / ``n_sortmerge_joins`` /
      ``n_nestedloop_joins``: join strategy mix (a nested loop on big
      inputs is almost always a missing equi-condition);
    - ``n_scans`` and per-scan read columns + pushed-filter presence
      (a scan reading all columns for a narrow projection means pruning
      broke);
    - ``whole_stage_codegen``: spans of JVM-fused execution;
    - ``has_take_ordered``: top-k planned without a global sort.

    ``execute=True`` (default) collects THIS frame once (results
    discarded) so ITS AdaptiveSparkPlan finalizes and codegen spans
    appear — ``count()`` would build a different query execution and
    leave the audited plan unfinalized. Audit aggregated/sampled frames,
    not raw facts; pass ``execute=False`` to read the pre-execution
    adaptive plan for free (codegen count reads 0 there).
    """
    if execute:
        df.collect()
    plan = executed_plan(df)
    scans = []
    for line in _scans(plan):
        cols_m = re.search(r"FileScan parquet \[([^\]]*)\]", line)
        push_m = re.search(r"PushedFilters: \[([^\]]*)\]", line)
        path_m = re.search(r"Location: \w+\(\d+ paths?\)\[([^,\]]+)", line)
        scans.append(
            {
                "path": path_m.group(1) if path_m else None,
                "columns": sorted(
                    c.split("#")[0].strip()
                    for c in (cols_m.group(1).split(",") if cols_m else [])
                    if c.strip()
                ),
                "pushed_filters": bool(push_m and push_m.group(1).strip()),
            }
        )
    n_single = len(re.findall(r"\bExchange SinglePartition", plan))
    return {
        "n_shuffles": len(
            re.findall(r"\bExchange (?:hash|range)partitioning", plan)
        )
        + n_single,
        # the single-task collapse (global Window.orderBy etc.) called
        # out separately — the worst shuffle shape at cluster scale
        "n_single_partition_exchanges": n_single,
        "n_broadcast_joins": plan.count("BroadcastHashJoin"),
        "n_sortmerge_joins": plan.count("SortMergeJoin"),
        "n_nestedloop_joins": plan.count("BroadcastNestedLoopJoin")
        + plan.count("CartesianProduct"),
        "n_scans": len(scans),
        "scans": scans,
        # executedPlan text marks codegen stages as "*(n) Operator"
        "whole_stage_codegen": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "has_take_ordered": "TakeOrderedAndProject" in plan,
    }
