"""Plan-inspection helpers: the engine's "is this the plan I'd want at
100 TB" checks, used by tests and the bench harness.

These read the *executed* plan (post-AQE) so broadcast decisions and
codegen fusion are what actually ran, not what was proposed."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def plan_summary(df: DataFrame) -> dict:
    p = executed_plan(df)
    return {
        "broadcast_joins": p.count("BroadcastHashJoin"),
        "sort_merge_joins": p.count("SortMergeJoin"),
        "shuffles": p.count("Exchange hashpartitioning"),
        "wholestage_codegen_spans": len(set(re.findall(r"\*\((\d+)\)", p))),
        "python_stages": p.count("Python"),
        "pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]", p)),
    }


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of EXPLICIT broadcast hints in the optimized logical plan.

    Distinct from plan_summary's BroadcastHashJoin count: AQE choosing a
    broadcast at runtime because a side happens to be small is fine and
    size-safe; an F.broadcast() hint FORCES the broadcast at any scale.
    The 100 TB gate is therefore: no hint on any unbounded-cardinality
    side (dims are allowed — assert a specific count, not zero)."""
    p = df._jdf.queryExecution().optimizedPlan().toString()
    return p.count("strategy=broadcast")


def assert_pushdown(df: DataFrame, column: str) -> bool:
    """True iff a filter on ``column`` reached the parquet scan."""
    p = executed_plan(df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", p)
    return bool(m and column in m.group(1))


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the source (column-pruning check).
    Parsed from the FileScan output list — the ReadSchema field is
    length-truncated in plan text."""
    p = executed_plan(df)
    m = re.search(r"FileScan \w+ \[([^\]]*)\]", p)
    if not m:
        return []
    return [c.strip().split("#")[0] for c in m.group(1).split(",") if c.strip()]
