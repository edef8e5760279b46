"""Physical-plan inspection helpers — the feedback loop for scale tuning.

These parse ``explain("formatted")`` output to assert the properties that
matter at 100 TB: filters actually pushed to the Parquet scan, projections
pruned, small joins broadcast, and expressions inside whole-stage codegen.
Used by tests/test_plans.py and handy interactively while iterating on an
operator."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each parquet scan (column-pruning check)."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", plan)]


def _numbered_nodes(df: DataFrame) -> list[tuple[int, str]]:
    """Unique (node_id, operator) pairs — explain('formatted') prints each
    node twice (tree + detail block), so dedupe by id."""
    plan = formatted_plan(df)
    seen: dict[int, str] = {}
    for m in re.finditer(r"\((\d+)\) (\w+)", plan):
        seen.setdefault(int(m.group(1)), m.group(2))
    return sorted(seen.items())


def join_strategies(df: DataFrame) -> list[str]:
    """Join operator names in the physical plan (broadcast check)."""
    kinds = {
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    }
    return [op for _i, op in _numbered_nodes(df) if op in kinds]


def num_shuffles(df: DataFrame) -> int:
    """Exchange count in the physical plan (shuffle budget check)."""
    return sum(1 for _i, op in _numbered_nodes(df) if op == "Exchange")


def codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider is better for row pipelines)."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", formatted_plan(df))))
