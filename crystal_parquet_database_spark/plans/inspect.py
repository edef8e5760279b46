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


def pushed_filters(df: DataFrame, plan: str | None = None) -> list[str]:
    """All PushedFilters entries across scans in the plan. Pass a
    pre-computed ``formatted_plan(df)`` string via ``plan`` when asserting
    several properties of one frame — each helper otherwise re-runs the
    full JVM analysis/optimization/planning pass per call.

    Filters are split on TOP-LEVEL commas with bracket/paren balancing —
    an entry like ``In(p_size, [1,10,5])`` contains both inner brackets
    (which would stop a naive ``[^\\]]*`` capture early, silently dropping
    every filter after it) and commas (which a plain split would shred
    into fragments)."""
    plan = formatted_plan(df) if plan is None else plan
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[", plan):
        i = m.end()
        depth = 1  # inside the outer [
        start = i
        while i < len(plan) and depth:
            ch = plan[i]
            if ch in "[(":
                depth += 1
            elif ch in "])":
                depth -= 1
                if depth == 0:
                    break
            elif ch == "," and depth == 1:
                if plan[start:i].strip():
                    out.append(plan[start:i].strip())
                start = i + 1
            i += 1
        if plan[start:i].strip():
            out.append(plan[start:i].strip())
    return out


def scan_read_schemas(df: DataFrame, plan: str | None = None) -> list[str]:
    """ReadSchema of each parquet scan (column-pruning check)."""
    plan = formatted_plan(df) if plan is None else plan
    return [m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", plan)]


def _numbered_nodes(df: DataFrame, plan: str | None = None) -> list[tuple[int, str]]:
    """Unique (node_id, operator) pairs — explain('formatted') prints each
    node twice (tree + detail block), so dedupe by id."""
    plan = formatted_plan(df) if plan is None else plan
    seen: dict[int, str] = {}
    for m in re.finditer(r"\((\d+)\) (\w+)", plan):
        seen.setdefault(int(m.group(1)), m.group(2))
    return sorted(seen.items())


def join_strategies(df: DataFrame, plan: str | None = None) -> list[str]:
    """Join operator names in the physical plan (broadcast check)."""
    kinds = {
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    }
    return [op for _i, op in _numbered_nodes(df, plan) if op in kinds]


def num_shuffles(df: DataFrame, plan: str | None = None) -> int:
    """Exchange count in the physical plan (shuffle budget check)."""
    return sum(1 for _i, op in _numbered_nodes(df, plan) if op == "Exchange")


def codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees (wider is better for row
    pipelines). Two fixes over the original formatted-mode scan, which
    ALWAYS returned 0: (a) formatted mode never prints 'WholeStageCodegen
    (N)' — the codegen explain mode does; (b) under AQE the pre-execution
    plan is an AdaptiveSparkPlan shell that also reports 0 subtrees, so the
    plan is re-derived with AQE off (a folded-away no-op filter forces a
    fresh planning pass under the temporary conf).

    NOT thread-safe: the AQE toggle is session-wide, so queries planned in
    other threads during the window run with AQE off. This is an
    inspection-only utility for tests and plan audits — never call it from
    concurrent production paths.
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    key = "spark.sql.adaptive.enabled"
    # restore faithfully: an originally-UNSET conf is unset again afterwards
    # (conf.get would report the runtime default, so probe the explicit
    # settings map instead of pinning an explicit 'true' that wasn't there)
    was_set = bool(spark._jsparkSession.sessionState().conf().contains(key))
    prev = spark.conf.get(key) if was_set else None
    try:
        spark.conf.set(key, "false")
        d2 = df.where(F.lit(True))
        s = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            d2._jdf.queryExecution(), "codegen"
        )
    finally:
        if was_set:
            spark.conf.set(key, prev)
        else:
            spark.conf.unset(key)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", s)
    return int(m.group(1)) if m else 0
