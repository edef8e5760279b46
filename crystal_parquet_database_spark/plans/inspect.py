"""Physical-plan inspection helpers — the feedback loop for scale tuning.

These parse ``explain("formatted")`` output to assert the properties that
matter at 100 TB: filters actually pushed to the Parquet scan, projections
pruned, small joins broadcast, and expressions inside whole-stage codegen.
Used by tests/test_plans.py and handy interactively while iterating on an
operator."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _explain(df: DataFrame, mode: str) -> str:
    """ONE touchpoint for the private PythonSQLUtils.explainString API —
    formatted_plan and codegen_spans both route through it, so a pyspark
    internals change is a one-line fix."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def formatted_plan(df: DataFrame) -> str:
    return _explain(df, "formatted")


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
        # a STACK of opener types, not a flat depth counter: filter VALUES
        # are printed unquoted, so a stray ')' inside a string value used
        # to decrement the shared depth to 0 and silently drop every later
        # filter — closers now only pop their MATCHING opener, and a
        # mismatched ')' in a value is ignored. (A stray top-level ']' in a
        # value is indistinguishable from the real list closer and still
        # ends the list early — unavoidable without quoting.)
        stack = ["["]
        start = i
        while i < len(plan) and stack:
            ch = plan[i]
            if ch in "[(":
                stack.append(ch)
            elif ch == "]":
                if stack[-1] == "[":
                    stack.pop()
                    if not stack:
                        break
            elif ch == ")":
                if stack[-1] == "(":
                    stack.pop()
            elif ch == "," and len(stack) == 1:
                if plan[start:i].strip():
                    out.append(plan[start:i].strip())
                start = i + 1
            i += 1
        if plan[start:i].strip():
            out.append(plan[start:i].strip())
    return out


def scan_read_schemas(df: DataFrame, plan: str | None = None) -> list[str]:
    """ReadSchema of each parquet scan (column-pruning check).

    Raises on a TRUNCATED schema string: Spark clips scan metadata at
    spark.sql.maxMetadataStringLength (default 100 chars), and a clipped
    schema makes 'unwanted_col not in schema' assertions pass because the
    column was CUT OFF, not pruned — a silent false-pass hiding a real
    pruning regression. Raise the conf for wide tables."""
    plan = formatted_plan(df) if plan is None else plan
    schemas = [m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", plan)]
    for s in schemas:
        if "..." in s or (s.startswith("struct<") and not s.endswith(">")):
            raise ValueError(
                f"ReadSchema is truncated ({s!r}); raise "
                "spark.sql.maxMetadataStringLength before asserting on it — "
                "a clipped schema false-passes column-pruning checks"
            )
    return schemas


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
        s = _explain(d2, "codegen")
    finally:
        if was_set:
            spark.conf.set(key, prev)
        else:
            spark.conf.unset(key)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", s)
    return int(m.group(1)) if m else 0
