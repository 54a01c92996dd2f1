"""Physical-plan audits — make the 100 TB posture checkable, not aspirational.

The reference has no planner (SURVEY.md §4); on Spark the plan IS the
performance contract. These helpers read ``df._jdf...executedPlan`` /
``explain`` output and assert the properties a plan must keep to survive
a 1000-executor, 100 TB run:

- small dimension tables join by **broadcast**, not shuffle;
- filters/column pruning reach the parquet scan (**PushedFilters** /
  narrow **ReadSchema**);
- no accidental **CartesianProduct** / **BroadcastNestedLoopJoin**;
- hash aggregates keep a map-side **partial** phase (no raw
  single-phase shuffle of every row);
- hot expressions stay inside **WholeStageCodegen** spans.

Tests call these against the headline queries so a regression that
flips a broadcast join to a sort-merge shuffle (or un-pushes a filter)
fails CI, not the cluster bill.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan (what ``df.explain('formatted')`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "simple"
    )


def count_occurrences(df: DataFrame, pattern: str) -> int:
    return len(re.findall(pattern, physical_plan(df)))


def uses_broadcast_join(df: DataFrame) -> bool:
    """At least one join executes as broadcast-hash (dim side shipped,
    no shuffle of the fact side)."""
    return count_occurrences(df, r"BroadcastHashJoin") > 0


def has_shuffle_join(df: DataFrame) -> bool:
    return count_occurrences(df, r"SortMergeJoin|ShuffledHashJoin") > 0


def has_cartesian(df: DataFrame) -> bool:
    """True if the plan degenerates into an all-pairs join — the #1 way a
    query that passes at sf0.01 dies at sf100."""
    return count_occurrences(df, r"CartesianProduct|BroadcastNestedLoopJoin") > 0


def pushed_filters(df: DataFrame) -> list[str]:
    """The filter expressions that reached the parquet scan."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        expr = m.group(1).strip()
        if expr:
            out.extend(s.strip() for s in expr.split(","))
    return out


def scan_read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists each parquet scan actually reads (column pruning check:
    a scan reading every column for a 2-column projection is a bug)."""
    plan = physical_plan(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def max_scan_width(df: DataFrame) -> int:
    return max((len(s) for s in scan_read_schemas(df)), default=0)


def has_partial_aggregation(df: DataFrame) -> bool:
    """An aggregate operator appears in both partial (map-side) and final
    mode — i.e. combining happens before the shuffle, so shuffle volume
    is |groups|, not |rows|. Any aggregate flavor counts: HashAggregate,
    ObjectHashAggregate, or SortAggregate (Catalyst falls back to the
    sort-based operator when an agg function isn't hash-capable, e.g.
    ``first`` on the Expand multi-distinct path — the map-side combine
    still happens)."""
    plan = physical_plan(df)
    return bool(re.search(r"HashAggregate|SortAggregate", plan)) and bool(
        re.search(r"partial_|Partial", plan)
    )


def codegen_span_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (fewer, wider spans = more of the
    query compiled into single JVM loops). Formatted explain tags operators
    with ``[codegen id : N]``; simple mode prints ``WholeStageCodegen (N)``.

    Under AQE the pre-execution plan carries no codegen annotation —
    execute the SAME DataFrame first (``df.collect()``) so the adaptive
    plan is final, then this returns the real span count."""
    plan = physical_plan(df)
    ids = set(re.findall(r"codegen id : (\d+)", plan))
    ids.update(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(ids)


def scan_count(df: DataFrame) -> int:
    """Number of source scans in the plan. Formatted mode prints each
    node twice (tree line + detail header) — count only the numbered
    detail headers, falling back to the simple plan's inline form."""
    plan = physical_plan(df)
    formatted = len(re.findall(r"\(\d+\) Scan ", plan))
    if formatted:
        return formatted
    return len(re.findall(r"Scan ", simple_plan(df)))


def executed_scan_count(df: DataFrame) -> int:
    """Source scans that actually RUN. A DAG whose branches share a
    subtree prints one scan per branch in the initial plan, but AQE's
    exchange reuse collapses them at runtime into ReusedQueryStage
    references — so count tree-level scans in the Final Plan section
    only, after the caller has executed the DataFrame (``df.collect()``).
    Falls back to the whole plan when AQE hasn't finalized one."""
    plan = physical_plan(df)
    final = plan.split("== Initial Plan ==")[0]
    return len(re.findall(r"Scan (?:parquet|csv|json|orc|text|ExistingRDD)", final))


def executed_shuffle_count(df: DataFrame) -> int:
    """Shuffle Exchanges that actually RUN, post-AQE: tree-level Exchange
    nodes in the Final Plan section, excluding BroadcastExchange (not a
    shuffle of the big side) and ReusedExchange / ReusedQueryStage
    (computed once elsewhere). Call after ``df.collect()``; before the
    plan finalizes this degrades to counting the whole initial plan."""
    plan = physical_plan(df)
    final = plan.split("== Initial Plan ==")[0]
    return len(re.findall(r"(?:^|[:+\-] )Exchange \(\d+\)", final, re.MULTILINE))


def shuffle_count(df: DataFrame) -> int:
    """Shuffle Exchange operators in the plan (BroadcastExchange excluded
    — shipping a small table is not a shuffle of the big one). Every one
    is a full network rewrite of its input at scale; audits pin the
    expected count so an accidental extra shuffle fails loudly.

    Matches both explain formats: formatted mode names the operator
    ``(N) Exchange``; simple mode inlines ``Exchange hashpartitioning...``.
    """
    plan = physical_plan(df)
    formatted = len(re.findall(r"\(\d+\) Exchange\b", plan))
    if formatted:
        return formatted
    return len(
        re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan)
    )


def audit(df: DataFrame) -> dict:
    """One-call plan summary for tests and notebooks."""
    return {
        "broadcast_joins": count_occurrences(df, r"BroadcastHashJoin"),
        "shuffle_joins": count_occurrences(df, r"SortMergeJoin|ShuffledHashJoin"),
        "cartesian": has_cartesian(df),
        "shuffles": shuffle_count(df),
        "pushed_filters": pushed_filters(df),
        "scan_widths": [len(s) for s in scan_read_schemas(df)],
        "partial_agg": has_partial_aggregation(df),
        "codegen_spans": codegen_span_count(df),
    }
