"""Physical-plan audit: make "is this the plan you'd want?" executable.

The reference delegates all physical planning to client engines (SURVEY §4 —
its metadata *enables* pushdown/pruning; Catalyst performs them). This
module inspects the plans Catalyst actually produces so tests and CI can
assert the properties that matter at the 100 TB design point:

- filters reach the parquet scan (PushedFilters non-empty);
- scans read only needed columns (ReadSchema width);
- dimension joins broadcast instead of shuffling;
- hot paths stay inside WholeStageCodegen (no row-at-a-time Python UDFs);
- shuffle (Exchange) count is what the query shape requires, no more.

A plan that silently regresses any of these still returns correct rows at
test scale — and falls over at 1000 executors. Auditing the plan text is
the only local signal for that class of bug, so it is tested like behavior.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """Capture `df.explain(mode)` output as a string."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def audit(df: DataFrame, execute: bool = False) -> dict:
    """Structured summary of the physical plan's scale-relevant properties.

    With AQE, runtime decisions (broadcast conversion, codegen spans, final
    exchange count) only appear in the plan AFTER this exact DataFrame has
    executed — pass execute=True to collect() first and audit the
    `isFinalPlan=true` plan (`df.count()` would NOT do: it builds a
    different plan and leaves this one unfinalized)."""
    if execute:
        df.collect()
    text = plan_text(df, "formatted")
    simple = plan_text(df, "simple")
    scans = re.findall(r"Scan parquet[^\n]*", text)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", text)
    return {
        "scans": len(scans),
        "pushed_filters": [p.strip() for p in pushed if p.strip()],
        "read_schema_widths": [
            len([c for c in s.split(",") if ":" in c]) for s in read_schemas
        ],
        "exchanges": simple.count("Exchange hashpartitioning")
        + simple.count("Exchange rangepartitioning"),
        "broadcast_joins": simple.count("BroadcastHashJoin")
        + simple.count("BroadcastNestedLoopJoin"),
        "sortmerge_joins": simple.count("SortMergeJoin"),
        # Non-equi join shapes: fine on labeled tiny/probe inputs, fatal on
        # a fact table — the sweep test whitelists by name.
        "nested_loop_joins": simple.count("BroadcastNestedLoopJoin"),
        "cartesian_products": simple.count("CartesianProduct"),
        "codegen_stages": len(
            set(re.findall(r"\[codegen id : (\d+)\]", text))
            | set(re.findall(r"WholeStageCodegen \((\d+)\)", simple))
        ),
        "python_row_udfs": simple.count("BatchEvalPython"),
        "arrow_udfs": simple.count("ArrowEvalPython")
        + simple.count("FlatMapGroupsInPandas")
        + simple.count("MapInPandas"),
        "single_partition_over_scan": _single_partition_over_scan(simple),
    }


_AGG_RE = re.compile(r"\b(HashAggregate|SortAggregate|ObjectHashAggregate)\b")
_SCAN_RE = re.compile(r"\bScan (parquet|orc|avro|csv|json|text)\b|FileScan")


def _single_partition_over_scan(simple: str) -> int:
    """Count `Exchange SinglePartition` nodes whose subtree reaches a file
    scan with NO aggregate in between — the textbook 100×-scale straggler
    (e.g. `Window.orderBy` with no partitionBy collapses the whole table
    onto one task). A single-partition exchange above an aggregate is fine:
    the aggregate bounds the row count (group cardinality), so the one task
    handles a summary, not the data.

    Works off the `simple` plan's indentation tree: a node's subtree is the
    following lines with strictly deeper tree-prefix depth."""
    lines = simple.splitlines()

    def depth(line: str) -> int:
        m = re.match(r"^[\s:+|-]*", line)
        return len(m.group(0)) if m else 0

    hits = 0
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        d = depth(line)
        saw_scan, saw_agg = False, False
        for sub in lines[i + 1 :]:
            if not sub.strip():
                continue
            if depth(sub) <= d:
                break
            if _AGG_RE.search(sub):
                saw_agg = True
            if _SCAN_RE.search(sub):
                saw_scan = True
        if saw_scan and not saw_agg:
            hits += 1
    return hits


def assert_scan_efficient(
    df: DataFrame,
    max_read_columns: int | None = None,
    require_pushed_filter: str | None = None,
) -> dict:
    """Raise if the scan reads more than it should or a filter failed to
    reach the parquet reader."""
    a = audit(df)
    if max_read_columns is not None:
        widest = max(a["read_schema_widths"] or [0])
        if widest > max_read_columns:
            raise AssertionError(
                f"scan reads {widest} columns, expected <= {max_read_columns}:\n"
                + plan_text(df)
            )
    if require_pushed_filter is not None:
        if not any(require_pushed_filter in p for p in a["pushed_filters"]):
            raise AssertionError(
                f"no pushed filter mentions {require_pushed_filter!r}; "
                f"pushed={a['pushed_filters']}\n" + plan_text(df)
            )
    return a


def assert_jvm_only(df: DataFrame) -> dict:
    """Raise if the plan contains a row-at-a-time Python UDF (the slow
    path); Arrow-batched pandas UDFs are allowed."""
    a = audit(df)
    if a["python_row_udfs"]:
        raise AssertionError(
            "plan contains row-at-a-time Python eval (BatchEvalPython):\n"
            + plan_text(df, "simple")
        )
    return a


def assert_broadcasts(df: DataFrame, at_least: int = 1) -> dict:
    """Raise unless the (AQE-final) plan broadcasts at least N joins —
    dimension joins must not shuffle the fact table."""
    a = audit(df, execute=True)
    if a["broadcast_joins"] < at_least:
        raise AssertionError(
            f"expected >= {at_least} broadcast joins, found "
            f"{a['broadcast_joins']}:\n" + plan_text(df, "simple")
        )
    return a
