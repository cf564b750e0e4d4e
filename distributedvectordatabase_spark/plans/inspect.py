"""Helpers that parse ``df.explain('formatted')`` output into checkable
facts: what a Parquet scan reads (column pruning), which predicates
reached the scan (pushdown), which partition filters prune directories,
whether a top-k runs as TakeOrderedAndProject, whether a join broadcast
its small side, and how many whole-stage-codegen spans cover the plan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (what .explain prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def _scan_blocks(plan: str) -> list[str]:
    """Split the formatted plan's operator-detail section into blocks,
    returning those describing Parquet scans."""
    blocks = re.split(r"\n\(\d+\) ", plan)
    return [b for b in blocks if b.startswith("Scan parquet") or "Scan parquet" in b.splitlines()[0]]


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema of every Parquet scan — the columns that actually hit
    the reader (column pruning check)."""
    out = []
    for b in _scan_blocks(physical_plan(df)):
        m = re.search(r"ReadSchema: struct<([^>]*)>", b)
        if m:
            out.append(m.group(1))
    return out


def scan_pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters of every Parquet scan (predicate pushdown check)."""
    out = []
    for b in _scan_blocks(physical_plan(df)):
        m = re.search(r"PushedFilters: \[([^\]]*)\]", b)
        if m:
            out.append(m.group(1))
    return out


def scan_partition_filters(df: DataFrame) -> list[str]:
    """PartitionFilters of every Parquet scan (partition pruning check —
    a pruned directory is never even listed, let alone read)."""
    out = []
    for b in _scan_blocks(physical_plan(df)):
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", b)
        if m:
            out.append(m.group(1))
    return out


def has_take_ordered(df: DataFrame) -> bool:
    """True if the plan's top-k is TakeOrderedAndProject — per-partition
    bounded heap + driver merge, never a full sort/shuffle."""
    return "TakeOrderedAndProject" in physical_plan(df)


def has_broadcast(df: DataFrame) -> bool:
    """True if any join in the plan broadcasts a side."""
    p = physical_plan(df)
    return "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans (wider = more of the plan
    runs as generated JVM loops rather than interpreted operators)."""
    return len(set(re.findall(r"\[codegen id : (\d+)\]", physical_plan(df))))
