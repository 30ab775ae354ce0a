"""Physical-plan inspection: make "is this the plan you'd want at
100 TB?" a testable property instead of a code-review opinion.

The reference engine has no plan at all (a fixed, hand-fused C++
pipeline — SURVEY §4); on Spark the plan IS the performance contract, so
we pin the load-bearing properties per query in tests/test_plans.py:

* filters reach the parquet scan (``PushedFilters``),
* scans read only the projected columns (``ReadSchema``),
* dimension joins broadcast (no fact-side shuffle),
* aggregations are partial+final (map-side combine),
* global top-k compiles to TakeOrdered (per-partition heaps), never a
  global sort,
* shuffle (Exchange) counts don't silently regress.

All helpers parse ``explain("formatted")`` / executedPlan text — the
same strings a human reads — so assertions survive Spark version bumps
better than internal-API visitors would.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The executed (post-AQE-planning) physical plan as text."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def exchange_count(df: DataFrame) -> int:
    """Number of DATA-SIZED shuffle exchanges: hash partitioning, range
    partitioning, and single-partition collection.  Deliberately
    excluded: broadcast exchanges (they ship a dimension, not the fact)
    and round-robin repartitions (only emitted by ensure_min_splits,
    whose contract is to be a no-op whenever input splits ≥ cores —
    i.e. always, at scale)."""
    plan = simple_plan(df)
    return len(
        re.findall(
            r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
            plan,
        )
    )


def broadcast_join_count(df: DataFrame) -> int:
    return simple_plan(df).count("BroadcastHashJoin")


def pushed_filters(df: DataFrame, table_hint: str = "") -> list[str]:
    """All PushedFilters entries (optionally only scans whose text
    mentions ``table_hint``, e.g. the parquet file name)."""
    out: list[str] = []
    blocks = re.split(r"\(\d+\) Scan parquet", formatted_plan(df))[1:]
    for b in blocks:
        if table_hint and table_hint not in b.split("PushedFilters", 1)[0]:
            continue
        fm = re.search(r"PushedFilters: \[([^\]]*)\]", b)
        if fm and fm.group(1).strip():
            out.extend(s.strip() for s in fm.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame, table_hint: str) -> set[str]:
    """Column names the scan of ``table_hint`` actually reads."""
    blocks = re.split(r"\(\d+\) Scan parquet", formatted_plan(df))[1:]
    for b in blocks:
        head = b.split("PushedFilters", 1)[0]
        if table_hint in head:
            sm = re.search(r"ReadSchema: struct<([^>]*)>", b)
            if sm:
                return {p.split(":", 1)[0].strip() for p in sm.group(1).split(",") if p.strip()}
    return set()


def partition_filters(df: DataFrame) -> list[str]:
    """All PartitionFilters entries across parquet scans — non-empty
    means partition pruning is happening at planning time (files of
    non-matching partitions are never opened)."""
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", formatted_plan(df)):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Count of WholeStageCodegen regions — wider/fewer is better.
    ``toString()`` renders a region as ``*(N) Operator``."""
    plan = simple_plan(df)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(ids)
