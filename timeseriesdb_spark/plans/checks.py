"""Physical-plan assertions (SURVEY.md §4) — the scale contract made
testable. The reference hand-builds its execution tricks (byte-plane
filters, selection-vector pushdown, SIMD scans); on Spark those are
Catalyst/Parquet features that can silently disappear when a query is
written badly. These helpers pin them:

- pushed_filters(df): the PushedFilters the Parquet scan will apply at
  row-group/page level (the analog of the reference's query-over-
  compressed-bytes short-circuit).
- read_schema(df): columns actually decoded by the scan — column
  pruning (a 2-column projection must not read all 6).
- exchange_count(df): shuffles in the plan; every unnecessary one is
  the 100 TB bottleneck.
- has_broadcast_join(df): small-dim joins must broadcast, never
  shuffle the fact side.
- codegen_spans(df): WholeStageCodegen regions (vectorized JVM
  execution; Python touches only the declared pandas-UDF operators).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(p.strip() for p in m.group(1).split(",") if p.strip())
    return out


def read_schema(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges only (broadcast exchanges are free-ish).
    Counts the numbered '(N) Exchange' operator sections of the
    formatted plan — the partitioning detail sits on a separate
    Arguments: line, so matching 'Exchange hashpartitioning' inline
    would (silently) count nothing."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def codegen_spans(df: DataFrame) -> int:
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", formatted_plan(df))))
