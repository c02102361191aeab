"""Physical-plan inspection: the engine's answer to 'would this plan
survive a 100x scale-up?'.

The reference achieves its performance with hand-built mechanisms
(SURVEY.md §4: selection pushdown, column pruning, chromosome partition
pruning). Here those are Catalyst features — but only if the plan
actually exhibits them. These helpers make plan shape testable, so
regressions in pushdown/pruning/broadcast fail CI instead of surfacing
as cluster bills.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (row-group skipping)."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_string(df)):
        out.extend(x.strip() for x in m.group(1).split(",") if x.strip())
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """Filters applied at partition-directory level (pruning)."""
    out = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan_string(df)):
        out.extend(x.strip() for x in m.group(1).split(",") if x.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """Column sets each scan actually reads (pruning check)."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan_string(df))


def num_shuffles(df: DataFrame) -> int:
    """Exchange count — every one is a full network pass at scale."""
    return len(re.findall(r"\bExchange\b", plan_string(df, "simple")))


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan_string(df, "simple")))


def sortmerge_join_count(df: DataFrame) -> int:
    return len(re.findall(r"SortMergeJoin", plan_string(df, "simple")))


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine present (partial_ functions or two HashAggregate
    levels around the exchange)."""
    s = plan_string(df)
    return "partial_" in s or s.count("HashAggregate") >= 2


def wholestage_codegen_spans(df: DataFrame) -> int:
    # (a stray r"\W" here used to swallow the leading 'W' and the first
    # branch never matched)
    s = plan_string(df, "simple")
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", s))) or len(
        set(re.findall(r"\*\((\d+)\)", s))
    )
