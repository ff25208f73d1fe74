"""Physical-plan inspection: the ".explain and iterate" loop as code.

``plan_report`` summarizes the executed plan into the handful of numbers
that decide 100 TB behavior (exchanges, join strategies, scans, pushed
filters, codegen coverage); ``assert_plan`` lets tests pin them so a
regression that adds a shuffle or drops a broadcast fails CI instead of
shipping (used in tests/test_plan_quality.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    broadcast_hash_joins: int = 0
    sort_merge_joins: int = 0
    nested_loop_joins: int = 0
    exchanges: int = 0
    parquet_scans: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    wholestage_codegen: int = 0
    raw: str = ""


def plan_report(df: DataFrame) -> PlanReport:
    # default spark.sql.maxMetadataStringLength=100 truncates PushedFilters
    # mid-list; widen while rendering so the pins see every pushed predicate
    conf = df.sparkSession.conf
    prev = conf.get("spark.sql.maxMetadataStringLength", "100")
    conf.set("spark.sql.maxMetadataStringLength", "10000")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        conf.set("spark.sql.maxMetadataStringLength", prev)
    return PlanReport(
        broadcast_hash_joins=plan.count("BroadcastHashJoin"),
        sort_merge_joins=plan.count("SortMergeJoin"),
        nested_loop_joins=plan.count("BroadcastNestedLoopJoin"),
        exchanges=plan.count("Exchange"),
        parquet_scans=plan.count("Scan parquet"),
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
        wholestage_codegen=plan.count("WholeStageCodegen"),
        raw=plan,
    )


def assert_plan(
    df: DataFrame,
    max_exchanges: int | None = None,
    max_scans: int | None = None,
    require_broadcast_joins: int | None = None,
    forbid_sort_merge: bool = False,
    forbid_cartesian: bool = False,
    require_pushed_filter: str | None = None,
) -> PlanReport:
    """Assert structural properties of a query's physical plan."""
    r = plan_report(df)
    if forbid_cartesian and (
        r.nested_loop_joins or "CartesianProduct" in r.raw
    ):
        raise AssertionError(f"unexpected cartesian/nested-loop join:\n{r.raw}")
    if max_exchanges is not None and r.exchanges > max_exchanges:
        raise AssertionError(f"{r.exchanges} exchanges > {max_exchanges}:\n{r.raw}")
    if max_scans is not None and r.parquet_scans > max_scans:
        raise AssertionError(f"{r.parquet_scans} scans > {max_scans}:\n{r.raw}")
    if (
        require_broadcast_joins is not None
        and r.broadcast_hash_joins < require_broadcast_joins
    ):
        raise AssertionError(
            f"{r.broadcast_hash_joins} broadcast joins < {require_broadcast_joins}:\n{r.raw}"
        )
    if forbid_sort_merge and r.sort_merge_joins:
        raise AssertionError(f"unexpected SortMergeJoin:\n{r.raw}")
    if require_pushed_filter is not None and not any(
        require_pushed_filter in f for f in r.pushed_filters
    ):
        raise AssertionError(
            f"no pushed filter matching {require_pushed_filter!r}; "
            f"got {r.pushed_filters}:\n{r.raw}"
        )
    return r
