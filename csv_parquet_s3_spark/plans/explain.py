"""Physical-plan inspection helpers: the `.explain("formatted")` feedback
loop used to keep every headline query scale-shaped.

What "good" looks like (SURVEY.md §4.2 / the 100 TB design point):

- ``PushedFilters`` non-empty on filtered Parquet scans;
- ``ReadSchema`` pruned to the referenced columns, not the full table;
- constant-size dims joined via ``BroadcastHashJoin``, not sort-merge;
- few ``Exchange`` nodes (each is a shuffle), none avoidable;
- wide ``WholeStageCodegen`` spans (expressions stayed JVM-side).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


@dataclass
class PlanStats:
    n_exchanges: int
    n_broadcast_joins: int
    n_sortmerge_joins: int
    n_scans: int
    scans_with_pushed_filters: int
    read_schemas: list[str]
    plan: str
    # Exchange SinglePartition: everything funnels to ONE task. Expected for
    # a final 1-row/global aggregate readout; a scale bug when the frame is
    # entity-sized (the two-phase rank in plans/ranking.py is the fix).
    n_single_partition: int = 0

    def summary(self) -> str:
        return (
            f"exchanges={self.n_exchanges} bhj={self.n_broadcast_joins} "
            f"smj={self.n_sortmerge_joins} scans={self.n_scans} "
            f"pushed={self.scans_with_pushed_filters}"
        )


def analyze(df: DataFrame) -> PlanStats:
    plan = formatted_plan(df)
    read_schemas = re.findall(r"ReadSchema: (.+)", plan)
    pushed = [
        m for m in re.findall(r"PushedFilters: \[(.*?)\]", plan) if m.strip()
    ]
    # Formatted explain prints each node twice (once in the tree, once in
    # the numbered details), so count only the numbered detail headers.
    return PlanStats(
        n_exchanges=len(re.findall(r"^\(\d+\) Exchange", plan, re.M)),
        n_broadcast_joins=len(re.findall(r"^\(\d+\) BroadcastHashJoin", plan, re.M)),
        n_sortmerge_joins=len(re.findall(r"^\(\d+\) SortMergeJoin", plan, re.M)),
        n_scans=len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)),
        scans_with_pushed_filters=len(pushed),
        read_schemas=read_schemas,
        plan=plan,
        # each Exchange node's detail block is "(N) Exchange" / "Input ..."
        # / "Arguments: <partitioning>, ..." — match the Arguments line
        n_single_partition=len(
            re.findall(r"^Arguments: SinglePartition", plan, re.M)
        ),
    )


def analyze_simple(plan: str) -> PlanStats:
    """PlanStats from a SIMPLE-mode plan tree (one line per node, no
    numbered detail section) — the format ``StreamingQuery.explainInternal``
    exposes for the last executed micro-batch. Counts are whole-word node
    occurrences; ``\\bExchange\\b`` does not match inside ReusedExchange, so
    reuse is not double-counted (same convention as the formatted counter,
    which also counts only materialized exchanges)."""
    read_schemas = re.findall(r"ReadSchema: (.+)", plan)
    pushed = [
        m for m in re.findall(r"PushedFilters: \[(.*?)\]", plan) if m.strip()
    ]
    return PlanStats(
        n_exchanges=len(re.findall(r"\bExchange\b", plan)),
        n_broadcast_joins=len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        n_sortmerge_joins=len(re.findall(r"\bSortMergeJoin\b", plan)),
        n_scans=len(re.findall(r"\bFileScan parquet\b", plan)),
        scans_with_pushed_filters=len(pushed),
        read_schemas=read_schemas,
        plan=plan,
        n_single_partition=len(re.findall(r"\bExchange SinglePartition\b", plan)),
    )
