"""Plan-shape assertions: the scan-efficiency claims (SURVEY.md §4.2 /
ARCHITECTURE.md) hold as executable checks, not prose."""

from __future__ import annotations

import re

from csv_parquet_s3_spark.operators import QUERIES
from csv_parquet_s3_spark.plans.explain import analyze

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_scan(spark):
    """q06 (filtered single-table aggregate): the shipdate/discount/quantity
    predicates must appear in PushedFilters on the parquet scan."""
    plan = analyze(QUERIES["q06_forecast_revenue"](spark, SF)).plan
    pushed = re.search(r"PushedFilters: \[([^\]]+)\]", plan)
    assert pushed and "l_shipdate" in pushed.group(1), plan


def test_column_pruning_on_projection(spark):
    """q06 touches 4 of lineitem's 11 columns; ReadSchema must not contain
    the untouched ones (full-width scans are the #1 avoidable IO cost)."""
    plan = analyze(QUERIES["q06_forecast_revenue"](spark, SF)).plan
    schema = re.search(r"ReadSchema: (.+)", plan).group(1)
    assert "l_shipdate" in schema and "l_discount" in schema
    for untouched in ("l_orderkey", "l_returnflag", "l_tax", "l_partkey"):
        assert untouched not in schema, schema


def test_constant_dims_broadcast(spark):
    """q05's region/nation/supplier legs must plan as broadcast joins —
    a sort-merge join against a 5-row dimension is a planning failure."""
    stats = analyze(QUERIES["q05_regional_revenue"](spark, SF))
    assert stats.n_broadcast_joins >= 2, stats.summary()


def test_topk_compiles_to_take_ordered(spark):
    """ORDER BY + LIMIT must become TakeOrderedAndProject (top-k heap),
    never a full global sort."""
    plan = analyze(QUERIES["q_topk_orders_by_value"](spark, SF)).plan
    assert "TakeOrderedAndProject" in plan
    assert "GlobalSort" not in plan
