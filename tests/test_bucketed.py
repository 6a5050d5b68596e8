"""Bucketed layout: the co-located join must plan with zero Exchange."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from csv_parquet_s3_spark.plans.explain import analyze
from csv_parquet_s3_spark.sources.bucketed import cobucket_for_join
from csv_parquet_s3_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_cobucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")

    b_orders, b_li = cobucket_for_join(
        spark, orders, li, "b_orders", "b_lineitem",
        ["o_orderkey"], ["l_orderkey"], n_buckets=8,
        base_path=str(tmp_path / "wh"),
    )
    try:
        joined = b_li.join(
            b_orders, b_li.l_orderkey == b_orders.o_orderkey
        ).groupBy("o_orderstatus").agg(F.count("*").alias("n"))

        stats = analyze(joined)
        plan = stats.plan
        # the join itself is exchange-free: neither side shuffles on its join
        # key; the only Exchange is the group-by aggregate above the join
        assert "SortMergeJoin" in plan, stats.summary()
        assert "hashpartitioning(l_orderkey" not in plan, stats.summary()
        assert "hashpartitioning(o_orderkey" not in plan, stats.summary()
        assert stats.n_exchanges == 1, stats.summary()

        # same query on unbucketed parquet shuffles both sides
        base = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count("*").alias("n"))
        assert analyze(base).n_exchanges > stats.n_exchanges

        # values identical
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, base.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_materialized_fact_layout_serves_registered_queries(spark):
    """materialize_bucketed_facts: registered queries transparently pick up
    the bucketed catalog tables via the load_table override, lose the
    fact-side Exchange, and return byte-identical results."""
    from csv_parquet_s3_spark.operators import QUERIES
    from csv_parquet_s3_spark.sources.bucketed import (
        materialize_bucketed_facts,
        release_bucketed_facts,
    )

    name = "q18_large_volume_orders"
    raw = QUERIES[name](spark, SF)
    raw_stats = analyze(raw)
    raw_rows = sorted(map(tuple, raw.collect()))
    materialize_bucketed_facts(spark, SF)
    try:
        bucketed = QUERIES[name](spark, SF)
        b_stats = analyze(bucketed)
        assert b_stats.n_exchanges < raw_stats.n_exchanges, (
            raw_stats.summary(),
            b_stats.summary(),
        )
        assert b_stats.n_exchanges == 0, b_stats.summary()
        assert sorted(map(tuple, bucketed.collect())) == raw_rows
    finally:
        release_bucketed_facts()
    # override released: back to the raw-parquet plan
    assert analyze(QUERIES[name](spark, SF)).n_exchanges == raw_stats.n_exchanges
