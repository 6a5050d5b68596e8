"""Semantic pins for the statistics/graph operators taking their first
driver rows in the r06 window. The differential oracle proves Spark ==
DuckDB; these tests pin that the shared definition is the RIGHT one — the
mathematical invariants each statistic must satisfy regardless of data.
"""

from __future__ import annotations

import math
import os

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _run(spark, name):
    from csv_parquet_s3_spark.operators import QUERIES

    return QUERIES[name](spark, SF).collect()


def test_benford_reference_distribution(spark):
    rows = {r["first_digit"]: r for r in _run(spark, "q_orders_benford_digits")}
    assert set(rows) == set(range(1, 10))
    for d, r in rows.items():
        assert abs(r["benford_share"] - round(math.log10(1 + 1 / d), 6)) < 1e-9
        assert abs(
            r["abs_dev"] - round(abs(r["observed_share"] - r["benford_share"]), 6)
        ) <= 2e-6
    assert abs(sum(r["observed_share"] for r in rows.values()) - 1.0) < 1e-4


def test_autocorrelation_bounded(spark):
    rows = _run(spark, "q_events_autocorrelation")
    assert rows, "no lags computed"
    for r in rows:
        assert -1.0 - 1e-9 <= r["autocorr"] <= 1.0 + 1e-9
    # each extra lag can only shrink the pair count
    by_lag = sorted(rows, key=lambda r: r["lag"])
    pairs = [r["n_pairs"] for r in by_lag]
    assert pairs == sorted(pairs, reverse=True)


def test_dow_seasonality_indices_average_to_one(spark):
    rows = _run(spark, "q_events_dow_seasonality")
    assert len(rows) == 7
    assert all(r["seasonal_index"] > 0 for r in rows)
    n = sum(r["n_days"] for r in rows)
    weighted = sum(r["seasonal_index"] * r["n_days"] for r in rows) / n
    # index_d = avg_d / overall ⇒ the n_days-weighted mean is identically 1
    assert abs(weighted - 1.0) < 1e-3


def test_hll_estimate_within_error_bound(spark):
    (r,) = _run(spark, "q_hll_distinct_users")
    exact = r["exact_distinct"]
    assert exact > 0
    # m=64 registers ⇒ ~13% standard error; allow ~3 sigma
    assert abs(r["est_distinct"] - exact) / exact < 0.4
    assert 1 <= r["n_used_registers"] <= 64


def test_gains_table_accounting(spark):
    rows = sorted(_run(spark, "q_model_gains_table"), key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, 11))
    gains = [r["cumulative_gain"] for r in rows]
    assert gains == sorted(gains)  # cumulative share is monotone
    assert abs(gains[-1] - 1.0) < 1e-5  # all positives accounted for
    base = sum(r["n_positive"] for r in rows) / sum(r["n_customers"] for r in rows)
    for r in rows:
        assert abs(r["lift"] - round(r["response_rate"] / base, 6)) <= 2e-5


def test_pagerank_is_a_distribution(spark):
    rows = _run(spark, "graph_pagerank_nation_trade")
    assert rows and all(r["pagerank"] > 0 for r in rows)
    assert abs(sum(r["pagerank"] for r in rows) - 1.0) < 1e-3


def test_gini_bounded(spark):
    (r,) = _run(spark, "q_customer_gini_concentration")
    assert 0.0 <= r["gini"] < 1.0
    assert r["n_customers"] > 0 and r["total_spend"] > 0


def test_kcore_degree_floor(spark):
    from csv_parquet_s3_spark.operators.components import KCORE_K

    rows = _run(spark, "graph_kcore_docs")
    # every surviving node keeps >= k neighbors INSIDE the surviving set
    assert all(r["core_degree"] >= KCORE_K for r in rows)
