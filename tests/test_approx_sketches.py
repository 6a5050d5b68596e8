"""Property-pin the one permanently rows-only registry entry.

``q_approx_sketches`` has no DuckDB oracle by design (HLL++/KLL estimates are
engine-specific), so the driver only checks that it runs. These tests give it
a falsifiable local contract instead: every estimate must sit within the
THEORETICAL error bound of the exact value, computed cheaply at test SF.

Bounds used:
- ``approx_count_distinct(rsd=0.02)``: HLL++ relative standard deviation 2%;
  we allow 5σ = 10% relative error (the estimator is deterministic for fixed
  data, so this either always passes or reveals a real regression).
- ``percentile_approx(0.5, accuracy=10000)``: Greenwald-Khanna style rank
  error ≤ n/accuracy, so the returned value must lie between the exact
  quantiles at 0.5 ± 1/10000 (padded to ±0.01 for interpolation slack).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECTNESS


@pytest.fixture(scope="module")
def sketch_and_exact(spark):
    from pyspark.sql import functions as F

    from csv_parquet_s3_spark.operators.advanced import q_approx_sketches
    from csv_parquet_s3_spark.sources.tables import load_table

    approx = {r["l_returnflag"]: r.asDict() for r in q_approx_sketches(spark, SF_CORRECTNESS).collect()}
    li = load_table(spark, SF_CORRECTNESS, "lineitem")
    exact = {
        r["l_returnflag"]: r.asDict()
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(l_extendedprice, 0.49)").alias("p49"),
            F.expr("percentile(l_extendedprice, 0.51)").alias("p51"),
            F.count("*").alias("n_rows"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    return approx, exact


def test_hll_distinct_within_5_sigma(sketch_and_exact):
    approx, exact = sketch_and_exact
    for flag in exact:
        for a_col, e_col in (("approx_orders", "orders"), ("approx_parts", "parts")):
            est, true = approx[flag][a_col], exact[flag][e_col]
            assert abs(est - true) <= max(0.10 * true, 5), (
                f"{a_col}[{flag}]: HLL estimate {est} vs exact {true} "
                f"exceeds 5x the configured 2% rsd"
            )


def test_approx_median_within_rank_error(sketch_and_exact):
    approx, exact = sketch_and_exact
    for flag in exact:
        est = approx[flag]["approx_median_price"]
        lo, hi = exact[flag]["p49"], exact[flag]["p51"]
        assert lo <= est <= hi, (
            f"approx_median_price[{flag}]={est} outside exact [p49, p51] = "
            f"[{lo}, {hi}] — beyond the accuracy=10000 rank-error guarantee"
        )


def test_exact_row_counts_pass_through(sketch_and_exact):
    """n_rows is not an estimate — it must match exactly."""
    approx, exact = sketch_and_exact
    for flag in exact:
        assert approx[flag]["n_rows"] == exact[flag]["n_rows"]
