"""Pin the ε-bound contract of ``q_approx_sketches``.

Since r10 the entry is oracle-checked, not rows-only: it emits the EXACT
distinct counts / row counts plus booleans asserting the HLL++ and
percentile_approx estimates sit inside their theoretical error bounds
(|est/exact − 1| ≤ 4·rsd; median within the exact 47th..53rd percentile
window, ~500× the accuracy=10000 rank-error guarantee), and the DuckDB
oracle recomputes the exact side and pins every flag TRUE. These tests
keep a local falsifiable pin of the same contract (the estimators are
deterministic for fixed data — a failure is a real regression, never a
flake) plus the tighter observed-error margin the oracle bound relaxes.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECTNESS


@pytest.fixture(scope="module")
def sketch_rows(spark):
    from csv_parquet_s3_spark.operators.advanced import q_approx_sketches

    return {
        r["l_returnflag"]: r.asDict()
        for r in q_approx_sketches(spark, SF_CORRECTNESS).collect()
    }


def test_all_bound_flags_true(sketch_rows):
    assert sketch_rows, "no groups returned"
    for flag, row in sketch_rows.items():
        for col in (
            "hll_orders_in_bound",
            "hll_parts_in_bound",
            "approx_median_in_bound",
        ):
            assert row[col] is True, f"{col}[{flag}] is {row[col]}"


def test_exact_side_matches_independent_aggregation(spark, sketch_rows):
    from pyspark.sql import functions as F

    from csv_parquet_s3_spark.sources.tables import load_table

    li = load_table(spark, SF_CORRECTNESS, "lineitem")
    exact = {
        r["l_returnflag"]: r.asDict()
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("exact_orders"),
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.count("*").alias("n_rows"),
        )
        .collect()
    }
    assert set(sketch_rows) == set(exact)
    for flag in exact:
        for col in ("exact_orders", "exact_parts", "n_rows"):
            assert sketch_rows[flag][col] == exact[flag][col], f"{col}[{flag}]"


def test_hll_observed_error_well_inside_bound(spark):
    """The committed 4σ oracle bound must carry real margin: the observed
    relative error at test SF stays under 2σ (= the rsd's nominal 95%
    band), so the TRUE flags aren't sitting on the edge of the bound."""
    from pyspark.sql import functions as F

    from csv_parquet_s3_spark.operators.advanced import HLL_RSD
    from csv_parquet_s3_spark.sources.tables import load_table

    li = load_table(spark, SF_CORRECTNESS, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("exact"),
            F.approx_count_distinct("l_orderkey", rsd=HLL_RSD).alias("est"),
        )
        .collect()
    )
    for r in rows:
        rel = abs(r["est"] / r["exact"] - 1.0)
        assert rel <= 2 * HLL_RSD, (
            f"HLL error {rel:.4f} for {r['l_returnflag']} exceeds 2σ — "
            "the 4σ oracle bound is losing its margin"
        )
