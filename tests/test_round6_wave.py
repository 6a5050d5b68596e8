"""Semantic pins for the round-6 changes — properties the differential
oracle can't express (it proves Spark==DuckDB, not that either is RIGHT).

- Late-data streaming: the planted too-late row is genuinely absent from
  the drained sink, the watermark-carrier row never surfaces, and the sink
  equals an independently computed batch aggregate with the append-mode
  emission cutoff — all three checked Spark-side only, so a correlated
  oracle bug could not mask a semantics break.
- Item-CF super-basket cap: no customer contributes more than
  CF_MAX_BASKET items to the pair expansion, and the capped interaction
  matrix is a subset of the uncapped one (the cap removes rows, never
  invents them).
- Poisson bootstrap inverse CDF: the breakpoint table is the true
  Poisson(1) CDF through k=5 and the derandomized draw hits every
  multiplicity 0..5 with the right mass (the r05 advisor found the old
  table skipped 5 entirely).
- DP release: the output schema says nominal_epsilon (not epsilon) and the
  seed is threaded into both engines' noise hash.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Late-data watermark semantics
# ---------------------------------------------------------------------------
def test_late_data_probe_dropped_and_cutoff_exact(spark):
    from csv_parquet_s3_spark.operators.streaming_batch import (
        stream_events_late_data_drop,
    )
    from csv_parquet_s3_spark.sources.tables import load_table

    out = stream_events_late_data_drop(spark, SF)
    rows = out.collect()
    types = {r["event_type"] for r in rows}
    assert "late_probe" not in types, "watermark failed to drop the late row"
    assert "wm_carrier" not in types, "carrier window leaked into append output"

    # Independent batch replay of the append contract: real events only,
    # windows whose end the final watermark (max ts - 1h) has passed.
    ev = load_table(spark, SF, "events")
    expected = (
        ev.crossJoin(
            F.broadcast(ev.agg((F.max("ts") - F.expr("INTERVAL 1 HOUR")).alias("wm")))
        )
        .filter(F.date_trunc("hour", F.col("ts")) + F.expr("INTERVAL 1 HOUR") <= F.col("wm"))
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
    )
    got = {(r["hour_start"], r["event_type"]): r["n_events"] for r in rows}
    want = {(r["hour_start"], r["event_type"]): r["n_events"] for r in expected.collect()}
    assert got == want


# ---------------------------------------------------------------------------
# Item-CF super-basket cap
# ---------------------------------------------------------------------------
def test_item_cf_cap_bounds_and_subset(spark):
    from csv_parquet_s3_spark.operators.reshape import CF_MAX_BASKET
    from csv_parquet_s3_spark.sources.tables import load_table
    from pyspark.sql import Window as W

    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    ui_all = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i"))
        .distinct()
    )
    capped = (
        ui_all.withColumn(
            "rn_cap",
            F.row_number().over(
                W.partitionBy("u").orderBy(
                    F.expr(
                        "md5(cast(concat(cast(u as string), ':',"
                        " cast(i as string)) as binary))"
                    ),
                    "i",
                )
            ),
        )
        .filter(F.col("rn_cap") <= CF_MAX_BASKET)
        .drop("rn_cap")
    )
    per_user = capped.groupBy("u").agg(F.count("*").alias("n")).collect()
    assert per_user, "capped interaction matrix is empty"
    assert max(r["n"] for r in per_user) <= CF_MAX_BASKET
    # the cap binds on this corpus (otherwise the test pins nothing)
    full_max = ui_all.groupBy("u").agg(F.count("*").alias("n")).agg(F.max("n")).collect()[0][0]
    assert full_max > CF_MAX_BASKET, "fixture too small: cap never engages"
    # subset: capping removes interactions, never invents them
    assert capped.exceptAll(ui_all).count() == 0


# ---------------------------------------------------------------------------
# Poisson bootstrap inverse CDF (advisor fix: table runs through k=5)
# ---------------------------------------------------------------------------
def test_poisson_cdf_table_exact():
    from csv_parquet_s3_spark.operators.statistics import _POIS_CDF

    e = math.exp(-1)
    cum, fact = 0.0, 1
    for k, breakpoint_ in enumerate(_POIS_CDF):
        if k > 0:
            fact *= k
        cum += e / fact
        assert abs(breakpoint_ - cum) < 5e-16, f"CDF breakpoint {k} wrong"
    assert len(_POIS_CDF) == 6  # k = 0..5; the tail above P(W<=5) maps to 6


def test_poisson_inverse_cdf_hits_all_multiplicities():
    import duckdb

    from csv_parquet_s3_spark.operators.statistics import _POIS_CDF, _boot_w

    # Evaluate the generated CASE expression on a fine uniform grid and
    # compare each multiplicity's empirical mass to the true pmf.
    expr = _boot_w("u")
    con = duckdb.connect()
    got = dict(
        con.sql(
            "SELECT w, COUNT(*) FROM (SELECT "
            + expr
            + " AS w FROM (SELECT (k + 0.5) / 1000000.0 AS u"
            "  FROM UNNEST(range(0, 1000000)) AS t(k)))"
            " GROUP BY w"
        ).fetchall()
    )
    con.close()
    e = math.exp(-1)
    pmf = [e, e, e / 2, e / 6, e / 24, e / 120]
    for k, p in enumerate(pmf):
        assert abs(got.get(k, 0) / 1e6 - p) < 2e-6, f"multiplicity {k} mass wrong"
    # the truncation tail: everything above P(W<=5) collapses to 6
    assert abs(got.get(6, 0) / 1e6 - (1 - _POIS_CDF[-1])) < 2e-6
    assert 5 in got, "multiplicity 5 skipped (the r05 advisor bug)"
    mean = sum(k * n for k, n in got.items()) / 1e6
    assert abs(mean - 1.0) < 1e-3  # E[w]=1 up to the 6-truncation bias (~6e-4)


# ---------------------------------------------------------------------------
# DP release honesty
# ---------------------------------------------------------------------------
def test_dp_release_schema_and_seed(spark):
    from csv_parquet_s3_spark.operators import ORACLES
    from csv_parquet_s3_spark.operators.privacy import (
        DP_SEED,
        q_dp_noisy_counts_by_nation,
    )

    df = q_dp_noisy_counts_by_nation(spark, SF)
    assert "nominal_epsilon" in df.columns and "epsilon" not in df.columns
    # the seed is threaded into BOTH engines' noise hash
    assert DP_SEED in ORACLES["q_dp_noisy_counts_by_nation"]
