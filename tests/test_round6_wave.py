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

import pytest

import math

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Late-data watermark semantics
# ---------------------------------------------------------------------------
@pytest.mark.slow
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
# k-fold assignment: the folds partition the corpus
# ---------------------------------------------------------------------------
def test_kfold_partitions_corpus(spark):
    from csv_parquet_s3_spark.operators import QUERIES
    from csv_parquet_s3_spark.operators.sampling import KFOLD_K
    from csv_parquet_s3_spark.sources.tables import load_table

    rows = QUERIES["split_documents_kfold"](spark, SF).collect()
    assert {r["fold"] for r in rows} <= set(range(KFOLD_K))
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs  # disjoint + exhaustive
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], 0.0)
        by_lang[r["lang"]] += r["lang_share"]
    for lang, s in by_lang.items():
        assert abs(s - 1.0) < 1e-4, f"{lang} fold shares do not sum to 1"


# ---------------------------------------------------------------------------
# Temperature sampling: smallest language survives whole; keep rates order
# inversely to corpus size
# ---------------------------------------------------------------------------
def test_temperature_sampling_keep_rates(spark):
    from csv_parquet_s3_spark.operators import QUERIES
    from csv_parquet_s3_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    full = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept_rows = QUERIES["sample_documents_temperature"](spark, SF).collect()
    kept = {}
    for r in kept_rows:
        kept[r["lang"]] = kept.get(r["lang"], 0) + 1
    n_min = min(full.values())
    smallest = [lang for lang, n in full.items() if n == n_min]
    for lang in smallest:  # rate (n_min/n_l)^(1-alpha) = 1.0 exactly
        assert kept.get(lang, 0) == full[lang], "smallest language must keep all"
    # keep RATE is non-increasing in language size (monotone thresholds)
    rates = sorted(((full[lang], kept.get(lang, 0) / full[lang]) for lang in full))
    for (n_a, r_a), (n_b, r_b) in zip(rates, rates[1:]):
        if n_a < n_b:
            assert r_a >= r_b - 0.12  # binomial slack at sf0.001 counts


# ---------------------------------------------------------------------------
# Activity streaks: independent Python re-derivation
# ---------------------------------------------------------------------------
def test_streaks_match_python_rederivation(spark):
    from csv_parquet_s3_spark.operators import QUERIES
    from csv_parquet_s3_spark.sources.tables import load_table

    got = {
        r["user_id"]: (r["longest_streak_days"], r["n_streaks"], r["current_streak_days"])
        for r in QUERIES["q_user_activity_streaks"](spark, SF).collect()
    }
    days = (
        load_table(spark, SF, "events")
        .select("user_id", F.expr("CAST(date_trunc('day', ts) AS DATE)").alias("d"))
        .distinct()
        .collect()
    )
    by_user = {}
    for r in days:
        by_user.setdefault(r["user_id"], set()).add(r["d"])
    corpus_last = max(d for s in by_user.values() for d in s)
    for user, ds in by_user.items():
        ordered = sorted(ds)
        runs, run = [], [ordered[0]]
        for a, b in zip(ordered, ordered[1:]):
            if (b - a).days == 1:
                run.append(b)
            else:
                runs.append(run)
                run = [b]
        runs.append(run)
        longest = max(len(r) for r in runs)
        current = len(runs[-1]) if runs[-1][-1] == corpus_last else 0
        assert got[user] == (longest, len(runs), current), f"user {user}"


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
