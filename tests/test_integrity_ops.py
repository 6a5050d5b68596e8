"""Integrity / audit operators: the properties that make them trustworthy —
digest invariance under partitioning and ordering, orphan detection that
actually fires, sweep-line conservation, transition-matrix stochasticity."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_parquet_s3_spark.operators.advanced import (
    _DIGEST_COLS_SPARK,
    _KMV_HEX_INT,
    fk_edge_audit,
    q_fk_orphan_audit,
    q_open_orders_daily,
    q_table_content_digest,
)
from csv_parquet_s3_spark.operators.reshape import q_events_transition_matrix
from csv_parquet_s3_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _digest_of(df):
    row_hash = _KMV_HEX_INT.format(
        h=f"md5(cast(concat_ws('|', {_DIGEST_COLS_SPARK}) as binary))"
    )
    return df.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.expr(row_hash)).cast("bigint").alias("digest"),
    ).collect()[0]


def test_digest_invariant_under_partitioning_and_order(spark):
    li = load_table(spark, SF, "lineitem")
    base = q_table_content_digest(spark, SF).collect()[0]
    repart = _digest_of(li.repartition(7))
    sorted_ = _digest_of(li.orderBy(F.desc("l_extendedprice")))
    assert (base.n_rows, base.digest) == (repart.n_rows, repart.digest)
    assert (base.n_rows, base.digest) == (sorted_.n_rows, sorted_.digest)


def test_digest_detects_single_row_change(spark):
    li = load_table(spark, SF, "lineitem")
    base = _digest_of(li)
    key = li.select("l_orderkey").head()[0]
    tampered = li.withColumn(
        "l_returnflag",
        F.when(F.col("l_orderkey") == key, F.lit("X")).otherwise(
            F.col("l_returnflag")
        ),
    )
    t = _digest_of(tampered)
    assert t.n_rows == base.n_rows and t.digest != base.digest


def test_fk_audit_all_edges_clean_and_fires_on_orphans(spark):
    rows = {r.edge: r for r in q_fk_orphan_audit(spark, SF).collect()}
    assert len(rows) == 5
    assert all(r.n_orphans == 0 for r in rows.values())
    assert all(r.n_child_rows > 0 for r in rows.values())
    # the audit really fires: drop half the parents, orphans appear
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    half = orders.filter(F.col("o_orderkey") % 2 == 0)
    fired = fk_edge_audit(li, "l_orderkey", half, "o_orderkey", "e").collect()[0]
    assert fired.n_orphans > 0
    assert fired.n_child_rows == li.count()


def test_fk_edge_audit_not_exists_semantics(spark):
    """NOT EXISTS semantics of the single-pass audit on planted data:
    NULL child keys count as orphans, duplicate parent keys do NOT
    multiply the child count, and counts are exact."""
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (None,), (9,)], "k int"
    )
    parent = spark.createDataFrame([(1,), (1,), (2,), (3,)], "p int")
    r = fk_edge_audit(child, "k", parent, "p", "edge").collect()[0]
    # 5 child rows survive the join exactly once each (dup parent key 1
    # is deduped); orphans = the NULL key + the unmatched 9.
    assert r.n_child_rows == 5
    assert r.n_orphans == 2


def test_fk_edge_audit_empty_child(spark):
    child = spark.createDataFrame([], "k int")
    parent = spark.createDataFrame([(1,)], "p int")
    r = fk_edge_audit(child, "k", parent, "p", "edge").collect()[0]
    assert r.n_child_rows == 0 and r.n_orphans == 0


def test_open_orders_conservation(spark):
    """Σ opened = Σ closed = |orders with lines|, and the final running
    level returns to zero (every opened interval closes)."""
    rows = q_open_orders_daily(spark, SF).orderBy("day").collect()
    orders_with_lines = (
        load_table(spark, SF, "orders")
        .join(load_table(spark, SF, "lineitem"), F.expr("o_orderkey = l_orderkey"), "left_semi")
        .count()
    )
    assert sum(r.n_opened for r in rows) == orders_with_lines
    assert sum(r.n_closed for r in rows) == orders_with_lines
    assert rows[-1].open_orders == 0
    assert all(r.open_orders >= 0 for r in rows)


def test_transition_matrix_rows_are_stochastic(spark):
    rows = q_events_transition_matrix(spark, SF).collect()
    assert len(rows) > 0
    by_from: dict = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r)
    for from_type, rs in by_from.items():
        total = sum(r.p for r in rs)
        assert abs(total - 1.0) < 1e-4, f"{from_type} rows sum to {total}"
        assert all(r.n_transitions > 0 for r in rs)


def test_gopher_rules_each_fire_and_keep_is_conjunction(spark):
    """Every named rule must actually discriminate on the corpus (a
    constant-true rule is a vacuous screen), and `keep` must equal the
    conjunction of the rule booleans."""
    from csv_parquet_s3_spark.operators.textstats import text_gopher_quality_flags

    rows = text_gopher_quality_flags(spark, SF).collect()
    assert len(rows) > 0
    rules = ["r_min_words", "r_mean_len", "r_type_token", "r_repetition", "r_stopwords"]
    for rule in rules:
        vals = {getattr(r, rule) for r in rows}
        assert vals == {True, False}, f"{rule} never fires (values: {vals})"
    for r in rows:
        assert r.keep == all(getattr(r, rule) for rule in rules)
    kept = sum(1 for r in rows if r.keep)
    assert 0 < kept < len(rows)
