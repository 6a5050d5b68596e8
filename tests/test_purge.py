"""Purge-module tests: FIXTURES.md F3 scenarios against a records table."""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from csv_parquet_s3_spark.purge import PurgeConfig, run_purge


@pytest.fixture
def records_root(spark, tmp_path):
    """A small `records` table: 10 rows, transaction_date split 4 old / 6 new,
    one row with NULL transaction_date (must survive a date-predicate purge)."""
    rows = []
    for i in range(10):
        d = (
            None
            if i == 9
            else datetime.date(2023, 1 + i % 2, 1) if i < 4 else datetime.date(2024, 1, 1 + i)
        )
        rows.append((i, f"name{i}", d))
    df = spark.createDataFrame(rows, "id int, name string, transaction_date date")
    df.write.mode("overwrite").parquet(str(tmp_path / "records"))
    return str(tmp_path)


OLD_PRED = " WHERE transaction_date < DATE '2023-06-01'"


def test_criteria_purge_under_threshold(spark, records_root):
    res = run_purge(
        spark,
        [PurgeConfig("records", "CRITERIA", OLD_PRED, max_record_count=5, user_name="u")],
        records_root,
    )
    (o,) = res.outcomes
    assert o.status == "purged" and o.rows_matched == 4 and o.rows_kept == 6
    left = spark.read.parquet(records_root + "/records")
    assert left.count() == 6
    # NULL-predicate row survived (SQL DELETE semantics)
    assert left.filter(F.col("transaction_date").isNull()).count() == 1
    assert left.filter(F.col("transaction_date") < "2023-06-01").count() == 0


def test_criteria_purge_over_threshold_aborts(spark, records_root):
    res = run_purge(
        spark,
        [PurgeConfig("records", "CRITERIA", OLD_PRED, max_record_count=3)],
        records_root,
    )
    (o,) = res.outcomes
    assert o.status == "aborted" and o.rows_matched == 4
    assert spark.read.parquet(records_root + "/records").count() == 10  # untouched


def test_dry_run_modifies_nothing(spark, records_root):
    res = run_purge(
        spark,
        [PurgeConfig("records", "CRITERIA", OLD_PRED, max_record_count=100)],
        records_root,
        dry_run=True,
    )
    assert res.outcomes[0].status == "dry_run" and res.outcomes[0].rows_matched == 4
    assert spark.read.parquet(records_root + "/records").count() == 10


def test_truncate_action(spark, records_root):
    res = run_purge(
        spark,
        [PurgeConfig("records", "SQL", "TRUNCATE TABLE records")],
        records_root,
    )
    assert res.outcomes[0].status == "truncated"
    left = spark.read.parquet(records_root + "/records")
    assert left.count() == 0
    assert set(left.columns) == {"id", "name", "transaction_date"}  # schema kept


def test_sql_delete_translation(spark, records_root):
    res = run_purge(
        spark,
        [PurgeConfig("records", "SQL", "DELETE FROM records WHERE id >= 8", max_record_count=10)],
        records_root,
    )
    assert res.outcomes[0].status == "purged" and res.outcomes[0].rows_matched == 2
    assert spark.read.parquet(records_root + "/records").count() == 8


def test_null_action_and_missing_table_skip(spark, records_root):
    res = run_purge(
        spark,
        [
            PurgeConfig("records", None, None),
            PurgeConfig("ghost_table", "CRITERIA", OLD_PRED, 10),
        ],
        records_root,
    )
    assert [o.status for o in res.outcomes] == ["skipped", "skipped"]
    assert res.outcomes[1].detail == "missing table"


def test_table_list_dispatch(spark, records_root):
    res = run_purge(
        spark,
        [
            PurgeConfig("records", "CRITERIA", OLD_PRED, 100),
            PurgeConfig("other", "CRITERIA", OLD_PRED, 100),
        ],
        records_root,
        table_list="other, another",
    )
    # 'records' filtered out; 'other' missing → skipped
    assert [o.table_name for o in res.outcomes] == ["other"]


def test_audit_log_appended(spark, records_root, tmp_path):
    audit = str(tmp_path / "audit")
    run_purge(
        spark,
        [PurgeConfig("records", "CRITERIA", OLD_PRED, 100, user_name="ops")],
        records_root,
        audit_path=audit,
    )
    run_purge(
        spark,
        [PurgeConfig("records", "SQL", "TRUNCATE TABLE records", user_name="ops")],
        records_root,
        audit_path=audit,
    )
    log = spark.read.parquet(audit)
    assert log.count() >= 2  # one row per logged step, appended across runs
    assert set(log.columns) == {"log_timestamp", "log_message", "user_name", "table_name"}
    assert log.filter(F.col("user_name") == "ops").count() == log.count()


def test_guard_error_isolated_per_table(spark, records_root):
    res = run_purge(
        spark,
        [
            PurgeConfig("records", "CRITERIA", " WHERE no_such_column = 1", 10),
            PurgeConfig("records", "CRITERIA", OLD_PRED, 100),
        ],
        records_root,
    )
    assert res.outcomes[0].status == "error"
    assert res.outcomes[1].status == "purged"  # sibling unaffected
