"""The driver verifies the FIRST 50 entries of ``queries()`` — pin the
round's verification window so a registry edit can't silently rotate a
query out of coverage."""

from __future__ import annotations

import importlib.util

WINDOW = 50


def _entry_module():
    spec = importlib.util.spec_from_file_location("e", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_priority_window_is_exactly_the_driver_budget():
    m = _entry_module()
    assert len(m.VERIFY_PRIORITY) == WINDOW
    assert len(set(m.VERIFY_PRIORITY)) == WINDOW


def test_queries_order_puts_priority_first_and_loses_nothing():
    m = _entry_module()
    q = m.queries()
    assert list(q)[:WINDOW] == m.VERIFY_PRIORITY

    from csv_parquet_s3_spark.operators import QUERIES

    assert set(q) == set(QUERIES)
    assert len(q) == len(QUERIES)


def test_priority_entries_are_oracle_backed_where_possible():
    """Window slots are scarce: every priority entry except the documented
    rows-only ones must carry an oracle (hash check, not rows-only)."""
    m = _entry_module()
    oracles = m.oracle_sql()
    rows_only_by_design = set()
    missing = [
        n for n in m.VERIFY_PRIORITY if n not in oracles and n not in rows_only_by_design
    ]
    assert missing == []
