"""Date-partitioned layout: plan must show partition pruning, and the
pruned scan must read only the matching partition directories."""

from __future__ import annotations

import re

from csv_parquet_s3_spark.plans.explain import formatted_plan
from csv_parquet_s3_spark.sinks.partitioned import (
    read_day_range,
    write_partitioned_by_day,
)
from csv_parquet_s3_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_partition_pruning(spark, tmp_path):
    path = str(tmp_path / "events_by_day")
    ev = load_table(spark, SF, "events")
    write_partitioned_by_day(ev, path)

    n_days = ev.selectExpr("to_date(ts) d").distinct().count()
    assert n_days > 3  # layout actually split multiple partitions

    one_day = ev.selectExpr("CAST(to_date(ts) AS STRING) d").groupBy("d").count()
    day = sorted(r.d for r in one_day.collect())[1]

    pruned = read_day_range(spark, path, day, day)
    plan = formatted_plan(pruned)
    # the day predicate lands in PartitionFilters (directory pruning),
    # not PushedFilters (row-group pruning)
    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "event_date" in m.group(1), plan
    # count matches the unpartitioned filter
    want = ev.filter(f"to_date(ts) = '{day}'").count()
    assert pruned.count() == want > 0

    # the scan's input files are confined to the one matching directory
    files = {
        r.f
        for r in pruned.selectExpr("input_file_name() f").distinct().collect()
    }
    assert files and all(f"event_date={day}" in f for f in files)
